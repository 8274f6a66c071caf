package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `uniqUpTo(N)(x)` — exact distinct count saturating at N: returns
  * the exact count while ≤ N, else N+1 (reference:
  * dbms/src/AggregateFunctions/AggregateFunctionUniqUpTo.h). The
  * buffer stores at most N+1 distinct values, so memory is O(N) per
  * group regardless of input cardinality — unlike countDistinct's
  * unbounded expand-and-shuffle, this composes with partial
  * aggregation and stays tiny at 100 TB.
  *
  * Input is hashed/cast to Long upstream (implicit cast); the
  * saturating semantics only need equality.
  */
case class UniqUpTo(
    child: Expression,
    n: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.HashSet[Long]]
    with ImplicitCastInputTypes {

  require(n > 0 && n < (1 << 20), s"uniqUpTo threshold out of range: $n")

  override def inputTypes = Seq(LongType)
  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = child :: Nil
  override def prettyName: String = "uniq_upto"

  override def createAggregationBuffer(): java.util.HashSet[Long] =
    new java.util.HashSet[Long]()

  override def update(buf: java.util.HashSet[Long], input: InternalRow): java.util.HashSet[Long] = {
    val v = child.eval(input)
    // saturation: once n+1 distinct values are seen the answer is fixed
    if (v != null && buf.size() <= n) buf.add(v.asInstanceOf[Long])
    buf
  }

  override def merge(a: java.util.HashSet[Long], b: java.util.HashSet[Long]): java.util.HashSet[Long] = {
    val it = b.iterator()
    while (it.hasNext && a.size() <= n) a.add(it.next())
    a
  }

  override def eval(buf: java.util.HashSet[Long]): Any =
    math.min(buf.size().toLong, n.toLong + 1)

  override def serialize(buf: java.util.HashSet[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 8 * buf.size())
    bb.putInt(buf.size())
    val it = buf.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.HashSet[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val sz = bb.getInt
    val s = new java.util.HashSet[Long](sz * 2)
    var i = 0
    while (i < sz) { s.add(bb.getLong); i += 1 }
    s
  }

  override def withNewMutableAggBufferOffset(offset: Int): UniqUpTo =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): UniqUpTo =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): UniqUpTo =
    copy(child = newChildren.head)
}

/** Boyer-Moore majority-vote state for [[AnyHeavy]]. */
final class HeavyBuf(var value: UTF8String, var count: Long)

/** `anyHeavy(x)` — heavy-hitter: returns a value that, if any value
  * occurs in more than half the rows, is guaranteed to be that value
  * (reference: dbms/src/AggregateFunctions/AggregateFunctionAnyHeavy
  * semantics — Boyer-Moore majority vote with subtractive merge).
  * O(1) state per group; merge order only matters when no majority
  * exists, in which case any answer is acceptable by contract.
  */
case class AnyHeavy(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[HeavyBuf]
    with ImplicitCastInputTypes {

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def children: Seq[Expression] = child :: Nil
  override def prettyName: String = "any_heavy"

  override def createAggregationBuffer(): HeavyBuf = new HeavyBuf(null, 0L)

  override def update(buf: HeavyBuf, input: InternalRow): HeavyBuf = {
    val v = child.eval(input).asInstanceOf[UTF8String]
    if (v != null) {
      if (buf.value != null && buf.value.equals(v)) buf.count += 1
      else if (buf.count == 0) { buf.value = v.clone(); buf.count = 1 }
      else buf.count -= 1
    }
    buf
  }

  override def merge(a: HeavyBuf, b: HeavyBuf): HeavyBuf = {
    if (b.value != null) {
      if (a.value != null && a.value.equals(b.value)) a.count += b.count
      else if (b.count > a.count) {
        val c = b.count - a.count
        a.value = b.value
        a.count = c
      } else a.count -= b.count
    }
    a
  }

  override def eval(buf: HeavyBuf): Any = buf.value

  override def serialize(buf: HeavyBuf): Array[Byte] = {
    val vb = if (buf.value == null) Array.emptyByteArray else buf.value.getBytes
    val bb = ByteBuffer.allocate(8 + 4 + vb.length)
    bb.putLong(buf.count)
    bb.putInt(if (buf.value == null) -1 else vb.length)
    bb.put(vb)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): HeavyBuf = {
    val bb = ByteBuffer.wrap(bytes)
    val cnt = bb.getLong
    val len = bb.getInt
    if (len < 0) new HeavyBuf(null, cnt)
    else {
      val vb = new Array[Byte](len)
      bb.get(vb)
      new HeavyBuf(UTF8String.fromBytes(vb), cnt)
    }
  }

  override def withNewMutableAggBufferOffset(offset: Int): AnyHeavy =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): AnyHeavy =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): AnyHeavy =
    copy(child = newChildren.head)
}
