package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Bit-exact port of the reference's uniqHLL12 estimator
  * (AggregateFunctionUniq.h AggregateFunctionUniqHLL12Data:
  * HyperLogLogWithSmallSetOptimization<T, 16, 12>):
  *
  *  - values map to a UInt64 KEY first: integers as-is, floats by bit
  *    pattern, strings via CityHash64 of the bytes
  *    (AggregateFunctionUniqTraits);
  *  - up to 16 distinct keys live in an exact small set;
  *  - the 17th distinct key converts to a 4096-bucket HyperLogLog:
  *    hash = intHash32(key) (salt 0), bucket = low 12 bits, rank =
  *    trailing zeros of the remaining 20 bits + 1 (capped at 21);
  *  - the estimate is the FullFeatured fix of the harmonic mean:
  *    LinearCounting below 2.5·m, the 2^32 saturation fix above
  *    2^32/30, rounded to UInt32 (HyperLogLogCounter.h size()).
  *
  * The denominator fold Σ c_r·2^-r runs in exact binary arithmetic
  * (counts ≤ 4096, 21 halvings — all representable), so double here
  * equals the reference's long double bit-for-bit.
  *
  * Distributed shape: a constant 4 KB state per group with
  * partial/final merge — the canonical sketch aggregate at 100 TB.
  */
final class HLL12State(val trivial: Boolean = false) {
  var small: java.util.HashSet[Long] = new java.util.HashSet[Long]()
  var registers: Array[Byte] = null

  @inline private def toLarge(): Unit = {
    registers = new Array[Byte](HLL12State.M)
    val it = small.iterator()
    while (it.hasNext) insertLarge(it.next())
    small = null
  }

  @inline private def insertLarge(key: Long): Unit = {
    // variadic mode: the key IS the hash already (TrivialHash —
    // AggregateFunctionUniqHLL12DataForVariadic), truncated to UInt32
    val hash = if (trivial) key.toInt else HLL12State.intHash32(key)
    val bucket = hash & 0xfff
    val tail = hash >>> 12 // 20 significant bits
    val rank =
      if (tail == 0) HLL12State.MaxRank
      else math.min(java.lang.Integer.numberOfTrailingZeros(tail) + 1,
        HLL12State.MaxRank)
    if (rank > (registers(bucket) & 0xff)) registers(bucket) = rank.toByte
  }

  def insertKey(key: Long): Unit =
    if (registers == null) {
      if (!small.contains(key)) {
        if (small.size() < 16) small.add(key)
        else { toLarge(); insertLarge(key) }
      }
    } else insertLarge(key)

  def merge(other: HLL12State): Unit =
    if (other.registers == null) {
      val it = other.small.iterator()
      while (it.hasNext) insertKey(it.next())
    } else {
      if (registers == null) toLarge()
      var b = 0
      while (b < HLL12State.M) {
        if ((other.registers(b) & 0xff) > (registers(b) & 0xff))
          registers(b) = other.registers(b)
        b += 1
      }
    }

  def estimate(): Long =
    if (registers == null) small.size().toLong
    else {
      val m = HLL12State.M
      val counts = new Array[Int](HLL12State.MaxRank + 1)
      var b = 0
      while (b < m) { counts(registers(b) & 0xff) += 1; b += 1 }
      val zeros = counts(0)
      // denominator.get(): top-down fold = Σ counts(r)·2^-r
      var v: Double = counts(HLL12State.MaxRank).toDouble
      var i = HLL12State.MaxRank - 1
      while (i >= 0) { v = v / 2.0 + counts(i); i -= 1 }
      val alpha = 0.7213 / (1 + 1.079 / m)
      val raw = alpha * m * m / v
      val pow2_32 = 4294967296.0
      val fixed =
        if (raw > pow2_32 / 30.0) -pow2_32 * math.log(1.0 - raw / pow2_32)
        else if (raw <= 2.5 * m) {
          if (zeros != 0) m * (math.log(m.toDouble) - math.log(zeros.toDouble))
          else raw
        } else raw
      ((fixed + 0.5).toLong) & 0xffffffffL
    }
}

object HLL12State {
  val M = 4096
  val MaxRank = 21 // 32 - precision + 1

  /** intHash32 with salt 0 (Common/HashTable/Hash.h:144) — note the
    * C++ shifts are on UNSIGNED, so logical shifts here. */
  def intHash32(key0: Long): Int = {
    var key = key0
    key = (~key) + (key << 18)
    key = key ^ ((key >>> 31) | (key << 33))
    key = key * 21
    key = key ^ ((key >>> 11) | (key << 53))
    key = key + (key << 6)
    key = key ^ ((key >>> 22) | (key << 42))
    key.toInt
  }
}

/** The reference's multi-argument uniq key
  * (AggregateFunctions/UniqVariadicHash.h): each argument's RAW
  * STORAGE BYTES (IColumn::getDataAt — the declared CH width, little
  * endian) hash with CityHash64; successive hashes fold with
  * Hash128to64. `widths` carries the per-argument byte width (-1 for
  * strings), resolved from declared CH types by
  * [[graft.plans.ChTypeNameResolution]] while ChTypeTag markers are
  * still visible; Nil means not yet resolved. */
case class UniqVariadicKeyExpr(children: Seq[Expression], widths: Seq[Int])
    extends Expression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def dataType: DataType = LongType
  override def nullable: Boolean = children.exists(_.nullable)
  override def prettyName: String = "uniq_variadic_key"

  private def combine(lo: Long, hi: Long): Long = {
    val kMul = 0x9ddfea08eb382d69L
    var a = (lo ^ hi) * kMul
    a ^= (a >>> 47)
    var b = (hi ^ a) * kMul
    b ^= (b >>> 47)
    b * kMul
  }

  private def argHash(v: Any, dt: DataType, width: Int): Long = {
    val bytes: Array[Byte] = v match {
      case s: UTF8String => s.getBytes
      case a: Array[Byte] => a
      case other =>
        val x: Long = other match {
          case l: Long =>
            dt match {
              case _: TimestampType | TimestampNTZType =>
                Math.floorDiv(l, 1000000L)
              case _ => l
            }
          case i: Int => i.toLong
          case s: Short => s.toLong
          case b: Byte => b.toLong
          case b: Boolean => if (b) 1L else 0L
          case f: Float =>
            java.lang.Float.floatToRawIntBits(f).toLong & 0xffffffffL
          case d: Double => java.lang.Double.doubleToRawLongBits(d)
          case o => return HashFns.cityHash64(
            UTF8String.fromString(o.toString).getBytes)
        }
        val w = if (width > 0) width else 8
        val out = new Array[Byte](w)
        var i = 0
        while (i < w) { out(i) = ((x >>> (8 * i)) & 0xff).toByte; i += 1 }
        out
    }
    HashFns.cityHash64(bytes)
  }

  override def eval(input: InternalRow): Any = {
    var acc = 0L
    var first = true
    var i = 0
    while (i < children.length) {
      val v = children(i).eval(input)
      if (v == null) return null
      val w = if (widths.nonEmpty) widths(i) else -2
      val h = argHash(v, children(i).dataType, w)
      acc = if (first) h else combine(h, acc)
      first = false
      i += 1
    }
    acc
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): UniqVariadicKeyExpr =
    copy(children = newChildren)
}

case class UniqHLL12(
    child: Expression,
    trivial: Boolean = false,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[HLL12State] {

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = child :: Nil
  override def prettyName: String = "uniq_hll12"

  override def createAggregationBuffer(): HLL12State = new HLL12State(trivial)

  /** Value → UInt64 key (AggregateFunctionUniqTraits / the String
    * CityHash64 path). */
  private def keyOf(v: Any): Long = v match {
    case l: Long => l
    case i: Int => i.toLong
    case s: Short => s.toLong
    case b: Byte => b.toLong
    case b: Boolean => if (b) 1L else 0L
    case f: Float =>
      java.lang.Float.floatToRawIntBits(f).toLong & 0xffffffffL
    case d: Double => java.lang.Double.doubleToRawLongBits(d)
    case s: UTF8String => HashFns.cityHash64(s.getBytes)
    case a: Array[Byte] => HashFns.cityHash64(a)
    case other => HashFns.cityHash64(
      UTF8String.fromString(other.toString).getBytes)
  }

  private lazy val isTimestamp = child.dataType match {
    case _: TimestampType | TimestampNTZType => true
    case _ => false
  }

  override def update(buf: HLL12State, input: InternalRow): HLL12State = {
    val v = child.eval(input)
    if (v != null) {
      // a DateTime's hashed value is its epoch SECOND (the UInt32 the
      // reference stores); Spark's internal Long is microseconds
      val key =
        if (isTimestamp) Math.floorDiv(v.asInstanceOf[Long], 1000000L)
        else keyOf(v)
      buf.insertKey(key)
    }
    buf
  }

  override def merge(a: HLL12State, b: HLL12State): HLL12State = {
    a.merge(b); a
  }

  override def eval(buf: HLL12State): Any = buf.estimate()

  override def serialize(buf: HLL12State): Array[Byte] =
    if (buf.registers == null) {
      val bb = ByteBuffer.allocate(1 + 4 + 8 * buf.small.size())
      bb.put(0.toByte).putInt(buf.small.size())
      val it = buf.small.iterator()
      while (it.hasNext) bb.putLong(it.next())
      bb.array()
    } else {
      val bb = ByteBuffer.allocate(1 + HLL12State.M)
      bb.put(1.toByte).put(buf.registers)
      bb.array()
    }

  override def deserialize(bytes: Array[Byte]): HLL12State = {
    val bb = ByteBuffer.wrap(bytes)
    val s = new HLL12State(trivial)
    if (bb.get() == 0) {
      val n = bb.getInt
      var i = 0
      while (i < n) { s.small.add(bb.getLong); i += 1 }
    } else {
      s.small = null
      s.registers = new Array[Byte](HLL12State.M)
      bb.get(s.registers)
    }
    s
  }

  override def withNewMutableAggBufferOffset(offset: Int): UniqHLL12 =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): UniqHLL12 =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): UniqHLL12 =
    copy(child = newChildren.head)
}
