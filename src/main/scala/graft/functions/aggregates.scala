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

/** `uniqUpToState(N)(x)` — the -State combinator
  * (AggregateFunctions/AggregateFunctionState.cpp): instead of the
  * final value, emit the SERIALIZED aggregation buffer as a binary
  * column. This is the reference's `AggregateFunction(...)` data type
  * (ColumnAggregateFunction): partial states become storable,
  * re-aggregatable values — the AggregatingMergeTree idea.
  */
case class UniqUpToState(
    child: Expression,
    n: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.HashSet[Long]]
    with ImplicitCastInputTypes {

  private val inner = UniqUpTo(child, n)

  override def inputTypes = Seq(LongType)
  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = child :: Nil
  override def prettyName: String = "uniq_upto_state"

  override def createAggregationBuffer(): java.util.HashSet[Long] =
    inner.createAggregationBuffer()
  override def update(buf: java.util.HashSet[Long], input: InternalRow): java.util.HashSet[Long] =
    inner.update(buf, input)
  override def merge(a: java.util.HashSet[Long], b: java.util.HashSet[Long]): java.util.HashSet[Long] =
    inner.merge(a, b)
  override def eval(buf: java.util.HashSet[Long]): Any = inner.serialize(buf)
  override def serialize(buf: java.util.HashSet[Long]): Array[Byte] = inner.serialize(buf)
  override def deserialize(bytes: Array[Byte]): java.util.HashSet[Long] = inner.deserialize(bytes)

  override def withNewMutableAggBufferOffset(offset: Int): UniqUpToState =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): UniqUpToState =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): UniqUpToState =
    copy(child = newChildren.head)
}

/** `uniqUpToMerge(N)(state)` — the -Merge combinator
  * (AggregateFunctionMerge.cpp): consume serialized states produced
  * by [[UniqUpToState]] and finish the aggregation. State tables can
  * therefore be rolled up repeatedly (day → month → total) without
  * touching raw rows — each level's input is |keys| rows, not |data|.
  */
case class UniqUpToMerge(
    child: Expression,
    n: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.HashSet[Long]]
    with ImplicitCastInputTypes {

  private val codec = UniqUpTo(child, n)

  override def inputTypes = Seq(BinaryType)
  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = child :: Nil
  override def prettyName: String = "uniq_upto_merge"

  override def createAggregationBuffer(): java.util.HashSet[Long] =
    new java.util.HashSet[Long]()

  override def update(buf: java.util.HashSet[Long], input: InternalRow): java.util.HashSet[Long] = {
    val v = child.eval(input)
    if (v != null) codec.merge(buf, codec.deserialize(v.asInstanceOf[Array[Byte]]))
    else buf
  }
  override def merge(a: java.util.HashSet[Long], b: java.util.HashSet[Long]): java.util.HashSet[Long] =
    codec.merge(a, b)
  override def eval(buf: java.util.HashSet[Long]): Any =
    math.min(buf.size().toLong, n.toLong + 1)
  override def serialize(buf: java.util.HashSet[Long]): Array[Byte] = codec.serialize(buf)
  override def deserialize(bytes: Array[Byte]): java.util.HashSet[Long] = codec.deserialize(bytes)

  override def withNewMutableAggBufferOffset(offset: Int): UniqUpToMerge =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): UniqUpToMerge =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): UniqUpToMerge =
    copy(child = newChildren.head)
}

/** `quantileTiming(level)(ms)` — the reference's timing-quantile
  * sketch (AggregateFunctions/AggregateFunctionsQuantileTiming.h
  * semantics, all three state regimes): raw values are kept exactly
  * while count < 5672 (tiny/medium states, floor-index rule); past
  * that the state is the large histogram — exact below 1024, 16 ms
  * buckets up to 30 000 reported with the intHash32 jitter, clamped
  * above — with the ceil(level × total) accumulate rule. Merge sums
  * histograms, so results are deterministic independent of
  * partitioning (unlike sampling-based sketches), and the map
  * rebuckets once it outgrows the medium regime, so executor memory
  * stays bounded (≤ ~2 840 slots) at any scale. Negative inputs
  * count as 0.
  */
case class QuantileTiming(
    child: Expression,
    level: Double,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.HashMap[Long, Long]]
    with ImplicitCastInputTypes {

  require(level >= 0.0 && level <= 1.0, s"quantile level out of range: $level")

  override def inputTypes = Seq(LongType)
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def children: Seq[Expression] = child :: Nil
  override def prettyName: String = "quantile_timing"

  override def createAggregationBuffer(): java.util.HashMap[Long, Long] =
    new java.util.HashMap[Long, Long]()

  override def update(buf: java.util.HashMap[Long, Long], input: InternalRow): java.util.HashMap[Long, Long] = {
    val v = child.eval(input)
    if (v != null) QuantileTiming.insert(buf, v.asInstanceOf[Long], 1L)
    buf
  }

  override def merge(a: java.util.HashMap[Long, Long], b: java.util.HashMap[Long, Long]): java.util.HashMap[Long, Long] = {
    val it = b.entrySet().iterator()
    while (it.hasNext) { val e = it.next(); a.merge(e.getKey, e.getValue, (x, y) => x + y) }
    a
  }

  override def eval(buf: java.util.HashMap[Long, Long]): Any =
    QuantileTiming.evalLevel(buf, level)

  override def serialize(buf: java.util.HashMap[Long, Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * buf.size())
    bb.putInt(buf.size())
    buf.forEach((k, v) => { bb.putLong(k); bb.putLong(v) })
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.HashMap[Long, Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val sz = bb.getInt
    val m = new java.util.HashMap[Long, Long](sz * 2)
    var i = 0
    while (i < sz) { m.put(bb.getLong, bb.getLong); i += 1 }
    m
  }

  override def withNewMutableAggBufferOffset(offset: Int): QuantileTiming =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): QuantileTiming =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): QuantileTiming =
    copy(child = newChildren.head)
}

object QuantileTiming {
  // AggregateFunctionQuantileTiming.h constants
  private val SmallThreshold = 1024L
  private val BigThreshold = 30000L
  private val BigPrecision = 16L
  /** Medium→large promotion point: sizeof(QuantileTimingLarge) /
    * sizeof(UInt16) / 2 (mediumIsWorthToConvertToLarge). The medium
    * vector holds exactly this many elements before the NEXT insert
    * converts, so counts ≤ MediumMax still eval under the raw
    * floor-index rule. */
  private val MediumMax = 5672L

  /** TINY_MAX_ELEMS — the weighted variant never uses medium
    * (QuantileTiming::insertWeighted: tinyToLarge past this). */
  private val TinyMax = 31L

  /** Insert-side clamp (tiny/medium insert: x > BIG_THRESHOLD → 30000;
    * negative timings index slot 0). Raw values are KEPT until the
    * large regime — QuantileTimingMedium stores the element vector, so
    * tiny/medium evals are exact on raw values. */
  def clamp(v: Long): Long =
    if (v < 0) 0L else math.min(v, BigThreshold)

  def bucket(v: Long): Long =
    if (v < SmallThreshold) v
    else if (v >= BigThreshold) BigThreshold
    else SmallThreshold + ((v - SmallThreshold) / BigPrecision) * BigPrecision

  /** A raw-value map larger than this rebuckets in place — at that
    * point count ≥ distinct > MediumMax, so the state is already in
    * the large regime and only bucket resolution is observable. Keeps
    * executor memory bounded like the reference's 2835-slot histogram
    * regardless of the timing-value domain. */
  private val MaxRawKeys = MediumMax.toInt

  def insert(buf: java.util.HashMap[Long, Long], v: Long, w: Long): Unit = {
    buf.merge(clamp(v), w, (a, b) => a + b)
    if (buf.size > MaxRawKeys) {
      val re = new java.util.HashMap[Long, Long](4096)
      buf.forEach((k, c) => re.merge(bucket(k), c, (a, b) => a + b))
      buf.clear()
      buf.putAll(re)
    }
  }

  /** QuantileTimingLarge::indexInBigToValue — bucket base plus a
    * deterministic intHash32<0> jitter "so that it is not noticeable
    * that all the values are even". */
  private def indexInBigToValue(i: Long): Long =
    i * BigPrecision + SmallThreshold +
      (HashFns.intHash32Salted(i, 0L) % BigPrecision - BigPrecision / 2)

  /** Shared eval for the timing sketches. `weighted = true` follows
    * the reference's weighted state machine — tiny (raw floor rule)
    * only while total weight ≤ TINY_MAX_ELEMS, then straight to the
    * large histogram ("for the weighted variant we do not use
    * `medium`", AggregateFunctionQuantileTiming.h:611) — while the
    * unweighted path keeps raw values through the medium regime
    * (count ≤ 5672). */
  def evalLevel(buf: java.util.HashMap[Long, Long], level: Double, weighted: Boolean = false): Any = {
    if (buf.isEmpty) return null
    var total = 0L
    buf.values().forEach(c => total += c)
    val keys = buf.keySet().toArray(new Array[java.lang.Long](0)).map(_.longValue()).sorted
    var acc = 0L
    var i = 0
    val rawMax = if (weighted) TinyMax else MediumMax
    if (total <= rawMax) {
      // tiny/medium: exact sorted-element indexing, n = floor(level·count)
      // (QuantileTimingTiny/Medium::get; level==1 → last element)
      val n = if (level < 1) (level * total).toLong else total - 1
      while (i < keys.length) {
        acc += buf.get(keys(i))
        if (acc > n) return keys(i)
        i += 1
      }
      keys.last
    } else {
      // large: histogram walk, pos = ceil(level·count); small slots are
      // exact, big buckets report their jittered representative, and
      // clamped 30000s count toward total but hold no slot — a level
      // landing past every slot reports BIG_THRESHOLD
      // (QuantileTimingLarge::get/getMany)
      val pos = math.ceil(level * total).toLong
      val hist = new java.util.TreeMap[Long, Long]()
      buf.forEach { (k, c) =>
        if (k < BigThreshold)
          hist.merge(bucket(k), c, (a, b) => a + b)
      }
      val it = hist.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        acc += e.getValue
        if (acc >= pos) {
          val k = e.getKey
          return if (k < SmallThreshold) k
          else indexInBigToValue((k - SmallThreshold) / BigPrecision)
        }
      }
      BigThreshold
    }
  }
}

/** `quantilesTiming(l1,…)(ms)` — the plural form: ONE histogram
  * buffer, every level read out of it at eval (the reference's
  * quantilesTiming reads its single state N times too —
  * AggregateFunctionsQuantileTiming.h insertResultInto loop). One
  * buffer instead of N parallel aggregates is also the right shape
  * at scale: state size is independent of the level count.
  */
case class QuantilesTiming(
    child: Expression,
    levels: Seq[Double],
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.HashMap[Long, Long]]
    with ImplicitCastInputTypes {

  override def inputTypes = Seq(LongType)
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(LongType, containsNull = true)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = child :: Nil
  override def prettyName: String = "quantiles_timing"

  override def createAggregationBuffer(): java.util.HashMap[Long, Long] =
    new java.util.HashMap[Long, Long]()

  override def update(buf: java.util.HashMap[Long, Long], input: InternalRow): java.util.HashMap[Long, Long] = {
    val v = child.eval(input)
    if (v != null) QuantileTiming.insert(buf, v.asInstanceOf[Long], 1L)
    buf
  }

  override def merge(a: java.util.HashMap[Long, Long], b: java.util.HashMap[Long, Long]): java.util.HashMap[Long, Long] = {
    val it = b.entrySet().iterator()
    while (it.hasNext) { val e = it.next(); a.merge(e.getKey, e.getValue, (x, y) => x + y) }
    a
  }

  override def eval(buf: java.util.HashMap[Long, Long]): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      levels.map(l => QuantileTiming.evalLevel(buf, l)).toArray[Any])

  override def serialize(buf: java.util.HashMap[Long, Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * buf.size())
    bb.putInt(buf.size())
    buf.forEach((k, v) => { bb.putLong(k); bb.putLong(v) })
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.HashMap[Long, Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val sz = bb.getInt
    val m = new java.util.HashMap[Long, Long](sz * 2)
    var i = 0
    while (i < sz) { m.put(bb.getLong, bb.getLong); i += 1 }
    m
  }

  override def withNewMutableAggBufferOffset(offset: Int): QuantilesTiming =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): QuantilesTiming =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): QuantilesTiming =
    copy(child = newChildren.head)
}

/** `quantileTDigest(level)(x)` — t-digest quantile sketch
  * (reference: dbms/src/AggregateFunctions/QuantileTDigest.h; see
  * [[TDigest]]). O(δ) mergeable state with tight tail accuracy;
  * results are approximate (rank error ≈ q(1−q)/δ), so the driver
  * check is rows-only and accuracy is property-tested.
  */
case class QuantileTDigest(
    child: Expression,
    level: Double,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TDigest]
    with ImplicitCastInputTypes {

  require(level >= 0.0 && level <= 1.0, s"quantile level out of range: $level")

  override def inputTypes = Seq(DoubleType)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def children: Seq[Expression] = child :: Nil
  override def prettyName: String = "quantile_tdigest"

  override def createAggregationBuffer(): TDigest = new TDigest()

  override def update(buf: TDigest, input: InternalRow): TDigest = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[Double])
    buf
  }

  override def merge(a: TDigest, b: TDigest): TDigest = { a.merge(b); a }

  override def eval(buf: TDigest): Any = {
    val q = buf.quantile(level)
    if (q.isNaN) null else q
  }

  override def serialize(buf: TDigest): Array[Byte] = buf.serialize()
  override def deserialize(bytes: Array[Byte]): TDigest = TDigest.deserialize(bytes)

  override def withNewMutableAggBufferOffset(offset: Int): QuantileTDigest =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): QuantileTDigest =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): QuantileTDigest =
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

/** argMin / argMax with the reference's FIRST-encountered tie rule
  * (AggregateFunctionsArgMinMax.h: the stored pair only updates on a
  * STRICT improvement of the ordering value, so among equal orderings
  * the first row in read order wins). Spark's own min_by/max_by keeps
  * the LAST tied row, which diverges on any data with duplicate
  * ordering values (corpus 00027).
  *
  * Declarative two-slot buffer (value, ordering) — partial/final agg
  * with a constant-size state, the canonical 100 TB shape. Merge is
  * strict the same way, and Spark merges partial buffers in partition
  * order, so first-win holds across partitions too.
  */
case class ChArgExtremum(
    valueExpr: Expression,
    orderingExpr: Expression,
    isMin: Boolean)
    extends org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate {
  import org.apache.spark.sql.catalyst.expressions._

  override def children: Seq[Expression] = Seq(valueExpr, orderingExpr)
  override def nullable: Boolean = true
  override def dataType: DataType = valueExpr.dataType
  override def prettyName: String = if (isMin) "ch_arg_min" else "ch_arg_max"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    org.apache.spark.sql.catalyst.util.TypeUtils
      .checkForOrderingExpr(orderingExpr.dataType, prettyName)

  private lazy val value =
    AttributeReference("value", valueExpr.dataType, nullable = true)()
  private lazy val ordering =
    AttributeReference("ordering", orderingExpr.dataType, nullable = true)()

  override lazy val aggBufferAttributes: Seq[AttributeReference] =
    value :: ordering :: Nil
  override lazy val initialValues: Seq[Expression] = Seq(
    Literal.create(null, valueExpr.dataType),
    Literal.create(null, orderingExpr.dataType))

  private def strictlyBetter(newOrd: Expression, oldOrd: Expression): Expression =
    if (isMin) LessThan(newOrd, oldOrd) else GreaterThan(newOrd, oldOrd)

  private def updateWith(oldValue: Expression, oldOrd: Expression,
      newValue: Expression, newOrd: Expression): Seq[Expression] = {
    val better = And(IsNotNull(newOrd),
      Or(IsNull(oldOrd), strictlyBetter(newOrd, oldOrd)))
    Seq(If(better, newValue, oldValue), If(better, newOrd, oldOrd))
  }

  override lazy val updateExpressions: Seq[Expression] =
    updateWith(value, ordering, valueExpr, orderingExpr)
  override lazy val mergeExpressions: Seq[Expression] =
    updateWith(value.left, ordering.left, value.right, ordering.right)
  override lazy val evaluateExpression: Expression = value

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ChArgExtremum =
    copy(valueExpr = newChildren(0), orderingExpr = newChildren(1))
}

/** Buffer for [[ChAny]]: `set` distinguishes "no row seen" from "a
  * NULL value was seen" (any() with ignoreNulls=false keeps it). */
final class AnyBuf(var set: Boolean, var value: Any)

/** CH `any(x)` / `anyLast(x)` — first/last value in read order, ANY
  * input type (reference AggregateFunctionsMinMaxAny.h: any = first
  * non-assigned, anyLast = overwrite every row; both nondeterministic
  * across parallel streams, like Spark's first/last).
  *
  * Exists as a TypedImperativeAggregate for PLAN QUALITY, not
  * semantics: Spark's declarative First/Last carry a var-length
  * buffer, which HashAggregateExec cannot hold, so any query mixing
  * any() with plain aggregates falls all the way to SortAggregate —
  * bench43 q29 spent 60% of its time sorting 50M rows. A typed
  * aggregate routes the whole aggregation through
  * ObjectHashAggregateExec (hash-based, no sort). */
case class ChAny(
    child: Expression,
    last: Boolean,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[AnyBuf] {

  override def dataType: DataType = child.dataType
  override def nullable: Boolean = true
  override def children: Seq[Expression] = child :: Nil
  override def prettyName: String = if (last) "anylast" else "any"

  override def createAggregationBuffer(): AnyBuf = new AnyBuf(false, null)

  override def update(buf: AnyBuf, input: InternalRow): AnyBuf = {
    if (last || !buf.set) {
      // values read out of vectorized rows alias reused buffers —
      // copy (copyValue clones UTF8String/binary/complex, passes
      // primitives through)
      buf.value = InternalRow.copyValue(child.eval(input))
      buf.set = true
    }
    buf
  }

  override def merge(a: AnyBuf, b: AnyBuf): AnyBuf = {
    if (b.set && (last || !a.set)) { a.value = b.value; a.set = true }
    a
  }

  override def eval(buf: AnyBuf): Any = buf.value

  @transient private lazy val ser =
    org.apache.spark.sql.catalyst.expressions.UnsafeProjection
      .create(Array(dataType))
  override def serialize(buf: AnyBuf): Array[Byte] =
    if (!buf.set) Array.emptyByteArray
    else ser(InternalRow(buf.value)).getBytes

  override def deserialize(bytes: Array[Byte]): AnyBuf =
    if (bytes.isEmpty) new AnyBuf(false, null)
    else {
      val row = new org.apache.spark.sql.catalyst.expressions.UnsafeRow(1)
      row.pointTo(bytes, bytes.length)
      new AnyBuf(true, InternalRow.copyValue(row.get(0, dataType)))
    }

  override def withNewMutableAggBufferOffset(offset: Int): ChAny =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): ChAny =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): ChAny =
    copy(child = newChildren.head)
}
