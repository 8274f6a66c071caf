package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

/** `quantileExactWeighted(level)(x, w)` — exact quantile over a
  * weighted multiset (reference:
  * dbms/src/AggregateFunctions/AggregateFunctionQuantileExactWeighted.h:44).
  * State is a value→total-weight map (bounded by the number of
  * DISTINCT values, not rows — the reference's design point: weights
  * compress repeated measurements, so the state stays small and
  * merges exactly under partial aggregation). Result: the smallest
  * value whose cumulative weight reaches ceil(level × Σw).
  */
case class QuantileExactWeighted(
    valueExpr: Expression,
    weightExpr: Expression,
    level: Double,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.HashMap[Double, Long]]
    with ImplicitCastInputTypes {

  require(level >= 0.0 && level <= 1.0, s"quantile level out of range: $level")

  override def inputTypes = Seq(DoubleType, LongType)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def children: Seq[Expression] = valueExpr :: weightExpr :: Nil
  override def prettyName: String = "quantile_exact_weighted"

  override def createAggregationBuffer(): java.util.HashMap[Double, Long] =
    new java.util.HashMap[Double, Long]()

  override def update(buf: java.util.HashMap[Double, Long], input: InternalRow): java.util.HashMap[Double, Long] = {
    val v = valueExpr.eval(input)
    val w = weightExpr.eval(input)
    if (v != null && w != null)
      buf.merge(v.asInstanceOf[Double], w.asInstanceOf[Long], (a, b) => a + b)
    buf
  }

  override def merge(a: java.util.HashMap[Double, Long], b: java.util.HashMap[Double, Long]): java.util.HashMap[Double, Long] = {
    val it = b.entrySet().iterator()
    while (it.hasNext) { val e = it.next(); a.merge(e.getKey, e.getValue, (x, y) => x + y) }
    a
  }

  override def eval(buf: java.util.HashMap[Double, Long]): Any = {
    if (buf.isEmpty) return null
    var total = 0L
    buf.values().forEach(c => total += c)
    // threshold = ceil(level·Σw), accumulated ≥ threshold — level 0
    // returns the first value even under zero weight
    // (AggregateFunctionQuantileExactWeighted.h:137-146)
    val threshold = math.ceil(level * total).toLong
    val keys = buf.keySet().toArray(new Array[java.lang.Double](0)).map(_.doubleValue()).sorted
    var acc = 0L
    var i = 0
    while (i < keys.length) {
      acc += buf.get(keys(i))
      if (acc >= threshold) return keys(i)
      i += 1
    }
    keys.last
  }

  override def serialize(buf: java.util.HashMap[Double, Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * buf.size())
    bb.putInt(buf.size())
    buf.forEach((k, v) => { bb.putDouble(k); bb.putLong(v) })
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.HashMap[Double, Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val sz = bb.getInt
    val m = new java.util.HashMap[Double, Long](sz * 2)
    var i = 0
    while (i < sz) { m.put(bb.getDouble, bb.getLong); i += 1 }
    m
  }

  override def withNewMutableAggBufferOffset(offset: Int): QuantileExactWeighted =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): QuantileExactWeighted =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): QuantileExactWeighted =
    copy(valueExpr = newChildren(0), weightExpr = newChildren(1))
}

/** Plural `quantilesExactWeighted(l1,…)(x, w)` — one weight map,
  * every level read from it at eval. */
case class QuantilesExactWeighted(
    valueExpr: Expression,
    weightExpr: Expression,
    levels: Seq[Double],
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.HashMap[Double, Long]]
    with ImplicitCastInputTypes {

  override def inputTypes = Seq(DoubleType, LongType)
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(DoubleType, containsNull = true)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = valueExpr :: weightExpr :: Nil
  override def prettyName: String = "quantiles_exact_weighted"

  override def createAggregationBuffer(): java.util.HashMap[Double, Long] =
    new java.util.HashMap[Double, Long]()

  override def update(buf: java.util.HashMap[Double, Long], input: InternalRow): java.util.HashMap[Double, Long] = {
    val v = valueExpr.eval(input)
    val w = weightExpr.eval(input)
    if (v != null && w != null)
      buf.merge(v.asInstanceOf[Double], w.asInstanceOf[Long], (a, b) => a + b)
    buf
  }

  override def merge(a: java.util.HashMap[Double, Long], b: java.util.HashMap[Double, Long]): java.util.HashMap[Double, Long] = {
    val it = b.entrySet().iterator()
    while (it.hasNext) { val e = it.next(); a.merge(e.getKey, e.getValue, (x, y) => x + y) }
    a
  }

  override def eval(buf: java.util.HashMap[Double, Long]): Any = {
    val keys = buf.keySet().toArray(new Array[java.lang.Double](0)).map(_.doubleValue()).sorted
    var total = 0L
    buf.values().forEach(c => total += c)
    val out = levels.map { level =>
      if (buf.isEmpty) null
      else {
        val threshold = math.ceil(level * total).toLong
        var acc = 0L
        var i = 0
        var res: Any = keys.last
        var done = false
        while (i < keys.length && !done) {
          acc += buf.get(keys(i))
          if (acc >= threshold) { res = keys(i); done = true }
          i += 1
        }
        res
      }
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray[Any])
  }

  override def serialize(buf: java.util.HashMap[Double, Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * buf.size())
    bb.putInt(buf.size())
    buf.forEach((k, v) => { bb.putDouble(k); bb.putLong(v) })
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.HashMap[Double, Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val sz = bb.getInt
    val m = new java.util.HashMap[Double, Long](sz * 2)
    var i = 0
    while (i < sz) { m.put(bb.getDouble, bb.getLong); i += 1 }
    m
  }

  override def withNewMutableAggBufferOffset(offset: Int): QuantilesExactWeighted =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): QuantilesExactWeighted =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): QuantilesExactWeighted =
    copy(valueExpr = newChildren(0), weightExpr = newChildren(1))
}

/** `quantileTimingWeighted(level)(ms, w)` — the timing sketch with
  * per-row weights (reference: AggregateFunctionsQuantileTiming.h
  * `insertWeighted`). Raw clamped values are kept while total weight
  * ≤ TINY_MAX_ELEMS (tiny regime, floor-index rule); past that the
  * state is the large histogram — exact <1024 ms, 16 ms bins to
  * 30 s with the intHash32 jitter, clamped above — under the
  * ceil(level × Σw) rule. The weighted variant never uses the
  * medium regime (`tinyToLarge` at AggregateFunctionQuantileTiming.h:611).
  */
case class QuantileTimingWeighted(
    valueExpr: Expression,
    weightExpr: Expression,
    level: Double,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.HashMap[Long, Long]]
    with ImplicitCastInputTypes {

  require(level >= 0.0 && level <= 1.0, s"quantile level out of range: $level")

  override def inputTypes = Seq(LongType, LongType)
  // Float32 like the reference (getFloat): zero total weight is NaN
  override def dataType: DataType = FloatType
  override def nullable: Boolean = true
  override def children: Seq[Expression] = valueExpr :: weightExpr :: Nil
  override def prettyName: String = "quantile_timing_weighted"

  override def createAggregationBuffer(): java.util.HashMap[Long, Long] =
    new java.util.HashMap[Long, Long]()

  override def update(buf: java.util.HashMap[Long, Long], input: InternalRow): java.util.HashMap[Long, Long] = {
    val v = valueExpr.eval(input)
    val w = weightExpr.eval(input)
    // zero-weight slots never materialize: the reference histogram's
    // iterator visits nonzero counters only (corpus 00275)
    if (v != null && w != null && w.asInstanceOf[Long] != 0L)
      QuantileTiming.insert(buf, v.asInstanceOf[Long], w.asInstanceOf[Long])
    buf
  }

  override def merge(a: java.util.HashMap[Long, Long], b: java.util.HashMap[Long, Long]): java.util.HashMap[Long, Long] = {
    val it = b.entrySet().iterator()
    while (it.hasNext) { val e = it.next(); a.merge(e.getKey, e.getValue, (x, y) => x + y) }
    a
  }

  override def eval(buf: java.util.HashMap[Long, Long]): Any = {
    var total = 0L
    buf.values().forEach(c => total += c)
    if (total == 0L) return Float.NaN
    QuantileTiming.evalLevel(buf, level, weighted = true) match {
      case l: Long => l.toFloat
      case _ => Float.NaN
    }
  }

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

  override def withNewMutableAggBufferOffset(offset: Int): QuantileTimingWeighted =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): QuantileTimingWeighted =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): QuantileTimingWeighted =
    copy(valueExpr = newChildren(0), weightExpr = newChildren(1))
}

/** Plural `quantilesTimingWeighted(l1,…)(ms, w)` — one weighted
  * timing histogram, each level read from it at eval. */
case class QuantilesTimingWeighted(
    valueExpr: Expression,
    weightExpr: Expression,
    levels: Seq[Double],
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.HashMap[Long, Long]]
    with ImplicitCastInputTypes {

  override def inputTypes = Seq(LongType, LongType)
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(FloatType, containsNull = true)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = valueExpr :: weightExpr :: Nil
  override def prettyName: String = "quantiles_timing_weighted"

  override def createAggregationBuffer(): java.util.HashMap[Long, Long] =
    new java.util.HashMap[Long, Long]()

  override def update(buf: java.util.HashMap[Long, Long], input: InternalRow): java.util.HashMap[Long, Long] = {
    val v = valueExpr.eval(input)
    val w = weightExpr.eval(input)
    if (v != null && w != null && w.asInstanceOf[Long] != 0L)
      QuantileTiming.insert(buf, v.asInstanceOf[Long], w.asInstanceOf[Long])
    buf
  }

  override def merge(a: java.util.HashMap[Long, Long], b: java.util.HashMap[Long, Long]): java.util.HashMap[Long, Long] = {
    val it = b.entrySet().iterator()
    while (it.hasNext) { val e = it.next(); a.merge(e.getKey, e.getValue, (x, y) => x + y) }
    a
  }

  override def eval(buf: java.util.HashMap[Long, Long]): Any = {
    var total = 0L
    buf.values().forEach(c => total += c)
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      levels.map(l =>
        if (total == 0L) Float.NaN
        else QuantileTiming.evalLevel(buf, l, weighted = true) match {
          case v: Long => v.toFloat
          case _ => Float.NaN
        }).toArray[Any])
  }

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

  override def withNewMutableAggBufferOffset(offset: Int): QuantilesTimingWeighted =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): QuantilesTimingWeighted =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): QuantilesTimingWeighted =
    copy(valueExpr = newChildren(0), weightExpr = newChildren(1))
}

/** `quantileDeterministic(level)(x, determinator)` — sampling
  * quantile whose sample membership is a deterministic function of
  * the determinator column, not an RNG (reference:
  * dbms/src/AggregateFunctions/AggregateFunctionsQuantileDeterministic.cpp:88;
  * ReservoirSamplerDeterministic.h). A row is kept while the low
  * `skip_degree` bits of hash32(determinator) are zero; when the
  * 8192-slot reservoir fills, skip_degree increments and the sample
  * thins to the rows still passing — so re-running the query yields
  * the same answer, the reference's whole point. Result: linear
  * interpolation at level×(n−1) over the sorted sample (equals the
  * exact continuous quantile whenever the group fits the reservoir).
  */
case class QuantileDeterministic(
    valueExpr: Expression,
    detExpr: Expression,
    level: Double,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[QuantileDeterministic.Reservoir]
    with ImplicitCastInputTypes {
  import QuantileDeterministic._

  require(level >= 0.0 && level <= 1.0, s"quantile level out of range: $level")

  override def inputTypes = Seq(DoubleType, LongType)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def children: Seq[Expression] = valueExpr :: detExpr :: Nil
  override def prettyName: String = "quantile_deterministic"

  override def createAggregationBuffer(): Reservoir = new Reservoir

  override def update(buf: Reservoir, input: InternalRow): Reservoir = {
    val v = valueExpr.eval(input)
    val d = detExpr.eval(input)
    if (v != null && d != null)
      buf.insert(v.asInstanceOf[Double], d.asInstanceOf[Long])
    buf
  }

  override def merge(a: Reservoir, b: Reservoir): Reservoir = { a.mergeFrom(b); a }

  override def eval(buf: Reservoir): Any = buf.quantileInterpolated(level)

  override def serialize(buf: Reservoir): Array[Byte] = buf.toBytes
  override def deserialize(bytes: Array[Byte]): Reservoir = Reservoir.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(offset: Int): QuantileDeterministic =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): QuantileDeterministic =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): QuantileDeterministic =
    copy(valueExpr = newChildren(0), detExpr = newChildren(1))
}

/** `quantilesDeterministic(l1,…)(x, det)` — plural form over ONE
  * deterministic reservoir, each level interpolated from the same
  * sample at eval (the reference reads one state N times too). */
case class QuantilesDeterministic(
    valueExpr: Expression,
    detExpr: Expression,
    levels: Seq[Double],
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[QuantileDeterministic.Reservoir]
    with ImplicitCastInputTypes {
  import QuantileDeterministic._

  override def inputTypes = Seq(DoubleType, LongType)
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(DoubleType, containsNull = true)
  override def nullable: Boolean = false
  override def children: Seq[Expression] = valueExpr :: detExpr :: Nil
  override def prettyName: String = "quantiles_deterministic"

  override def createAggregationBuffer(): Reservoir = new Reservoir

  override def update(buf: Reservoir, input: InternalRow): Reservoir = {
    val v = valueExpr.eval(input)
    val d = detExpr.eval(input)
    if (v != null && d != null)
      buf.insert(v.asInstanceOf[Double], d.asInstanceOf[Long])
    buf
  }

  override def merge(a: Reservoir, b: Reservoir): Reservoir = { a.mergeFrom(b); a }

  override def eval(buf: Reservoir): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      levels.map(l => buf.quantileInterpolated(l)).toArray[Any])

  override def serialize(buf: Reservoir): Array[Byte] = buf.toBytes
  override def deserialize(bytes: Array[Byte]): Reservoir = Reservoir.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(offset: Int): QuantilesDeterministic =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): QuantilesDeterministic =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): QuantilesDeterministic =
    copy(valueExpr = newChildren(0), detExpr = newChildren(1))
}

object QuantileDeterministic {
  final val SampleCount = 8192

  /** Murmur3 finalizer WITHOUT the SQL-facing salt — the sampler's
    * internal hash (Common/HashTable/Hash.h:13; FunctionsHashing's
    * intHash64 adds a salt on top, the sampler does not). */
  @inline private def rawIntHash64(x0: Long): Long = {
    var x = x0
    x ^= x >>> 33
    x *= 0xff51afd7ed558ccdL
    x ^= x >>> 33
    x *= 0xc4ceb9fe1a85ec53L
    x ^= x >>> 33
    x
  }

  final class Reservoir {
    // parallel arrays of (value, hash32); order is irrelevant — the
    // sample sorts by value at eval
    private[QuantileDeterministic] var values = new ArrayBuffer[Double](64)
    private[QuantileDeterministic] var hashes = new ArrayBuffer[Int](64)
    private[QuantileDeterministic] var skipDegree: Int = 0

    @inline private def good(h: Int): Boolean =
      if (skipDegree >= 32) h == 0 // JVM << is mod-32; degree 32 = all bits
      else (h & ((1 << skipDegree) - 1)) == 0

    def insert(v: Double, determinator: Long): Unit = {
      val h = rawIntHash64(determinator).toInt
      if (good(h)) insertImpl(v, h)
    }

    private def insertImpl(v: Double, h: Int): Unit = {
      while (values.length + 1 >= SampleCount) {
        skipDegree += 1
        thinOut()
      }
      values += v
      hashes += h
    }

    private def thinOut(): Unit = {
      val nv = new ArrayBuffer[Double](values.length / 2 + 1)
      val nh = new ArrayBuffer[Int](values.length / 2 + 1)
      var i = 0
      while (i < values.length) {
        if (good(hashes(i))) { nv += values(i); nh += hashes(i) }
        i += 1
      }
      values = nv
      hashes = nh
    }

    def mergeFrom(b: Reservoir): Unit = {
      // merging into a fresh state adopts the partial VERBATIM: the
      // reference runs single-threaded with ONE state and no merge
      // at all, so the degenerate single-partial final merge must be
      // the identity — the `good()` filter below would drop the
      // insertImpl straggler (the element that triggers a skip-degree
      // bump is appended without re-checking, see insertImpl) that
      // the reference's sample legitimately contains (corpus 00273)
      if (values.isEmpty && skipDegree == 0) {
        skipDegree = b.skipDegree
        values = b.values.clone()
        hashes = b.hashes.clone()
        return
      }
      if (b.skipDegree > skipDegree) {
        skipDegree = b.skipDegree
        thinOut()
      }
      var i = 0
      while (i < b.values.length) {
        if (good(b.hashes(i))) insertImpl(b.values(i), b.hashes(i))
        i += 1
      }
    }

    def quantileInterpolated(level: Double): Any = {
      val n = values.length
      if (n == 0) return null
      val sorted = values.toArray
      java.util.Arrays.sort(sorted)
      val index = math.max(0.0, math.min(n - 1.0, level * (n - 1)))
      val left = index.toInt
      if (left + 1 == n) sorted(left)
      else sorted(left) * (left + 1 - index) + sorted(left + 1) * (index - left)
    }

    def toBytes: Array[Byte] = {
      val bb = ByteBuffer.allocate(8 + 12 * values.length)
      bb.putInt(skipDegree)
      bb.putInt(values.length)
      var i = 0
      while (i < values.length) { bb.putDouble(values(i)); bb.putInt(hashes(i)); i += 1 }
      bb.array()
    }
  }

  object Reservoir {
    def fromBytes(bytes: Array[Byte]): Reservoir = {
      val bb = ByteBuffer.wrap(bytes)
      val r = new Reservoir
      r.skipDegree = bb.getInt
      val sz = bb.getInt
      var i = 0
      while (i < sz) { r.values += bb.getDouble; r.hashes += bb.getInt; i += 1 }
      r
    }
  }
}
