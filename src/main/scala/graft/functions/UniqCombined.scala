package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Bit-exact port of the reference's uniqCombined estimator
  * (AggregateFunctionUniq.h BaseUniqCombinedData →
  * Common/CombinedCardinalityEstimator.h):
  *
  *  - numerics key as UInt32(intHash64(value)) (floats via bit
  *    pattern), strings as the full CityHash64
  *    (AggregateFunctionUniqCombinedTraits);
  *  - three phases: exact small set (≤16 keys) → exact hash set
  *    (≤2^14 keys) → HyperLogLog with 2^17 buckets over the KEY
  *    ITSELF (TrivialHash — the key is already a hash);
  *  - the estimate applies the HyperLogLog++ bias interpolation
  *    ([[UniqCombinedBias]]) and LinearCounting below the 177700
  *    threshold (HyperLogLogCounter.h FullFeatured with
  *    HyperLogLogBiasEstimator<UniqCombinedBiasData>).
  *
  * Distributed shape: ≤128 KB state per group, partial/final merge.
  */
final class CombinedState(val hvBits: Int) {
  import CombinedState._

  /** SMALL/MEDIUM: exact key set; LARGE: null set + registers. */
  var set: java.util.HashSet[Long] = new java.util.HashSet[Long]()
  var registers: Array[Byte] = null

  def maxRank: Int = hvBits - Precision + 1

  private def toLarge(): Unit = {
    registers = new Array[Byte](M)
    val it = set.iterator()
    while (it.hasNext) insertLarge(it.next())
    set = null
  }

  private def insertLarge(key: Long): Unit = {
    val bucket = (key & (M - 1)).toInt
    val tail = key >>> Precision // hvBits - 17 significant bits
    val rank =
      if (tail == 0) maxRank
      else math.min(java.lang.Long.numberOfTrailingZeros(tail) + 1, maxRank)
    if (rank > (registers(bucket) & 0xff)) registers(bucket) = rank.toByte
  }

  def insertKey(key: Long): Unit =
    if (registers == null) {
      // the reference's medium phase converts on ANY insert at
      // capacity (CombinedCardinalityEstimator::insert checks size
      // before membership)
      if (set.size() < MediumMax) set.add(key)
      else { toLarge(); insertLarge(key) }
    } else insertLarge(key)

  def merge(other: CombinedState): Unit =
    if (other.registers == null) {
      val it = other.set.iterator()
      while (it.hasNext) insertKey(it.next())
    } else {
      if (registers == null) toLarge()
      var b = 0
      while (b < M) {
        if ((other.registers(b) & 0xff) > (registers(b) & 0xff))
          registers(b) = other.registers(b)
        b += 1
      }
    }

  def estimate(): Long =
    if (registers == null) set.size().toLong
    else {
      val counts = new Array[Int](maxRank + 1)
      var b = 0
      while (b < M) { counts(registers(b) & 0xff) += 1; b += 1 }
      val zeros = counts(0)
      var v: Double = counts(maxRank).toDouble
      var i = maxRank - 1
      while (i >= 0) { v = v / 2.0 + counts(i); i -= 1 }
      val m = M.toDouble
      val alpha = 0.7213 / (1 + 1.079 / m)
      val raw = alpha * m * m / v
      val pow2_32 = 4294967296.0
      val fixed =
        if (hvBits == 32 && raw > pow2_32 / 30.0)
          -pow2_32 * math.log(1.0 - raw / pow2_32)
        else {
          var f = if (raw <= 5 * m) raw - getBias(raw) else raw
          val linear =
            if (zeros != 0) m * (math.log(m) - math.log(zeros.toDouble))
            else f
          if (linear < UniqCombinedBias.threshold) f = linear
          f
        }
      ((fixed + 0.5).toLong) & 0xffffffffL
    }
}

object CombinedState {
  val Precision = 17
  val M = 1 << Precision // 131072 buckets
  val MediumMax = 1 << 14

  /** HyperLogLogBiasEstimator::getBias — lower_bound + linear
    * interpolation over the ported tables. */
  def getBias(rawEstimate: Double): Double = {
    val est = UniqCombinedBias.rawEstimates
    val bias = UniqCombinedBias.biases
    // lower_bound: first index with est(i) >= rawEstimate
    var lo = 0; var hi = est.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (est(mid) < rawEstimate) lo = mid + 1 else hi = mid
    }
    if (lo == est.length) bias(est.length - 1)
    else if (est(lo) == rawEstimate) bias(lo)
    else if (lo == 0) bias(0)
    else {
      val slope = (bias(lo) - bias(lo - 1)) / (est(lo) - est(lo - 1))
      bias(lo - 1) + slope * (rawEstimate - est(lo - 1))
    }
  }
}

case class UniqCombined(
    child: Expression,
    variadic: Boolean = false,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[CombinedState] {

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = child :: Nil
  override def prettyName: String = "uniq_combined"

  private lazy val stringKeyed = child.dataType match {
    case StringType | BinaryType => true
    case _ => false
  }

  private lazy val isTimestamp = child.dataType match {
    case _: TimestampType | TimestampNTZType => true
    case _ => false
  }

  override def createAggregationBuffer(): CombinedState =
    new CombinedState(if (variadic || stringKeyed) 64 else 32)

  private def keyOf(v: Any): Long = v match {
    case s: UTF8String => HashFns.cityHash64(s.getBytes)
    case a: Array[Byte] => HashFns.cityHash64(a)
    case other =>
      val x = other match {
        case l: Long => l
        case i: Int => i.toLong
        case s: Short => s.toLong
        case b: Byte => b.toLong
        case b: Boolean => if (b) 1L else 0L
        case f: Float =>
          java.lang.Float.floatToRawIntBits(f).toLong & 0xffffffffL
        case d: Double => java.lang.Double.doubleToRawLongBits(d)
        case o => HashFns.cityHash64(
          UTF8String.fromString(o.toString).getBytes)
      }
      HashFns.rawIntHash64(x) & 0xffffffffL
  }

  override def update(buf: CombinedState, input: InternalRow): CombinedState = {
    val v = child.eval(input)
    if (v != null) {
      val key =
        if (variadic) v.asInstanceOf[Long] // the child IS the 64-bit key
        else if (isTimestamp)
          HashFns.rawIntHash64(Math.floorDiv(v.asInstanceOf[Long], 1000000L)) & 0xffffffffL
        else keyOf(v)
      buf.insertKey(key)
    }
    buf
  }

  override def merge(a: CombinedState, b: CombinedState): CombinedState = {
    a.merge(b); a
  }

  override def eval(buf: CombinedState): Any = buf.estimate()

  override def serialize(buf: CombinedState): Array[Byte] =
    if (buf.registers == null) {
      val bb = ByteBuffer.allocate(2 + 4 + 8 * buf.set.size())
      bb.put(0.toByte).put(buf.hvBits.toByte).putInt(buf.set.size())
      val it = buf.set.iterator()
      while (it.hasNext) bb.putLong(it.next())
      bb.array()
    } else {
      val bb = ByteBuffer.allocate(2 + CombinedState.M)
      bb.put(1.toByte).put(buf.hvBits.toByte).put(buf.registers)
      bb.array()
    }

  override def deserialize(bytes: Array[Byte]): CombinedState = {
    val bb = ByteBuffer.wrap(bytes)
    val tag = bb.get()
    val s = new CombinedState(bb.get().toInt)
    if (tag == 0) {
      val n = bb.getInt
      var i = 0
      while (i < n) { s.set.add(bb.getLong); i += 1 }
    } else {
      s.set = null
      s.registers = new Array[Byte](CombinedState.M)
      bb.get(s.registers)
    }
    s
  }

  override def withNewMutableAggBufferOffset(offset: Int): UniqCombined =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): UniqCombined =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): UniqCombined =
    copy(child = newChildren.head)
}
