package graft.functions

import scala.collection.mutable.ArrayBuffer

/** Merging t-digest (Dunning's algorithm, from the published paper
  * "Computing Extremely Accurate Quantiles Using t-Digests"; the
  * reference ships it as quantileTDigest,
  * dbms/src/AggregateFunctions/QuantileTDigest.h). Centroids carry
  * (mean, weight); compression bounds centroid weight by the scale
  * function 4·N·q(1−q)/δ, so tail quantiles stay tight while the
  * state is O(δ) — mergeable partial aggregation at any scale.
  */
final class TDigest(val delta: Int = 100) extends Serializable {
  // merged centroids, ascending by mean
  var means: ArrayBuffer[Double] = ArrayBuffer.empty
  var weights: ArrayBuffer[Long] = ArrayBuffer.empty
  // unmerged buffer; compressed when it reaches bufferCap
  private val bufferCap = 5 * delta
  private var bufMeans: ArrayBuffer[Double] = ArrayBuffer.empty
  private var bufWeights: ArrayBuffer[Long] = ArrayBuffer.empty

  def add(x: Double, w: Long = 1L): Unit = {
    bufMeans += x; bufWeights += w
    if (bufMeans.length >= bufferCap) compress()
  }

  def merge(other: TDigest): Unit = {
    other.compress()
    var i = 0
    while (i < other.means.length) {
      bufMeans += other.means(i); bufWeights += other.weights(i)
      if (bufMeans.length >= bufferCap) compress()
      i += 1
    }
  }

  def compress(): Unit = {
    if (bufMeans.isEmpty) return
    val n = means.length + bufMeans.length
    val ms = new Array[Double](n)
    val ws = new Array[Long](n)
    means.copyToArray(ms); bufMeans.copyToArray(ms, means.length)
    weights.copyToArray(ws); bufWeights.copyToArray(ws, weights.length)
    val order = ms.indices.sortBy(ms(_))
    val total = ws.sum.toDouble

    val outM = ArrayBuffer.empty[Double]
    val outW = ArrayBuffer.empty[Long]
    var curM = ms(order.head)
    var curW = ws(order.head)
    var seen = 0L
    order.tail.foreach { idx =>
      val q = (seen + curW / 2.0) / total
      val limit = math.max(1.0, 4.0 * total * q * (1.0 - q) / delta)
      if (curW + ws(idx) <= limit) {
        // weighted-mean fold into the current centroid
        val w2 = ws(idx)
        curM = (curM * curW + ms(idx) * w2) / (curW + w2)
        curW += w2
      } else {
        outM += curM; outW += curW; seen += curW
        curM = ms(idx); curW = ws(idx)
      }
    }
    outM += curM; outW += curW
    means = outM; weights = outW
    bufMeans = ArrayBuffer.empty; bufWeights = ArrayBuffer.empty
  }

  /** Quantile by linear interpolation between centroid means. */
  def quantile(level: Double): Double = {
    compress()
    if (means.isEmpty) return Double.NaN
    if (means.length == 1) return means.head
    val total = weights.sum.toDouble
    val target = level * total
    var cum = 0.0
    var i = 0
    while (i < means.length) {
      val half = weights(i) / 2.0
      if (cum + half >= target) {
        if (i == 0) return means.head
        val prevHalf = weights(i - 1) / 2.0
        val lo = cum - prevHalf
        val hi = cum + half
        val t = if (hi == lo) 0.0 else (target - lo) / (hi - lo)
        return means(i - 1) + t * (means(i) - means(i - 1))
      }
      cum += weights(i)
      i += 1
    }
    means.last
  }

  def serialize(): Array[Byte] = {
    compress()
    val bb = java.nio.ByteBuffer.allocate(8 + 16 * means.length)
    bb.putInt(delta); bb.putInt(means.length)
    var i = 0
    while (i < means.length) { bb.putDouble(means(i)); bb.putLong(weights(i)); i += 1 }
    bb.array()
  }
}

object TDigest {
  def deserialize(bytes: Array[Byte]): TDigest = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val d = new TDigest(bb.getInt)
    val n = bb.getInt
    var i = 0
    while (i < n) { d.means += bb.getDouble; d.weights += bb.getLong; i += 1 }
    d
  }
}
