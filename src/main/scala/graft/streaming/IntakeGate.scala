package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming corpus-intake gates — the continuous counterparts of the
  * batch quality/decontamination queries (q103/q104), composable
  * after [[StreamDedup]] into one intake pipeline:
  *
  *   raw stream → exact dedup (watermark-bounded state)
  *             → repetition quality gate   (stateless, narrow)
  *             → decontamination prefilter (stateless, narrow)
  *             → sink
  *
  * Both gates here are STATELESS — a codegen'd kernel call plus a
  * filter per document — so they add no state store, no shuffle, and
  * no watermark requirement of their own; at 100 TB/day of intake
  * they scale exactly like the batch projections they mirror.
  *
  * Decontamination note: the streaming gate is Bloom-ONLY (drops the
  * filter's ~fpp false positives along with true hits) because an
  * exact verification join against the benchmark would make the
  * operator stateful for no gain at intake time — the authoritative
  * exact pass is the batch q104 over the corpus at rest. fpp is the
  * caller's Bloom build parameter; 1% costs 1% clean-doc loss at the
  * gate, tune down as needed.
  *
  * Reference analog: none (the reference's streaming surface is
  * Buffer/MV fold-at-merge); part of the training-pipeline layer.
  */
object IntakeGate {

  /** Drop documents whose repetition signals exceed the thresholds
    * (Rae et al. 2021 table A1 shape: fraction of characters in
    * duplicated tokens, fraction covered by the top bigram) or that
    * are shorter than `minTokens`. Fractions compare as
    * numerator ≤ frac·denominator in exact integers — no float
    * boundary drift between engines. */
  def qualityGate(docs: DataFrame, textCol: String,
      minTokens: Long = 8L,
      maxDupTokenFrac: Double = 0.6,
      maxTop2Frac: Double = 0.3): DataFrame = {
    graft.GraftFunctions.register(docs.sparkSession)
    val dupBp = math.round(maxDupTokenFrac * 10000)
    val topBp = math.round(maxTop2Frac * 10000)
    docs
      .withColumn("__r", expr(s"repetition_stats($textCol)"))
      .where(col("__r").getItem(0) >= minTokens &&
        col("__r").getItem(2) * lit(10000L) <= col("__r").getItem(3) * lit(dupBp) &&
        col("__r").getItem(4) * lit(10000L) <= col("__r").getItem(3) * lit(topBp))
      .drop("__r")
  }

  /** Drop documents sharing (by Bloom evidence) any word n-gram with
    * the benchmark filter — `bloomBytes` is a serialized
    * [[org.apache.spark.util.sketch.BloomFilter]] over SipHash64
    * shingle hashes (build it with [[benchmarkBloom]]). */
  def decontaminate(docs: DataFrame, textCol: String,
      bloomBytes: Array[Byte], n: Int = 8): DataFrame = {
    graft.GraftFunctions.register(docs.sparkSession)
    // broadcast, not a plan literal — the filter bytes ship once per
    // executor and the streaming plan carries only the handle
    val bc = docs.sparkSession.sparkContext.broadcast(bloomBytes)
    docs.where(!org.apache.spark.sql.graftbridge.Bridge.column(
      graft.functions.BloomContainsAnyBcExpr(
        org.apache.spark.sql.graftbridge.Bridge.expression(
          expr(s"token_ngram_hashes($textCol, $n)")), bc)))
  }

  /** Build the benchmark Bloom filter from a STATIC benchmark table —
    * run once at pipeline start, ship the bytes into the stream. */
  def benchmarkBloom(bench: DataFrame, textCol: String,
      n: Int = 8, fpp: Double = 0.01): Array[Byte] = {
    graft.GraftFunctions.register(bench.sparkSession)
    val grams = bench
      .select(explode(expr(s"token_ngram_hashes($textCol, $n)")).as("g"))
      .distinct()
    val count = grams.count()
    val bloom = grams.stat.bloomFilter("g", math.max(count, 64L), fpp)
    val bos = new java.io.ByteArrayOutputStream()
    bloom.writeTo(bos)
    bos.toByteArray
  }

  /** The full intake pipeline: watermark-bounded exact dedup, then
    * the two stateless gates. */
  def intake(docs: DataFrame, textCol: String, tsCol: String,
      dedupDelay: String, bloomBytes: Array[Byte], n: Int = 8,
      minTokens: Long = 8L, maxDupTokenFrac: Double = 0.6,
      maxTop2Frac: Double = 0.3): DataFrame =
    decontaminate(
      qualityGate(
        StreamDedup.byContent(docs, textCol, tsCol, dedupDelay),
        textCol, minTokens, maxDupTokenFrac, maxTop2Frac),
      textCol, bloomBytes, n)
}
