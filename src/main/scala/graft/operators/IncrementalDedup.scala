package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental exact dedup — drop an incoming batch's rows whose
  * digest already exists in the corpus at rest. The ingestion-time
  * counterpart of self-dedup (q42); q111 runs it end-to-end.
  *
  * The shape is dictated by the asymmetry at 100 TB: the HISTORY is
  * huge (billions of digests — NOT broadcastable, NOT shuffleable per
  * batch), the BATCH is comparatively small, and true duplicates are
  * rare. So:
  *
  *   1. history → Bloom filter: ONE narrow scan of the digest column
  *      (no distinct, no shuffle — Bloom insertion is idempotent);
  *      built once per ingestion cycle and amortized across batches.
  *   2. batch → Bloom prefilter: a codegen'd boolean per row; the
  *      ~100% clean rows pass with NO join and NO shuffle.
  *   3. the tiny candidate set (true dups + fpp) BROADCASTS into a
  *      semi-join against history — history is scanned, never
  *      shuffled, never broadcast — producing the exact hit set;
  *   4. candidates anti-join the (tiny, broadcast) hit set, removing
  *      Bloom false positives. Output is exact.
  *
  * Reference analog: ReplacingMergeTree folds duplicates at MERGE
  * time (dbms/src/DataStreams/ReplacingSortedBlockInputStream.cpp) —
  * correct for one table's keyspace, but it re-sorts the history;
  * this operator decides at INSERT time against an immutable history.
  */
object IncrementalDedup {

  /** @param batch    incoming rows (any schema with `digestCol`)
    * @param history  corpus at rest (only `digestCol` is read)
    * @param expectedHistory  Bloom sizing; pass the known history row
    *        count to skip the count job, or -1 to count
    */
  def apply(batch: DataFrame, history: DataFrame, digestCol: String,
      fpp: Double = 0.01, expectedHistory: Long = -1L): DataFrame = {
    val s = batch.sparkSession
    graft.GraftFunctions.register(s)
    val histDigests = history.select(col(digestCol))
      .where(col(digestCol).isNotNull)
    // empty history — or one whose digests are all null — holds
    // nothing to be a duplicate OF. Spark's bloomFilter NPEs on zero
    // input rows, so detect the case explicitly; catching the NPE
    // instead would silently disable dedup on ANY unexpected
    // Bloom-build failure. When the caller did not pass a size, the
    // count() job doubles as the emptiness check (the old code ran a
    // limit(1) job AND a count() job — one redundant scheduling floor
    // per invocation); the limit(1) short-circuit scan runs only on
    // the trusted-size path, where no count happens.
    if (expectedHistory == 0) return batch
    val n = if (expectedHistory > 0) {
      if (histDigests.limit(1).isEmpty) return batch
      expectedHistory
    } else histDigests.count()
    if (n == 0) return batch
    val bloom = histDigests
      .selectExpr(s"siphash64(CAST($digestCol AS BINARY)) AS h")
      .stat.bloomFilter("h", math.max(n, 64L), fpp)
    val bos = new java.io.ByteArrayOutputStream()
    bloom.writeTo(bos)
    // a billion-digest history means an MB-to-GB-class filter: ship it
    // as a broadcast (once per executor), never as a plan literal
    val bc = s.sparkContext.broadcast(bos.toByteArray)
    val mightDup = org.apache.spark.sql.graftbridge.Bridge.column(
      graft.functions.BloomContainsAnyBcExpr(
        org.apache.spark.sql.graftbridge.Bridge.expression(
          expr(s"array(siphash64(CAST($digestCol AS BINARY)))")), bc))
    val cand = batch.where(mightDup)
    // exact verification: candidates broadcast INTO the history scan;
    // the hit set that comes back is at most the candidate set
    val hits = histDigests
      .join(broadcast(cand.select(col(digestCol)).distinct()),
        Seq(digestCol), "left_semi")
      .distinct()
    batch.where(!mightDup)
      .unionByName(cand.join(broadcast(hits), Seq(digestCol), "left_anti"))
  }
}
