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
    val n = if (expectedHistory >= 0) expectedHistory else histDigests.count()
    // empty history: nothing can be a duplicate. Spark's bloomFilter
    // NPEs on zero rows, so that case (counted OR a wrong
    // expectedHistory over an actually-empty table) returns early.
    if (n == 0) return batch
    val bloom =
      try histDigests
        .selectExpr(s"siphash64(CAST($digestCol AS BINARY)) AS h")
        .stat.bloomFilter("h", math.max(n, 64L), fpp)
      catch { case _: NullPointerException => return batch }
    val bos = new java.io.ByteArrayOutputStream()
    bloom.writeTo(bos)
    val hex = java.util.HexFormat.of().formatHex(bos.toByteArray)
    val mightDup = expr(
      s"bloom_contains_any(array(siphash64(CAST($digestCol AS BINARY))), unhex('$hex'))")
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
