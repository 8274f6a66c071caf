package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming NEAR-duplicate candidate detection — the q47 MinHash+LSH
  * banding pipeline re-expressed over a document stream: every
  * arriving doc computes its 16-permutation MinHash signature (the
  * codegen'd `minhash_sig` kernel, one call per doc), hashes it into
  * 4 LSH bands, and checks each band bucket's keyed state for prior
  * docs in the dedup window. Colliding docs emit (doc_id, dup_of)
  * candidate pairs downstream — flagging, not dropping, since LSH
  * candidates still need exact confirmation (ngram_jaccard) before a
  * doc is discarded.
  *
  * Scale shape: the band explode is a ×4 narrow projection; the ONE
  * shuffle keys on (band, band_hash) — the same single-shuffle shape
  * as the batch path. State per bucket is a BOUNDED id list: the
  * same ≤64-doc hot-bucket cap as q47 (boilerplate buckets flag the
  * first 64, then stop accumulating), evicted wholesale by
  * event-time timeout once the watermark passes the bucket's last
  * activity + the window. A doc pair colliding in several bands
  * emits the pair once per band; the consumer dedups exactly like
  * the batch `distinct()` — kept out of this operator so the output
  * stream stays append-only per bucket.
  */
object StreamNearDup {

  final case class BucketState(lastMs: Long, docs: List[Long])

  final case class Candidate(doc_id: Long, dup_of: Long,
      ts: java.sql.Timestamp, band: Int)

  private val maxBucket = 64

  /** `docs` must be a STREAMING DataFrame with (idCol: long,
    * tsCol: timestamp, textCol: string). Emits candidate pairs
    * (doc_id, dup_of, ts, band) where dup_of arrived earlier in the
    * same window. */
  def candidates(
      spark: SparkSession,
      docs: DataFrame,
      idCol: String, tsCol: String, textCol: String,
      watermarkDelay: String, windowMs: Long): Dataset[Candidate] = {
    import spark.implicits._
    graft.GraftFunctions.register(spark)
    val banded = docs
      .select(col(idCol).cast("long").as("__id"),
        col(tsCol).cast("timestamp").as("__ts"),
        expr(s"minhash_sig($textCol, 16, 5)").as("__sig"))
      .withWatermark("__ts", watermarkDelay)
      .select(col("__id"), col("__ts"), explode(expr(
        "transform(sequence(0, 3), b -> struct(b AS band, " +
          "xxhash64(element_at(__sig, 4*b+1), element_at(__sig, 4*b+2), " +
          "element_at(__sig, 4*b+3), element_at(__sig, 4*b+4)) AS bh))"))
        .as("bb"))
      .select(col("__id"), col("__ts"),
        col("bb.band").as("__band"), col("bb.bh").as("__bh"))

    banded
      .as[(Long, java.sql.Timestamp, Int, Long)]
      .groupByKey { case (_, _, band, bh) => (band, bh) }
      .flatMapGroupsWithState(
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(
        (key: (Int, Long),
            rows: Iterator[(Long, java.sql.Timestamp, Int, Long)],
            state: GroupState[BucketState]) => {
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val st = state.getOption.getOrElse(BucketState(0L, Nil))
            var docs = st.docs
            var lastMs = st.lastMs
            val out = Iterator.newBuilder[Candidate]
            // deterministic in-batch order: by event time then id
            rows.toSeq.sortBy(r => (r._2.getTime, r._1)).foreach {
              case (id, ts, band, _) =>
                // EVERY arrival is bucket activity — a re-seen doc id
                // must still push the eviction horizon, else a batch
                // of only already-seen ids computes a timeout at or
                // below the watermark (which Spark rejects, killing
                // the query)
                lastMs = math.max(lastMs, ts.getTime)
                if (!docs.contains(id)) {
                  docs.foreach(prior =>
                    out += Candidate(id, prior, ts, band))
                  if (docs.size < maxBucket) docs = id :: docs
                }
            }
            state.update(BucketState(lastMs, docs))
            // evict the whole bucket once the watermark passes its
            // last activity + window; clamped above the current
            // watermark — late-but-on-time rows can land with
            // lastMs + windowMs already behind it
            state.setTimeoutTimestamp(math.max(lastMs + windowMs,
              state.getCurrentWatermarkMs() + 1))
            out.result()
          }
        })
  }
}
