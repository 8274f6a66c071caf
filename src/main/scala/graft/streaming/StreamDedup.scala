package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming exact deduplication — the continuous-ingestion
  * counterpart of the batch content-digest dedup (q42): documents
  * arriving on a stream are deduplicated by content digest with
  * watermark-BOUNDED state, so the state store holds only the digests
  * seen inside the dedup window instead of growing without bound.
  *
  * Semantics: the first document with a given digest passes; any
  * duplicate whose event time lands within `window` of the original
  * is dropped. Once the watermark passes original_ts + window the
  * digest's state is evicted — a much-later re-occurrence passes
  * again and is folded by the downstream BATCH dedup. This bounded
  * re-admission is the price of bounded state; the reference has no
  * streaming dedup at all (Buffer + ReplacingMergeTree folds only at
  * merge time, dbms/src/Storages/StorageBuffer.cpp).
  *
  * Scale shape: `dropDuplicatesWithinWatermark` keys the state store
  * by digest — one shuffle on the digest, state O(#distinct digests
  * in window) per partition (RocksDB-backed on a cluster), late rows
  * beyond the watermark dropped by the watermark operator itself.
  */
object StreamDedup {

  /** Dedup a STREAMING DataFrame by the md5 digest of `textCol`.
    * `tsCol` must be the event-time column; `delay` is the watermark
    * delay ("10 seconds") and also bounds how out-of-order a
    * duplicate can arrive and still be caught. */
  def byContent(docs: DataFrame, textCol: String, tsCol: String,
      delay: String): DataFrame =
    docs
      .withColumn("__digest", md5(col(textCol).cast("binary")))
      .withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark("__digest")
      .drop("__digest")

  /** Dedup by explicit key columns (e.g. a precomputed fingerprint
    * or (source, url)) instead of hashing the text. */
  def byKeys(docs: DataFrame, tsCol: String, delay: String,
      keyCols: String*): DataFrame = {
    require(keyCols.nonEmpty, "at least one key column")
    docs.withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark(keyCols.head, keyCols.tail: _*)
  }
}
