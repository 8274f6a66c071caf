package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.QueryDef
import graft.core.Tables

/** Training-corpus assembly operators — the steps between a cleaned
  * document table and a tokenized training run: sequence packing and
  * deterministic dataset splits. Beyond the reference (its analytics
  * stop at the query layer); first-class here because a 100 TB corpus
  * is assembled with exactly these shapes.
  */
object PipelineQueries {
  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables(s, dir, name)

  // ---------------------------------------------------------------
  // q101 sequence packing — concatenate-and-chop (the GPT-pretraining
  // shape): documents are laid out contiguously per shard in a
  // deterministic order; each doc gets its token START offset
  // (running sum) and the 2048-token training sequence it begins in.
  // A document straddling a boundary is split by the downstream
  // tokenizer — packing with no straddle (next-fit) is a recurrence,
  // not a window, and runs per shard via mapGroups when needed.
  //
  // Scale shape: ONE shuffle on the shard key, then a linear
  // per-shard window pass. Shards are independent, so 1000 executors
  // pack 1000 shards concurrently; the demo's 8 shards on doc_id%8
  // stand in for xxhash64(doc_id)%shards at production scale.
  // ---------------------------------------------------------------
  def q101(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("shard")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t(s, dir, "documents")
      .select(col("doc_id"),
        expr("size(split(text, ' '))").cast("long").as("n_tokens"))
      .withColumn("shard", pmod(col("doc_id"), lit(8)))
      .withColumn("token_start",
        sum(col("n_tokens")).over(w) - col("n_tokens"))
      .withColumn("seq", floor(col("token_start") / lit(2048)).cast("long"))
      .select(col("doc_id"), col("shard"), col("n_tokens"),
        col("token_start"), col("seq"))
      .orderBy(col("doc_id"))
  }

  private val q101Sql =
    """WITH d AS (SELECT doc_id,
      |    CAST(length(string_split(text, ' ')) AS BIGINT) AS n_tokens,
      |    doc_id % 8 AS shard
      |  FROM documents),
      |p AS (SELECT doc_id, shard, n_tokens,
      |    CAST(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
      |      ROWS UNBOUNDED PRECEDING) - n_tokens AS BIGINT) AS token_start
      |  FROM d)
      |SELECT doc_id, shard, n_tokens, token_start,
      |  CAST(floor(token_start / 2048) AS BIGINT) AS seq
      |FROM p ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------------
  // q102 deterministic train/val/test split — the assignment must be
  // a pure function of the document identity (stable across runs,
  // engines, and re-partitioning; joinable from any table), so it
  // hashes the doc_id's md5 into 256 buckets: <204 train (~80%),
  // <230 val (~10%), else test. Narrow projection, no shuffle, no
  // stored split table to drift.
  // ---------------------------------------------------------------
  def q102(s: SparkSession, dir: String): DataFrame = {
    // bucket = integer value of the md5's last two hex digits (0-255);
    // the oracle spells the same value with strpos arithmetic since
    // DuckDB has no base-conversion function
    val h = md5(col("doc_id").cast("string").cast("binary"))
    val bucket = conv(substring(h, 31, 2), 16, 10).cast("long")
    t(s, dir, "documents")
      .select(col("doc_id"), bucket.as("bucket"))
      .withColumn("split",
        when(col("bucket") < 204, "train")
          .when(col("bucket") < 230, "val")
          .otherwise("test"))
      .orderBy(col("doc_id"))
  }

  private val q102Sql =
    """WITH h AS (SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS hx FROM documents)
      |SELECT doc_id,
      |  CAST((strpos('0123456789abcdef', substr(hx, 31, 1)) - 1) * 16
      |     + (strpos('0123456789abcdef', substr(hx, 32, 1)) - 1) AS BIGINT) AS bucket,
      |  CASE WHEN (strpos('0123456789abcdef', substr(hx, 31, 1)) - 1) * 16
      |          + (strpos('0123456789abcdef', substr(hx, 32, 1)) - 1) < 204 THEN 'train'
      |       WHEN (strpos('0123456789abcdef', substr(hx, 31, 1)) - 1) * 16
      |          + (strpos('0123456789abcdef', substr(hx, 32, 1)) - 1) < 230 THEN 'val'
      |       ELSE 'test' END AS split
      |FROM h ORDER BY doc_id""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q101_sequence_packing", q101, Some(q101Sql)),
    QueryDef("q102_hash_split", q102, Some(q102Sql)))
}
