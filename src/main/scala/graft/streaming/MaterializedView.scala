package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Insert-triggered materialized views and the Buffer table analog
  * (SURVEY.md §2.10).
  *
  * The reference's MV is a pipeline attached to INSERT: each inserted
  * block flows through the view's SELECT into a target table
  * (StorageMaterializedView.cpp; PushingToViewsBlockOutputStream.h,
  * wired in InterpreterInsertQuery.cpp:93-106). `StorageBuffer`
  * micro-batches inserts on row/time thresholds (StorageBuffer.cpp).
  *
  * Structured Streaming is the superset: a streaming source plays the
  * INSERT stream, `foreachBatch` is the per-block push, and the
  * trigger interval is the Buffer flush threshold. The aggregating MV
  * below keeps a *mergeable-state* target (the AggregatingMergeTree
  * idea): each batch partial-aggregates, then merges with the target
  * by re-aggregation — so the target stays one row per key no matter
  * how many inserts arrived, and the merge is a partial/final
  * aggregate at any cluster size.
  */
object MaterializedView {

  /** Start a summing MV: `source` (streaming) → groupBy(keys) sum
    * of `sumCols` → merged into the session-scoped target view
    * `targetView`. The target is re-registered after every batch, so
    * readers always see the latest folded state.
    */
  def startSumming(
      spark: SparkSession,
      source: DataFrame,
      keys: Seq[String],
      sumCols: Seq[String],
      targetView: String,
      trigger: Trigger = Trigger.ProcessingTime("1 second")): StreamingQuery = {
    require(source.isStreaming, "source must be a streaming DataFrame")
    source.writeStream
      .outputMode("update")
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val partial = batch.groupBy(keys.map(col): _*)
          .agg(sumCols.map(c => sum(col(c)).as(c)).head,
            sumCols.map(c => sum(col(c)).as(c)).tail: _*)
        val merged =
          if (spark.catalog.tableExists(targetView)) {
            spark.table(targetView).unionByName(partial)
              .groupBy(keys.map(col): _*)
              .agg(sumCols.map(c => sum(col(c)).as(c)).head,
                sumCols.map(c => sum(col(c)).as(c)).tail: _*)
          } else partial
        // materialize before replacing the view the plan reads from
        val rows = merged.collect()
        val snapshot = spark.createDataFrame(
          spark.sparkContext.parallelize(rows.toIndexedSeq), merged.schema)
        snapshot.createOrReplaceTempView(targetView)
        ()
      }
      .start()
  }

  /** Event-time tumbling-window aggregation with a watermark — the
    * capability superset over the reference's timeSlot bucketing
    * (SURVEY.md §2.10: the reference has no event time, no late-data
    * handling; Structured Streaming supplies both). Returns the
    * windowed count/sum frame ready for `writeStream`.
    */
  def eventTimeWindow(
      source: DataFrame,
      tsCol: String,
      window_ : String,
      watermark: String,
      valueCol: String): DataFrame = {
    require(source.isStreaming, "source must be a streaming DataFrame")
    source
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), window_))
      .agg(count(lit(1)).as("n"), sum(col(valueCol)).as("total"))
      .select(col("window.start").as("win_start"), col("n"), col("total"))
  }

  /** Buffer analog: forward micro-batches into an append-only parquet
    * target on a processing-time threshold (StorageBuffer flush). */
  def startBuffer(
      source: DataFrame,
      targetPath: String,
      checkpoint: String,
      trigger: Trigger = Trigger.ProcessingTime("1 second")): StreamingQuery =
    source.writeStream
      .outputMode("append")
      .trigger(trigger)
      .option("checkpointLocation", checkpoint)
      .format("parquet")
      .option("path", targetPath)
      .start()
}
