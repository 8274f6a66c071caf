package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Gap-based sessionization over an event stream — the custom-state
  * streaming operator (`KeyValueGroupedDataset.flatMapGroupsWithState`
  * with event-time timeouts), SURVEY.md §2.10.
  *
  * Semantics: per key, consecutive events closer than `gap` belong to
  * one session; a session CLOSES when the event-time watermark passes
  * its last event + gap (no more on-time events can extend it), and
  * closing emits exactly one row (key, session_start, session_end,
  * n_events, total_value). This is the per-user activity-window
  * primitive of a training-data pipeline (rate limiting, engagement
  * slicing) and of the reference's visit/session analytics.
  *
  * Scale shape: state is O(1) per ACTIVE key (start/last/count/sum —
  * no event buffer), keyed state lives in the state store (RocksDB at
  * cluster scale), and closure is driven by watermark timeouts, not a
  * per-batch scan of all keys. Late events beyond the watermark are
  * dropped by the watermark operator itself — the at-most-once reopen
  * problem the reference's visit engine punts to offline merge.
  */
object Sessionize {

  final case class SessionState(
      start: Long, last: Long, n: Long, total: Double)

  final case class Session(
      key: Long, session_start: java.sql.Timestamp,
      session_end: java.sql.Timestamp, n_events: Long, total_value: Double)

  /** `events` must be a STREAMING DataFrame with columns
    * (keyCol: long, tsCol: timestamp, valueCol: double).
    * `watermarkDelay` is a duration string ("10 minutes"). */
  def sessions(
      spark: SparkSession,
      events: DataFrame,
      keyCol: String, tsCol: String, valueCol: String,
      gapSeconds: Long, watermarkDelay: String): Dataset[Session] = {
    import spark.implicits._
    val gapMs = gapSeconds * 1000L
    // cast BEFORE watermarking — a cast-projection above the
    // watermark node would produce a fresh attribute the state
    // operator no longer recognizes as the event-time column
    val typed = events
      .select(col(keyCol).cast("long").as("__k"),
        col(tsCol).cast("timestamp").as("__ts"),
        col(valueCol).cast("double").as("__v"))
      .withWatermark("__ts", watermarkDelay)
      .as[(Long, java.sql.Timestamp, Double)]

    typed.groupByKey(_._1)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key, rows, state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            // watermark passed last + gap: the session can no longer
            // be extended by on-time data — close and clear
            val s = state.get
            state.remove()
            Iterator(Session(key, new java.sql.Timestamp(s.start),
              new java.sql.Timestamp(s.last), s.n, s.total))
          } else {
            // fold this batch's events (in event-time order) into the
            // open session, closing any session a >gap jump ends
            val sorted = rows.toSeq.sortBy(_._2.getTime)
            val closed = Seq.newBuilder[Session]
            var cur = state.getOption
            sorted.foreach { case (_, ts, v) =>
              val t = ts.getTime
              cur match {
                case Some(s) if t - s.last <= gapMs =>
                  cur = Some(SessionState(s.start, math.max(s.last, t),
                    s.n + 1, s.total + v))
                case Some(s) =>
                  closed += Session(key, new java.sql.Timestamp(s.start),
                    new java.sql.Timestamp(s.last), s.n, s.total)
                  cur = Some(SessionState(t, t, 1, v))
                case None =>
                  cur = Some(SessionState(t, t, 1, v))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // fires once the event-time watermark passes this point
              state.setTimeoutTimestamp(s.last + gapMs)
            }
            closed.result().iterator
          }
      }
  }

  /** Batch analog over a static DataFrame (identical semantics; the
    * session id is a running count of >gap jumps per key — two window
    * functions over ONE keyed partitioning, then one aggregate). Used
    * as the oracle-checkable spelling of the streaming operator. */
  def sessionsBatch(
      events: DataFrame,
      keyCol: String, tsCol: String, valueCol: String,
      gapSeconds: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byKey = Window.partitionBy(col(keyCol)).orderBy(col(tsCol))
    events
      .withColumn("__prev", lag(col(tsCol), 1).over(byKey))
      .withColumn("__new", when(col("__prev").isNull ||
        col(tsCol).cast("long") - col("__prev").cast("long") > gapSeconds, 1)
        .otherwise(0))
      .withColumn("__sid", sum(col("__new")).over(
        byKey.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(keyCol), col("__sid"))
      .agg(min(col(tsCol)).as("session_start"), max(col(tsCol)).as("session_end"),
        count(lit(1)).as("n_events"),
        sum(col(valueCol)).as("total_value"))
      .drop("__sid")
  }
}
