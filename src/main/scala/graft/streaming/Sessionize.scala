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
  * Scale shape: state is O(#open sessions) per ACTIVE key, each O(1)
  * (start/last/count/sum — no event buffer; the open count is bounded
  * by watermarkDelay/gap since older sessions close), keyed state
  * lives in the state store (RocksDB at cluster scale), and closure
  * is driven by watermark timeouts, not a per-batch scan of all keys.
  * Late events beyond the watermark are dropped by the watermark
  * operator itself — the at-most-once reopen problem the reference's
  * visit engine punts to offline merge.
  *
  * Out-of-order correctness: an on-time event may arrive for ANY
  * still-open span — older than the newest session, before an open
  * session's start, or bridging two open sessions. So the state keeps
  * every not-yet-closable session; an event folds into the session
  * whose [start-gap, last+gap] span covers it (extending start
  * backwards when t < start), a fold that bridges two sessions merges
  * them, and a session EMITS only once the watermark passes
  * last + gap — never merely because a later event jumped the gap
  * in-batch (a late-but-on-time event could still fill that gap).
  */
object Sessionize {

  final case class SessionState(
      start: Long, last: Long, n: Long, total: Double)

  final case class OpenSessions(sessions: List[SessionState])

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
      .flatMapGroupsWithState[OpenSessions, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key, rows, state: GroupState[OpenSessions]) =>
          def emit(s: SessionState) = Session(key,
            new java.sql.Timestamp(s.start), new java.sql.Timestamp(s.last),
            s.n, s.total)
          // emit sessions the watermark has passed (no on-time event
          // can extend them), keep the rest open with the next timeout
          // clamped ABOVE the watermark (Spark rejects a timeout at or
          // before it)
          def drain(sessions: List[SessionState]): Iterator[Session] = {
            val wm = state.getCurrentWatermarkMs()
            val (closed, open) = sessions.partition(_.last + gapMs <= wm)
            if (open.isEmpty) state.remove()
            else {
              state.update(OpenSessions(open))
              state.setTimeoutTimestamp(
                math.max(open.map(_.last + gapMs).min, wm + 1))
            }
            closed.sortBy(_.start).map(emit).iterator
          }
          if (state.hasTimedOut) drain(state.get.sessions)
          else {
            var sessions = state.getOption.map(_.sessions).getOrElse(Nil)
            rows.foreach { case (_, ts, v) =>
              val t = ts.getTime
              // fold into the open session whose gap-padded span
              // covers t (extending start backwards for late events),
              // else open a new one
              sessions.indexWhere(s =>
                t >= s.start - gapMs && t <= s.last + gapMs) match {
                case -1 => sessions = SessionState(t, t, 1, v) :: sessions
                case i =>
                  val s = sessions(i)
                  sessions = sessions.updated(i, SessionState(
                    math.min(s.start, t), math.max(s.last, t),
                    s.n + 1, s.total + v))
              }
              // an extended session may now bridge a neighbor: merge
              // any two open sessions within gap of each other
              val sorted = sessions.sortBy(_.start)
              sessions = sorted.tail.foldLeft(List(sorted.head)) { (acc, s) =>
                val h = acc.head
                if (s.start - h.last <= gapMs)
                  SessionState(h.start, math.max(h.last, s.last),
                    h.n + s.n, h.total + s.total) :: acc.tail
                else s :: acc
              }
            }
            drain(sessions)
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
