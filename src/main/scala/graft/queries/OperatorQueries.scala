package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.QueryDef
import graft.core.Tables
import graft.operators.{AsOfJoin, SaltedJoin}

/** Driver-checked queries for the standalone join operators
  * ([[graft.operators.AsOfJoin]], [[graft.operators.SaltedJoin]]).
  * Both are beyond-the-reference extensions (SURVEY.md §2.3 "absent")
  * that a training-data pipeline needs: point-in-time feature lookup
  * and hot-key-safe joins.
  */
object OperatorQueries {
  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables(s, dir, name)

  // ---------------------------------------------------------------
  // q84 as-of join — every click event picks up the most recent
  // (ts' <= ts) purchase value of the same user. Single shuffle on
  // the key, linear window pass (AsOfJoin.scala). The right side is
  // pre-aggregated per (user, ts) so ties are deterministic on both
  // engines.
  // ---------------------------------------------------------------
  def q84(s: SparkSession, dir: String): DataFrame = {
    val ev = t(s, dir, "events")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id"), col("ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .groupBy(col("user_id"), col("ts"))
      .agg(max(col("value")).as("last_purchase_value"))
    AsOfJoin(clicks, purchases, key = "user_id",
      leftTime = "ts", rightTime = "ts",
      rightVals = Seq("last_purchase_value"))
      .select(col("user_id"), col("event_id"), col("last_purchase_value"))
      .orderBy(col("user_id"), col("event_id"))
  }

  // DuckDB's ASOF LEFT JOIN picks the greatest r.ts <= l.ts — the same
  // right-row-visible-at-equal-instant semantics as AsOfJoin's
  // right-before-left tie order.
  private val q84Sql =
    """SELECT l.user_id, l.event_id, r.last_purchase_value
      |FROM (SELECT user_id, event_id, ts FROM events WHERE event_type = 'click') l
      |ASOF LEFT JOIN (
      |  SELECT user_id, ts, max(value) AS last_purchase_value
      |  FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts) r
      |ON l.user_id = r.user_id AND l.ts >= r.ts
      |ORDER BY l.user_id, l.event_id""".stripMargin

  // ---------------------------------------------------------------
  // q85 skew-salted join — lineitem×supplier through SaltedJoin
  // (8 salt buckets spread any hot l_suppkey over 8 reducers; the
  // supplier side replicates 8×). Results must equal the plain join.
  // ---------------------------------------------------------------
  def q85(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
      .select(col("l_suppkey"), col("l_quantity"))
    val su = t(s, dir, "supplier")
      .select(col("s_suppkey").as("l_suppkey"), col("s_nationkey"))
    SaltedJoin(li, su, keys = Seq("l_suppkey"), buckets = 8)
      .groupBy(col("s_nationkey"))
      .agg(count(lit(1)).as("n_lines"),
        sum(col("l_quantity").cast("long")).as("sum_qty"))
      .orderBy(col("s_nationkey"))
  }

  private val q85Sql =
    """SELECT s_nationkey, count(*) AS n_lines,
      |  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
      |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      |GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin

  // ---------------------------------------------------------------
  // q98 gap-based sessionization (batch spelling of the
  // flatMapGroupsWithState streaming operator, streaming/Sessionize
  // .scala) — per-user activity sessions with a 10-minute gap: two
  // window functions over ONE keyed partitioning (lag → session-break
  // flag → running sum = session id), then one aggregate. DECIMAL
  // sums keep total_value exact and order-independent; the gap test
  // compares floor-epoch seconds in both engines.
  // ---------------------------------------------------------------
  def q98(s: SparkSession, dir: String): DataFrame =
    graft.streaming.Sessionize.sessionsBatch(
      t(s, dir, "events")
        .select(col("user_id"), col("ts"),
          col("value").cast(org.apache.spark.sql.types.DecimalType(18, 6)).as("v")),
      "user_id", "ts", "v", gapSeconds = 600)
      .select(col("user_id"), col("session_start"), col("session_end"),
        col("n_events"), col("total_value").cast("double").as("total_value"))
      .orderBy(col("user_id"), col("session_start"))

  private val q98Sql =
    """WITH e AS (
      |  SELECT user_id, ts, CAST(value AS DECIMAL(18,6)) AS v,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |      OR CAST(floor(epoch(ts)) AS BIGINT)
      |         - CAST(floor(epoch(lag(ts) OVER w)) AS BIGINT) > 600
      |      THEN 1 ELSE 0 END AS brk
      |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
      |s AS (SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts
      |        ROWS UNBOUNDED PRECEDING) AS sid FROM e)
      |SELECT user_id, min(ts) AS session_start, max(ts) AS session_end,
      |  count(*) AS n_events, CAST(sum(v) AS DOUBLE) AS total_value
      |FROM s GROUP BY user_id, sid ORDER BY user_id, session_start""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q84_asof_join", q84, Some(q84Sql)),
    QueryDef("q85_salted_join", q85, Some(q85Sql)),
    QueryDef("q98_sessionize", q98, Some(q98Sql)))
}
