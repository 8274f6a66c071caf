package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{GraftFunctions, QueryDef}
import graft.core.Tables

/** Queries exercising the custom Catalyst surface (native
  * expressions + TypedImperativeAggregates registered through
  * [[graft.GraftExtensions]]): sipHash64, uniqUpTo, anyHeavy —
  * SURVEY.md §7.3's "needs custom code" rows.
  */
object ExtensionQueries {
  private def t(s: SparkSession, dir: String, name: String): DataFrame = {
    GraftFunctions.register(s)
    Tables(s, dir, name)
  }

  // ---------------------------------------------------------------
  // q55 sipHash64 — ClickHouse's canonical string hash as a native
  // codegen'd expression; exact values are pinned by spec-vector unit
  // tests (no DuckDB parity → rows-only driver check).
  // ---------------------------------------------------------------
  def q55(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "part")
      .selectExpr("p_partkey", "siphash64(p_name) AS h",
        "pmod(siphash64(p_name), 16) AS shard")
      .orderBy(col("p_partkey"))

  // ---------------------------------------------------------------
  // q56 uniqUpTo(N) — saturating distinct count (O(N) state/group;
  // reference AggregateFunctionUniqUpTo.h). Oracle: the saturating
  // CASE over exact distinct.
  // ---------------------------------------------------------------
  def q56(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "events")
      .groupBy(col("event_type"))
      .agg(expr("uniq_upto(user_id, 50)").as("u50"),
        expr("uniq_upto(pmod(user_id, 7), 50)").as("u_small"))
      .orderBy(col("event_type"))

  private val q56Sql =
    """SELECT event_type,
      |  CAST(CASE WHEN count(DISTINCT user_id) <= 50
      |       THEN count(DISTINCT user_id) ELSE 51 END AS BIGINT) AS u50,
      |  CAST(CASE WHEN count(DISTINCT user_id % 7) <= 50
      |       THEN count(DISTINCT user_id % 7) ELSE 51 END AS BIGINT) AS u_small
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  // ---------------------------------------------------------------
  // q57 anyHeavy — Boyer-Moore heavy hitter (O(1) state/group).
  // The returned value is only contractual when a majority exists, so
  // the query reports the vote over a majority-skewed derivation:
  // 'common' rows are >50% by construction (l_quantity spans 1..50).
  // ---------------------------------------------------------------
  def q57(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .withColumn("cls", when(col("l_quantity") <= 35, "common").otherwise(concat(lit("rare_"), col("l_linestatus"))))
      .groupBy(col("l_returnflag"))
      .agg(expr("any_heavy(cls)").as("heavy"), count(lit(1)).as("cnt"))
      .orderBy(col("l_returnflag"))

  private val q57Sql =
    """SELECT l_returnflag, 'common' AS heavy, count(*) AS cnt
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q55_siphash64_native", q55, None),
    QueryDef("q56_uniq_upto", q56, Some(q56Sql)),
    QueryDef("q57_any_heavy", q57, Some(q57Sql)))
}
