package graft

import org.apache.spark.sql.functions._
import graft.operators.LimitAgg

/** Pins for the GROUP BY … LIMIT n (no ORDER BY) candidate rewrite:
  * the answer is n COMPLETE groups (counts match a full aggregation),
  * few-group inputs fall back to the single-pass plan and return all
  * groups, and ORDER BY shapes are untouched. */
class LimitAggSpec extends SparkSpec {

  private lazy val view: Unit = {
    val df = spark.range(0, 60000, 1, 6)
      .withColumn("k", pmod(expr("xxhash64(id, 1)"), lit(5000)))
      .withColumn("ks", concat(lit("s"), pmod(expr("xxhash64(id, 2)"), lit(4000))))
      .withColumn("v", pmod(expr("xxhash64(id, 3)"), lit(100)).cast("int"))
    df.createOrReplaceTempView("la_t")
    // full truth for count-per-group
    spark.sql("SELECT k, ks, count(*) AS c FROM la_t GROUP BY k, ks")
      .createOrReplaceTempView("la_truth")
  }

  test("rewrite fires and returns n complete groups") {
    view
    val before = LimitAgg.applied
    val df = sql.ChDdl.execute(spark,
      "SELECT k, ks, count() AS c FROM la_t GROUP BY k, ks LIMIT 7").get
    val got = df.collect()
    assert(LimitAgg.applied === before + 1)
    assert(got.length === 7)
    // counts must be EXACT (complete groups), not sample counts
    val truth = spark.table("la_truth").collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r.getLong(2)).toMap
    got.foreach { r =>
      assert(r.getLong(2) === truth((r.getLong(0), r.getString(1))))
    }
  }

  test("few groups: falls back and returns every group") {
    view
    val before = LimitAgg.applied
    val df = sql.ChDdl.execute(spark,
      "SELECT v, count() AS c FROM la_t GROUP BY v LIMIT 1000").get
    assert(LimitAgg.applied === before, "must fall back when groups < n")
    assert(df.collect().length === 100)
  }

  test("ORDER BY shapes are untouched") {
    view
    val before = LimitAgg.applied
    val df = sql.ChDdl.execute(spark,
      "SELECT k, count() AS c FROM la_t GROUP BY k ORDER BY c DESC LIMIT 5").get
    assert(df.collect().length === 5)
    assert(LimitAgg.applied === before)
  }

  test("aggregates beyond count survive the rewrite (sum/avg/uniq)") {
    view
    val before = LimitAgg.applied
    val df = sql.ChDdl.execute(spark,
      "SELECT k, sum(v) AS s, avg(v) AS a, uniq(ks) AS u FROM la_t GROUP BY k LIMIT 9").get
    val got = df.collect()
    assert(LimitAgg.applied === before + 1)
    assert(got.length === 9)
    val truth = spark.sql(
      "SELECT k, sum(v) AS s FROM la_t GROUP BY k").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    got.foreach(r => assert(r.getLong(1) === truth(r.getLong(0))))
  }
}
