package graft

import org.apache.spark.sql.catalyst.plans.logical.Aggregate
import org.apache.spark.sql.functions._

/** Pins for DropDerivedGroupKeys: `GROUP BY x, x-1, …` groups by x
  * alone (derived keys leave the hash map and shuffle row), results
  * are unchanged, and non-derivable or semantic keys stay. */
class DropDerivedGroupKeysSpec extends SparkSpec {
  import spark.implicits._

  private def groupKeyCount(df: org.apache.spark.sql.DataFrame): Int =
    df.queryExecution.optimizedPlan.collect {
      case a: Aggregate => a.groupingExpressions.length
    }.head

  test("q36 shape: GROUP BY x, x-1, x-2, x-3 optimizes to one key, same rows") {
    // parquet-backed (a LocalRelation gets constant-folded through the
    // pull-out Project, which erases the alias definitions)
    val dir = java.nio.file.Files.createTempDirectory("ddk").toString
    (1 to 1000).map(i => i % 37).toDF("x")
      .write.mode("overwrite").parquet(s"$dir/t.parquet")
    spark.read.parquet(s"$dir/t.parquet").createOrReplaceTempView("ddk_t")
    val q = spark.sql(
      "SELECT x, x - 1, x - 2, x - 3, count(*) AS c FROM ddk_t GROUP BY x, x - 1, x - 2, x - 3")
    assert(groupKeyCount(q) === 1, q.queryExecution.optimizedPlan.toString)
    val got = q.collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getLong(4)))
      .sortBy(_._1)
    val want = (1 to 1000).groupBy(_ % 37).toSeq.map { case (k, vs) =>
      (k, k - 1, k - 2, k - 3, vs.size.toLong)
    }.sortBy(_._1)
    assert(got.toSeq === want)
  }

  test("keys that are NOT functions of attribute keys stay") {
    val df = Seq((1, 2), (1, 3), (2, 2)).toDF("a", "b")
    df.createOrReplaceTempView("ddk_u")
    // a+b references b, which is not a kept attribute key — must stay
    val q = spark.sql("SELECT a, a + b AS s, count(*) AS c FROM ddk_u GROUP BY a, a + b")
    assert(groupKeyCount(q) === 2, q.queryExecution.optimizedPlan.toString)
    assert(q.collect().length === 3)
  }

  test("the keyless '__all' literal marker is not treated as derived") {
    // ConstGroupToGlobalAgg owns that rewrite; this rule must leave
    // single-literal groups alone (empty-input semantics)
    spark.range(0).toDF("v").createOrReplaceTempView("ddk_e")
    val rows = sql.ChDdl.execute(spark, "SELECT count() FROM ddk_e").get.collect()
    assert(rows.isEmpty)
  }
}
