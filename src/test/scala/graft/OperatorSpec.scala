package graft

import org.apache.spark.sql.functions._

import graft.operators.LimitBy

class OperatorSpec extends SparkSpec {
  import spark.implicits._

  test("LimitBy keeps first n rows per group in order") {
    val df = Seq(
      ("a", 3), ("a", 1), ("a", 2),
      ("b", 9), ("b", 8)).toDF("k", "v")
    val got = LimitBy(df, 2, Seq(col("k")), Seq(col("v")))
      .orderBy("k", "v").as[(String, Int)].collect().toSeq
    assert(got === Seq(("a", 1), ("a", 2), ("b", 8), ("b", 9)))
  }

  test("LimitBy with n larger than group passes everything") {
    val df = Seq(("a", 1), ("b", 2)).toDF("k", "v")
    assert(LimitBy(df, 10, Seq(col("k")), Seq(col("v"))).count() === 2)
  }

  test("SaltedJoin matches the plain join on skewed data") {
    import graft.operators.SaltedJoin
    // 10k rows of one hot key + a long tail
    val skewed = ((1 to 10000).map(_ => "hot") ++ (1 to 100).map(i => s"k$i"))
      .toDF("k").withColumn("v", monotonically_increasing_id())
    val small = (Seq("hot") ++ (1 to 100).map(i => s"k$i")).zipWithIndex
      .toDF("k", "dim")
    val expected = skewed.join(small, Seq("k")).agg(
      count(lit(1)), sum(col("dim"))).collect()(0)
    val got = SaltedJoin(skewed, small, Seq("k"), buckets = 8).agg(
      count(lit(1)), sum(col("dim"))).collect()(0)
    assert(got === expected)
    // the salt actually participates in the shuffle keys
    val plan = SaltedJoin(skewed, small, Seq("k"), 8).queryExecution
      .executedPlan.toString
    assert(plan.contains("__graft_salt"), plan)
  }
}
