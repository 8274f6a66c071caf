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
}
