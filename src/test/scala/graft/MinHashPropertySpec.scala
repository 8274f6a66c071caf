package graft

import org.apache.spark.sql.functions._

/** Property checks for the approximate operators the DuckDB oracle
  * can't verify (SURVEY.md §5: cheap wins the reference lacks). */
class MinHashPropertySpec extends SparkSpec {
  import spark.implicits._

  // MinHash signature equality rate across permutations estimates
  // Jaccard similarity: identical docs → identical signatures,
  // disjoint docs → (whp) fully distinct signatures.
  test("minhash: identical texts collide, disjoint texts do not") {
    val docs = Seq(
      (0L, "the quick brown fox jumps over the lazy dog again and again"),
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "zzzz yyyy xxxx wwww vvvv uuuu tttt ssss rrrr qqqq pppp oooo"))
      .toDF("doc_id", "text")
    docs.createOrReplaceTempView("mh_docs")
    val shingles =
      "array_distinct(transform(sequence(1, greatest(length(text) - 4, 1)), i -> substring(text, i, 5)))"
    val sig = docs.select(col("doc_id"),
      explode(expr(s"transform($shingles, g -> pmod(xxhash64(g), 2147483647))")).as("h"))
      .groupBy(col("doc_id"))
      .agg((0 until 16).map(i =>
        min(pmod(col("h") * (2 * i + 1) + 97 * i, lit(2147483647L))).as(s"m$i")).head,
        (0 until 16).map(i =>
          min(pmod(col("h") * (2 * i + 1) + 97 * i, lit(2147483647L))).as(s"m$i")).tail: _*)
    val rows = sig.orderBy("doc_id").collect()
    val s0 = rows(0).toSeq.drop(1)
    val s1 = rows(1).toSeq.drop(1)
    val s2 = rows(2).toSeq.drop(1)
    assert(s0 === s1, "identical docs must share the full signature")
    val matches02 = s0.zip(s2).count { case (a, b) => a == b }
    assert(matches02 <= 3, s"disjoint docs matched $matches02/16 signature slots")
  }

  test("approx_count_distinct within 10% of exact on events") {
    val ev = graft.core.Tables(spark, sfDir, "events")
    val r = ev.agg(
      countDistinct(col("user_id")).as("exact"),
      approx_count_distinct(col("user_id")).as("approx")).collect()(0)
    val exact = r.getLong(0).toDouble
    val approx = r.getLong(1).toDouble
    assert(math.abs(approx - exact) / exact < 0.10)
  }

  test("deterministic sample is stable and subset-composable") {
    val li = graft.core.Tables(spark, sfDir, "lineitem")
    def sampled(frac: Long) = li.filter(
      pmod(pmod(col("l_orderkey"), lit(4294967296L)) * 40503L, lit(65536L)) < lit(frac))
    val n5 = sampled(3277).count()  // 5%
    val n10 = sampled(6554).count() // 10%
    assert(n5 <= n10, "5% sample must be a subset of the 10% sample")
    assert(sampled(6554).count() === n10, "resampling is deterministic")
    val total = li.count().toDouble
    assert(math.abs(n10 / total - 0.10) < 0.03, s"10% sample was ${n10 / total}")
  }
}
