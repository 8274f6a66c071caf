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

  // ---- ConnectedComponents (large-star / small-star) ----

  import graft.operators.ConnectedComponents

  private def cc(edges: Seq[(Long, Long)]): Map[Long, Long] =
    ConnectedComponents(edges.toDF("a", "b"), "a", "b")
      .as[(Long, Long)].collect().toMap

  /** local union-find oracle */
  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  test("ConnectedComponents merges transitive chains to the min id") {
    // two chains and one isolated edge: {1,2,3,4} {10,11} {20,21,22}
    val got = cc(Seq((2L, 1L), (2L, 3L), (4L, 3L), (10L, 11L),
      (21L, 20L), (21L, 22L)))
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L, 22L -> 20L))
  }

  test("ConnectedComponents handles a long chain (worst case for label propagation)") {
    val chain = (0L until 200L).map(i => (i, i + 1))
    val got = cc(chain)
    assert(got.size === 201 && got.values.forall(_ == 0L))
  }

  test("ConnectedComponents ignores self-loops and duplicate edges") {
    val got = cc(Seq((5L, 5L), (1L, 2L), (2L, 1L), (1L, 2L)))
    assert(got === Map(5L -> 5L, 1L -> 1L, 2L -> 1L))
  }

  test("IncrementalDedup drops exact-history digests, keeps new ones, survives fpp") {
    import graft.operators.IncrementalDedup
    import spark.implicits._
    // history has digests d1,d2 (d2 twice — Bloom insert idempotent)
    val history = Seq("d1", "d2", "d2").toDF("digest")
    val batch = Seq(
      (10L, "d1"),  // true dup -> dropped
      (11L, "d3"),  // new -> kept
      (12L, "d2"),  // true dup -> dropped
      (13L, "d4"))  // new -> kept
      .toDF("id", "digest")
    val out = IncrementalDedup(batch, history, "digest")
      .select("id").as[Long].collect().toSet
    assert(out === Set(11L, 13L))
    // empty history keeps everything; empty batch stays empty
    assert(IncrementalDedup(batch, Seq.empty[String].toDF("digest"), "digest")
      .count() === 4L)
    assert(IncrementalDedup(batch.limit(0), history, "digest").count() === 0L)
  }

  test("ConnectedComponents matches a union-find oracle on a random graph") {
    val rnd = new scala.util.Random(42)
    val edges = Seq.fill(300)((rnd.nextInt(120).toLong, rnd.nextInt(120).toLong))
      .filter { case (a, b) => a != b }
    assert(cc(edges) === unionFind(edges))
  }
}
