package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType}
import graft.operators.ComplexKeyHashedDict

/** Pins for the complex_key_hashed dictionary layout
  * (ComplexKeyHashedDictionary.cpp semantics): composite (tuple) key
  * lookup, miss and NULL-key-member yield the configured default,
  * duplicate keys keep the first row, string attributes work, and the
  * probe is a broadcast per-row expression (no join, no shuffle). */
class ComplexKeyHashedDictSpec extends SparkSpec {
  import spark.implicits._

  private def longDict(): ComplexKeyHashedDict = {
    val src = Seq(
      ("a", 1, 100L), ("a", 2, 200L), ("b", 1, 300L),
      ("a", 1, 999L) // duplicate key: first wins
    ).toDF("k1", "k2", "v")
    ComplexKeyHashedDict.build(src, Seq("k1", "k2"), "v", LongType)
  }

  test("composite hit, miss, and duplicate-key-keeps-first") {
    val d = longDict()
    assert(d.size === 3)
    val got = Seq(("a", 1), ("a", 2), ("b", 1), ("b", 2), ("zz", 1))
      .toDF("k1", "k2")
      .select(ComplexKeyHashedDict.dictGet(
        d, Seq(col("k1"), col("k2")), lit(-1L)).as("v"))
      .collect().map(_.getLong(0)).toSeq
    assert(got === Seq(100L, 200L, 300L, -1L, -1L))
  }

  test("NULL key member yields the default (keys are non-nullable)") {
    val d = longDict()
    val got = Seq((Some("a"), Some(1)), (None, Some(1)), (Some("a"), None))
      .toDF("k1", "k2")
      .select(ComplexKeyHashedDict.dictGet(
        d, Seq(col("k1"), col("k2")), lit(-5L)).as("v"))
      .collect().map(_.getLong(0)).toSeq
    assert(got === Seq(100L, -5L, -5L))
    // a source row with a NULL key member is skipped at build
    val src = Seq((Some("x"), Some(1), 7L), (None, Some(2), 8L))
      .toDF("k1", "k2", "v")
    val d2 = ComplexKeyHashedDict.build(src, Seq("k1", "k2"), "v", LongType)
    assert(d2.size === 1)
  }

  test("integral key parts widen: Int probe matches Long build and vice versa") {
    val src = Seq((1L, 10), (2L, 20)).toDF("k1", "k2")
      .select(col("k1"), col("k2"), (col("k1") * 1000).as("v"))
    val d = ComplexKeyHashedDict.build(src, Seq("k1", "k2"), "v", LongType)
    val got = Seq((1, 10L), (2, 20L)).toDF("k1", "k2")
      .select(ComplexKeyHashedDict.dictGet(
        d, Seq(col("k1"), col("k2")), lit(-1L)).as("v"))
      .collect().map(_.getLong(0)).toSeq
    assert(got === Seq(1000L, 2000L))
  }

  test("string attribute + SQL surface: dictGetString / dictGetInt64 over tuple(k1,k2)") {
    GraftFunctions.register(spark)
    val sdict = ComplexKeyHashedDict.build(
      Seq(("a", 1, "alpha"), ("b", 2, "beta")).toDF("k1", "k2", "v"),
      Seq("k1", "k2"), "v", StringType)
    ComplexKeyHashedDict.register("labels", "name", sdict, default = "none")
    ComplexKeyHashedDict.register("labels", "code", longDict(), default = -9L)
    try {
      val got = Seq(("a", 1), ("b", 2), ("c", 3)).toDF("k1", "k2")
        .selectExpr(
          "dictGetString('labels', 'name', struct(k1, k2)) AS s",
          "dictGetInt64('labels', 'code', struct(k1, k2)) AS v")
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      assert(got === Seq(("alpha", 100L), ("beta", -9L), ("none", -9L)))
      // the dialect's tuple() spelling resolves to the same probe
      Seq(("a", 1)).toDF("k1", "k2").createOrReplaceTempView("ck_probe")
      val viaCh = sql.ChDdl.execute(spark,
        "SELECT dictGetString('labels', 'name', tuple(k1, k2)) AS s FROM ck_probe")
        .get.collect()(0).getString(0)
      assert(viaCh === "alpha")
      // unregistered attribute is an analysis-time error
      val e = intercept[Exception] {
        Seq(("a", 1)).toDF("k1", "k2")
          .selectExpr("dictGetInt64('labels', 'nope', struct(k1, k2))")
      }
      assert(e.getMessage.contains("no registered attribute"), e.getMessage)
    } finally ComplexKeyHashedDict.clearRegistry()
  }

  test("over-limit dictionary source fails loud with a named error") {
    import spark.implicits._
    val saved = operators.DictGuard.MaxRows
    operators.DictGuard.MaxRows = 100
    try {
      val big = spark.range(0, 200).select(
        col("id").cast("string").as("k1"), col("id").as("k2"),
        col("id").as("v"))
      val e = intercept[IllegalArgumentException] {
        operators.ComplexKeyHashedDict.build(
          big, Seq("k1", "k2"), "v", org.apache.spark.sql.types.LongType)
      }
      assert(e.getMessage.contains("complex_key_hashed"), e.getMessage)
      assert(e.getMessage.contains("100 rows"), e.getMessage)
      // at the bound is fine
      operators.DictGuard.MaxRows = 200
      val d = operators.ComplexKeyHashedDict.build(
        big, Seq("k1", "k2"), "v", org.apache.spark.sql.types.LongType)
      assert(d != null)
    } finally operators.DictGuard.MaxRows = saved
  }

  test("q126 plan: broadcast probe, no join, no extra shuffle before the aggregate") {
    val df = queries.MiscQueries.q126(spark, sfDir)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("dict_get_complex_key"), p)
    assert(!p.contains("Join"), p)
    // exactly the aggregate's shuffle + the global sort's range
    // exchange — the lookup itself adds none
    assert("Exchange".r.findAllIn(p).size <= 2, p)
  }
}
