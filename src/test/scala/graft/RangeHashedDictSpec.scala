package graft

import org.apache.spark.sql.functions._
import graft.operators.RangeHashedDict

/** Pins for the range_hashed dictionary layout
  * (RangeHashedDictionary.h semantics): first containing range wins
  * in (lower, upper) order, open bounds on either side, miss yields
  * the configured default, and the probe is a broadcast per-row
  * expression (no join, no shuffle in the plan). */
class RangeHashedDictSpec extends SparkSpec {
  import spark.implicits._

  private def dictOf(rows: Seq[(Long, String, String, Long)]): RangeHashedDict = {
    val src = rows.toDF("id", "lo", "hi", "value")
      .select(col("id"),
        when(col("lo") =!= "", to_date(col("lo"))).as("lower"),
        when(col("hi") =!= "", to_date(col("hi"))).as("upper"),
        col("value"))
    RangeHashedDict.build(src, "id", "lower", "upper", "value")
  }

  private def probe(dict: RangeHashedDict, id: Long, date: String,
      default: Long = -1L): Long =
    Seq((id, date)).toDF("id", "d")
      .select(RangeHashedDict.dictGet(dict, col("id"),
        to_date(col("d")), default).as("v"))
      .collect()(0).getLong(0)

  test("containing range wins; miss and unknown id give the default") {
    val d = dictOf(Seq(
      (1L, "2020-01-01", "2020-06-30", 10L),
      (1L, "2020-07-01", "2020-12-31", 20L)))
    assert(probe(d, 1L, "2020-03-15") === 10L)
    assert(probe(d, 1L, "2020-07-01") === 20L)  // inclusive lower
    assert(probe(d, 1L, "2020-06-30") === 10L)  // inclusive upper
    assert(probe(d, 1L, "2021-01-01") === -1L)  // date miss
    assert(probe(d, 2L, "2020-03-15") === -1L)  // id miss
  }

  test("overlapping ranges: FIRST in (lower, upper) order wins (find_if over sorted values)") {
    val d = dictOf(Seq(
      (1L, "2020-03-01", "2020-12-31", 99L),
      (1L, "2020-01-01", "2020-06-30", 11L))) // sorts first
    assert(probe(d, 1L, "2020-04-01") === 11L)
    assert(probe(d, 1L, "2020-08-01") === 99L) // only the later range contains
  }

  test("open bounds: null lower / null upper extend to infinity on that side") {
    val d = dictOf(Seq(
      (5L, "", "2019-12-31", 1L),           // open lower
      (5L, "2020-01-01", "", 2L)))          // open upper
    assert(probe(d, 5L, "1900-01-01") === 1L)
    assert(probe(d, 5L, "2019-12-31") === 1L)
    assert(probe(d, 5L, "2020-01-01") === 2L)
    assert(probe(d, 5L, "2099-12-31") === 2L)
  }

  test("SQL surface: dictGetInt64('d','attr',id,date) resolves through the registry") {
    GraftFunctions.register(spark)
    val d = dictOf(Seq(
      (1L, "2020-01-01", "2020-06-30", 10L),
      (1L, "2020-07-01", "2020-12-31", 20L)))
    RangeHashedDict.register("rates", "rate", d, default = -7L)
    try {
      val got = Seq((1L, "2020-08-01"), (1L, "2021-01-01"), (9L, "2020-08-01"))
        .toDF("id", "ds")
        .selectExpr("dictGetInt64('rates', 'rate', id, to_date(ds)) AS v")
        .collect().map(_.getLong(0)).toSeq
      assert(got === Seq(20L, -7L, -7L))
      // narrower getter casts on top of the Long lookup
      val n = Seq((1L, "2020-02-02")).toDF("id", "ds")
        .selectExpr("dictGetUInt16('rates', 'rate', id, to_date(ds)) AS v")
        .collect()(0)
      assert(n.getInt(0) === 10)
      // unregistered attribute is an analysis-time error
      val e = intercept[Exception] {
        Seq((1L, "2020-02-02")).toDF("id", "ds")
          .selectExpr("dictGetInt64('rates', 'nope', id, to_date(ds))")
      }
      assert(e.getMessage.contains("no registered attribute"), e.getMessage)
    } finally RangeHashedDict.clearRegistry()
  }

  test("q124 plan: broadcast probe, no join, no extra shuffle before the aggregate") {
    val df = queries.MiscQueries.q124(spark, sfDir)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("dict_get_range"), p)
    assert(!p.contains("Join"), p)
    // exactly the aggregate's shuffle + the global sort's range
    // exchange — the lookup itself adds none
    assert("Exchange".r.findAllIn(p).size <= 2, p)
  }
}
