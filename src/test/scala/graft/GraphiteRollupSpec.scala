package graft

import org.apache.spark.sql.functions._

import graft.sql.ChDdl
import graft.storage.{GraphiteRollup, MergeTreeTable}
import GraphiteRollup.{Params, Pattern, Retention}

/** GraphiteMergeTree retention/rollup
  * (GraphiteRollupSortedBlockInputStream.h/.cpp): pattern → function
  * selection, the age → precision ladder, rounding, version dedup,
  * and the DDL engine wiring. */
class GraphiteRollupSpec extends SparkSpec {

  private val params = Params(
    pathCol = "Path", timeCol = "Time", valueCol = "Value",
    versionCol = "Version",
    patterns = Seq(
      Pattern(Some("^click"), "any",
        Seq(Retention(0, 5), Retention(86400, 60))),
      Pattern(None, "max",
        Seq(Retention(0, 60), Retention(3600, 300)))))

  test("two retention tiers: recent data keeps fine precision, old data coarsens") {
    import spark.implicits._
    val tMerge = 1000000L
    // "other" metric (default pattern, max): recent rows (age < 3600)
    // round to 60 s; old rows (age >= 3600) round to 300 s
    val recentBase = 999360L // 60-aligned; ages ≈ 600 → tier 60
    val oldBase = 992700L // 300-aligned; ages ≈ 7300 → tier 300
    val df = Seq(
      // recent: two 60 s buckets
      ("other.metric", recentBase + 1L, 1.0, 1L),
      ("other.metric", recentBase + 30L, 5.0, 1L),
      ("other.metric", recentBase + 61L, 2.0, 1L),
      // old: one 300 s bucket spanning what would be several 60 s ones
      ("other.metric", oldBase + 10L, 7.0, 1L),
      ("other.metric", oldBase + 200L, 9.0, 1L),
      ("other.metric", oldBase + 299L, 3.0, 1L))
      .toDF("Path", "Time", "Value", "Version")
    val out = GraphiteRollup.rollup(df, params, tMerge)
      .orderBy("Time").collect()
      .map(r => (r.getLong(1), r.getDouble(2)))
    assert(out.toSeq === Seq(
      (oldBase, 9.0), // max of 7,9,3 in one 300 s bucket
      (recentBase, 5.0), // max of 1,5
      (recentBase + 60L, 2.0)))
  }

  test("pattern regexp picks its own function; max version wins per (path,time)") {
    import spark.implicits._
    val tMerge = 1000000L
    val t0 = tMerge - 100L // age 100 → click ladder tier 5
    val df = Seq(
      // same exact (path,time): version 3 must win before rollup
      ("click_cost", t0, 10.0, 1L),
      ("click_cost", t0, 20.0, 3L),
      ("click_cost", t0 + 2L, 30.0, 1L), // same 5 s bucket
      ("click_cost", t0 + 7L, 40.0, 2L)) // next 5 s bucket
      .toDF("Path", "Time", "Value", "Version")
    val out = GraphiteRollup.rollup(df, params, tMerge)
      .orderBy("Time").collect()
      .map(r => (r.getLong(1), r.getDouble(2), r.getLong(3)))
    // 'any' keeps the first surviving value of the bucket; version is
    // the bucket max
    assert(out.toSeq === Seq(
      (t0 / 5L * 5L, 20.0, 3L),
      ((t0 + 7L) / 5L * 5L, 40.0, 2L)))
  }

  test("day-anchored rounding above one hour never moves the date") {
    import spark.implicits._
    // precision 7200 > 3600: round within the UTC day, not the raw epoch
    val p = Params("Path", "Time", "Value", "Version",
      Seq(Pattern(None, "max", Seq(Retention(0, 7200)))))
    val time = 86400L * 10 + 3600L * 5 + 1234L // day 10, 05:00:34
    val df = Seq(("m", time, 1.0, 1L)).toDF("Path", "Time", "Value", "Version")
    val got = GraphiteRollup.rollup(df, p, time + 10L)
      .collect().head.getLong(1)
    assert(got === 86400L * 10 + 7200L * 2) // 04:00 of the same day
  }

  test("paths matching no pattern pass through unrounded") {
    import spark.implicits._
    val p = Params("Path", "Time", "Value", "Version",
      Seq(Pattern(Some("^only_this"), "max", Seq(Retention(0, 60)))))
    val df = Seq(("unmatched", 12345L, 1.0, 2L), ("unmatched", 12345L, 9.0, 5L))
      .toDF("Path", "Time", "Value", "Version")
    val out = GraphiteRollup.rollup(df, p, 100000L).collect()
    assert(out.length === 1)
    assert(out.head.getLong(1) === 12345L) // time untouched
    assert(out.head.getDouble(2) === 9.0) // max-version row survives
  }

  test("reference XML config format parses") {
    val p = GraphiteRollup.parseXml(
      """<yandex><graphite_rollup>
        |<path_column_name>metric</path_column_name>
        |<time_column_name>timestamp</time_column_name>
        |<value_column_name>value</value_column_name>
        |<version_column_name>updated</version_column_name>
        |<pattern>
        |  <regexp>^one_sec</regexp><function>avg</function>
        |  <retention><age>0</age><precision>1</precision></retention>
        |  <retention><age>86400</age><precision>5</precision></retention>
        |</pattern>
        |<default>
        |  <function>avg</function>
        |  <retention><age>0</age><precision>60</precision></retention>
        |</default>
        |</graphite_rollup></yandex>""".stripMargin)
    assert(p.pathCol === "metric" && p.versionCol === "updated")
    assert(p.patterns.length === 2)
    assert(p.patterns.head.regexp === Some("^one_sec"))
    // ladder sorted age-descending for selectPrecision's scan order
    assert(p.patterns.head.retentions === Seq(Retention(86400, 5), Retention(0, 1)))
    assert(p.patterns.last.regexp === None)
  }

  test("DDL: GraphiteMergeTree engine rolls up on OPTIMIZE") {
    ChDdl.reset(spark)
    ChDdl.execute(spark,
      "CREATE TABLE test.graphite (d Date, Path String, Time UInt32, " +
        "Value Float64, Version UInt32) " +
        "ENGINE = GraphiteMergeTree(d, (Path, Time), 8192, 'graphite_rollup')")
    // epoch-adjacent timestamps: ages are far past the deepest rung of
    // the built-in default ladder (max, 86400 → 3600), so rounding is
    // deterministic regardless of wall clock
    ChDdl.execute(spark,
      "INSERT INTO test.graphite VALUES " +
        "('1970-01-02', 'site.cpu', 90000, 1.5, 1)," +
        "('1970-01-02', 'site.cpu', 91000, 4.5, 1)," + // same 3600 s bucket
        "('1970-01-02', 'site.cpu', 93700, 2.5, 1)") // next bucket
    ChDdl.execute(spark, "OPTIMIZE TABLE test.graphite")
    val got = ChDdl.execute(spark,
      "SELECT Time, Value FROM test.graphite ORDER BY Time").get
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(got.toSeq === Seq((90000L / 3600 * 3600, 4.5), (93700L / 3600 * 3600, 2.5)))
    ChDdl.execute(spark, "DROP TABLE test.graphite")
  }

  test("system.graphite and system.replication_queue are registered") {
    graft.core.SystemTables.register(spark)
    val rows = spark.sql(
      "SELECT config_name, function FROM system_graphite").collect()
    assert(rows.nonEmpty)
    assert(rows.map(_.getString(0)).contains("graphite_rollup"))
    // replication_queue: structurally empty, schema live
    val rq = spark.sql("SELECT database, new_part_name, parts_to_merge " +
      "FROM system_replication_queue")
    assert(rq.count() === 0)
  }
}
