package graft

import org.apache.spark.sql.functions._
import graft.operators.MetadataAggregate

/** Pins for the footer-stats aggregate rewrite (`count()`, `min`,
  * `max` over an unfiltered parquet relation answered from parquet
  * metadata): values identical to the scan, reference empty-input
  * semantics preserved, and the guards (filters, inexact stat types,
  * other aggregates) keep it off. */
class MetadataAggregateSpec extends SparkSpec {

  private lazy val dir = {
    val d = java.nio.file.Files.createTempDirectory("metaagg").toString
    spark.range(0, 10000, 1, 4)
      .withColumn("v", pmod(expr("xxhash64(id, 1)"), lit(1000)))
      .withColumn("d", to_date(lit("2020-01-01")) + (col("id") % 365).cast("int"))
      .withColumn("s", concat(lit("x"), col("id")))
      .withColumn("alln", lit(null).cast("long"))
      .write.mode("overwrite").parquet(s"$d/t.parquet")
    spark.read.parquet(s"$d/t.parquet").createOrReplaceTempView("ma_t")
    // empty table with the same schema
    spark.range(0, 0)
      .withColumn("v", lit(0L))
      .write.mode("overwrite").parquet(s"$d/e.parquet")
    spark.read.parquet(s"$d/e.parquet").createOrReplaceTempView("ma_e")
    d
  }

  private def run(q: String): (Boolean, Array[org.apache.spark.sql.Row]) = {
    val before = MetadataAggregate.applied
    val rows = sql.ChDdl.execute(spark, q).get.collect()
    (MetadataAggregate.applied > before, rows)
  }

  test("count/min/max answer from footers and match the scan exactly") {
    dir
    val (fired, rows) = run(
      "SELECT count() AS c, min(v) AS mn, max(v) AS mx, min(d) AS dn, max(d) AS dx FROM ma_t")
    assert(fired, "metadata aggregate did not fire")
    val truth = spark.sql(
      "SELECT count(*), min(v), max(v), min(d), max(d) FROM ma_t").collect()(0)
    assert(rows.head.getLong(0) === truth.getLong(0))
    assert(rows.head.getLong(1) === truth.getLong(1))
    assert(rows.head.getLong(2) === truth.getLong(2))
    assert(rows.head.getDate(3) === truth.getDate(3))
    assert(rows.head.getDate(4) === truth.getDate(4))
  }

  test("all-null column yields null min/max (stats record only nulls)") {
    dir
    val (fired, rows) = run("SELECT min(alln) AS mn, count() AS c FROM ma_t")
    assert(fired)
    assert(rows.head.isNullAt(0))
    assert(rows.head.getLong(1) === 10000L)
  }

  test("reference empty-input semantics: keyless aggregate over empty table is EMPTY") {
    dir
    val (fired, rows) = run("SELECT count() AS c FROM ma_e")
    // fires or not, the dialect contract holds: zero rows out
    assert(rows.isEmpty, s"fired=$fired rows=${rows.toSeq}")
  }

  test("NaN doubles and MILLIS timestamps fall back to the scan") {
    val d = java.nio.file.Files.createTempDirectory("metaagg2").toString
    // writers skip or misorder NaN in double stats while Spark's max
    // is NaN — doubles are excluded from the rewrite entirely
    spark.range(0, 1000, 1, 4)
      .withColumn("dd", when(col("id") === 999, lit(Double.NaN))
        .otherwise(col("id").cast("double")))
      .write.mode("overwrite").parquet(s"$d/n.parquet")
    spark.read.parquet(s"$d/n.parquet").createOrReplaceTempView("ma_n")
    val (f1, r1) = run("SELECT min(dd) AS mn, max(dd) AS mx FROM ma_n")
    assert(!f1, "double min/max must not answer from footers")
    assert(r1.head.getDouble(0) === 0.0)
    assert(r1.head.getDouble(1).isNaN, "scan truth: Spark max is NaN")
    // TIMESTAMP(MILLIS) footer stats are 1000x off Spark's micros —
    // the per-file encoding check forces the scan
    val prevTs = spark.conf.get("spark.sql.parquet.outputTimestampType")
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MILLIS")
    try {
      spark.range(0, 1000, 1, 4)
        .withColumn("ts", expr("timestamp_seconds(1577836800 + id * 60)"))
        .write.mode("overwrite").parquet(s"$d/m.parquet")
    } finally spark.conf.set("spark.sql.parquet.outputTimestampType", prevTs)
    spark.read.parquet(s"$d/m.parquet").createOrReplaceTempView("ma_m")
    val (f2, r2) = run("SELECT min(ts) AS mn, max(ts) AS mx FROM ma_m")
    assert(!f2, "MILLIS-encoded timestamp stats must not answer from footers")
    val truth = spark.sql("SELECT min(ts), max(ts) FROM ma_m").collect()(0)
    assert(r2.head.getTimestamp(0) === truth.getTimestamp(0))
    assert(r2.head.getTimestamp(1) === truth.getTimestamp(1))
  }

  test("guards: WHERE, string min/max, sum, GROUP BY all fall back to the scan") {
    dir
    val before = MetadataAggregate.applied
    val (f1, r1) = run("SELECT count() AS c FROM ma_t WHERE v > 500")
    val (f2, r2) = run("SELECT min(s) AS mn FROM ma_t")
    val (f3, r3) = run("SELECT sum(v) AS s FROM ma_t")
    val (f4, _) = run("SELECT v % 2 AS g, count() AS c FROM ma_t GROUP BY g")
    assert(!f1 && !f2 && !f3 && !f4)
    assert(MetadataAggregate.applied === before)
    // and the fallbacks are still right
    assert(r1.head.getLong(0) ===
      spark.sql("SELECT count(*) FROM ma_t WHERE v > 500").collect()(0).getLong(0))
    assert(r2.head.getString(0) ===
      spark.sql("SELECT min(s) FROM ma_t").collect()(0).getString(0))
    assert(r3.head.getLong(0) ===
      spark.sql("SELECT sum(v) FROM ma_t").collect()(0).getLong(0))
  }
}
