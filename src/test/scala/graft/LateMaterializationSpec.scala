package graft

import org.apache.spark.sql.functions._
import graft.operators.LateMaterialization

/** Pins for the two-pass late-materialization rewrite of wide
  * `ORDER BY … LIMIT n` (bench43 q24 shape): results identical to the
  * naive plan, the narrow first pass reads ≤ 3 data columns, the wide
  * second pass pushes the sort-key threshold into the parquet reader,
  * and the guards (narrow projection, small relation, big limit) keep
  * the rewrite off everywhere it wouldn't pay. */
class LateMaterializationSpec extends SparkSpec {

  private lazy val dir = {
    val d = java.nio.file.Files.createTempDirectory("latemat").toString
    // 16 columns, 50k rows, deterministic; multiple files so the
    // (file_path, row_index) identity is exercised across files
    val df = spark.range(0, 50000, 1, 8)
      .withColumn("k", pmod(expr("xxhash64(id, 1)"), lit(1000)))
      .withColumn("s", concat(lit("val_"), pmod(expr("xxhash64(id, 2)"), lit(50))))
    val wide = (1 to 13).foldLeft(df)((d2, i) =>
      d2.withColumn(s"c$i", expr(s"xxhash64(id, ${i + 10})")))
    wide.write.mode("overwrite").parquet(s"$d/t.parquet")
    spark.read.parquet(s"$d/t.parquet").createOrReplaceTempView("lm_t")
    d
  }

  private def withLowThreshold[T](f: => T): T = {
    val saved = LateMaterialization.minRelationBytes
    LateMaterialization.minRelationBytes = 1L
    try f finally LateMaterialization.minRelationBytes = saved
  }

  test("rewrite fires and matches the naive plan exactly (incl. ties by row identity)") {
    dir
    withLowThreshold {
      val before = LateMaterialization.applied
      val q = "SELECT * FROM lm_t WHERE s LIKE '%val_1%' ORDER BY k, id LIMIT 7"
      val got = sql.ChDdl.execute(spark, q).get.collect()
      assert(LateMaterialization.applied === before + 1)
      val want = spark.sql(q).collect()
      // (k, id) is a total order here, so rows must match 1:1
      assert(got.map(_.toString).toSeq === want.map(_.toString).toSeq)
      assert(got.length === 7)
    }
  }

  test("pass 1 reads ≤ 3 data columns; pass 2 pushes the key threshold") {
    dir
    withLowThreshold {
      sql.ChDdl.execute(spark,
        "SELECT * FROM lm_t WHERE s = 'val_3' ORDER BY k LIMIT 5").get.collect()
      val p1 = LateMaterialization.lastPass1Plan
      // narrow scan: only the filter column, order column and row
      // identity reach the first-pass reader
      val read = "ReadSchema: struct<([^>]*)>".r.findFirstMatchIn(p1)
        .map(_.group(1)).getOrElse(fail(s"no ReadSchema in:\n$p1"))
      val dataCols = read.split(",").count(!_.startsWith("_"))
      assert(dataCols <= 3, s"pass1 reads $dataCols data columns: $read\n$p1")
      assert(p1.contains("TakeOrderedAndProject"), p1)
      // pass 2 carries the threshold as a REAL pushed filter on the
      // leading sort key — this is what prunes row groups/pages
      val p2 = LateMaterialization.lastPass2Plan
      assert(p2.contains("LessThanOrEqual(k"), p2)
      assert(p2.contains("PushedFilters: [") && p2.contains("LessThanOrEqual(k"), p2)
    }
  }

  test("empty filter result keeps schema and returns zero rows") {
    dir
    withLowThreshold {
      val df = sql.ChDdl.execute(spark,
        "SELECT * FROM lm_t WHERE s = 'no_such' ORDER BY k LIMIT 5").get
      assert(df.columns.length === 16)
      assert(df.count() === 0)
    }
  }

  test("guards: narrow projection, small relation, oversized limit stay single-pass") {
    dir
    val before = LateMaterialization.applied
    withLowThreshold {
      // narrow projection (< MinProjectWidth columns)
      sql.ChDdl.execute(spark,
        "SELECT k, s FROM lm_t ORDER BY k LIMIT 5").get.collect()
      // oversized limit
      sql.ChDdl.execute(spark,
        s"SELECT * FROM lm_t ORDER BY k LIMIT ${LateMaterialization.MaxLimit + 1}")
        .get.collect()
    }
    // small relation at the default 64 MB threshold
    sql.ChDdl.execute(spark,
      "SELECT * FROM lm_t ORDER BY k LIMIT 5").get.collect()
    assert(LateMaterialization.applied === before)
  }

  test("DESC order uses a min threshold and still matches") {
    dir
    withLowThreshold {
      val before = LateMaterialization.applied
      val q = "SELECT * FROM lm_t ORDER BY k DESC, id DESC LIMIT 6"
      val got = sql.ChDdl.execute(spark, q).get.collect()
      assert(LateMaterialization.applied === before + 1)
      val want = spark.sql(q).collect()
      assert(got.map(_.toString).toSeq === want.map(_.toString).toSeq)
      assert(LateMaterialization.lastPass2Plan.contains("GreaterThanOrEqual(k"),
        LateMaterialization.lastPass2Plan)
    }
  }

  test("null keys in the top-n fall back to the single-pass plan") {
    dir
    withLowThreshold {
      // kn is null on ~1/7 of rows; ASC NULLS FIRST puts them in the
      // top-n, which the threshold conjunct cannot represent
      val wide = spark.table("lm_t")
        .withColumn("kn", when(pmod(col("id"), lit(7)) === 0, lit(null))
          .otherwise(col("k")))
      wide.write.mode("overwrite").parquet(s"$dir/tn.parquet")
      spark.read.parquet(s"$dir/tn.parquet").createOrReplaceTempView("lm_tn")
      // the dialect sorts NULLS LAST, so a null key reaches the top-n
      // only when fewer than n rows match — exactly the case where the
      // threshold cannot represent the answer
      val before = LateMaterialization.applied
      val q = "SELECT * FROM lm_tn WHERE id < 3 ORDER BY kn, id LIMIT 5"
      val got = sql.ChDdl.execute(spark, q).get.collect()
      assert(LateMaterialization.applied === before, "must fall back on null keys")
      assert(got.length === 3)
      assert(got.count(_.isNullAt(got(0).fieldIndex("kn"))) === 1)
    }
  }

  test("no-filter wide ORDER BY LIMIT also rewrites") {
    dir
    withLowThreshold {
      val before = LateMaterialization.applied
      val got = sql.ChDdl.execute(spark,
        "SELECT * FROM lm_t ORDER BY k, id LIMIT 3").get.collect()
      assert(LateMaterialization.applied === before + 1)
      val want = spark.sql("SELECT * FROM lm_t ORDER BY k, id LIMIT 3").collect()
      assert(got.map(_.toString).toSeq === want.map(_.toString).toSeq)
    }
  }
}
