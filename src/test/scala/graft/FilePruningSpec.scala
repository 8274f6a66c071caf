package graft

import org.apache.spark.sql.functions._
import graft.operators.FilePruning

/** Pins for the sparse file index (driver-side footer min/max file
  * pruning, the reference's in-RAM primary-index analog): a selective
  * predicate on the sort column prunes the file LIST itself, results
  * match the unpruned scan exactly, conservative conjuncts keep
  * files, and nothing fires below the file-count threshold. */
class FilePruningSpec extends SparkSpec {

  // 16 files range-partitioned+sorted by k (0..1599 → k = id/100,
  // each file a contiguous k range), a v column uniform
  private lazy val dir = {
    val d = java.nio.file.Files.createTempDirectory("fprune").toString
    spark.range(0, 1600, 1, 4)
      .withColumn("k", (col("id") / lit(100)).cast("long"))
      .withColumn("v", pmod(expr("xxhash64(id, 7)"), lit(1000)))
      .withColumn("d", to_date(lit("2020-01-01")) + col("k").cast("int"))
      .repartitionByRange(16, col("k"))
      .sortWithinPartitions("k")
      .write.mode("overwrite").parquet(s"$d/t.parquet")
    spark.read.parquet(s"$d/t.parquet").createOrReplaceTempView("fp_t")
    d
  }

  private def run(q: String): Array[org.apache.spark.sql.Row] =
    sql.ChDdl.execute(spark, q).get.collect()

  test("selective sort-key predicate prunes the file list; rows match the full scan") {
    dir
    val before = FilePruning.applied
    val got = run("SELECT k, count() AS c FROM fp_t WHERE k = 7 GROUP BY k")
    assert(FilePruning.applied > before, "pruning did not fire")
    assert(FilePruning.lastKept < FilePruning.lastTotal,
      s"kept ${FilePruning.lastKept}/${FilePruning.lastTotal}")
    assert(FilePruning.lastKept <= 2)
    assert(got.map(r => (r.getLong(0), r.getLong(1))).toSeq === Seq((7L, 100L)))
    // range + date forms prune too
    run("SELECT count() AS c FROM fp_t WHERE k >= 14")
    assert(FilePruning.lastKept <= 3)
    val d2 = run("SELECT count() AS c FROM fp_t WHERE d < toDate('2020-01-03')")
    assert(d2.head.getLong(0) === 200L)
    assert(FilePruning.lastKept <= 4)
  }

  test("empty keep-set keeps one file and returns zero rows") {
    dir
    val got = run("SELECT count() AS c FROM fp_t WHERE k = 999")
    // keyless agg + empty input → empty result (reference semantics)
    assert(got.isEmpty)
    assert(FilePruning.lastKept === 1)
  }

  test("conservative: predicates on uniform or unsupported shapes keep all files") {
    dir
    val before = FilePruning.applied
    // uniform column: stats cover the probe value in every file
    val vv = spark.sql("SELECT v FROM fp_t ORDER BY id LIMIT 1")
      .collect()(0).getLong(0)
    val r1 = run(s"SELECT count() AS c FROM fp_t WHERE v = $vv")
    val truth = spark.sql(s"SELECT count(*) FROM fp_t WHERE v = $vv")
      .collect()(0).getLong(0)
    assert(truth > 0 && r1.head.getLong(0) === truth)
    // unsupported conjunct shapes never fire the rewrite
    run("SELECT count() AS c FROM fp_t WHERE k != 3")
    run("SELECT count() AS c FROM fp_t WHERE k + 1 = 8")
    // none of the three removed any file
    assert(FilePruning.applied === before)
  }

  test("partitioned layout (MergeTree month dirs): data-column predicate prunes, partition column is left to Spark") {
    val d = java.nio.file.Files.createTempDirectory("fprune3").toString
    // 4 month partitions × 4 sorted files each, k contiguous per file
    spark.range(0, 1600, 1, 4)
      .withColumn("m", (col("id") % 4).cast("int"))
      .withColumn("k", (col("id") / lit(100)).cast("long"))
      .repartitionByRange(16, col("m"), col("k"))
      .sortWithinPartitions("m", "k")
      .write.mode("overwrite").partitionBy("m").parquet(s"$d/p.parquet")
    spark.read.parquet(s"$d/p.parquet").createOrReplaceTempView("fp_p")
    val before = FilePruning.applied
    val got = run("SELECT count() AS c FROM fp_p WHERE k = 7")
    assert(FilePruning.applied > before, "partitioned pruning did not fire")
    assert(FilePruning.lastKept < FilePruning.lastTotal)
    val truth = spark.sql("SELECT count(*) FROM fp_p WHERE k = 7")
      .collect()(0).getLong(0)
    assert(truth > 0 && got.head.getLong(0) === truth)
    // mixed predicate: partition conjunct ignored by the index but
    // still applied; results exact
    val got2 = run("SELECT count() AS c FROM fp_p WHERE k = 7 AND m = 1")
    val truth2 = spark.sql("SELECT count(*) FROM fp_p WHERE k = 7 AND m = 1")
      .collect()(0).getLong(0)
    if (truth2 == 0) assert(got2.isEmpty)
    else assert(got2.head.getLong(0) === truth2)
    // predicate ONLY on the partition column: no footer pruning fires
    val b2 = FilePruning.applied
    run("SELECT count() AS c FROM fp_p WHERE m = 2")
    assert(FilePruning.applied === b2)
  }

  test("doubles (NaN hazard) and non-micros timestamps never prune") {
    val d = java.nio.file.Files.createTempDirectory("fprune4").toString
    // NaN orders ABOVE every value in Spark, so the only rows matching
    // dd > 100 live in the NaN file — a footer-max-trusting rewrite
    // would prune exactly that file (writers skip/misorder NaN stats)
    spark.range(0, 1600, 1, 4)
      .withColumn("k", (col("id") / lit(100)).cast("long"))
      .withColumn("dd", when(col("k") === 15, lit(Double.NaN))
        .otherwise(col("k").cast("double")))
      .repartitionByRange(16, col("k")).sortWithinPartitions("k")
      .write.mode("overwrite").parquet(s"$d/n.parquet")
    val t = spark.read.parquet(s"$d/n.parquet")
    val before = FilePruning.applied
    val got = FilePruning.maybeRewrite(spark, t.where(col("dd") > 100.0)).count()
    assert(got === 100L, "NaN rows must survive")
    assert(FilePruning.applied === before, "double stats must not prune")
    // TIMESTAMP(MILLIS) writer: footer stats are millis — 1000x below
    // the micros literals Spark compares — so a trusting rewrite would
    // prove EVERY file empty for ts >= x; the encoding check keeps all
    val prevTs = spark.conf.get("spark.sql.parquet.outputTimestampType")
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MILLIS")
    try {
      spark.range(0, 1600, 1, 4)
        .withColumn("k", (col("id") / lit(100)).cast("long"))
        .withColumn("ts", timestamp_seconds(lit(1577836800L) + col("k") * 86400))
        .repartitionByRange(16, col("k")).sortWithinPartitions("k")
        .write.mode("overwrite").parquet(s"$d/m.parquet")
    } finally spark.conf.set("spark.sql.parquet.outputTimestampType", prevTs)
    val tm = spark.read.parquet(s"$d/m.parquet")
    val b2 = FilePruning.applied
    val pred = tm.where(
      col("ts") >= expr(s"timestamp_seconds(${1577836800L + 8 * 86400}L)"))
    val truth = pred.count()
    assert(truth === 800L)
    assert(FilePruning.maybeRewrite(spark, pred).count() === truth)
    assert(FilePruning.applied === b2, "MILLIS stats must not prune")
  }

  test("persisted sidecar: a FRESH session prunes with zero footer opens") {
    import graft.operators.FooterStats
    val d = java.nio.file.Files.createTempDirectory("fprune5").toString
    spark.range(0, 1600, 1, 4)
      .withColumn("k", (col("id") / lit(100)).cast("long"))
      .withColumn("d", to_date(lit("2020-01-01")) + col("k").cast("int"))
      .repartitionByRange(16, col("k")).sortWithinPartitions("k")
      .write.mode("overwrite").parquet(s"$d/t.parquet")
    val conf = spark.sessionState.newHadoopConf()
    FooterStats.writeSidecars(conf, s"$d/t.parquet")
    assert(new java.io.File(s"$d/t.parquet/${FooterStats.SidecarName}").exists())
    // simulate a fresh session: cold in-RAM caches
    FooterStats.clearAllCaches()
    val opens = FooterStats.footerOpens
    val before = FilePruning.applied
    val t = spark.read.parquet(s"$d/t.parquet")
    val got = FilePruning.maybeRewrite(spark, t.where(col("k") === 7)).count()
    assert(got === 100L)
    assert(FilePruning.applied > before, "sidecar-fed pruning did not fire")
    assert(FilePruning.lastKept <= 2)
    assert(FooterStats.footerOpens === opens,
      s"cold planning opened ${FooterStats.footerOpens - opens} footers")
    // metadata-only aggregates answer from the sidecar too
    t.createOrReplaceTempView("fp_side")
    val ma = graft.operators.MetadataAggregate.applied
    val r = sql.ChDdl.execute(spark,
      "SELECT count() AS c, min(k) AS mn, max(k) AS mx, max(d) AS dx FROM fp_side")
      .get.collect()(0)
    assert(graft.operators.MetadataAggregate.applied > ma)
    assert(FooterStats.footerOpens === opens, "metadata agg opened footers")
    assert(r.getLong(0) === 1600L && r.getLong(1) === 0L && r.getLong(2) === 15L)
    assert(r.getDate(3).toString === "2020-01-16")
    // integrity check: a sidecar whose recorded size disagrees with
    // the file on disk (stale index after a rewrite) falls back to
    // the footer — results stay exact, opens become nonzero
    val sidecar = new java.io.File(s"$d/t.parquet/${FooterStats.SidecarName}")
    val doctored = new String(
      java.nio.file.Files.readAllBytes(sidecar.toPath), "UTF-8")
      .replaceAll("\"size\"\\s*:\\s*\\d+", "\"size\" : 1")
    java.nio.file.Files.write(sidecar.toPath, doctored.getBytes("UTF-8"))
    FooterStats.clearAllCaches()
    val o2 = FooterStats.footerOpens
    val got2 = FilePruning.maybeRewrite(spark, t.where(col("k") === 7)).count()
    assert(got2 === 100L)
    assert(FooterStats.footerOpens > o2, "stale sidecar must not be trusted")
  }

  test("month-partitioned layout gets one sidecar per month dir and prunes cold") {
    import graft.operators.FooterStats
    val d = java.nio.file.Files.createTempDirectory("fprune6").toString
    spark.range(0, 1600, 1, 4)
      .withColumn("m", (col("id") % 4).cast("int"))
      .withColumn("k", (col("id") / lit(100)).cast("long"))
      .repartitionByRange(16, col("m"), col("k"))
      .sortWithinPartitions("m", "k")
      .write.mode("overwrite").partitionBy("m").parquet(s"$d/p.parquet")
    val conf = spark.sessionState.newHadoopConf()
    FooterStats.writeSidecars(conf, s"$d/p.parquet")
    val monthDirs = new java.io.File(s"$d/p.parquet").listFiles()
      .filter(_.isDirectory).filter(_.getName.startsWith("m="))
    assert(monthDirs.nonEmpty)
    monthDirs.foreach { md =>
      assert(new java.io.File(md, FooterStats.SidecarName).exists(),
        s"no sidecar in ${md.getName}")
    }
    FooterStats.clearAllCaches()
    val opens = FooterStats.footerOpens
    val before = FilePruning.applied
    val t = spark.read.parquet(s"$d/p.parquet")
    val truth = t.where(col("k") === 7).count()
    val got = FilePruning.maybeRewrite(spark, t.where(col("k") === 7)).count()
    assert(got === truth && truth > 0)
    assert(FilePruning.applied > before)
    assert(FooterStats.footerOpens === opens,
      s"cold partitioned planning opened ${FooterStats.footerOpens - opens} footers")
  }

  test("below the file-count threshold nothing fires") {
    val d = java.nio.file.Files.createTempDirectory("fprune2").toString
    spark.range(0, 100, 1, 2).withColumn("k", col("id") % 10)
      .write.mode("overwrite").parquet(s"$d/s.parquet")
    spark.read.parquet(s"$d/s.parquet").createOrReplaceTempView("fp_s")
    val before = FilePruning.applied
    run("SELECT count() AS c FROM fp_s WHERE k = 1")
    assert(FilePruning.applied === before)
  }
}
