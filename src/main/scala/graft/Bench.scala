package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      // keep TypedImperativeAggregate GROUP BYs hash-aggregated (the
      // 128-group default silently sorts whole inputs) — same setting
      // as the other entry points
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        "1000000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Page-cache warm-up: the container's DAMON-based proactive
    // reclaimer evicts testdata between rounds; single-run timings
    // would otherwise measure disk, not the engine.
    locally {
      val buf = new Array[Byte](1 << 20)
      def streamAll(f: java.io.File): Unit =
        if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(streamAll)
        else if (f.getName.endsWith(".parquet")) {
          val in = new java.io.FileInputStream(f)
          try { while (in.read(buf) >= 0) () } finally in.close()
        }
      try streamAll(new java.io.File(sfDir))
      catch { case _: Throwable => () }
    }
    // Warm the session (codegen, parquet footer cache, executor
    // spin-up) INCLUDING the noop-sink write path — a bare count()
    // warm-up left the first measured query paying ~3s of residual
    // codegen/datasource initialization.
    try queries.CoreQueries.q02(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }
    // noop sink: forces full evaluation of every output column
    // (count() would let Catalyst prune unused projections and
    // under-measure map-heavy queries).
    // A failed query records -1, NOT its (milliseconds-fast) time-to-throw:
    // phantom 0.07s "timings" for broken queries deflated the r6 total.
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}"); false }
      name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
    }
    val failed = results.collect { case (n, t) if t < 0 => n }
    val total = results.map(_._2).filter(_ >= 0).sum
    // Full-name per-query timings go to a file: the driver's stdout
    // capture keeps only the last 2000 chars, which truncates a
    // 94-query line mid-JSON. The stdout line uses the short qNN ids
    // (unique prefixes of the full names) + 3-decimal seconds so it
    // fits the window and parses.
    val fullQs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val detail = new java.io.File("bench_full.json").getAbsolutePath
    val w = new java.io.PrintWriter(detail, "UTF-8")
    val errArr = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    try w.println(
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$fullQs,"errors":$errArr,"sf":"$sfDir"}""")
    finally w.close()
    val shortQs = results.map { case (k, v) =>
      "\"" + k.takeWhile(_ != '_') + "\":" + math.rint(v * 1000) / 1000 }
      .mkString("{", ",", "}")
    val line = s"""{"metric":"total","value":$total,"unit":"sec","queries":$shortQs,"errors":${failed.size},"sf":"$sfDir","detail":"$detail"}"""
    // the exact stdout summary line also lands in its own file so the
    // round artifact can parse it without scraping the sbt log tail
    val sw = new java.io.PrintWriter(
      new java.io.File("bench_summary.json").getAbsolutePath, "UTF-8")
    try sw.println(line) finally sw.close()
    println(line)
    spark.stop()
  }
}
