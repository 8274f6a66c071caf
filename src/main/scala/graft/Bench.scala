package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val builder0 = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.GraftExtensions")
    // shuffle/spill on RAM-backed temp — see CacheKeeper.benchLocalDir
    val spark = tools.CacheKeeper.benchLocalDir()
      .fold(builder0)(d => builder0.config("spark.local.dir", d))
      // keep TypedImperativeAggregate GROUP BYs hash-aggregated (the
      // 128-group default silently sorts whole inputs) — same setting
      // as the other entry points
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        "1000000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Keep the inputs page-cache-resident for the WHOLE run: the
    // container pairs an ~11 MB/s cold-read device with a proactive
    // reclaimer that evicts cold pages mid-run; a one-shot warm-up is
    // not enough (the r13 suite ran uniformly ~1.4× inflated). See
    // CacheKeeper's header.
    locally {
      val bytes = tools.CacheKeeper.pin(Seq(sfDir))
      System.err.println(f"[bench] pinned ${bytes / 1e9}%.2f GB from $sfDir")
    }
    // Untimed JIT pre-lap: run EVERY query once (noop sink) before the
    // clock starts. A fresh JVM spends its first dozens of queries
    // JIT-compiling the dialect/codegen/reader paths, inflating
    // early-suite minimums ~3×; the reference baseline is AOT-compiled
    // C++ whose warm-run minimum never includes compiling the engine.
    locally {
      val t0 = System.nanoTime()
      SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (_, fn) =>
        try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        catch { case _: Throwable => () }
      }
      System.err.println(
        f"[bench] JIT pre-lap done in ${(System.nanoTime() - t0) / 1e9}%.1f s")
    }
    // noop sink: forces full evaluation of every output column
    // (count() would let Catalyst prune unused projections and
    // under-measure map-heavy queries).
    // Protocol (r14): three runs per query, scored min-of-three —
    // after the cache pin + JIT pre-lap every run is warm by
    // construction, matching the reference's warm-minimum-on-resident-
    // data convention. Single-run timings could not distinguish a plan
    // regression from scheduler noise; triples make round-over-round
    // deltas meaningful. A failed query records -1, NOT its
    // (milliseconds-fast) time-to-throw: phantom 0.07s "timings" for
    // broken queries deflated the r6 total.
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      def once(): Double = {
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      try {
        val runs = Seq(once(), once(), once())
        (name, runs.min, runs)
      } catch { case e: Throwable =>
        System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
        (name, -1.0, Nil)
      }
    }
    val failed = results.collect { case (n, t, _) if t < 0 => n }
    val total = results.map(_._2).filter(_ >= 0).sum
    // Variance is part of the artifact: min-of-N alone scores noise
    // when a query's runs span >2× (the container has noisy-host
    // windows — see CacheKeeper's header). Each query reports its
    // median and spread (max/min); spread > 2 marks it UNMEASURED —
    // readers should treat its min as a lower bound, not a score.
    def median(runs: Seq[Double]): Double = {
      val s = runs.sorted
      if (s.size % 2 == 1) s(s.size / 2)
      else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
    }
    def spread(runs: Seq[Double]): Double =
      if (runs.isEmpty || runs.min <= 0) -1.0 else runs.max / runs.min
    // min <= 0 = a sub-resolution run: the timer was measured, not the
    // query — unmeasured, same as a >2x spread (the -1 sentinel must
    // not slip past the spread<=2 filter)
    def unmeasurable(runs: Seq[Double]): Boolean =
      runs.nonEmpty && (runs.min <= 0 || runs.max / runs.min > 2.0)
    val unmeasured = results.collect {
      case (n, t, runs) if t >= 0 && unmeasurable(runs) => n
    }
    // Full-name per-query timings (with the raw warm runs + variance)
    // go to a file: the driver's stdout capture keeps only the last
    // 2000 chars, which truncates a 127-query line mid-JSON. The
    // stdout line uses the short qNN ids (unique prefixes of the full
    // names) + 3-decimal seconds so it fits the window and parses.
    val fullQs = results.map { case (k, v, runs) =>
      val rs = runs.map(t => f"$t%.3f").mkString("[", ",", "]")
      val variance =
        if (runs.isEmpty) ""
        else f""","med":${median(runs)}%.3f,"spread":${spread(runs)}%.2f""" +
          (if (unmeasurable(runs)) ""","unmeasured":true""" else "")
      s"\"" + k + "\":{\"sec\":" + v + ",\"runs\":" + rs + variance + "}"
    }.mkString("{", ",", "}")
    val detail = new java.io.File("bench_full.json").getAbsolutePath
    val w = new java.io.PrintWriter(detail, "UTF-8")
    val errArr = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val unmArr = unmeasured.map("\"" + _ + "\"").mkString("[", ",", "]")
    try w.println(
      s"""{"metric":"total_min_warm","value":$total,"unit":"sec","protocol":"JIT pre-lap + 3 runs, min-of-3, inputs cache-pinned; spread=max/min, spread>2 = unmeasured","queries":$fullQs,"errors":$errArr,"unmeasured":$unmArr,"sf":"$sfDir"}""")
    finally w.close()
    val shortQs = results.map { case (k, v, _) =>
      "\"" + k.takeWhile(_ != '_') + "\":" + math.rint(v * 1000) / 1000 }
      .mkString("{", ",", "}")
    val line = s"""{"metric":"total_min_warm","value":$total,"unit":"sec","queries":$shortQs,"errors":${failed.size},"unmeasured":${unmeasured.size},"sf":"$sfDir","detail":"$detail"}"""
    // the exact stdout summary line also lands in its own file so the
    // round artifact can parse it without scraping the sbt log tail
    val sw = new java.io.PrintWriter(
      new java.io.File("bench_summary.json").getAbsolutePath, "UTF-8")
    try sw.println(line) finally sw.close()
    println(line)
    tools.CacheKeeper.unpin()
    spark.stop()
  }
}
