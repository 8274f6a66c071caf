package graft.tools

import org.apache.spark.sql.SparkSession

/** Interleaved A/B benchmark for the SketchAgg adaptive bypass.
  *
  * The container drifts (noisy-host windows swing timings 3-6× within
  * one run — see CacheKeeper's header), so back-to-back "5 runs of A
  * then 5 runs of B" measures the drift, not the knob. This main
  * alternates A/B *per run* inside one warm JVM — every pair of
  * adjacent runs shares the host state, so the per-pair delta isolates
  * the knob even when absolute times wander.
  *
  * Usage: AbBench <qnums-csv> [reps] [knob]
  *   knob: "bypass" (default — adaptive bypass on/off) or
  *         "finalmax:<n>" (A = default final-stage group cap,
  *         B = cap n, forcing the sort-based fallback)
  * env: HITS_PATH, SPARK_GRAFT_CPUS.
  * Prints per-query rows with paired runs and min/median per mode.
  */
object AbBench {
  def main(args: Array[String]): Unit = {
    val qnums = args.headOption.getOrElse("16").split(",").map(_.trim.toInt)
    val reps = args.lift(1).map(_.toInt).getOrElse(4)
    val knob = args.lift(2).getOrElse("bypass")
    val defaultFinalMax = graft.operators.SketchAgg.FinalMaxGroups
    val (setA, setB): (() => Unit, () => Unit) = knob match {
      case s if s.startsWith("finalmax:") =>
        val n = s.stripPrefix("finalmax:").toInt
        (() => graft.operators.SketchAgg.FinalMaxGroups = defaultFinalMax,
          () => graft.operators.SketchAgg.FinalMaxGroups = n)
      case "pack" =>
        (() => graft.operators.SketchAgg.packEnabled = true,
          () => graft.operators.SketchAgg.packEnabled = false)
      case s if s.startsWith("maxkeys:") =>
        val n = s.stripPrefix("maxkeys:").toInt
        (() => graft.operators.SketchAgg.MaxKeys = n,
          () => graft.operators.SketchAgg.MaxKeys = 2)
      case "stringkeys" =>
        (() => graft.operators.SketchAgg.StringKeysEnabled = true,
          () => graft.operators.SketchAgg.StringKeysEnabled = false)
      case _ =>
        (() => graft.operators.SketchAgg.bypassEnabled = true,
          () => graft.operators.SketchAgg.bypassEnabled = false)
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val path = sys.env.getOrElse("HITS_PATH", "target/hits100m.parquet")
    val builder0 = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold",
        "1000000")
      .config("spark.ui.enabled", "false")
    val spark = CacheKeeper.benchLocalDir()
      .fold(builder0)(d => builder0.config("spark.local.dir", d))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    CacheKeeper.pin(Seq(path))
    spark.read.parquet(path).createOrReplaceTempView("hits")
    val qs = graft.Bench43.loadQueries()
    def once(q: String): Double = {
      val t0 = System.nanoTime()
      graft.sql.ChDdl.execute(spark, q)
        .foreach(_.write.format("noop").mode("overwrite").save())
      (System.nanoTime() - t0) / 1e9
    }
    // JIT pre-lap in BOTH modes (each compiles different operators)
    qnums.foreach { n =>
      setA()
      try once(qs(n - 1)) catch { case _: Throwable => () }
      setB()
      try once(qs(n - 1)) catch { case _: Throwable => () }
    }
    def stats(xs: Seq[Double]): String = {
      val s = xs.sorted
      val med =
        if (s.size % 2 == 1) s(s.size / 2)
        else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
      f"min=${s.head}%.2f med=$med%.2f max=${s.last}%.2f"
    }
    qnums.foreach { n =>
      val q = qs(n - 1)
      val on = collection.mutable.ArrayBuffer.empty[Double]
      val off = collection.mutable.ArrayBuffer.empty[Double]
      (1 to reps).foreach { _ =>
        setA()
        on += once(q)
        setB()
        off += once(q)
      }
      setA()
      val pairs = on.zip(off)
        .map { case (a, b) => f"$a%.2f/$b%.2f" }.mkString(" ")
      println(f"[ab:$knob] q$n%02d A(${stats(on.toSeq)})  " +
        f"B(${stats(off.toSeq)})  pairs A/B: $pairs")
    }
    CacheKeeper.unpin()
    spark.stop()
  }
}
