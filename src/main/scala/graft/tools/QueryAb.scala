package graft.tools

import org.apache.spark.sql.SparkSession

/** Interleaved A/B of two arbitrary CH-dialect queries over the hits
  * table — the attribution variant of [[AbBench]] (which A/Bs a knob
  * on one query). Used e.g. to split "ORDER BY t LIMIT n" cost into
  * scan+filter vs top-K by pairing the full query against its
  * scan-only reduction in adjacent runs of one warm JVM.
  * Usage: QueryAb <queryA> <queryB> [reps]   env: HITS_PATH,
  * SPARK_GRAFT_CPUS.
  */
object QueryAb {
  def main(args: Array[String]): Unit = {
    val qa = args(0)
    val qb = args(1)
    val reps = args.lift(2).map(_.toInt).getOrElse(4)
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
    def once(q: String): Double = {
      val t0 = System.nanoTime()
      graft.sql.ChDdl.execute(spark, q)
        .foreach(_.write.format("noop").mode("overwrite").save())
      (System.nanoTime() - t0) / 1e9
    }
    Seq(qa, qb).foreach(q => try once(q) catch { case e: Throwable =>
      System.err.println(s"prelap failed: $e") })
    val as = collection.mutable.ArrayBuffer.empty[Double]
    val bs = collection.mutable.ArrayBuffer.empty[Double]
    (1 to reps).foreach { _ => as += once(qa); bs += once(qb) }
    def stats(xs: Seq[Double]): String = {
      val s = xs.sorted
      f"min=${s.head}%.2f med=${s(s.size / 2)}%.2f max=${s.last}%.2f"
    }
    println(s"[qab] A(${stats(as.toSeq)})  B(${stats(bs.toSeq)})  pairs: " +
      as.zip(bs).map { case (a, b) => f"$a%.2f/$b%.2f" }.mkString(" "))
    CacheKeeper.unpin()
    spark.stop()
  }
}
