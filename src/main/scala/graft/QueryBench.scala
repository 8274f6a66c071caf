package graft

import org.apache.spark.sql.SparkSession

/** Dev micro-benchmark: run ONE registered query repeatedly in a warm
  * JVM, printing per-run wall time. `Bench` measures the whole suite
  * cold; this isolates a single query from JIT/scheduler noise when
  * iterating on its plan.
  *
  * Usage: runMain graft.QueryBench <query-prefix> [sfDir] [reps]
  */
object QueryBench {
  def main(args: Array[String]): Unit = {
    val prefix = args.headOption.getOrElse(
      sys.error("usage: QueryBench <query-prefix> [sfDir] [reps]"))
    val dir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(2).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder0 = SparkSession.builder()
      .appName("graft-qbench").master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toInt)
      .config("spark.ui.enabled", value = false)
    // shuffle/spill on RAM-backed temp — see CacheKeeper.benchLocalDir
    val spark = tools.CacheKeeper.benchLocalDir()
      .fold(builder0)(d => builder0.config("spark.local.dir", d))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    tools.CacheKeeper.pin(Seq(dir)) // see CacheKeeper header
    val hits = SparkEntry.queries.keys.filter(_.startsWith(prefix)).toSeq.sorted
    require(hits.nonEmpty, s"no registered query starts with '$prefix'")
    hits.foreach { name =>
      (1 to reps).foreach { i =>
        val t0 = System.nanoTime()
        val n = SparkEntry.queries(name)(spark, dir).count()
        println(f"[qbench] $name run$i rows=$n sec=${(System.nanoTime() - t0) / 1e9}%.3f")
      }
    }
    spark.stop()
  }
}
