package graft.tools

import scala.collection.concurrent.TrieMap

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Attribution profiler for the heavy-class GROUP BY residual: runs
  * bench43 queries and prints, per run, (a) every physical plan node's
  * SQL metrics — the SketchAgg partial/final nodes carry bypassRows,
  * mergeLoopNs and the sampled fetchNs split, the exchange carries
  * shuffle bytes/time — and (b) per-stage executor totals from the
  * scheduler (run time, shuffle write time, fetch wait). Together they
  * split a query's wall time into scan+partial / exchange write /
  * exchange read+deser / final merge compute, which the r15 verdict
  * asked for ("the remaining ~2-3 s per query is unattributed").
  *
  * Usage: ProfileAgg <qnums-csv> [reps]   env: HITS_PATH,
  * SPARK_GRAFT_CPUS. Results go to stdout (this is an analysis main,
  * not a scored artifact).
  */
object ProfileAgg {
  def main(args: Array[String]): Unit = {
    val qnums = args.headOption.getOrElse("16").split(",").map(_.trim.toInt)
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
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

    // stage totals for the CURRENT run (cleared per run)
    final case class StageRow(name: String, runMs: Long, cpuMs: Long,
        shufWriteMs: Long, fetchWaitMs: Long, recsRead: Long,
        recsWritten: Long, bytesWritten: Long)
    val stages = TrieMap.empty[Int, StageRow]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val m = e.stageInfo.taskMetrics
        if (m != null) stages.put(e.stageInfo.stageId, StageRow(
          e.stageInfo.name.takeWhile(_ != '\n').take(60),
          m.executorRunTime, m.executorCpuTime / 1000000,
          m.shuffleWriteMetrics.writeTime / 1000000,
          m.shuffleReadMetrics.fetchWaitTime,
          m.shuffleReadMetrics.recordsRead,
          m.shuffleWriteMetrics.recordsWritten,
          m.shuffleWriteMetrics.bytesWritten))
      }
    })

    qnums.foreach { n =>
      val q = qs(n - 1)
      println(s"=== q$n: ${q.take(120)}")
      // JIT pre-lap, untimed
      try graft.sql.ChDdl.execute(spark, q).foreach(_.collect()) catch {
        case e: Throwable => println(s"prelap failed: $e")
      }
      (1 to reps).foreach { rep =>
        stages.clear()
        val t0 = System.nanoTime()
        val dfOpt = graft.sql.ChDdl.execute(spark, q)
        dfOpt.foreach(_.collect())
        val wall = (System.nanoTime() - t0) / 1e9
        println(f"--- q$n rep$rep wall=$wall%.3f s")
        dfOpt.foreach { df =>
          df.queryExecution.executedPlan.foreach { node =>
            val ms = node.metrics.toSeq.map { case (k, m) => (k, m.value) }
              .filter(_._2 != 0).sortBy(_._1)
            if (ms.nonEmpty)
              println(s"  [node] ${node.nodeName}: " + ms.map { case (k, v) =>
                if (k.endsWith("Ns") || k == "mergeLoopNs" || k == "fetchNs")
                  f"$k=${v / 1e9}%.3fs"
                else s"$k=$v"
              }.mkString(" "))
          }
        }
        stages.toSeq.sortBy(_._1).foreach { case (id, s) =>
          println(f"  [stage $id] run=${s.runMs / 1000.0}%.2fs " +
            f"cpu=${s.cpuMs / 1000.0}%.2fs shufWrite=${s.shufWriteMs / 1000.0}%.2fs " +
            f"fetchWait=${s.fetchWaitMs / 1000.0}%.2fs recsR=${s.recsRead} " +
            f"recsW=${s.recsWritten} bytesW=${s.bytesWritten} :: ${s.name}")
        }
      }
    }
    CacheKeeper.unpin()
    spark.stop()
  }
}
