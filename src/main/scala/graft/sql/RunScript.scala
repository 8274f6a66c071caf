package graft.sql

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Dev tool: run an arbitrary CH-dialect script file through the
  * ChDdl/ChSql pipeline, printing each statement's rendered output.
  * Usage: runMain graft.sql.RunScript /path/to/script.sql */
object RunScript {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      // keep TypedImperativeAggregate states hash-aggregated (the
      // 128-group sort fallback scrambles per-group input order,
      // which order-sensitive sampler goldens observe — corpus 00273)
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "1000000")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sql = Files.readString(Paths.get(args(0)))
    ChDdl.resetSettings()
    ChSql.statements(sql).foreach { st =>
      println(s">>> $st")
      try ChDdl.executeRendered(spark, st).foreach(println)
      catch {
        case e: Throwable =>
          println(s"ERR ${e.getClass.getSimpleName}: " +
            Option(e.getMessage).getOrElse("").linesIterator.take(4).mkString(" | "))
          var c = e.getCause
          while (c != null) {
            println(s"  CAUSE ${c.getClass.getSimpleName}: " +
              Option(c.getMessage).getOrElse("").linesIterator.take(2).mkString(" | "))
            c = c.getCause
          }
      }
    }
    spark.stop()
  }
}
