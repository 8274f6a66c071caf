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
      }
    }
    spark.stop()
  }
}
