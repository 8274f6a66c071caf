package graft.sql

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Dev tool: show the translation and full error for one corpus test.
  * Usage: runMain graft.sql.TranslateDebug <testname> */
object TranslateDebug {
  def main(args: Array[String]): Unit = {
    val corpus = "/root/reference/dbms/tests/queries/0_stateless"
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sql = Files.readString(Paths.get(s"$corpus/${args(0)}.sql"))
    ChSql.statements(sql).foreach { st =>
      println(s"--- CH:    $st")
      try {
        println(s"--- SPARK: ${ChSql.translate(st)}")
        ChDdl.executeRendered(spark, st).foreach(r => println(s"--- OUT:\n$r"))
      } catch {
        case e: Throwable =>
          println(s"--- ERR: ${e.getClass.getName}")
          println(Option(e.getMessage).getOrElse("").linesIterator.take(12).mkString("\n"))
          var c: Throwable = e
          while (c.getCause != null) c = c.getCause
          if (c ne e) {
            println(s"--- ROOT: $c")
            c.getStackTrace.take(8).foreach(f => println(s"    $f"))
          }
      }
    }
    spark.stop()
  }
}
