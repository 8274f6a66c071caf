package graft.sql

import org.apache.spark.sql.SparkSession

/** Debug tool: execute CH-dialect statements from the command line
  * (each arg is a full statement list) and print rendered output.
  * Not part of the driver contract; see also [[CorpusTriage]].
  *
  * Usage: runMain graft.sql.Repl "SELECT 1" ...
  */
object Repl {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("GRAFT_MASTER", "local[2]"))
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.map { a =>
      if (a.startsWith("@"))
        new String(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get(a.drop(1))), "UTF-8")
      else a
    }.foreach { sql =>
      System.err.println(s"--- ${sql.take(200)}")
      try ChSql.statements(sql).foreach { st =>
        if (sys.env.contains("GRAFT_MARK"))
          println(s"==STMT== ${st.linesIterator.mkString(" ").take(160)}")
        ChDdl.executeRendered(spark, st).foreach(println)
      } catch {
        case e: Throwable =>
          println(s"ERR ${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("")}")
          if (sys.env.contains("GRAFT_REPL_STACK")) e.printStackTrace()
      }
    }
    spark.stop()
  }
}
