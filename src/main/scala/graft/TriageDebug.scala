/** Dev tool: show the first failing statement + error per corpus test. */
object TriageDebug {
  def main(args: Array[String]): Unit = {
    val corpus = "/root/reference/dbms/tests/queries/0_stateless"
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.readAllLines(java.nio.file.Paths.get(args(0)))
      .forEach { name =>
        val sql = java.nio.file.Files.readString(
          java.nio.file.Paths.get(s"$corpus/$name.sql"))
        graft.sql.ChDdl.resetSettings()
        try {
          val sts = graft.sql.ChSql.statements(sql)
          var failed = false
          sts.foreach { st =>
            if (!failed) try graft.sql.ChDdl.executeRendered(spark, st)
            catch { case e: Throwable =>
              failed = true
              println(s"### $name STMT: ${st.replace('\n',' ').take(200)}")
              println(s"### $name ERR: ${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").replace('\n',' ').take(300)}")
            }
          }
          if (!failed) println(s"### $name ALL-STATEMENTS-OK (diff is output-level)")
        } catch { case e: Throwable =>
          println(s"### $name SPLIT-ERR: ${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").replace('\n',' ').take(300)}")
        }
      }
    spark.stop()
  }
}
