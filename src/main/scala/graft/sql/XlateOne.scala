package graft.sql

import java.nio.file.{Files, Paths}

/** Dev tool: translate one SQL string read from a file (no Spark).
  * Usage: runMain graft.sql.XlateOne /path/to/file.sql */
object XlateOne {
  def main(args: Array[String]): Unit = {
    val sql = Files.readString(Paths.get(args(0)))
    println(ChSql.translate(sql))
  }
}
