package graft.sql

import java.io.File
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

import graft.sources.Formats

/** Triage tool: run every reference stateless test through [[ChSql]]
  * and report which match their .reference goldens. Used to grow the
  * pinned set in ChSqlCorpusSpec; not part of the driver contract.
  *
  * Usage: runMain graft.sql.CorpusTriage [substringFilter]
  */
object CorpusTriage {
  private val corpus = "/root/reference/dbms/tests/queries/0_stateless"

  // features we knowingly don't support in the translator yet, plus
  // tests that are nondeterministic by construction (now()/rand) or
  // pin algorithm-specific sketch values (uniq* HLL registers)
  private val skipMarkers = Seq(
    "zookeeper",
    "FORMAT Pretty", "FORMAT TabSeparatedRaw", "FORMAT RowBinary",
    "extremes", "SAMPLE",
    "sleep", "now()", "today()", "yesterday()", "rand",
    "replicate",
    "dict", "region", "OLAP")

  def main(args: Array[String]): Unit = {
    val filter = args.headOption.getOrElse("")
    // bounded, sweepable shuffle workspace (a full sweep once left
    // 55 GB of orphaned blockmgr dirs in /tmp)
    val localDir = new java.io.File(
      sys.props("java.io.tmpdir"), "graft-spark-local")
    localDir.mkdirs()
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.local.dir", localDir.getAbsolutePath)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // filter: substring match, or `@/path/to/file` with one test name
    // per line (used to sweep exactly the unpinned set)
    val nameMatch: String => Boolean =
      if (filter.startsWith("@")) {
        val names = Files.readAllLines(Paths.get(filter.drop(1)))
          .toArray(Array.empty[String]).map(_.trim).filter(_.nonEmpty).toSet
        n => names.contains(n.stripSuffix(".sql"))
      } else _.contains(filter)
    val files = new File(corpus).listFiles()
      .filter(f => f.getName.endsWith(".sql") && nameMatch(f.getName))
      .sortBy(_.getName)
    var pass, fail, skip = 0
    files.foreach { f =>
      val name = f.getName.stripSuffix(".sql")
      val refFile = new File(corpus, s"$name.reference")
      val sql = Files.readString(f.toPath)
      if (!refFile.exists() || skipMarkers.exists(sql.contains)) { skip += 1 }
      else {
        val expected = Files.readString(refFile.toPath).stripLineEnd
        ChDdl.resetSettings() // SET never leaks across files
        try {
          val fut = scala.concurrent.Future {
            ChSql.statements(sql)
              .flatMap(st => ChDdl.executeRendered(spark, st))
              .mkString("\n")
          }(scala.concurrent.ExecutionContext.global)
          val got = scala.concurrent.Await.result(fut,
            scala.concurrent.duration.Duration(240, "s"))
          if (got == expected) { println(s"PASS $name"); pass += 1 }
          else if (got.linesIterator.toSeq.sorted == expected.linesIterator.toSeq.sorted) {
            println(s"PASS-UNORDERED $name"); pass += 1
          } else {
            println(s"DIFF $name")
            if (args.length > 1) { // verbose: first differing lines
              val g = got.linesIterator.toSeq; val e = expected.linesIterator.toSeq
              val i = g.zipAll(e, "<EOF>", "<EOF>").indexWhere(p => p._1 != p._2)
              println(s"  at line ${i + 1} (got ${g.length} lines, want ${e.length}):")
              (i until math.min(i + 3, math.max(g.length, e.length))).foreach { j =>
                println(s"  got:  ${g.lift(j).getOrElse("<EOF>").take(160)}")
                println(s"  want: ${e.lift(j).getOrElse("<EOF>").take(160)}")
              }
            }
            fail += 1
          }
        } catch {
          case e: Throwable =>
            println(s"ERR  $name: ${e.getClass.getSimpleName} ${Option(e.getMessage).getOrElse("").linesIterator.take(1).mkString.take(100)}")
            fail += 1
        }
      }
    }
    println(s"\npass=$pass fail=$fail skip=$skip")
    spark.stop()
  }
}
