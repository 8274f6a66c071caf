package graft

import org.apache.spark.sql.types.TimestampType
import org.apache.spark.sql.functions.{col, count, max, min}

/** Regression pins for the table reader (`graft.core.Tables`).
  *
  * The driver regenerates /root/testdata between rounds and has shipped
  * `events.ts` both as parquet TIMESTAMP(NANOS) and as timestamp[us];
  * round 6 lost 22 queries at plan time when the reader assumed one
  * generation. These pins read `events` from every sf dir and assert the
  * normalized schema, so a fixture-type flip fails HERE with a clear
  * message instead of as 22 opaque AnalysisExceptions.
  */
class TablesSpec extends SparkSpec {

  private val sfDirs =
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")
      .filter(d => new java.io.File(d).isDirectory)

  test("events.ts loads as TimestampType from every sf dir") {
    assert(sfDirs.nonEmpty, "no testdata dirs found")
    sfDirs.foreach { dir =>
      val ev = graft.core.Tables(spark, dir, "events")
      assert(ev.schema("ts").dataType == TimestampType,
        s"$dir/events.parquet: ts loaded as ${ev.schema("ts").dataType}")
      val row = ev.agg(
        count(col("ts")).as("n"), min(col("ts")).as("lo"), max(col("ts")).as("hi")
      ).head()
      assert(row.getLong(0) > 0, s"$dir: events has no non-null ts rows")
      // sane epoch range: the generator writes 2020s-era timestamps; a
      // mis-scaled nanos/micros rebuild lands decades away
      val lo = row.getTimestamp(1).toInstant.atZone(java.time.ZoneOffset.UTC).getYear
      val hi = row.getTimestamp(2).toInstant.atZone(java.time.ZoneOffset.UTC).getYear
      assert(lo >= 2000 && hi <= 2100, s"$dir: ts range out of epoch ($lo..$hi)")
    }
  }

  test("all catalog tables read and are non-empty at sf0.001") {
    graft.core.Tables.names.foreach { n =>
      val df = graft.core.Tables(spark, sfDir, n)
      assert(df.limit(1).count() == 1, s"$n is empty or unreadable")
    }
  }
}
