package graft

import java.nio.file.{Files, Paths}

import graft.sources.Formats
import graft.sql.ChSql

/** Golden-output run of a supported subset of the reference's own
  * stateless test corpus (dbms/tests/queries/0_stateless — 436 .sql
  * files with .reference expected outputs; runner
  * dbms/tests/clickhouse-test). Each case: translate the CH SQL with
  * [[ChSql]], execute on Spark, render TabSeparated, diff against the
  * shipped .reference file.
  *
  * `ordered=false` marks queries with no top-level ORDER BY — the
  * reference prints them in storage order, which a distributed engine
  * doesn't guarantee, so those compare as sorted line-multisets.
  */
class ChSqlCorpusSpec extends SparkSpec {

  private val corpus = "/root/reference/dbms/tests/queries/0_stateless"

  private val cases: Seq[(String, Boolean)] = Seq(
    ("00001_select_1", true),
    ("00002_system_numbers", true),
    ("00007_array", true),
    ("00008_array_join", true),
    ("00010_big_array_join", true),
    ("00011_array_join_alias", true),
    ("00012_array_join_alias_2", true),
    ("00021_sorting_arrays", true),
    ("00022_func_higher_order_and_constants", true),
    ("00023_agg_select_agg_subquery", true),
    ("00025_implicitly_used_subquery_column", true),
    ("00027_distinct_and_order_by", true),
    ("00041_aggregation_remap", true),
    ("00042_set", true),
    ("00044_sorting_by_string_descending", true),
    ("00045_sorting_by_fixed_string_descending", true))
  // excluded by documented divergence: 00056_join_number_string —
  // this reference version default-fills non-joined columns (0/'')
  // where Spark produces SQL NULLs (ChSql scaladoc).

  cases.foreach { case (name, ordered) =>
    test(s"reference stateless test $name") {
      val sql = Files.readString(Paths.get(s"$corpus/$name.sql"))
      val expected = Files.readString(Paths.get(s"$corpus/$name.reference"))
        .stripLineEnd
      val got = ChSql.statements(sql)
        .map(st => Formats.tabSeparated(ChSql(spark, st)))
        .filter(_.nonEmpty).mkString("\n")
      if (ordered) assert(got === expected)
      else assert(got.linesIterator.toSeq.sorted ===
        expected.linesIterator.toSeq.sorted)
    }
  }
}
