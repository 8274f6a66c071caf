package graft.sql

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** `GROUP BY … WITH TOTALS` under `max_rows_to_group_by` +
  * `group_by_overflow_mode='any'` + `totals_mode` — the reference's
  * TotalsHavingBlockInputStream.cpp + Aggregator.cpp pipeline
  * (dbms/src/DataStreams/TotalsHavingBlockInputStream.cpp:57-98,
  * dbms/src/Interpreters/Aggregator.cpp:999-1012,
  * dbms/src/Interpreters/InterpreterSelectQuery.cpp:536-542).
  *
  * Reference semantics being reproduced:
  *  - Key admission is checked once per input block (`max_block_size`
  *    rows): the first block after which the hash table holds more than
  *    `max_rows_to_group_by` keys closes the key set; under 'any' mode
  *    already-admitted keys keep aggregating, rows of new keys fold
  *    into a side "overflow row" state — which exists only when
  *    `totals_mode != after_having_exclusive`
  *    (InterpreterSelectQuery.cpp:537-542).
  *  - The totals row is the merge of the aggregate STATES of the
  *    result groups — all of them for `before_having`, only the
  *    HAVING-passing ones otherwise — plus the overflow state when the
  *    mode includes it (`before_having`, `after_having_inclusive`, or
  *    `after_having_auto` when passed/total group ratio reaches
  *    `totals_auto_threshold`). Merging states over groups equals
  *    re-aggregating the union of those groups' input rows, which is
  *    how this evaluator computes it (one extra keyless aggregation —
  *    distributed, no state surgery needed).
  *
  * The block simulation assigns sequential row positions to the input
  * stream, which assumes a deterministic single-stream read order —
  * exactly the regime the reference's own tests pin (`max_threads=1`
  * over ordered `system.numbers`, which this engine's translator maps
  * to a single-slice range). The aggregation itself stays fully
  * distributed: admission marking is a window over the group key, and
  * main/totals are ordinary shuffled aggregations.
  */
object TotalsHaving {

  case class Settings(mode: String, autoThreshold: Double, maxRows: Long,
      blockSize: Long, overflowAny: Boolean)

  /** Route here only for the overflow-interaction regime; plain WITH
    * TOTALS stays on the GROUPING SETS fast path (one aggregation). */
  def applies(stmt: String, s: Settings): Boolean = {
    if (s.maxRows <= 0 || !s.overflowAny) return false
    val q = stmt.trim.stripSuffix(";").trim
    if (!q.take(6).equalsIgnoreCase("SELECT")) return false
    val top = ChSql.maskTop(q)
    // a FROM-less aggregation reads the one-row system.one source —
    // nothing can overflow max_rows_to_group_by, the GROUPING SETS
    // fast path is already exact
    "(?i)\\bWITH\\s+TOTALS\\b".r.findFirstIn(top).isDefined &&
      "(?i)\\bUNION\\b".r.findFirstIn(top).isEmpty &&
      "(?i)\\bFROM\\b".r.findFirstIn(top).isDefined
  }

  private case class Layout(select: Seq[(String, String)], from: String,
      where: Option[String], keyTokens: Seq[String], having: Option[String],
      orderBy: Option[String], limit: Option[Int])

  private def parse(stmt: String): Layout = {
    val q = stmt.trim.stripSuffix(";").trim
    val top = ChSql.maskTop(q)
    def find(re: String): Option[scala.util.matching.Regex.Match] =
      re.r.findFirstMatchIn(top)
    val from = find("(?i)\\bFROM\\b").get
    val where = find("(?i)\\bWHERE\\b")
    val group = find("(?i)\\bGROUP\\s+BY\\b").get
    val totals = find("(?i)\\bWITH\\s+TOTALS\\b").get
    val having = find("(?i)\\bHAVING\\b")
    val order = find("(?i)\\bORDER\\s+BY\\b")
    val limit = find("(?i)\\bLIMIT\\s+(\\d+)\\s*$")
    val tailStops = Seq(having.map(_.start), order.map(_.start),
      limit.map(_.start)).flatten
    def upTo(start: Int, stops: Seq[Int]): String =
      q.substring(start, (stops.filter(_ > start) :+ q.length).min).trim
    val fromTxt = upTo(from.end,
      Seq(where.map(_.start), Some(group.start)).flatten)
    val whereTxt = where.map(w => upTo(w.end, Seq(group.start)))
    val keysTxt = q.substring(group.end, totals.start).trim
    val havingTxt = having.map(h => upTo(h.end,
      Seq(order.map(_.start), limit.map(_.start)).flatten))
    val orderTxt = order.map(o => upTo(o.end, Seq(limit.map(_.start)).flatten))
    val keys = splitTop(keysTxt)
    Layout(ChSql.selectItems(q), fromTxt, whereTxt, keys, havingTxt,
      orderTxt, limit.map(_.group(1).toInt))
  }

  /** Split on depth-0 commas. */
  private def splitTop(s: String): Seq[String] = {
    val out = scala.collection.mutable.Buffer[String]()
    var depth = 0
    var inQ = false
    var start = 0
    s.indices.foreach { i =>
      s(i) match {
        case '\'' => inQ = !inQ
        case '(' if !inQ => depth += 1
        case ')' if !inQ => depth -= 1
        case ',' if !inQ && depth == 0 =>
          out += s.substring(start, i); start = i + 1
        case _ =>
      }
    }
    out += s.substring(start)
    out.map(_.trim).filter(_.nonEmpty).toSeq
  }

  private def norm(s: String): String = s.replaceAll("\\s+", "").toLowerCase

  /** Substitute each key's alias / raw expression text with `__k$i`
    * (HAVING and ORDER BY run against the aggregated frame, where only
    * the key columns exist — ASTSelectQuery resolves the same names
    * against the aggregation keys). */
  private def substKeys(txt: String,
      keys: Seq[(String, Option[String], Int)]): String =
    keys.foldLeft(txt) { case (t, (expr, alias, i)) =>
      val t1 = alias.fold(t)(a =>
        t.replaceAll("(?i)\\b" + java.util.regex.Pattern.quote(a) + "\\b",
          s"__k$i"))
      val p = java.util.regex.Pattern.quote(expr)
      val re = (if (expr.head.isLetterOrDigit || expr.head == '_') "\\b" else "") +
        p + (if (expr.last.isLetterOrDigit || expr.last == '_') "\\b" else "")
      t1.replaceAll("(?i)" + re, s"__k$i")
    }

  def run(spark: SparkSession, stmt: String, s: Settings): DataFrame = {
    val lay = parse(stmt)

    // resolve GROUP BY tokens: an alias of a select item, a select
    // item's literal expression text, or a bare source expression
    val keyInfo: Seq[(String, Option[String], Int)] =
      lay.keyTokens.zipWithIndex.map { case (tok, ix) =>
        val i = ix + 1
        lay.select.indexWhere { case (name, expr) =>
          norm(name) == norm(tok) && norm(name) != norm(expr) } match {
          case a if a >= 0 => (lay.select(a)._2, Some(lay.select(a)._1), i)
          case _ => (tok, None, i)
        }
      }
    val kCols = keyInfo.map { case (_, _, i) => s"__k$i" }
    // which select items ARE keys (rendered from __k$i, defaulted in
    // the totals row); everything else re-aggregates
    val itemRole: Seq[Either[Int, String]] = lay.select.map { case (name, expr) =>
      keyInfo.find { case (ke, al, _) =>
        norm(ke) == norm(expr) || al.exists(a => norm(a) == norm(name)) } match {
        case Some((_, _, i)) => Left(i)
        case None => Right(expr)
      }
    }

    val srcSql = s"SELECT * FROM ${lay.from}" +
      lay.where.map(w => s" WHERE $w").getOrElse("")
    // sequential positions = the reference's single-threaded read
    // order (blocks of max_block_size rows)
    val src = ChSql(spark, srcSql).coalesce(1)
      .withColumn("__pos", monotonically_increasing_id())
    src.createOrReplaceTempView("__th_src")

    val keySel = keyInfo.map { case (e, _, i) => s"($e) AS __k$i" }
      .mkString(", ")
    val keyed = ChSql(spark, s"SELECT *, $keySel FROM __th_src")
      .withColumn("__blk", (col("__pos") / s.blockSize).cast("long"))
    val fb = keyed.withColumn("__fblk",
      min(col("__blk")).over(Window.partitionBy(kCols.map(col): _*)))

    // first block after which the cumulative distinct-key count
    // exceeds max_rows closes the key set (checkLimits runs per block)
    val cum = fb.select((kCols :+ "__fblk").map(col): _*).distinct()
      .groupBy("__fblk").count()
      .withColumn("__cum", sum("count").over(
        Window.orderBy("__fblk")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val bstar: Long = cum.filter(col("__cum") > s.maxRows)
      .agg(min("__fblk")).head() match {
      case r if r.isNullAt(0) => Long.MaxValue
      case r => r.getLong(0)
    }
    val rows = fb.withColumn("__kept", col("__fblk") <= lit(bstar))
    rows.createOrReplaceTempView("__th_rows")

    val mainItems = itemRole.zipWithIndex.map {
      case (Left(ki), ix) => s"__k$ki AS __c${ix + 1}"
      case (Right(expr), ix) => s"($expr) AS __c${ix + 1}"
    }.mkString(", ")
    val havingSql = lay.having
      .map(h => s" HAVING ${substKeys(h, keyInfo)}").getOrElse("")
    val orderSql = lay.orderBy
      .map(o => s" ORDER BY ${substKeys(o, keyInfo)}").getOrElse("")
    val main = ChSql(spark,
      s"SELECT $mainItems FROM __th_rows WHERE __kept " +
        s"GROUP BY ${kCols.mkString(", ")}$havingSql$orderSql")

    // TotalsHavingBlockInputStream.getTotals: which groups' states
    // feed the totals row, and does the overflow state join them
    val kept = rows.filter(col("__kept"))
    val included =
      if (s.mode == "before_having" || lay.having.isEmpty) kept
      else {
        val passedKeys = main.select(itemRole.zipWithIndex.collect {
          case (Left(ki), ix) => col(s"__c${ix + 1}").as(s"__k$ki")
        }: _*).distinct()
        kept.join(passedKeys, kCols, "left_semi")
      }
    val includeOverflow = s.mode match {
      case "after_having_exclusive" => false // overflow state never built
      case "before_having" | "after_having_inclusive" => true
      case "after_having_auto" =>
        val total = kept.select(kCols.map(col): _*).distinct().count()
        val passed = if (lay.having.isEmpty) total else main.count()
        total > 0 && passed.toDouble / total >= s.autoThreshold
      case _ => true
    }
    val totSrc =
      if (includeOverflow) included.unionByName(rows.filter(!col("__kept")))
      else included
    totSrc.createOrReplaceTempView("__th_totsrc")

    val aggItems = itemRole.zipWithIndex.collect {
      case (Right(expr), ix) => s"($expr) AS __c${ix + 1}" }
    val totAgg =
      if (aggItems.isEmpty) spark.range(1).select()
      else ChSql(spark, s"SELECT ${aggItems.mkString(", ")} FROM __th_totsrc")
    // key columns render as type defaults in the totals row (the
    // renderer default-fills NULL there)
    val totRow = itemRole.zipWithIndex.foldLeft(totAgg) {
      case (df, (Left(_), ix)) =>
        df.withColumn(s"__c${ix + 1}",
          lit(null).cast(main.schema(s"__c${ix + 1}").dataType))
      case (df, _) => df
    }.select(main.columns.map(col): _*)

    val limited = lay.limit.fold(main)(main.limit)
    limited.withColumn("__gid", lit(0))
      .unionByName(totRow.withColumn("__gid", lit(1)))
  }
}
