package graft.storage

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** GraphiteMergeTree retention/rollup semantics
  * (dbms/src/DataStreams/GraphiteRollupSortedBlockInputStream.h:29-82,
  * .cpp:14-61): config-driven downsampling of time-series rows
  * (Path, Time, Value, Version) at merge time.
  *
  *  - a PATTERN is chosen per path: first pattern whose regexp
  *    matches, else the default (no-regexp) pattern, else the row
  *    passes through unmodified (selectPatternForPath);
  *  - a PRECISION is chosen per row from the pattern's retention
  *    ladder, ordered by age descending: the first retention whose
  *    `age` the row's data age (timeOfMerge − time) has reached, else
  *    1 = no rounding (selectPrecision);
  *  - time rounds DOWN to the precision — plain multiple-of-precision
  *    under one hour, anchored to the UTC day above it so the date
  *    never changes (roundTimeToPrecision);
  *  - rows with equal (path, time) first dedup to the max-version row
  *    (same rule as ReplacingMergeTree), then rounded-time groups
  *    aggregate the surviving values under the pattern's function,
  *    keeping the group's max version.
  *
  * Spark restatement: the whole fold is two keyed aggregations — a
  * (path, time) max-version dedup and a (path, roundedTime) rollup —
  * both partial/final hash aggs keyed by path-prefixed keys, so each
  * metric's history folds independently and in parallel; no windows,
  * no driver-side state. Pattern/precision selection compiles to a
  * per-row CASE chain evaluated inside whole-stage codegen.
  */
object GraphiteRollup {

  /** age → precision rung (both seconds). */
  final case class Retention(age: Long, precision: Long)

  /** One rollup rule: optional path regexp (None = the `default`
    * section), value aggregate name, retention ladder (kept sorted by
    * age descending — the reference requires this ordering). */
  final case class Pattern(
      regexp: Option[String],
      function: String,
      retentions: Seq[Retention]) {
    def sorted: Pattern = copy(retentions = retentions.sortBy(-_.age))
  }

  /** A named rollup scheme (the `<graphite_rollup>` config element). */
  final case class Params(
      pathCol: String,
      timeCol: String,
      valueCol: String,
      versionCol: String,
      patterns: Seq[Pattern])

  /** Registered configs, keyed by the DDL's config-element-name
    * argument (`ENGINE = GraphiteMergeTree(..., 'graphite_rollup')`).
    * The reference reads these from server XML; here they register
    * programmatically or via [[registerXml]]. */
  private val configs = TrieMap[String, Params]()

  def register(name: String, params: Params): Unit =
    configs.put(name, params.copy(patterns = params.patterns.map(_.sorted)))

  def get(name: String): Option[Params] = configs.get(name)

  /** Parse the reference's XML config format (the
    * `<graphite_rollup>` element of
    * tests/integration_drafts/graphite_merge_tree/config.d/
    * graphite_rollup.xml) with the JDK DOM parser — `<pattern>`
    * sections in document order, `<default>` last with no regexp. */
  def parseXml(xml: String): Params = {
    val doc = javax.xml.parsers.DocumentBuilderFactory.newInstance()
      .newDocumentBuilder()
      .parse(new java.io.ByteArrayInputStream(xml.getBytes("UTF-8")))
    val root0 = doc.getDocumentElement
    val root =
      if (root0.getTagName == "graphite_rollup") root0
      else root0.getElementsByTagName("graphite_rollup").item(0)
        .asInstanceOf[org.w3c.dom.Element]
    def text(e: org.w3c.dom.Element, tag: String, dflt: String): String = {
      val kids = e.getChildNodes
      (0 until kids.getLength).iterator
        .map(kids.item).collectFirst {
          case el: org.w3c.dom.Element if el.getTagName == tag =>
            el.getTextContent.trim
        }.getOrElse(dflt)
    }
    def children(e: org.w3c.dom.Element, tag: String): Seq[org.w3c.dom.Element] = {
      val kids = e.getChildNodes
      (0 until kids.getLength).iterator.map(kids.item).collect {
        case el: org.w3c.dom.Element if el.getTagName == tag => el
      }.toSeq
    }
    def pattern(e: org.w3c.dom.Element, isDefault: Boolean): Pattern =
      Pattern(
        regexp = if (isDefault) None else Some(text(e, "regexp", "")),
        function = text(e, "function", "any"),
        retentions = children(e, "retention").map(r =>
          Retention(text(r, "age", "0").toLong,
            text(r, "precision", "1").toLong))).sorted
    Params(
      pathCol = text(root, "path_column_name", "Path"),
      timeCol = text(root, "time_column_name", "Time"),
      valueCol = text(root, "value_column_name", "Value"),
      versionCol = text(root, "version_column_name", "Version"),
      patterns = children(root, "pattern").map(pattern(_, isDefault = false)) ++
        children(root, "default").map(pattern(_, isDefault = true)))
  }

  def registerXml(name: String, xml: String): Unit =
    register(name, parseXml(xml))

  /** Built-in `graphite_rollup` default, mirroring the scheme of the
    * reference's doc-comment example
    * (GraphiteRollupSortedBlockInputStream.h:50-82): pattern
    * `click_cost` → any with a 0→5s / 1d→60s ladder, default → max
    * with 0→60s / 1h→300s / 1d→3600s. Overridable via [[register]] /
    * [[registerXml]]. */
  register("graphite_rollup", Params(
    pathCol = "Path", timeCol = "Time",
    valueCol = "Value", versionCol = "Version",
    patterns = Seq(
      Pattern(Some("click_cost"), "any",
        Seq(Retention(0, 5), Retention(86400, 60))),
      Pattern(None, "max",
        Seq(Retention(0, 60), Retention(3600, 300), Retention(86400, 3600))))))

  /** Rows for system.graphite (StorageSystemGraphite.cpp:114-121
    * columns: config_name, regexp, function, age, precision,
    * priority, is_default — one row per retention rung). */
  def systemRows: Seq[(String, String, String, Long, Long, Int, Int)] =
    configs.toSeq.sortBy(_._1).flatMap { case (name, p) =>
      p.patterns.zipWithIndex.flatMap { case (pat, i) =>
        val isDefault = pat.regexp.isEmpty
        val priority = if (isDefault) 65535 else i + 1
        pat.retentions.map(r =>
          (name, pat.regexp.getOrElse(""), pat.function,
            r.age, r.precision, priority, if (isDefault) 1 else 0))
      }
    }

  /** Value aggregate for a pattern's declared function name. */
  private def valueAgg(function: String, v: Column, ins: Column): Column =
    function.toLowerCase match {
      case "avg" => avg(v)
      case "sum" => sum(v)
      case "min" => min(v)
      case "max" => max(v)
      case "any" => min_by(v, ins)
      case "anylast" => max_by(v, ins)
      case "count" => count(v).cast("double")
      case other =>
        throw new IllegalArgumentException(s"graphite rollup function: $other")
    }

  /** `roundTimeToPrecision`: ≤ 1 hour rounds the raw epoch down to a
    * multiple; larger precisions anchor to the UTC day so the date
    * part is preserved (the reference anchors to the server zone's
    * day; this engine runs UTC). */
  private def roundTime(time: Column, precision: Column): Column = {
    val t = time.cast("long")
    when(precision <= 3600L, t - t % precision)
      .otherwise {
        val sinceMidnight = t % 86400L
        t - sinceMidnight % precision
      }
  }

  /** The merge fold. `timeOfMerge` is the compaction timestamp
    * (epoch seconds) data ages are measured against. */
  def rollup(df: DataFrame, p: Params, timeOfMerge: Long): DataFrame = {
    val path = col(p.pathCol)
    val time = col(p.timeCol).cast("long")

    // pattern index per row: first matching regexp, default (regexp-
    // less) pattern as fallthrough, null = untouched passthrough
    val patIdx: Column = p.patterns.zipWithIndex.foldRight(
      lit(null).cast("int")) { case ((pat, i), rest) =>
      pat.regexp match {
        case Some(re) => when(path.rlike(re), lit(i)).otherwise(rest)
        case None => lit(i)
      }
    }

    // per-row precision from the matched pattern's ladder (ladders are
    // age-descending, so the first satisfied rung is the oldest)
    val age = lit(timeOfMerge) - time
    val precision: Column = p.patterns.zipWithIndex.foldRight(lit(1L)) {
      case ((pat, i), rest) =>
        // scan oldest rung first (ladders sorted age-descending here,
        // whatever order the config declared)
        val rung = pat.sorted.retentions.foldRight(lit(1L)) { (r, inner) =>
          when(age >= r.age, lit(r.precision)).otherwise(inner)
        }
        when(col("__pat") === i, rung).otherwise(rest)
    }

    // stage 1 — max-version dedup per exact (path, time); ties keep
    // the later part (max insertion order, the reference's last-row
    // rule), via one max_by over a (version, ins) pair. The ORIGINAL
    // pre-shuffle __ins rides through the max_by payload into stage 2
    // — regenerating it after the shuffle would make any/anylast
    // rollups depend on nondeterministic partition assignment, where
    // the reference's merge order is stable for a given part layout
    val keyCols = Seq(p.pathCol, p.timeCol)
    val payload = df.columns.filterNot(keyCols.contains) :+ "__ins"
    val deduped = df
      .withColumn("__ins", monotonically_increasing_id())
      .groupBy(path, col(p.timeCol))
      .agg(max_by(struct(payload.map(col).toIndexedSeq: _*),
        struct(col(p.versionCol), col("__ins"))).as("__row"))
      .select(Seq(path, col(p.timeCol)) ++
        payload.map(c => col(s"__row.$c").as(c)): _*)
      .withColumn("__pat", patIdx)

    // stage 2 — rounded-time rollup for pattern-matched rows
    val matched = deduped.filter(col("__pat").isNotNull)
      .withColumn(p.timeCol, roundTime(time, precision))
    val others = df.columns.filterNot(c =>
      keyCols.contains(c) || c == p.valueCol || c == p.versionCol)
    // the group's value under each distinct pattern function, chosen
    // by the group-constant pattern index (pattern follows path)
    val fns = p.patterns.map(_.function.toLowerCase).distinct
    val valueAggs = fns.map(f =>
      valueAgg(f, col(p.valueCol), col("__ins")).as(s"__v_$f"))
    val aggs = valueAggs ++
      Seq(max(col(p.versionCol)).as(p.versionCol),
        first(col("__pat")).as("__pat")) ++
      others.map(c => min_by(col(c), col("__ins")).as(c))
    val fnOf: Column = p.patterns.zipWithIndex.foldRight(
      lit(p.patterns.headOption.map(_.function.toLowerCase).getOrElse("any"))) {
      case ((pat, i), rest) =>
        when(col("__pat") === i, lit(pat.function.toLowerCase)).otherwise(rest)
    }
    val rolledValue = fns.foldRight(lit(null).cast(
      df.schema(p.valueCol).dataType)) { (f, rest) =>
      when(fnOf === f, col(s"__v_$f").cast(df.schema(p.valueCol).dataType))
        .otherwise(rest)
    }
    val rolled = matched
      .groupBy(path, col(p.timeCol))
      .agg(aggs.head, aggs.tail: _*)
      .withColumn(p.valueCol, rolledValue)
      .select(df.columns.map(col).toIndexedSeq: _*)

    // pattern-less rows pass through the dedup unmodified
    val passthrough = deduped.filter(col("__pat").isNull)
      .select(df.columns.map(col).toIndexedSeq: _*)
    rolled.unionByName(passthrough)
  }
}
