package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.functions.{col, concat_ws, lit}
import org.apache.spark.sql.graftbridge.Bridge

/** Two-pass late materialization for wide `ORDER BY … LIMIT n` over a
  * parquet relation — the reference's granule-level column deferral
  * (MergeTreeBaseBlockInputStream.cpp:73-219: PREWHERE reads the
  * filter column first and fetches the remaining columns only for
  * granules with passing rows).
  *
  * Spark's single-pass plan for `SELECT * FROM t WHERE p ORDER BY k
  * LIMIT n` decodes EVERY projected column of EVERY row before
  * TakeOrdered keeps n of them — on a 93-column table that is ~100×
  * the work of the 2-column scan the query actually needs. The
  * rewrite:
  *
  *   pass 1 (narrow, vectorized): scan only filter+order columns plus
  *     the parquet row identity (`_metadata.file_path`,
  *     `_metadata.row_index`), TakeOrdered n → collect ≤ n row ids;
  *   pass 2 (wide, surgical): re-scan ONLY the matched files with the
  *     row_index set pushed into the parquet reader — the page index
  *     skips every page outside the ~n hit rows, so the wide decode
  *     touches a few pages per column instead of whole files. A
  *     residual exact (file,row) pair filter drops cross-file
  *     row_index collisions.
  *
  * Row identity (not a key threshold) makes ties a non-issue: pass 2
  * returns exactly the rows pass 1 chose, which is one of the valid
  * answers of the (tie-nondeterministic) original query.
  *
  * At 100 TB this is the difference between "read the table" and
  * "read n rows": pass 1 is a 2-3 column columnar scan, pass 2 is
  * O(n) pages regardless of table size or file count.
  *
  * Applies only when it can only help: parquet relation ≥ 64 MB,
  * projection ≥ 12 plain columns, deterministic filter/sort without
  * subqueries, n ≤ 2048. Any analysis surprise falls back to the
  * original plan.
  */
object LateMaterialization {

  /** Minimum projected columns for the rewrite to pay — below this a
    * single narrow scan is already close to optimal. */
  val MinProjectWidth = 12
  /** Largest LIMIT worth collecting to the driver / pushing as an
    * In-filter. */
  val MaxLimit = 2048
  /** Smallest relation worth a second scan (below this the whole
    * table decode is cheap anyway). Mutable for tests only. */
  private[graft] var minRelationBytes: Long = 64L << 20

  /** Counter for plan-shape tests: number of rewrites applied. */
  @volatile private[graft] var applied = 0L
  /** Executed plan of the most recent pass 1 — plan-shape tests pin
    * that the narrow scan reads ≤ 3 data columns. */
  @volatile private[graft] var lastPass1Plan: String = ""
  /** Executed plan of the most recent pass 2 (the returned df is
    * consumed by the caller; tests read the pushed row_index here). */
  @volatile private[graft] var lastPass2Plan: String = ""

  def maybeRewrite(spark: SparkSession, df: DataFrame): DataFrame =
    try rewrite(spark, df).getOrElse(df)
    catch { case scala.util.control.NonFatal(_) => df }

  private def stripAlias(p: LogicalPlan): LogicalPlan = p match {
    case s: SubqueryAlias => stripAlias(s.child)
    case v: View => stripAlias(v.child)
    case other => other
  }

  private def clean(e: Expression): Boolean =
    e.deterministic && e.find(_.isInstanceOf[PlanExpression[_]]).isEmpty

  private def unresolve(e: Expression): Expression = e.transformUp {
    case a: AttributeReference => UnresolvedAttribute.quoted(a.name)
  }

  private def rewrite(spark: SparkSession, df: DataFrame): Option[DataFrame] = {
    val plan = df.queryExecution.analyzed
    plan match {
      case GlobalLimit(IntegerLiteral(n),
          LocalLimit(_, Sort(order, true, Project(projList, inner), _)))
          if n > 0 && n <= MaxLimit &&
            projList.length >= MinProjectWidth &&
            projList.forall(_.isInstanceOf[AttributeReference]) &&
            order.nonEmpty && order.forall(clean) =>
        val (condOpt, relTree) = stripAlias(inner) match {
          case Filter(c, r) if clean(c) => (Some(c), stripAlias(r))
          case r => (None, r)
        }
        relTree match {
          case rel @ LogicalRelation(fs: HadoopFsRelation, _, _, _, _)
              if fs.fileFormat.isInstanceOf[ParquetFileFormat] &&
                fs.partitionSchema.isEmpty &&
                fs.sizeInBytes >= minRelationBytes &&
                fs.dataSchema.fieldNames.distinct.length == fs.dataSchema.length &&
                condOpt.forall(_.references.subsetOf(rel.outputSet)) &&
                order.forall(_.references.subsetOf(rel.outputSet)) =>
            run(spark, rel, fs, condOpt, order, n, projList)
          case _ => None
        }
      case _ => None
    }
  }

  private def run(spark: SparkSession, rel: LogicalRelation,
      fs: HadoopFsRelation, condOpt: Option[Expression],
      order: Seq[SortOrder], n: Int,
      projList: Seq[NamedExpression]): Option[DataFrame] = {
    // ---- pass 1: narrow TakeOrdered over (filter+order+row id) ----
    // built directly on the bare relation node (metadata columns do
    // not propagate through View), reusing the resolved filter/sort
    // expressions — exprIds line up because they come from the same
    // analyzed tree
    val src: LogicalPlan = condOpt.fold(rel: LogicalPlan)(Filter(_, rel))
    val metaCols = Seq(
      Alias(UnresolvedAttribute(Seq("_metadata", "file_path")), "__lm_file")(),
      Alias(UnresolvedAttribute(Seq("_metadata", "row_index")), "__lm_row")())
    val orderAttrs = order.flatMap(_.references.toSeq).distinct
    val narrow = Project(metaCols ++ orderAttrs, src)
    val p1 = Project(
      Seq(UnresolvedAttribute("__lm_file"), UnresolvedAttribute("__lm_row")),
      GlobalLimit(Literal(n), LocalLimit(Literal(n),
        Sort(order, global = true, narrow))))
    val p1df = Bridge.ofRows(spark, p1)
    lastPass1Plan = p1df.queryExecution.executedPlan.toString
    val top = p1df.collect()

    // ---- pass 2: page-skipping fetch of exactly those rows ----
    val empty = top.isEmpty
    val files = top.map(_.getString(0)).distinct.toSeq
    val idxs = top.map(_.getLong(1)).distinct.toSeq
    val pairKeys = top.map(r => r.getString(0) + "#" + r.getLong(1)).toSeq
    // carry the original relation's read options (datetimeRebaseMode,
    // int96RebaseMode, …) so the pass-2 read decodes identically —
    // minus the path keys, which conflict with explicit .parquet(paths)
    val carried = fs.options.filter { case (k, _) =>
      val lk = k.toLowerCase; lk != "path" && lk != "paths" }
    val read2 = spark.read.options(carried).schema(fs.dataSchema)
    val base2 =
      if (empty) read2.parquet(fs.location.rootPaths.map(_.toString): _*)
      else read2.parquet(files: _*)
    val fetched =
      if (empty) base2.where(lit(false))
      else base2.where(
        // pushed: the parquet page index skips to the hit rows
        col("_metadata.row_index").isin(idxs: _*) &&
          // residual exact pair check (cross-file index collisions)
          concat_ws("#", col("_metadata.file_path"), col("_metadata.row_index"))
            .isin(pairKeys: _*))
    val sortCols: Seq[Column] = order.map(so =>
      Bridge.column(so.copy(child = unresolve(so.child))))
    val projCols: Seq[Column] = projList.map(a =>
      Bridge.column(UnresolvedAttribute.quoted(a.name)))
    applied += 1
    val out = fetched.orderBy(sortCols: _*).limit(n).select(projCols: _*)
    lastPass2Plan = out.queryExecution.executedPlan.toString
    Some(out)
  }
}
