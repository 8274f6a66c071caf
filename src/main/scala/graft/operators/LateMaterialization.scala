package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{Count, Max, Min}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.functions.lit
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

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
  *   pass 1 (narrow, vectorized): scan only filter+order columns,
  *     TakeOrdered n, and reduce to ONE driver row: the n-th value of
  *     the leading sort key (max for ASC, min for DESC) plus row/null
  *     counts for the safety guards;
  *   pass 2 (wide, pruned): re-run the original plan with the extra
  *     conjunct `leadKey <= t` (ASC; `>=` for DESC). That predicate is
  *     on a plain data column, so it reaches the parquet reader as a
  *     real pushed filter — row-group stats AND the page-level column
  *     index skip everything outside the few pages holding key values
  *     inside the threshold. The final Sort+Limit re-ranks the
  *     surviving superset, so the output is exactly a valid answer of
  *     the (tie-nondeterministic) original query.
  *
  * An earlier version fetched pass-1 rows by (file_path, row_index)
  * identity. That was wrong at scale: a pushed `In(row_index)` filter
  * names a column parquet-mr does not know, so nothing prunes and the
  * "fetch" decodes every matched FILE row-by-row (Batched: false — the
  * metadata struct also kicks the scan off the vectorized reader) —
  * linear in file size, 0.9 s at 10M rows but 5.4 s at 100M. The
  * threshold conjunct prunes by VALUE instead of position: cost tracks
  * the n selected rows (plus boundary-page ties), not the table.
  *
  * Correctness of the threshold: pass 1's TakeOrdered is exact, so
  * every row of some valid top-n answer has leading key ≤ t (ASC).
  * Rows with NULL leading key need care — `k <= t` drops them:
  *   - NULLS FIRST: a null-key row would have been IN pass 1's top-n;
  *     if pass 1 saw none, none exist.
  *   - NULLS LAST: a valid answer contains a null-key row only when
  *     fewer than n non-null rows match; then pass 1's top-n contains
  *     it too.
  *   Either way `count(*) != count(k)` over pass 1's top-n detects the
  *   case and falls back to the single-pass plan.
  *
  * Applies only when it can only help: parquet relation ≥ 64 MB,
  * projection ≥ 12 plain columns, deterministic filter/sort without
  * subqueries, leading sort key is a plain orderable column, n ≤ 2048.
  * Any analysis surprise falls back to the original plan.
  */
object LateMaterialization {

  /** Minimum projected columns for the rewrite to pay — below this a
    * single narrow scan is already close to optimal. */
  val MinProjectWidth = 12
  /** Largest LIMIT worth a threshold pass. */
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
    * consumed by the caller; tests read the pushed threshold here). */
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

  /** Types whose <=/>= comparison against a collected literal is safe
    * AND reaches the parquet reader as a pushed filter. Float/Double
    * stay out: NaN orders above everything in Spark but parquet
    * min/max stats misorder it, so a pushed threshold could prune
    * pages holding NaN rows (same rule as FilePruning/FooterStats). */
  private def thresholdable(t: DataType): Boolean = t match {
    case ByteType | ShortType | IntegerType | LongType | DateType |
        TimestampType | StringType | BooleanType => true
    case _: DecimalType => true
    case _ => false
  }

  private def rewrite(spark: SparkSession, df: DataFrame): Option[DataFrame] = {
    val plan = df.queryExecution.analyzed
    plan match {
      case GlobalLimit(IntegerLiteral(n),
          LocalLimit(_, Sort(order, true, Project(projList, inner), _)))
          if n > 0 && n <= MaxLimit &&
            projList.length >= MinProjectWidth &&
            projList.forall(_.isInstanceOf[AttributeReference]) &&
            order.nonEmpty && order.forall(clean) &&
            order.head.child.isInstanceOf[AttributeReference] &&
            thresholdable(order.head.child.dataType) =>
        val (condOpt, relTree) = stripAlias(inner) match {
          case Filter(c, r) if clean(c) => (Some(c), stripAlias(r))
          case r => (None, r)
        }
        relTree match {
          case rel @ LogicalRelation(fs: HadoopFsRelation, _, _, _, _)
              if fs.fileFormat.isInstanceOf[ParquetFileFormat] &&
                fs.partitionSchema.isEmpty &&
                fs.sizeInBytes >= minRelationBytes &&
                condOpt.forall(_.references.subsetOf(rel.outputSet)) &&
                order.forall(_.references.subsetOf(rel.outputSet)) =>
            run(spark, rel, condOpt, order, n, projList)
          case _ => None
        }
      case _ => None
    }
  }

  private def run(spark: SparkSession, rel: LogicalRelation,
      condOpt: Option[Expression], order: Seq[SortOrder], n: Int,
      projList: Seq[NamedExpression]): Option[DataFrame] = {
    val lead = order.head
    val asc = lead.direction == Ascending
    // ---- pass 1: narrow TakeOrdered n, reduced to one driver row ----
    // built on the resolved filter/sort expressions — exprIds line up
    // because they come from the same analyzed tree
    val src: LogicalPlan = condOpt.fold(rel: LogicalPlan)(Filter(_, rel))
    val orderAttrs = order.flatMap(_.references.toSeq).distinct
    val topn = GlobalLimit(Literal(n), LocalLimit(Literal(n),
      Sort(order, global = true, Project(orderAttrs, src))))
    val keyAlias = Alias(lead.child, "__lm_k")()
    val keyed = Project(Seq(keyAlias), topn)
    val k = keyAlias.toAttribute
    val thrAgg = if (asc) Max(k) else Min(k)
    val p1 = Aggregate(Nil, Seq(
      Alias(thrAgg.toAggregateExpression(), "__lm_t")(),
      Alias(Count(Literal(1)).toAggregateExpression(), "__lm_ca")(),
      Alias(Count(k).toAggregateExpression(), "__lm_ck")()), keyed)
    val p1df = Bridge.ofRows(spark, p1)
    lastPass1Plan = p1df.queryExecution.executedPlan.toString
    // internal row: the threshold literal must carry the EXACT key
    // bytes (a UTF8String→String roundtrip is lossy for non-UTF-8
    // data and could drop true top-n rows)
    val row = p1df.queryExecution.executedPlan.executeCollect()(0)
    val ca = row.getLong(1)
    val ck = row.getLong(2)
    if (ca == 0L) {
      // no matching rows: empty result with the original schema
      applied += 1
      lastPass2Plan = "(empty)"
      return Some(Bridge.ofRows(spark, Project(projList, src))
        .where(lit(false)))
    }
    if (ck != ca || row.isNullAt(0)) return None // null keys in top-n
    // ---- pass 2: original plan + pushed threshold conjunct ----
    val tLit = Literal(row.get(0, lead.child.dataType), lead.child.dataType)
    val cmp: Expression =
      if (asc) LessThanOrEqual(lead.child, tLit)
      else GreaterThanOrEqual(lead.child, tLit)
    val cond2 = condOpt.map(And(_, cmp)).getOrElse(cmp)
    val p2 = GlobalLimit(Literal(n), LocalLimit(Literal(n),
      Sort(order, global = true, Project(projList, Filter(cond2, rel)))))
    applied += 1
    val out = Bridge.ofRows(spark, p2)
    lastPass2Plan = out.queryExecution.executedPlan.toString
    Some(out)
  }
}
