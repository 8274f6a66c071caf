package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Two-pass rewrite for `GROUP BY k LIMIT n` with NO ORDER BY — the
  * bench43 q18 shape. Any n COMPLETE groups are a valid answer (the
  * reference's LIMIT over an unsorted aggregation is equally
  * nondeterministic), yet the naive plan aggregates and shuffles the
  * full key space to then discard all but n rows — at 100M rows and
  * ~11M (UserID, SearchPhrase) groups that is a multi-GB shuffle for
  * a 10-row answer.
  *
  *   pass 1 (bounded, one split): read the first `SampleRows` rows'
  *     key columns (LocalLimit stops the scan), take n distinct key
  *     tuples — the candidate groups;
  *   pass 2 (narrow, no wide shuffle): re-run the SAME aggregate
  *     restricted to rows whose key tuple null-safe-equals a
  *     candidate. Counts/sums are EXACT — every row of each chosen
  *     group passes the filter; the aggregation state is n groups.
  *
  * Falls back to the single-pass plan when the sample yields fewer
  * than n distinct keys (few-groups tables — where the original plan
  * is already cheap because partial aggregation collapses) or when
  * anything about the shape is surprising. Scale shape: pass 1 is one
  * task reading one split; pass 2 is a full scan with a codegen'd
  * n-way key filter and an n-group aggregate — no large exchange. */
object LimitAgg {
  /** Largest LIMIT the candidate pass will serve. */
  val MaxLimit = 1024
  /** Pass-1 PER-PARTITION row budgets (LocalLimit semantics — each
    * scan task stops after this many rows, ~one parquet page at the
    * default budget): escalate once before falling back. */
  private[graft] var sampleRows: Seq[Int] = Seq(2000, 100000)

  /** Counter for plan-shape tests. */
  @volatile private[graft] var applied = 0L

  private def atomicKey(t: DataType): Boolean = t match {
    case ByteType | ShortType | IntegerType | LongType | DateType |
        StringType | BooleanType | FloatType | DoubleType |
        TimestampType => true
    case _: DecimalType => true
    case _ => false
  }

  def maybeRewrite(spark: SparkSession, df: DataFrame): DataFrame =
    try rewrite(spark, df).getOrElse(df)
    catch { case scala.util.control.NonFatal(_) => df }

  private def clean(e: Expression): Boolean =
    e.deterministic && e.find(_.isInstanceOf[PlanExpression[_]]).isEmpty

  private def rewrite(spark: SparkSession, df: DataFrame): Option[DataFrame] = {
    val plan = df.queryExecution.analyzed
    plan match {
      case GlobalLimit(IntegerLiteral(n), LocalLimit(_,
          agg @ Aggregate(groupingExprs, resultExprs, child, _)))
          if n > 0 && n <= MaxLimit &&
            groupingExprs.nonEmpty &&
            groupingExprs.forall {
              case a: AttributeReference => atomicKey(a.dataType)
              case _ => false
            } &&
            resultExprs.forall(clean) &&
            child.deterministic && !child.isStreaming =>
        val keys = groupingExprs.map(_.asInstanceOf[AttributeReference])
        run(spark, agg, keys, child, n)
      case _ => None
    }
  }

  private def run(spark: SparkSession, agg: Aggregate,
      keys: Seq[AttributeReference], child: LogicalPlan,
      n: Int): Option[DataFrame] = {
    // ---- pass 1: n distinct key tuples from a bounded prefix ----
    // executeCollect keeps values in INTERNAL form (UTF8String, not
    // java String): a String→UTF8String roundtrip is lossy for
    // non-UTF-8 bytes (legal reference String data), and a lossy
    // candidate literal would silently drop that group from pass 2.
    var candidates: Array[org.apache.spark.sql.catalyst.InternalRow] =
      Array.empty
    val it = sampleRows.iterator
    var enough = false
    while (!enough && it.hasNext) {
      val budget = it.next()
      val sample = Bridge.ofRows(spark,
        LocalLimit(Literal(budget), Project(keys, child)))
      candidates = sample.distinct().limit(n)
        .queryExecution.executedPlan.executeCollect()
      enough = candidates.length >= n
    }
    if (!enough) return None // few groups: single-pass is already cheap
    // ---- pass 2: same aggregate over candidate rows only ----
    val disj: Expression = candidates.map { row =>
      keys.zipWithIndex.map { case (k, i) =>
        val v = if (row.isNullAt(i)) null else row.get(i, k.dataType)
        EqualNullSafe(k, Literal(v, k.dataType)): Expression
      }.reduce(And)
    }.reduce[Expression](Or)
    val p2 = Aggregate(keys, agg.aggregateExpressions, Filter(disj, child))
    applied += 1
    Some(Bridge.ofRows(spark, p2))
  }
}
