package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.LongType

/** `GROUP BY <literal>` → global aggregate + empty-input guard.
  *
  * The dialect spells keyless aggregates as `GROUP BY '__all'` so an
  * empty input yields an empty result (the reference's Aggregator
  * semantics, ChSql.injectEmptyAggGroup). Semantically right, but the
  * physical aggregate then carries a real grouping key: every row
  * hashes the constant and probes a hash map, and the object-agg path
  * (TypedImperativeAggregate: uniq, quantiles, sequenceMatch) loses
  * its single-buffer no-key fast path — measured ~2× on a 10M-row
  * `uniq(UserID)` (bench43 q5).
  *
  * Rewrite: aggregate with NO grouping (single shared buffer, no
  * per-row probe) plus a `count(1) > 0` guard that restores the
  * empty-input-empty-output contract:
  *
  *   Aggregate(['c], aggs, child)
  *     → Project(aggs, Filter(cnt > 0, Aggregate([], aggs :+ cnt, child)))
  *
  * Spark's own RemoveLiteralFromGroupExpressions keeps one literal
  * exactly because dropping it would change empty-input semantics —
  * this rule spends one extra count to buy the no-key execution path.
  */
object ConstGroupToGlobalAgg extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case Aggregate(Seq(_: Literal), aggs, child, _)
        if !child.isStreaming && aggs.nonEmpty =>
      val cnt = Alias(
        AggregateExpression(Count(Seq(Literal(1))), Complete, isDistinct = false),
        "__keyless_cnt")()
      val inner = Aggregate(Nil, aggs :+ cnt, child)
      Project(aggs.map(_.toAttribute),
        Filter(GreaterThan(cnt.toAttribute, Literal(0L, LongType)), inner))
  }
}
