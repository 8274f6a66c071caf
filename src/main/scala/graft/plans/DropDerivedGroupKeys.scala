package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule

/** Drop grouping keys that are deterministic functions of other
  * grouping keys: `GROUP BY x, x - 1, x - 2` groups exactly like
  * `GROUP BY x` — the derived keys add no distinguishing power, but
  * they DO ride every hash-map entry and every shuffle row of the
  * aggregate (benchmark q36 groups a ~full-cardinality ClientIP by
  * four copies of itself: 4× the shuffle payload for nothing).
  *
  * By optimizer time the analyzer's PullOutGroupingExpressions has
  * rewritten complex grouping expressions into `_groupingexpression`
  * attributes aliased in a Project below the Aggregate, so the rule
  * matches that shape: a grouping attribute whose defining alias is
  * deterministic and references only PASS-THROUGH grouping keys is
  * removed from the grouping, and its uses in the aggregate's result
  * expressions are substituted with the defining expression (result
  * expressions may be arbitrary functions of the remaining keys;
  * HashAggregateExec binds them against keys + aggregate buffers).
  * The group partition of the input rows is unchanged — semantics
  * hold for empty input, nulls, everything. */
object DropDerivedGroupKeys extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case agg @ Aggregate(groups, aggs, proj @ Project(projList, _), hint)
        if groups.length > 1 && groups.forall(_.isInstanceOf[Attribute]) =>
      val aliasDefs: Map[ExprId, Expression] = projList.collect {
        case a: Alias => a.exprId -> a.child
      }.toMap
      val groupAttrs = groups.map(_.asInstanceOf[Attribute])
      // keys that are plain pass-through columns (not computed here)
      val baseKeys = AttributeSet(
        groupAttrs.filterNot(k => aliasDefs.contains(k.exprId)))
      val (derived, kept) = groupAttrs.partition { k =>
        aliasDefs.get(k.exprId).exists(e =>
          e.deterministic && e.references.nonEmpty &&
            e.references.subsetOf(baseKeys))
      }
      if (derived.isEmpty) agg
      else {
        val subst: Map[ExprId, Expression] =
          derived.map(k => k.exprId -> aliasDefs(k.exprId)).toMap
        val newAggs: Seq[NamedExpression] = aggs.map { ne =>
          ne.transformUp {
            case a: AttributeReference if subst.contains(a.exprId) =>
              subst(a.exprId)
          } match {
            case named: NamedExpression => named
            // a bare dropped-key reference at the top level becomes
            // its defining expression — re-name it with the ORIGINAL
            // name and exprId so parent plans keep resolving
            case e => Alias(e, ne.name)(exprId = ne.exprId)
          }
        }
        Aggregate(kept, newAggs, proj, hint)
      }
  }
}
