package graft.plans

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

import graft.functions.ToTypeName
import graft.types.ChTypeInfer

/** Folds `toTypeName(e)` to its reference-spelled name during
  * ANALYSIS — while the [[graft.functions.ChTypeTag]] markers
  * are still in the tree (the
  * optimizer's ReplaceExpressions erases them; the tags carry UInt
  * and declared-CAST type names). Fires once the
  * argument is fully resolved; a ToTypeName that somehow survives
  * analysis still folds via its own RuntimeReplaceable fallback
  * (Spark-derived spelling). */
object ChTypeNameResolution extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperatorsUp { case p =>
      p.transformExpressionsUp {
        case t @ ToTypeName(c) if c.resolved =>
          Literal.create(ChTypeInfer.name(c),
            org.apache.spark.sql.types.StringType)
      }
    }
}
