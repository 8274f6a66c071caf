package graft.plans

import org.apache.spark.sql.catalyst.expressions.{And, ArrayExists, ArrayFilter, ArrayForAll, BinaryArithmetic, BinaryComparison, CaseWhen, Expression, If, LambdaFunction, Not, Or, UnaryMinus}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{BooleanType, NullType, NumericType}

import graft.functions.{BoolToUInt8, UInt8ToBool}

/** The reference dialect has no boolean type: conditions are UInt8
  * and any non-zero number is true (ExpressionAnalyzer / the
  * `if`/`and`/`or` implementations in FunctionsLogical.h take UInt8
  * columns). Spark requires BooleanType in WHERE / HAVING / JOIN ON /
  * CASE WHEN / NOT, so this resolution rule inserts the `!= 0`
  * adapter ([[UInt8ToBool]], codegen'd) wherever a resolved numeric
  * expression sits in a boolean seat:
  *
  *   WHERE 0 · WHERE x%2 · NOT 1 · CASE WHEN 1 THEN … ·
  *   if(number, a, b) · t1 JOIN t2 ON k1 - k2
  *
  * The dialect's function builders already coerce inside if()/and()/
  * or() calls they build themselves; this rule covers the shapes that
  * reach the analyzer through plain SQL parsing instead (corpus tests
  * 00164_not_chain, 00272/00420 `WHERE 0`, 00326/00328 CASE WHEN).
  * Boolean-typed conditions pass through untouched, so the rule is a
  * no-op on standard SQL.
  */
object ChBooleanCoercion extends Rule[LogicalPlan] {

  private def numeric(e: Expression): Boolean =
    e.resolved && (e.dataType match {
      case _: NumericType => true
      case NullType => true // CH: NULL condition filters everything out
      case _ => false
    })

  private def toBool(e: Expression): Expression =
    if (numeric(e)) UInt8ToBool(e) else e

  private def bool(e: Expression): Boolean =
    e.resolved && e.dataType == BooleanType

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperatorsUp {
      case f @ Filter(cond, _) if numeric(cond) =>
        f.copy(condition = UInt8ToBool(cond))
      case j @ Join(_, _, _, Some(cond), _) if numeric(cond) =>
        j.copy(condition = Some(UInt8ToBool(cond)))
      case p =>
        p.transformExpressionsUp {
          case Not(e) if numeric(e) => Not(UInt8ToBool(e))
          case i @ If(pred, _, _) if numeric(pred) =>
            i.copy(predicate = UInt8ToBool(pred))
          case cw @ CaseWhen(branches, _) if branches.exists(b => numeric(b._1)) =>
            cw.copy(branches = branches.map { case (c, v) => (toBool(c), v) })
          case And(l, r) if numeric(l) || numeric(r) => And(toBool(l), toBool(r))
          case Or(l, r) if numeric(l) || numeric(r) => Or(toBool(l), toBool(r))
          // the REVERSE seat: a UInt8 comparison result used as a
          // number (`(x = '0') > 0`, `-(x != y)` — FunctionsComparison
          // results are UInt8 in the reference; corpus 00386)
          case b: BinaryComparison if bool(b.left) && numeric(b.right) =>
            b.withNewChildren(Seq(BoolToUInt8(b.left), b.right))
          case b: BinaryComparison if numeric(b.left) && bool(b.right) =>
            b.withNewChildren(Seq(b.left, BoolToUInt8(b.right)))
          case a: BinaryArithmetic if bool(a.left) || bool(a.right) =>
            a.withNewChildren(Seq(
              if (bool(a.left)) BoolToUInt8(a.left) else a.left,
              if (bool(a.right)) BoolToUInt8(a.right) else a.right))
          case m @ UnaryMinus(c, _) if bool(c) =>
            m.withNewChildren(Seq(BoolToUInt8(c)))
          case m: org.apache.spark.sql.catalyst.expressions.BinaryMathExpression
              if bool(m.left) || bool(m.right) =>
            m.withNewChildren(Seq(
              if (bool(m.left)) BoolToUInt8(m.left) else m.left,
              if (bool(m.right)) BoolToUInt8(m.right) else m.right))
          case m: org.apache.spark.sql.catalyst.expressions.UnaryMathExpression
              if bool(m.child) =>
            m.withNewChildren(Seq(BoolToUInt8(m.child)))
          // predicate lambdas of the higher-order filters
          // (arrayFilter(x -> 0, …), corpus 00067/00182)
          case af @ ArrayFilter(arg, LambdaFunction(f, vs, h)) if numeric(f) =>
            af.copy(function = LambdaFunction(UInt8ToBool(f), vs, h))
          case ae @ ArrayExists(arg, LambdaFunction(f, vs, h), _) if numeric(f) =>
            ae.copy(function = LambdaFunction(UInt8ToBool(f), vs, h))
          case aa @ ArrayForAll(arg, LambdaFunction(f, vs, h)) if numeric(f) =>
            aa.copy(function = LambdaFunction(UInt8ToBool(f), vs, h))
        }
    }
}
