package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType}

/** IEEE-754 float division — the reference's `/` (FunctionsArithmetic.h
  * DivideFloatingImpl): 1/0 = inf, -1/0 = -inf, 0/0 = nan. Spark's
  * Divide returns NULL on a zero divisor in legacy mode; the dialect
  * swaps analyzed double Divides for this expression so the C
  * semantics (and isFinite/isNaN classification) match.
  */
case class ChFloatDivide(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "ch_fdiv"

  override protected def nullSafeEval(l: Any, r: Any): Any =
    l.asInstanceOf[Double] / r.asInstanceOf[Double]

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (l, r) => s"($l / $r)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ChFloatDivide =
    copy(left = newLeft, right = newRight)
}
