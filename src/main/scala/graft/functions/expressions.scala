package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Native Catalyst expression for sipHash64 (reference:
  * dbms/src/Functions/FunctionsHashing.h sipHash64) — a codegen'd
  * scalar: `doGenCode` emits a static call, so the hash runs inside
  * whole-stage codegen with no boxing or UDF serialization boundary.
  * Strings implicitly cast to binary (hashing the UTF-8 bytes, which
  * matches the reference hashing the raw string bytes).
  */
case class SipHash64Expr(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes = Seq(BinaryType)
  override def dataType: DataType = LongType
  override def prettyName: String = "siphash64"

  override protected def nullSafeEval(input: Any): Any =
    SipHash64.hash(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SipHash64.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): SipHash64Expr =
    copy(child = newChild)
}

object SipHash64Expr {
  val ident: FunctionIdentifier = FunctionIdentifier("siphash64")
  val info: ExpressionInfo = new ExpressionInfo(
    classOf[SipHash64Expr].getName, "siphash64")
  val builder: Seq[Expression] => Expression = {
    case Seq(e) => SipHash64Expr(e)
    case other => throw new IllegalArgumentException(
      s"siphash64 expects 1 argument, got ${other.size}")
  }
}
