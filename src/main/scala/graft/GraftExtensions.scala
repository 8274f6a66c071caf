package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

import graft.functions.{AnyHeavy, SipHash64Expr, UniqUpTo}

/** Function-surface extension (the analog of the reference's
  * FunctionFactory / AggregateFunctionFactory registration,
  * dbms/src/Functions/FunctionFactory.cpp): native expressions and
  * TypedImperativeAggregates become SQL-callable.
  *
  * Two entry points:
  *  - `spark.sql.extensions=graft.GraftExtensions` (injection at
  *    session build, the SparkSessionExtensions path);
  *  - `GraftFunctions.register(spark)` for an existing session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.descriptors.foreach(ext.injectFunction)
}

object GraftFunctions {
  private def info(name: String): ExpressionInfo =
    new ExpressionInfo(classOf[GraftExtensions].getName, name)

  val descriptors: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("siphash64"), info("siphash64"), SipHash64Expr.builder),
    (FunctionIdentifier("uniq_upto"), info("uniq_upto"), {
      case Seq(e, Literal(n: Int, _)) => UniqUpTo(e, n)
      case other => throw new IllegalArgumentException(
        s"uniq_upto(expr, N literal) expected, got $other")
    }),
    (FunctionIdentifier("any_heavy"), info("any_heavy"), {
      case Seq(e) => AnyHeavy(e)
      case other => throw new IllegalArgumentException(
        s"any_heavy(expr) expected, got $other")
    }))

  /** Idempotent registration into an existing session. */
  def register(spark: SparkSession): Unit =
    descriptors.foreach { case (ident, inf, builder) =>
      spark.sessionState.functionRegistry.registerFunction(ident, inf, builder)
    }
}
