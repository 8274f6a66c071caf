package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

import graft.functions.{AnyHeavy, QuantileTDigest, QuantileTiming, SipHash64Expr, UniqUpTo, UniqUpToMerge, UniqUpToState}

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
    }),
    // -State / -Merge combinators (first-class aggregate state)
    (FunctionIdentifier("uniq_upto_state"), info("uniq_upto_state"), {
      case Seq(e, Literal(n: Int, _)) => UniqUpToState(e, n)
      case other => throw new IllegalArgumentException(
        s"uniq_upto_state(expr, N literal) expected, got $other")
    }),
    (FunctionIdentifier("uniq_upto_merge"), info("uniq_upto_merge"), {
      case Seq(e, Literal(n: Int, _)) => UniqUpToMerge(e, n)
      case other => throw new IllegalArgumentException(
        s"uniq_upto_merge(expr, N literal) expected, got $other")
    }),
    (FunctionIdentifier("quantile_timing"), info("quantile_timing"), {
      case Seq(e, l) if l.foldable =>
        val level = org.apache.spark.sql.catalyst.expressions.Cast(
          l, org.apache.spark.sql.types.DoubleType).eval(null)
        QuantileTiming(e, level.asInstanceOf[Double])
      case other => throw new IllegalArgumentException(
        s"quantile_timing(expr, level literal) expected, got $other")
    }),
    (FunctionIdentifier("quantile_tdigest"), info("quantile_tdigest"), {
      case Seq(e, l) if l.foldable =>
        val level = org.apache.spark.sql.catalyst.expressions.Cast(
          l, org.apache.spark.sql.types.DoubleType).eval(null)
        QuantileTDigest(e, level.asInstanceOf[Double])
      case other => throw new IllegalArgumentException(
        s"quantile_tdigest(expr, level literal) expected, got $other")
    }))

  /** Idempotent registration into an existing session. */
  def register(spark: SparkSession): Unit =
    descriptors.foreach { case (ident, inf, builder) =>
      spark.sessionState.functionRegistry.registerFunction(ident, inf, builder)
    }
}
