package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DateType, IntegerType, TimestampNTZType}

/** Rewrite `year(d) = N` (and `toYYYYMM(d) = N`) over a DATE column
  * into the equivalent half-open range predicate.
  *
  * The function-wrapped form evaluates row-by-row: it survives
  * Catalyst but arrives at the parquet scan unusable — no
  * PushedFilters entry, no row-group min/max skipping, no partition
  * pruning. The range form `d >= '1996-01-01' AND d < '1997-01-01'`
  * prunes at every level, which is the difference between scanning a
  * year and scanning a century at 100 TB. (The reference gets the
  * same effect from its sparse primary index only for raw-column
  * comparisons — PKCondition.cpp builds ranges from atoms, and
  * toYear is one of its special-cased monotonic functions; this rule
  * is the Spark-side analog of that monotonicity analysis.)
  */
object SargableDates extends Rule[LogicalPlan] {

  private def dateLit(epochDay: Long): Literal =
    Literal(epochDay.toInt, DateType)

  /** [start, end) in epoch days for year y, None when out of range. */
  private def yearRange(y: Int): Option[(Long, Long)] =
    if (y < 1 || y > 9998) None
    else Some((java.time.LocalDate.of(y, 1, 1).toEpochDay,
      java.time.LocalDate.of(y + 1, 1, 1).toEpochDay))

  /** [start, end) for yyyymm, None when not a valid month. */
  private def monthRange(yyyymm: Int): Option[(Long, Long)] = {
    val y = yyyymm / 100
    val m = yyyymm % 100
    if (y < 1 || y > 9998 || m < 1 || m > 12) None
    else {
      val start = java.time.LocalDate.of(y, m, 1)
      Some((start.toEpochDay, start.plusMonths(1).toEpochDay))
    }
  }

  private def litInt(e: Expression): Option[Int] = e match {
    case Literal(v: Int, _) => Some(v)
    case Literal(v: Long, _) if v.isValidInt => Some(v.toInt)
    case Literal(v: Short, _) => Some(v.toInt)
    case _ => None
  }

  private def sargable(d: Expression): Boolean =
    d.dataType == DateType || d.dataType == TimestampNTZType
  // TimestampType (with zone) is excluded: year() of an instant
  // depends on the session zone, so the bound would too

  private def boundLit(d: Expression, epochDay: Long): Literal =
    if (d.dataType == DateType) dateLit(epochDay)
    else Literal(epochDay * 86400L * 1000000L, TimestampNTZType)

  private def asRange(fn: Expression, lit: Expression): Option[Expression] = {
    val bound: Option[(Expression, (Long, Long))] = fn match {
      case Year(d) if sargable(d) =>
        litInt(lit).flatMap(yearRange).map(d -> _)
      // toYYYYMM translates to year(d)*100 + month(d) (ch.toYYYYMM)
      case Cast(Add(Multiply(Year(d1), m100, _), Month(d2), _), IntegerType, _, _)
          if sargable(d1) && d1.semanticEquals(d2) &&
            litInt(m100).contains(100) =>
        litInt(lit).flatMap(monthRange).map(d1 -> _)
      case _ => None
    }
    bound.map { case (d, (start, end)) =>
      And(GreaterThanOrEqual(d, boundLit(d, start)),
        LessThan(d, boundLit(d, end)))
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressionsWithPruning(
      _.containsPattern(org.apache.spark.sql.catalyst.trees.TreePattern.BINARY_COMPARISON)) {
      case eq @ EqualTo(fn, l: Literal) => asRange(fn, l).getOrElse(eq)
      case eq @ EqualTo(l: Literal, fn) => asRange(fn, l).getOrElse(eq)
    }
}
