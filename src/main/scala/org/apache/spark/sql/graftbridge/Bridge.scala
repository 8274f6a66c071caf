package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.{ColumnNodeToExpressionConverter, ExpressionUtils}

/** Column ↔ Expression bridge. `ExpressionUtils` is private[sql], so
  * this one-liner lives in an org.apache.spark.sql subpackage — the
  * supported pattern for extension libraries needing the classic
  * Column internals (no behavior, just visibility).
  *
  * `expression` converts RECURSIVELY via the classic
  * ColumnNodeToExpressionConverter: the lazy `ExpressionUtils
  * .expression` wrapper leaves ColumnNode shims in the tree, which
  * the analyzer accepts from Dataset.select but cannot resolve when
  * the tree is returned from a FunctionRegistry builder.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression =
    ColumnNodeToExpressionConverter(c.node)

  /** The running task's memory-manager page size — what
    * HashAggregateExec hands UnsafeKVExternalSorter; taskMemoryManager
    * is private[spark]. */
  def taskPageSizeBytes(): Long =
    org.apache.spark.TaskContext.get().taskMemoryManager().pageSizeBytes()

  /** The overflow error the codegen ANSI Add path raises
    * (ARITHMETIC_OVERFLOW error class + hint) — QueryExecutionErrors
    * is private[sql]. */
  def arithmeticOverflowError(message: String, hint: String): ArithmeticException =
    org.apache.spark.sql.errors.QueryExecutionErrors
      .arithmeticOverflowError(message, hint, null)

  /** DataFrame from a (transformed) logical plan — Dataset.ofRows is
    * private[sql]. */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
