package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** `LIMIT n BY cols` — first n rows per key group (reference:
  * dbms/src/DataStreams/LimitByBlockInputStream.cpp, parser
  * Parsers/ASTSelectQuery.h:57-58).
  *
  * Spark-first realization: `row_number()` over a window. The window
  * shuffles once on the partition keys and never materializes more
  * than a partition per task; with a pushed `orderCols` prefix this is
  * the plan Spark itself generates for per-group top-K, so it scales
  * to arbitrarily many groups (no driver-side state).
  */
object LimitBy {
  def apply(df: DataFrame, n: Int, partitionCols: Seq[Column], orderCols: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(partitionCols: _*).orderBy(orderCols: _*)
    val rnCol = "__graft_limit_by_rn"
    df.withColumn(rnCol, row_number().over(w))
      .filter(col(rnCol) <= n)
      .drop(rnCol)
  }
}
