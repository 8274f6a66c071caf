package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: for every left row (key, t), attach
  * the most recent right row (key, t') with t' ≤ t. The reference has
  * no such operator (SURVEY.md §2.3 — "absent"); it's listed as a
  * beyond-the-reference extension because feature lookups at event
  * time are a training-data staple.
  *
  * Spark-first shape: instead of a per-row range probe (quadratic) or
  * a broadcast of the right side (unbounded), union both sides and
  * carry the right values forward with one `last(…, ignoreNulls)`
  * window — a single shuffle on the key, linear work, no state beyond
  * a partition. Equal timestamps resolve right-before-left, so a
  * same-instant right row is visible to the left row.
  */
object AsOfJoin {
  def apply(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String,
      rightVals: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    // right rows become carrier rows: null left payload, tagged 0
    val rCols = Seq(col(key), col(rightTime).as(leftTime)) ++ rightVals.map(col)
    val rTagged = right.select(rCols: _*).withColumn("__src", lit(0))
    val lTagged = left.withColumn("__src", lit(1))
    val unioned = lTagged.unionByName(rTagged, allowMissingColumns = true)

    val w = Window.partitionBy(col(key))
      .orderBy(col(leftTime), col("__src"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = rightVals.foldLeft(unioned) { (df, v) =>
      df.withColumn(v, last(col(v), ignoreNulls = true).over(w))
    }
    carried.filter(col("__src") === 1)
      .select((leftCols ++ rightVals).map(col): _*)
  }
}
