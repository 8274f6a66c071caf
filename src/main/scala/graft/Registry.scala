package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One named query: the Spark implementation plus (when SQL-expressible)
  * an equivalent DuckDB oracle query. Non-SQL-expressible operators
  * (sketches, LSH, custom hashes) omit the oracle and get a weaker
  * rows-only check from the driver.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String]) {
  def fnTuple: (String, (SparkSession, String) => DataFrame) = name -> fn
}

/** Central registry aggregated by [[SparkEntry]]. */
object Registry {
  lazy val all: Seq[QueryDef] =
    queries.CoreQueries.defs ++
      queries.FunctionQueries.defs ++
      queries.MergeTreeQueries.defs ++
      queries.TextQueries.defs ++
      queries.SimilarityQueries.defs ++
      queries.ExtensionQueries.defs ++
      queries.ArrayQueries.defs ++
      queries.MiscQueries.defs ++
      queries.MultimodalQueries.defs ++
      queries.StatsQueries.defs ++
      queries.OperatorQueries.defs ++
      queries.HashQueries.defs ++
      queries.PipelineQueries.defs

  lazy val queriesMap: Map[String, (SparkSession, String) => DataFrame] =
    all.map(_.fnTuple).toMap

  lazy val oracleMap: Map[String, String] =
    all.flatMap(d => d.oracle.map(d.name -> _)).toMap
}
