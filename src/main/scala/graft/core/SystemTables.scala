package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The reference's system tables (dbms/src/Storages/System — numbers,
  * one, tables, columns, databases, functions, settings, metrics,
  * processes, build_options) as registered views over the Spark
  * catalog and status APIs. Introspection queries a reference user
  * runs (`SELECT * FROM system.tables`) work after
  * `SystemTables.register(spark)` with a `system_` prefix (temp views
  * cannot be schema-qualified).
  */
object SystemTables {

  def register(spark: SparkSession): Unit = {
    import spark.implicits._

    spark.sql("SELECT 0 AS dummy").createOrReplaceTempView("system_one")
    // bounded stand-in for the infinite generator (LocalLimit stops it)
    spark.range(100000000L).toDF("number").createOrReplaceTempView("system_numbers")

    spark.catalog.listTables().toDF()
      .selectExpr("namespace", "name", "tableType", "isTemporary")
      .createOrReplaceTempView("system_tables")

    val cols = spark.catalog.listTables().collect()
      .filter(t => t.name != "system_columns" && !t.name.startsWith("system_"))
      .flatMap { t =>
        scala.util.Try(spark.table(t.name).schema.fields.map(f =>
          (t.name, f.name, f.dataType.simpleString, f.nullable))).getOrElse(Array())
      }.toSeq
    cols.toDF("table", "name", "type", "nullable")
      .createOrReplaceTempView("system_columns")

    spark.catalog.listDatabases().toDF()
      .selectExpr("name", "locationUri")
      .createOrReplaceTempView("system_databases")

    spark.sessionState.functionRegistry.listFunction()
      .map(f => f.funcName).sorted.toDF("name")
      .createOrReplaceTempView("system_functions")

    spark.conf.getAll.toSeq.toDF("name", "value")
      .createOrReplaceTempView("system_settings")

    val tracker = spark.sparkContext.statusTracker
    tracker.getActiveJobIds().toSeq
      .map(id => (id, tracker.getJobInfo(id).map(_.status().toString).getOrElse("UNKNOWN")))
      .toDF("job_id", "status")
      .createOrReplaceTempView("system_processes")

    Seq(
      ("spark_version", spark.version),
      ("scala_version", scala.util.Properties.versionNumberString),
      ("java_version", System.getProperty("java.version")))
      .toDF("name", "value")
      .createOrReplaceTempView("system_build_options")
  }
}

/** DDL/admin verbs (InterpreterFactory.cpp dispatch): SHOW TABLES /
  * DESCRIBE / SHOW PROCESSLIST / KILL QUERY / OPTIMIZE. */
object Admin {
  def showTables(spark: SparkSession): DataFrame = {
    SystemTables.register(spark)
    spark.table("system_tables")
  }

  def describeTable(spark: SparkSession, name: String): DataFrame =
    spark.sql(s"DESCRIBE TABLE $name")

  def showProcesslist(spark: SparkSession): DataFrame = {
    SystemTables.register(spark)
    spark.table("system_processes")
  }

  /** KILL QUERY ≈ cancel the job group that ran it. */
  def killQuery(spark: SparkSession, group: String): Unit =
    spark.sparkContext.cancelJobGroup(group)

  /** OPTIMIZE TABLE — explicit compaction of a MergeTree path. */
  def optimize(spark: SparkSession, path: String,
      spec: graft.storage.MergeTreeTable.Spec): Unit =
    graft.storage.MergeTreeTable.optimize(spark, path, spec)

  /** The `extremes=1` side channel (IProfilingBlockInputStream):
    * a (min, max) row pair over every numeric column of a result. */
  def extremes(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    val numeric = df.schema.fields.filter(f =>
      f.dataType.isInstanceOf[org.apache.spark.sql.types.NumericType]).map(_.name)
    require(numeric.nonEmpty, "extremes: no numeric columns")
    val mins = df.groupBy().agg(min(col(numeric.head)).as(numeric.head),
      numeric.tail.map(c => min(col(c)).as(c)).toIndexedSeq: _*)
      .withColumn("extreme", lit("min"))
    val maxs = df.groupBy().agg(max(col(numeric.head)).as(numeric.head),
      numeric.tail.map(c => max(col(c)).as(c)).toIndexedSeq: _*)
      .withColumn("extreme", lit("max"))
    mins.unionByName(maxs).select(("extreme" +: numeric.toIndexedSeq).map(col): _*)
  }
}
