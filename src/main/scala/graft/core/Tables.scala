package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table catalog over the driver's parquet datasets (TESTDATA.md).
  *
  * The reference models tables as engine-typed `IStorage` instances
  * registered in a `Database` namespace (reference:
  * dbms/src/Storages/IStorage.h, dbms/src/Databases/). Here every
  * table is a parquet scan — Catalyst supplies column pruning,
  * predicate pushdown and partition pruning on top (SURVEY.md §2.1),
  * so the "engine" distinction collapses to read-view semantics
  * implemented in [[graft.storage.MergeTreeTable]].
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Read one table from an sf directory.
    *
    * `events.ts` has shipped as parquet TIMESTAMP(NANOS) in some fixture
    * generations (which Spark's reader rejects without the legacy
    * nanosAsLong conf) and plain timestamp[us] in others. Keep the conf
    * set so a nanos fixture loads as Long, then branch on the type the
    * reader actually produced — rebuild from nanos when Long, cast to
    * the session TimestampType otherwise — so both generations yield an
    * identical µs-granular TimestampType column.
    */
  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types.{LongType, TimestampType}
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events") df.schema("ts").dataType match {
      case LongType =>
        // integer division: `/` would promote to double, whose 256 ns ulp
        // at 2024-epoch magnitudes shifts ~2% of timestamps by 1 µs
        df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampType => df
      case _ => // TimestampNTZType: wall-clock fields are what the engine's
        // DateTime semantics read, so reinterpret in the session zone (UTC)
        df.withColumn("ts", col("ts").cast(TimestampType))
    } else df
  }

  /** Register every table as a temp view (the `Database` analog). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => apply(spark, dir, n).createOrReplaceTempView(n))
}
