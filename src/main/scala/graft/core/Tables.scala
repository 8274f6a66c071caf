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
    * `events.ts` is parquet TIMESTAMP(NANOS), which Spark's reader
    * rejects; read it as a long (legacy nanosAsLong) and rebuild the
    * timestamp at µs precision (the data is µs-granular, so lossless).
    */
  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events")
      // integer division: `/` would promote to double, whose 256 ns ulp
      // at 2024-epoch magnitudes shifts ~2% of timestamps by 1 µs
      df.withColumn("ts",
        org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
    else df
  }

  /** Register every table as a temp view (the `Database` analog). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => apply(spark, dir, n).createOrReplaceTempView(n))
}
