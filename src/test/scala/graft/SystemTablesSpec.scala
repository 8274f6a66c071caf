package graft

import graft.core.{Admin, SystemTables, Tables}

class SystemTablesSpec extends SparkSpec {

  test("system tables register and answer introspection queries") {
    Tables.registerAll(spark, sfDir)
    GraftFunctions.register(spark)
    SystemTables.register(spark)

    assert(spark.sql("SELECT * FROM system_one").collect()(0).getInt(0) === 0)
    assert(spark.sql("SELECT count(*) FROM (SELECT * FROM system_numbers LIMIT 7)")
      .collect()(0).getLong(0) === 7)

    val tables = spark.sql("SELECT name FROM system_tables")
      .collect().map(_.getString(0)).toSet
    assert(Tables.names.toSet.subsetOf(tables))

    val cols = spark.sql(
      "SELECT name FROM system_columns WHERE table = 'lineitem'")
      .collect().map(_.getString(0)).toSet
    assert(cols.contains("l_orderkey") && cols.contains("l_shipdate"))

    val fns = spark.sql("SELECT name FROM system_functions")
      .collect().map(_.getString(0)).toSet
    assert(fns.contains("siphash64") && fns.contains("uniq_upto"))

    assert(spark.sql("SELECT * FROM system_settings WHERE name LIKE 'spark.%'").count() > 0)
    assert(spark.sql("SELECT * FROM system_build_options").count() === 3)
  }

  test("system parts / merges / events / metrics / replicas / async metrics") {
    import graft.storage.MergeTreeTable
    import MergeTreeTable.Spec
    val dir = java.nio.file.Files.createTempDirectory("sysparts").toString
    val path = s"$dir/visits"
    import spark.implicits._
    val df = Seq((1L, "2024-01-05", 10L), (2L, "2024-02-10", 20L))
      .toDF("id", "d", "v")
      .withColumn("month", org.apache.spark.sql.functions.expr("substring(d,1,7)"))
    val spec = Spec(sortKey = Seq("id"), partitionCol = Some("month"))
    MergeTreeTable.write(df, path, spec)
    MergeTreeTable.optimize(spark, path, spec)
    SystemTables.register(spark)

    // parts: one row per parquet file, partition dir surfaced
    val parts = spark.sql(
      "SELECT partition FROM system_parts WHERE table = 'visits'")
      .collect().map(_.getString(0)).toSet
    assert(parts.exists(_.contains("month=2024-01")))
    assert(spark.sql(
      "SELECT * FROM system_parts WHERE bytes_on_disk <= 0").count() === 0)

    // merges: the optimize above is recorded, completed
    val merges = spark.sql(
      "SELECT * FROM system_merges WHERE table = 'visits' AND NOT is_active")
    assert(merges.count() >= 1)

    // events: the merge bumped its counter
    val ev = spark.sql("SELECT value FROM system_events WHERE event = 'Merge'")
      .collect()
    assert(ev.nonEmpty && ev(0).getLong(0) >= 1)

    // metrics / asynchronous_metrics: gauges exist and are sane
    assert(spark.sql(
      "SELECT value FROM system_metrics WHERE metric = 'MemoryTracking'")
      .collect()(0).getLong(0) > 0)
    assert(spark.sql(
      "SELECT value FROM system_asynchronous_metrics WHERE metric = 'NumberOfLogicalProcessorCores'")
      .collect()(0).getDouble(0) >= 1.0)

    // replicas: present, reference-shaped, empty (no replication layer)
    val rep = spark.table("system_replicas")
    assert(rep.columns.toSeq ===
      Seq("database", "table", "is_leader", "is_readonly", "absolute_delay"))
    assert(rep.count() === 0)

    // clusters: one local shard of the default cluster
    val clu = spark.sql(
      "SELECT cluster, shard_num, is_local FROM system_clusters").collect()
    assert(clu.length === 1 && clu(0).getString(0) === "default" &&
      clu(0).getInt(2) === 1)

    // dictionaries: the shipped regions hierarchy with its key type
    val dic = spark.sql(
      "SELECT name, key, element_count FROM system_dictionaries").collect()
    assert(dic.exists(r => r.getString(0) == "regions_hierarchy" &&
      r.getString(1) == "UInt64" && r.getLong(2) > 0))
  }

  test("admin verbs: show tables / describe / processlist") {
    Tables.registerAll(spark, sfDir)
    assert(Admin.showTables(spark).count() > 0)
    val desc = Admin.describeTable(spark, "nation")
      .collect().map(_.getString(0)).toSet
    assert(desc.contains("n_name"))
    assert(Admin.showProcesslist(spark).columns.toSeq === Seq("job_id", "status"))
  }
}
