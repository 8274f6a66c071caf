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

  test("admin verbs: show tables / describe / processlist") {
    Tables.registerAll(spark, sfDir)
    assert(Admin.showTables(spark).count() > 0)
    val desc = Admin.describeTable(spark, "nation")
      .collect().map(_.getString(0)).toSet
    assert(desc.contains("n_name"))
    assert(Admin.showProcesslist(spark).columns.toSeq === Seq("job_id", "status"))
  }
}
