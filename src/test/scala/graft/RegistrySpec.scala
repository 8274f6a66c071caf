package graft

import org.scalatest.funsuite.AnyFunSuite

class RegistrySpec extends AnyFunSuite {
  test("query names are unique") {
    val names = Registry.all.map(_.name)
    assert(names.distinct.size === names.size,
      s"duplicates: ${names.diff(names.distinct)}")
  }

  test("every oracle key has a matching query") {
    assert(Registry.oracleMap.keySet.subsetOf(Registry.queriesMap.keySet))
  }

  test("SparkEntry exposes the registry") {
    assert(SparkEntry.queries.size === Registry.all.size)
    assert(SparkEntry.oracleSql.nonEmpty)
  }

  test("names follow the qNN_slug convention") {
    assert(Registry.all.forall(_.name.matches("q\\d+_[a-z0-9_]+")))
  }

  test("no oracle SQL is null or blank (val-initialization-order guard)") {
    // a QueryDef list declared ABOVE its SQL vals captures null — it
    // surfaced as an NPE inside Verify's json dump, which would have
    // zeroed the whole correctness artifact
    Registry.all.foreach { d =>
      d.oracle.foreach { sql =>
        assert(sql != null && sql.trim.nonEmpty, s"${d.name} oracle is null/blank")
      }
      assert(d.fn != null, s"${d.name} query fn is null")
    }
  }
}
