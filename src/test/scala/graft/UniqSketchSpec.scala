package graft

import graft.functions.{UniqSketch, UniqSketchState}

/** The `uniq` adaptive-sampling sketch (UniquesHashSet.h port —
  * UniqSketch.scala): exactness below the thinning threshold,
  * accuracy above it, order/partition-invariant merge, and the
  * sketch-not-exact plan shape for the dialect's uniq(). */
class UniqSketchSpec extends SparkSpec {

  private def freshState(values: Iterator[Long]): UniqSketchState = {
    val s = new UniqSketchState
    values.foreach(v => s.insertHash(UniqSketchState.intHash64(v).toInt))
    s
  }

  test("exact below 2^16 distinct hashes") {
    val s = freshState((0L until 50000L).iterator)
    assert(s.skipDegree == 0)
    assert(s.estimate() == 50000L)
  }

  test("duplicates do not inflate the count") {
    val s = freshState(Iterator.fill(10)(0L until 1000L).flatten)
    assert(s.estimate() == 1000L)
  }

  test("thinned estimate stays within 1% at 1M distinct") {
    val s = freshState((0L until 1000000L).iterator)
    assert(s.skipDegree > 0)
    val est = s.estimate()
    assert(math.abs(est - 1000000L) < 10000L,
      s"estimate $est off by more than 1%")
  }

  test("merge of split parts equals the single-pass state") {
    val single = freshState((0L until 300000L).iterator)
    val parts = (0 until 7).map(p =>
      freshState((0L until 300000L).iterator.filter(_ % 7 == p)))
    val merged = parts.reduce { (a, b) => a.merge(b); a }
    assert(merged.skipDegree == single.skipDegree)
    assert(merged.estimate() == single.estimate())
    assert(merged.set == single.set)
  }

  test("serialization round-trips") {
    val agg = UniqSketch(org.apache.spark.sql.graftbridge.Bridge
      .expression(org.apache.spark.sql.functions.lit(1L)))
    val s = freshState((0L until 200000L).iterator)
    val back = agg.deserialize(agg.serialize(s))
    assert(back.skipDegree == s.skipDegree)
    assert(back.set == s.set)
    assert(back.estimate() == s.estimate())
  }

  test("dialect uniq() plans the sketch, not an exact distinct") {
    import graft.sql.ChSql
    val df = ChSql(spark,
      "SELECT uniq(number) FROM (SELECT number FROM system.numbers LIMIT 1000)")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("uniq_sketch"), s"no sketch aggregate in:\n$plan")
    assert(!plan.toLowerCase.contains("expand"), "exact-distinct Expand found")
    assert(df.collect().head.getLong(0) == 1000L)
  }

  test("uniqState stores a BOUNDED serialized sketch, not the distinct set") {
    import graft.sql.ChSql
    // one group over 1M distinct ids: an exact-set state would be
    // O(n) (~8 MB of values); the sketch state must stay in the
    // ≤256 KB class (1 + 4 + 4·2^16 bytes = 262149 worst case —
    // UniquesHashSet's UNIQUES_HASH_MAX_SIZE bound)
    val df = ChSql(spark,
      "SELECT uniqState(number) AS st FROM " +
        "(SELECT number FROM system.numbers LIMIT 1000000)")
    val state = df.collect().head.getAs[Array[Byte]]("st")
    assert(state.length <= 1 + 4 + 4 * 65536,
      s"state is ${state.length} bytes — not bounded")
    // and the stored state finalizes to the same estimate uniq() gives
    val direct = ChSql(spark,
      "SELECT uniq(number) FROM (SELECT number FROM system.numbers LIMIT 1000000)")
      .collect().head.getLong(0)
    assert(graft.functions.UniqSketchCodec.finalizeEstimate(state) == direct)
  }

  test("uniqState → uniqMerge two-level rollup equals direct uniq") {
    import graft.sql.ChSql
    val merged = ChSql(spark,
      "SELECT uniqMerge(st) FROM (SELECT number % 13 AS k, " +
        "uniqState(number) AS st FROM (SELECT number FROM system.numbers " +
        "LIMIT 100000) GROUP BY k)")
      .collect().head.getLong(0)
    val direct = ChSql(spark,
      "SELECT uniq(number) FROM (SELECT number FROM system.numbers LIMIT 100000)")
      .collect().head.getLong(0)
    assert(merged == direct)
    // exact in the sub-threshold regime (< 2^16 distinct)
    val small = ChSql(spark,
      "SELECT uniqMerge(st) FROM (SELECT number % 13 AS k, " +
        "uniqState(number) AS st FROM (SELECT number FROM system.numbers " +
        "LIMIT 50000) GROUP BY k)")
      .collect().head.getLong(0)
    assert(small == 50000L)
  }

  test("dialect uniq over strings and variadic keys stays exact at small N") {
    import graft.sql.ChSql
    val one = ChSql(spark,
      "SELECT uniq(toString(number % 100)) FROM " +
        "(SELECT number FROM system.numbers LIMIT 10000)")
    assert(one.collect().head.getLong(0) == 100L)
    val many = ChSql(spark,
      "SELECT uniq(number % 10, number % 7) FROM " +
        "(SELECT number FROM system.numbers LIMIT 10000)")
    assert(many.collect().head.getLong(0) == 70L)
  }
}
