package graft

import org.apache.spark.sql.functions._

import graft.functions.{BloomBcCache, SipHash64}

class CustomFunctionSpec extends SparkSpec {
  import spark.implicits._

  // Vectors generated from an independent from-spec SipHash-2-4
  // implementation (k0=k1=0).
  private val vectors = Seq(
    "" -> 2202906307356721367L,
    "a" -> -7583489610679606711L,
    "abc" -> 4596069200710135518L,
    "1234567" -> -611409910009243023L,
    "12345678" -> 6766637294834280856L,
    "123456789" -> 620596589959453183L,
    "Hello, world!" -> -5886168601705459377L,
    "the quick brown fox" -> 6125279140737828478L)

  test("SipHash64.hash matches spec vectors") {
    vectors.foreach { case (s, expected) =>
      assert(SipHash64.hash(s.getBytes("UTF-8")) === expected, s"input '$s'")
    }
  }

  test("siphash64 is SQL-callable and codegen evaluates the same values") {
    GraftFunctions.register(spark)
    val df = vectors.map(_._1).toDF("s")
      .repartition(3) // force distributed evaluation
      .selectExpr("s", "siphash64(s) AS h")
    val got = df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    vectors.foreach { case (s, expected) => assert(got(s) === expected) }
  }

  test("uniq_upto saturates at n+1") {
    GraftFunctions.register(spark)
    val df = (1 to 100).map(i => ("many", i.toLong)) ++ (1 to 5).map(i => ("few", i.toLong))
    val got = df.toDF("k", "v").repartition(4)
      .groupBy("k").agg(expr("uniq_upto(v, 10) AS u"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got("many") === 11L)
    assert(got("few") === 5L)
  }

  test("any_heavy finds the majority value across partitions") {
    GraftFunctions.register(spark)
    val rows = Seq.fill(60)("dominant") ++ (1 to 40).map(i => s"noise$i")
    val got = rows.toDF("v").repartition(8)
      .agg(expr("any_heavy(v) AS h")).collect()(0).getString(0)
    assert(got === "dominant")
  }

  test("state + merge equals direct aggregation (-State/-Merge combinators)") {
    GraftFunctions.register(spark)
    val df = (1 to 300).map(i => (i % 3, i.toLong % 70)).toDF("g", "v").repartition(6)
    val direct = df.groupBy("g").agg(expr("uniq_upto(v, 10) AS u"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val viaState = df.withColumn("sub", col("v") % 5)
      .groupBy("g", "sub").agg(expr("uniq_upto_state(v, 10) AS st"))
      .groupBy("g").agg(expr("uniq_upto_merge(st, 10) AS u"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(viaState === direct)
  }

  test("quantile_timing: exact below 1024, binned to 16ms, clamped at 30s") {
    GraftFunctions.register(spark)
    def qt(vals: Seq[Long], level: Double): Long =
      vals.toDF("v").repartition(4)
        .agg(expr(s"quantile_timing(v, CAST($level AS DOUBLE)) AS q"))
        .collect()(0).getLong(0)
    // medium regime (count ≤ 5672): raw values kept, the
    // n = floor(level·count) sorted index, as QuantileTimingMedium
    assert(qt(1L to 100L, 0.5) === 51L)           // sorted[50] of 1..100
    assert(qt(1L to 100L, 0.9) === 91L)
    assert(qt(Seq(2005L), 0.5) === 2005L)          // tiny/medium keep raw values
    assert(qt(Seq(50000L, 60000L), 0.5) === 30000L) // clamp
    assert(qt(Seq(-5L, -1L, 3L), 0.5) === 0L)      // negatives count as 0
    // large regime (count > 5672): 16 ms bucket reported via the
    // jittered representative — indexInBigToValue(61) = 1024 + 61·16
    // + (intHash32(61) % 16 − 8) = 2000 + 6 (AggregateFunction-
    // QuantileTiming.h:261-265)
    assert(qt(Seq.fill(6000)(2005L), 0.5) === 2006L)
  }

  test("quantile_tdigest: within 1% rank error of exact quantiles") {
    GraftFunctions.register(spark)
    val n = 100000
    val df = (1 to n).map(_.toDouble).toDF("v").repartition(8)
    Seq(0.5, 0.9, 0.99).foreach { level =>
      val got = df.agg(expr(s"quantile_tdigest(v, CAST($level AS DOUBLE)) AS q"))
        .collect()(0).getDouble(0)
      val exact = level * n
      assert(math.abs(got - exact) / n < 0.01,
        s"level $level: got $got, exact $exact")
    }
  }

  test("quantile_exact_weighted: weighted multiset rule, distributed merge") {
    GraftFunctions.register(spark)
    // multiset {1×1, 2×2, 3×3, 4×4}: Σw=10, p50 threshold=5 → cum(1)=1,
    // cum(2)=3, cum(3)=6 ≥ 5 → 3.0; p90 threshold=9 → 4.0
    val df = Seq((1.0, 1L), (2.0, 2L), (3.0, 3L), (4.0, 4L)).toDF("v", "w")
      .repartition(3)
    val r = df.agg(
      expr("quantile_exact_weighted(v, w, CAST(0.5 AS DOUBLE)) AS p50"),
      expr("quantile_exact_weighted(v, w, CAST(0.9 AS DOUBLE)) AS p90")).collect()(0)
    assert(r.getDouble(0) === 3.0)
    assert(r.getDouble(1) === 4.0)
  }

  test("quantile_timing_weighted: weight multiplies bucket counts") {
    GraftFunctions.register(spark)
    // {10×1, 20×9}: Σw = 10 ≤ 31 → tiny regime, sorted[floor(0.5·10)] = 20
    val df = Seq((10L, 1L), (20L, 9L)).toDF("ms", "w").repartition(2)
    val r = df.agg(expr("quantile_timing_weighted(ms, w, CAST(0.5 AS DOUBLE)) AS p50"))
      .collect()(0)
    // Float32 result like the reference's getFloat
    assert(r.getFloat(0) === 20f)
    // tiny keeps raw values: {2005×10} → 2005, not the bucket base
    val tiny = Seq((2005L, 10L)).toDF("ms", "w")
      .agg(expr("quantile_timing_weighted(ms, w, CAST(0.5 AS DOUBLE)) AS p50"))
      .collect()(0)
    assert(tiny.getFloat(0) === 2005f)
    // Σw > 31 goes STRAIGHT to the large histogram — the weighted
    // variant never uses medium (QuantileTiming::insertWeighted →
    // tinyToLarge, AggregateFunctionQuantileTiming.h:611) — so the
    // same value under weight 40 reports bucket 61's jittered
    // representative 2000 + 6
    val large = Seq((2005L, 40L)).toDF("ms", "w")
      .agg(expr("quantile_timing_weighted(ms, w, CAST(0.5 AS DOUBLE)) AS p50"))
      .collect()(0)
    assert(large.getFloat(0) === 2006f)
  }

  test("quantile_deterministic: exact below reservoir capacity, stable and sane above") {
    GraftFunctions.register(spark)
    // 1..1001 fits the 8192-slot reservoir → interpolated quantile is
    // the exact continuous quantile
    val small = (1 to 1001).map(i => (i.toDouble, i.toLong)).toDF("v", "d").repartition(4)
    val r = small.agg(expr("quantile_deterministic(v, d, CAST(0.5 AS DOUBLE)) AS p50"))
      .collect()(0)
    assert(r.getDouble(0) === 501.0)
    // 100k values overflows the reservoir → deterministically thinned
    // sample; the median must stay within 2% rank error and repeat runs
    // must agree exactly (the function's defining property)
    val big = (1 to 100000).map(i => (i.toDouble, i.toLong)).toDF("v", "d").repartition(8)
    val q1 = big.agg(expr("quantile_deterministic(v, d, CAST(0.5 AS DOUBLE)) AS p50"))
      .collect()(0).getDouble(0)
    val q2 = big.agg(expr("quantile_deterministic(v, d, CAST(0.5 AS DOUBLE)) AS p50"))
      .collect()(0).getDouble(0)
    assert(math.abs(q1 - 50000.0) / 100000.0 < 0.02, s"rank error too big: $q1")
    assert(q1 === q2, "same data + same partitioning must give identical results")
  }

  test("region dictionary: chain walks, reflexive regionIn, unknown ids") {
    import graft.functions.RegionDict
    // fixture: city 1017 → area 103 → country 11 → continent 2
    assert(RegionDict.toType(1017L, RegionDict.City) === 1017L)
    assert(RegionDict.toType(1017L, RegionDict.Area) === 103L)
    assert(RegionDict.toType(1017L, RegionDict.Country) === 11L)
    assert(RegionDict.toType(1017L, RegionDict.Continent) === 2L)
    assert(RegionDict.toType(103L, RegionDict.City) === 0L) // no walk down
    assert(RegionDict.toType(999999L, RegionDict.Country) === 0L) // unknown
    assert(RegionDict.hierarchy(1017L).toSeq === Seq(1017L, 103L, 11L, 2L))
    assert(RegionDict.hierarchy(999999L).isEmpty)
    assert(RegionDict.isIn(1017L, 1017L)) // reflexive
    assert(RegionDict.isIn(1017L, 2L))
    assert(!RegionDict.isIn(1017L, 1L))
    // SQL surface
    GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT regionToCountry(1005L) AS c, regionIn(1005L, 1L) AS i,
        |  dictIsIn('regions', 1005L, 10L) AS d""".stripMargin).collect()(0)
    assert(r.getLong(0) === 10L)
    assert(r.getInt(1) === 1)
    assert(r.getInt(2) === 1)
  }

  test("sequenceMatch pattern DSL with time conditions") {
    import graft.functions.SequencePattern
    def run(pat: String, events: Seq[(Long, Long)], conds: Int = 2): Boolean = {
      val a = SequencePattern.parse(pat, conds)
      val sorted = events.sortBy(identity)
      SequencePattern.matchFrom(a,
        sorted.map(_._1).toArray, sorted.map(_._2).toArray, 0)._1
    }
    // cond bit 0 = event 1, bit 1 = event 2
    val e = Seq((0L, 1L), (100L, 2L), (5000L, 2L))
    assert(run("(?1)(?2)", e)) // 1 then 2 somewhere later
    assert(run("(?1)(?t<=100)(?2)", e)) // within 100 s: ts 0 → 100
    assert(!run("(?1)(?t<50)(?2)", e)) // no pair closer than 50
    assert(run("(?1)(?t>=5000)(?2)", e)) // ts 0 → 5000
    assert(run("(?1)(?t>4000)(?2)", e))
    assert(!run("(?2)(?1)", e)) // wrong order
    assert(run("(?1).*(?2)", e))
    assert(run("(?1).(?2)", e)) // any single event between? adjacency
    assert(!run("(?1)(?t<=10)(?2)", e))
    // a 2-only sequence never matches (?1)
    assert(!run("(?1)(?2)", Seq((0L, 2L), (10L, 2L))))
    // sequenceCount: non-overlapping scan
    val a = SequencePattern.parse("(?1)(?2)", 2)
    val many = Seq((0L, 1L), (1L, 2L), (2L, 1L), (3L, 2L), (4L, 1L))
    val (ts, ms) = (many.map(_._1).toArray, many.map(_._2).toArray)
    var cnt = 0; var it = 0; var go = true
    while (go && it < ts.length) {
      val (ok, next) = SequencePattern.matchFrom(a, ts, ms, it)
      if (ok) cnt += 1 else go = false
      it = next
    }
    assert(cnt === 2)
  }

  test("sequence_match SQL aggregate end-to-end with time condition") {
    GraftFunctions.register(spark)
    val df = Seq(
      (1L, 10L, "signup"), (1L, 50L, "purchase"),   // within 100 s
      (2L, 10L, "signup"), (2L, 5000L, "purchase"), // too late
      (3L, 10L, "purchase"), (3L, 20L, "signup")    // wrong order
    ).toDF("u", "t", "e").repartition(3)
    val got = df.groupBy("u").agg(
      expr("sequence_match('(?1)(?t<=100)(?2)', t, e = 'signup', e = 'purchase')").as("m"),
      expr("sequence_count('(?1)(?2)', t, e = 'signup', e = 'purchase')").as("c"))
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getLong(2))).toMap
    assert(got(1L) === ((1, 1L)))
    assert(got(2L) === ((0, 1L))) // no time cap on the count form
    assert(got(3L) === ((0, 0L)))
  }

  test("repetition_stats: hand-computed Gopher repetition signals") {
    graft.GraftFunctions.register(spark)
    // tokens: [the, cat, sat, the, cat, sat, again]
    val r = spark.sql(
      "SELECT repetition_stats('The cat sat. the cat sat, again!') AS r")
      .head().getSeq[Long](0)
    assert(r(0) === 7L, "n_tokens")
    assert(r(1) === 4L, "n_distinct_tokens")
    // the/cat/sat each twice: (2-1)*3 three times
    assert(r(2) === 9L, "dup_token_chars")
    assert(r(3) === 23L, "total_token_chars")
    // "the cat" x2 covering 2*(3+3)
    assert(r(4) === 12L, "top2_chars")
    // "the cat sat" x2 covering 2*9
    assert(r(5) === 18L, "top3_chars")
    // all 4-grams unique; widest is "the cat sat again" = 14 chars
    assert(r(6) === 14L, "top4_chars")
    // empty text: all zeros, no division-by-zero landmine
    val z = spark.sql("SELECT repetition_stats('') AS r").head().getSeq[Long](0)
    assert(z === Seq(0L, 0L, 0L, 0L, 0L, 0L, 0L))
  }

  test("token_ngram_hashes: distinct, sorted, SipHash of the joined gram") {
    graft.GraftFunctions.register(spark)
    // 7 bigram positions, 5 distinct ("a b" and "b c" repeat)
    val hs = spark.sql(
      "SELECT token_ngram_hashes('a b c a b c d e', 2) AS h")
      .head().getSeq[Long](0)
    assert(hs.length === 5)
    assert(hs === hs.sorted)
    assert(hs.contains(SipHash64.hash("a b".getBytes("UTF-8"))))
    assert(hs.contains(SipHash64.hash("d e".getBytes("UTF-8"))))
    // shorter than n -> empty, not null
    val e = spark.sql("SELECT token_ngram_hashes('one two', 3) AS h")
      .head().getSeq[Long](0)
    assert(e.isEmpty)
  }

  test("bloom_contains_any: probes the serialized filter, no false negatives") {
    graft.GraftFunctions.register(spark)
    val bloom = org.apache.spark.util.sketch.BloomFilter.create(100, 0.01)
    Seq(11L, 22L, 33L).foreach(bloom.putLong)
    val bos = new java.io.ByteArrayOutputStream()
    bloom.writeTo(bos)
    val hex = java.util.HexFormat.of().formatHex(bos.toByteArray)
    def probe(arr: String): Boolean =
      spark.sql(s"SELECT bloom_contains_any($arr, unhex('$hex')) AS b")
        .head().getBoolean(0)
    assert(probe("array(1L, 22L)"), "member must hit")
    assert(probe("array(33L)"), "member must hit")
    assert(!probe("array(CAST(-987654321 AS BIGINT))"), "1% fpp: this non-member stays out")
    assert(!probe("array_remove(array(5L), 5L)"), "empty array is clean")
  }

  test("l2sq: hand-computed squared L2, codegen and interpreted agree") {
    graft.GraftFunctions.register(spark)
    val d = spark.sql(
      "SELECT l2sq(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)), " +
        "array(CAST(4.0 AS FLOAT), CAST(6.0 AS FLOAT)))")
      .head().getDouble(0)
    assert(d === 25.0) // 3² + 4²
  }

  test("normalize_for_dedup: NFC + lower + collapse, composition-form-insensitive") {
    graft.GraftFunctions.register(spark)
    def n(sql: String): String =
      spark.sql(s"SELECT normalize_for_dedup($sql)").head().getString(0)
    assert(n("'  The QUICK--brown,fox! '") === "the quick brown fox")
    // decomposed e + U+0301 and precomposed U+00E9 canonicalize alike:
    // NFC composes first, then the non-ascii char collapses to a space
    assert(n("'café x'") === n("'café x'"))
    assert(n("'café x'") === "caf x")
    assert(n("''") === "")
  }

  test("PII masking: synthetic vectors mask exactly (q119 chain)") {
    import graft.queries.PipelineQueries.maskPii
    val rows = Seq(
      ("reach me at jane.doe+x@sub.example.org today",
        "reach me at <EMAIL> today"),
      ("server 192.168.001.1 and 10.0.0.255 down",
        "server <IP> and <IP> down"),
      ("call +1 (555) 123-4567 now", "call <PHONE> now"),
      ("card 4111111111111111 leaked", "card <NUM> leaked"),
      // order: email wins over its digit tail; untouched text survives
      ("a1@b.co 123456789012", "<EMAIL> <NUM>"),
      ("plain text, no pii 42", "plain text, no pii 42"))
      .toDF("text", "expected")
    val got = rows.select(maskPii(col("text")).as("m"), col("expected")).collect()
    got.foreach(r => assert(r.getString(0) === r.getString(1)))
  }

  test("siphash64 null propagates") {
    GraftFunctions.register(spark)
    val r = Seq[(String, Int)](("x", 1)).toDF("s", "i")
      .selectExpr("siphash64(CAST(NULL AS STRING)) AS h").collect()(0)
    assert(r.isNullAt(0))
  }

  test("BloomBcCache stays bounded across many per-batch broadcasts") {
    def mkBloom(): Array[Byte] = {
      val bf = org.apache.spark.util.sketch.BloomFilter.create(100, 0.01)
      bf.putLong(42L)
      val bos = new java.io.ByteArrayOutputStream()
      bf.writeTo(bos); bos.toByteArray
    }
    // a long-running incremental-dedup stream creates one broadcast
    // per micro-batch; the decode cache must not pin them all
    (1 to 100).foreach { _ =>
      val bc = spark.sparkContext.broadcast(mkBloom())
      assert(BloomBcCache.get(bc).mightContainLong(42L))
    }
    assert(BloomBcCache.size <= 64, s"cache grew to ${BloomBcCache.size}")
  }
}
