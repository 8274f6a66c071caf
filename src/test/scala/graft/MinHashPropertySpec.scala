package graft

import org.apache.spark.sql.functions._

import graft.GraftFunctions

/** Property checks for the approximate operators the DuckDB oracle
  * can't verify (SURVEY.md §5: cheap wins the reference lacks). */
class MinHashPropertySpec extends SparkSpec {
  import spark.implicits._

  // MinHash signature equality rate across permutations estimates
  // Jaccard similarity: identical docs → identical signatures,
  // disjoint docs → (whp) fully distinct signatures.
  test("minhash: identical texts collide, disjoint texts do not (native expr)") {
    GraftFunctions.register(spark)
    val docs = Seq(
      (0L, "the quick brown fox jumps over the lazy dog again and again"),
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "zzzz yyyy xxxx wwww vvvv uuuu tttt ssss rrrr qqqq pppp oooo"))
      .toDF("doc_id", "text")
    val rows = docs.selectExpr("doc_id", "minhash_sig(text, 16, 5) AS sig")
      .orderBy("doc_id").collect()
    val s0 = rows(0).getSeq[Long](1)
    val s1 = rows(1).getSeq[Long](1)
    val s2 = rows(2).getSeq[Long](1)
    assert(s0 === s1, "identical docs must share the full signature")
    val matches02 = s0.zip(s2).count { case (a, b) => a == b }
    assert(matches02 <= 3, s"disjoint docs matched $matches02/16 signature slots")
  }

  test("minhash signature match rate estimates n-gram Jaccard") {
    // two near-dup texts sharing most shingles: the fraction of equal
    // signature slots must land near the exact Jaccard (k=64 keeps
    // the binomial std-dev ≈ sqrt(j(1-j)/64) ≈ 0.06 — assert ±0.25)
    val a = "the quick brown fox jumps over the lazy dog and runs far away home"
    val b = "the quick brown fox jumps over the lazy cat and runs far away home"
    val exact = graft.functions.TextKernels.ngramJaccard(a, b, 5)
    val sa = graft.functions.TextKernels.minHashSig(a, 64, 5)
    val sb = graft.functions.TextKernels.minHashSig(b, 64, 5)
    val est = sa.zip(sb).count { case (x, y) => x == y }.toDouble / 64
    assert(math.abs(est - exact) < 0.25, s"estimate $est vs exact $exact")
  }

  test("simhash banding (q123 shape): one-token edits collide, disjoint texts do not") {
    import graft.functions.TextKernels
    // Hamming distance tracks the CHANGED-TOKEN FRACTION: one token
    // of ~40 flips ~1 bit (measured); one of 13 flips ~5 — too far
    // for the <= 3 gate, which is WHY short near-dups belong to the
    // MinHash path (q47) and simhash banding to long documents
    val a = "the quick brown fox jumps over the lazy dog while rain falls " +
      "on the green hills and rivers flow past old stone bridges toward " +
      "distant villages where people gather every market day to trade " +
      "grain wool and bright copper pots"
    val b = a.replace("copper", "silver")
    val c = "zzzz yyyy xxxx wwww vvvv uuuu tttt ssss rrrr qqqq pppp oooo " +
      "nnnn mmmm llll kkkk jjjj iiii hhhh gggg ffff"
    val (ha, hb, hc) = (TextKernels.simHash64(a), TextKernels.simHash64(b),
      TextKernels.simHash64(c))
    assert(java.lang.Long.bitCount(ha ^ hb) <= 3,
      s"near-dup pair at Hamming ${java.lang.Long.bitCount(ha ^ hb)}")
    assert(java.lang.Long.bitCount(ha ^ hc) > 3,
      s"disjoint pair too close: ${java.lang.Long.bitCount(ha ^ hc)}")
    // pigeonhole: Hamming <= 3 over 4 bands must share a full band
    val bandsA = (0 until 4).map(k => (ha >>> (k * 16)) & 0xffff)
    val bandsB = (0 until 4).map(k => (hb >>> (k * 16)) & 0xffff)
    assert(bandsA.zip(bandsB).exists { case (x, y) => x == y })
  }

  test("text kernels: SQL expressions match the JVM kernels") {
    GraftFunctions.register(spark)
    val txt = "abcabcabc xyz abcabc"
    val r = spark.sql(
      s"""SELECT ngram_distinct_count('$txt', 5) AS c,
         |  simhash64('$txt') AS sh,
         |  char_weighted_fingerprint('$txt') AS fp,
         |  rolling_fingerprint(CAST('$txt' AS BINARY)) AS rf,
         |  ngram_jaccard('$txt', '$txt', 5) AS j""".stripMargin).collect()(0)
    assert(r.getLong(0) === graft.functions.TextKernels.ngramDistinctCount(txt, 5))
    assert(r.getLong(1) === graft.functions.TextKernels.simHash64(txt))
    assert(r.getLong(2) === graft.functions.TextKernels.charWeightedFingerprint(txt))
    assert(r.getLong(3) === graft.functions.TextKernels.rollingFingerprint(
      txt.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
    assert(r.getDouble(4) === 1.0)
  }

  test("char_weighted_fingerprint matches the SQL explode formula") {
    val txt = "hello world 123"
    val viaSql = spark.sql(
      s"SELECT CAST(aggregate(transform(sequence(1, length('$txt')), " +
        s"i -> ascii(substring('$txt', i, 1)) * i), 0L, (acc, x) -> acc + x) AS BIGINT)")
      .collect()(0).getLong(0)
    assert(graft.functions.TextKernels.charWeightedFingerprint(txt) === viaSql)
  }

  test("approx_count_distinct within 10% of exact on events") {
    val ev = graft.core.Tables(spark, sfDir, "events")
    val r = ev.agg(
      countDistinct(col("user_id")).as("exact"),
      approx_count_distinct(col("user_id")).as("approx")).collect()(0)
    val exact = r.getLong(0).toDouble
    val approx = r.getLong(1).toDouble
    assert(math.abs(approx - exact) / exact < 0.10)
  }

  test("deterministic sample is stable and subset-composable") {
    val li = graft.core.Tables(spark, sfDir, "lineitem")
    def sampled(frac: Long) = li.filter(
      pmod(pmod(col("l_orderkey"), lit(4294967296L)) * 40503L, lit(65536L)) < lit(frac))
    val n5 = sampled(3277).count()  // 5%
    val n10 = sampled(6554).count() // 10%
    assert(n5 <= n10, "5% sample must be a subset of the 10% sample")
    assert(sampled(6554).count() === n10, "resampling is deterministic")
    val total = li.count().toDouble
    assert(math.abs(n10 / total - 0.10) < 0.03, s"10% sample was ${n10 / total}")
  }
}
