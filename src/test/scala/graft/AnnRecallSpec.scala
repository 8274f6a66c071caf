package graft

import org.apache.spark.sql.functions._

import graft.queries.SimilarityQueries

/** Recall of the LSH ANN paths against the brute-force ground truth
  * (q50): multi-probe (q95, query bucket + every 1-bit flip) must
  * never recall less than single-probe (q53), and both must return a
  * subset of the candidates brute force would rank. */
class AnnRecallSpec extends SparkSpec {

  private def ids(df: org.apache.spark.sql.DataFrame): Seq[Long] =
    df.select(col("vec_id").cast("long")).collect().map(_.getLong(0)).toSeq

  test("multi-probe recall@5 >= single-probe recall@5 vs brute force") {
    val truth = ids(SimilarityQueries.q50(spark, sfDir)).toSet
    val single = ids(SimilarityQueries.q53(spark, sfDir)).toSet
    val multi = ids(SimilarityQueries.q95(spark, sfDir)).toSet
    assert(truth.nonEmpty)
    val rSingle = (truth & single).size.toDouble / truth.size
    val rMulti = (truth & multi).size.toDouble / truth.size
    assert(rMulti >= rSingle,
      s"multi-probe recall $rMulti < single-probe recall $rSingle")
  }

  test("query-directed multi-probe: numeric recall@5 floors on the sf0.1 vectors") {
    // Numeric floors so bucket-width / probe-set changes can't
    // silently degrade recall. WHY NOT 0.8: the sf0.1 vectors are
    // near-isotropic — the true top-5 cosines are only 0.33–0.41, so
    // each LSH hyperplane bit disagrees with the query with
    // p = acos(cos)/π ≈ 0.37, and ANY 8-bit signature scheme needs
    // >50% of the data probed to reach 0.8 (measured: the 5 true
    // neighbors sit at Hamming 1–4 of 8). At that similarity level
    // brute force (q50) IS the correct plan; the LSH floor pins what
    // sublinear probing can honestly deliver on this data:
    // query-directed T=32 probes ≈ 12% of the rows → 0.50 average
    // recall over 50 query points (5× the blind 1-bit-flip set).
    val dir = "/root/testdata/sf0.1"
    val truth = ids(SimilarityQueries.q50(spark, dir)).take(5).toSet
    val qd = ids(SimilarityQueries.q96(spark, dir)).toSet
    assert(truth.size === 5)
    val recall = (truth & qd).size.toDouble / truth.size
    assert(recall >= 0.4, s"query-directed recall@5 $recall < 0.4")
    // and it must never fall below the blind 1-bit-flip probe set
    val multi = ids(SimilarityQueries.q95(spark, dir)).toSet
    val rMulti = (truth & multi).size.toDouble / truth.size
    assert(recall >= rMulti,
      s"query-directed recall $recall < blind multi-probe recall $rMulti")
  }

  test("IVF ANN: trained quantizer recall@10 floors; probes a strict data subset") {
    import graft.operators.IvfAnn
    val dir = "/root/testdata/sf0.1"
    graft.GraftFunctions.register(spark)
    val e = graft.core.Tables(spark, dir, "embeddings")
    val facts = e.filter(col("vec_id") =!= 0)
    val qe = e.filter(col("vec_id") === 0)
      .select(col("embedding")).collect()(0).getSeq[Float](0)
    val truth = facts
      .select(col("vec_id"), expr("round(cosine_sim(embedding, " +
        qe.map(x => s"CAST($x AS FLOAT)").mkString("array(", ",", ")") + "), 4)").as("c"))
      .orderBy(col("c").desc, col("vec_id"))
      .limit(10).select(col("vec_id").cast("long"))
      .collect().map(_.getLong(0)).toSet

    val model = IvfAnn.train(facts, "embedding", k = 16, seed = 42L)
    val got = IvfAnn.topK(facts, "embedding", model, qe, k = 10, nProbe = 4)
      .orderBy(col("cosine").desc, col("vec_id"))
      .limit(10).select(col("vec_id").cast("long"))
      .collect().map(_.getLong(0)).toSet
    val recall = (truth & got).size.toDouble / truth.size
    // the sf0.1 vectors are near-isotropic (see the q96 floor note):
    // 4 of 16 cosine-k-means cells ≈ 25% of the data; an exact-subset
    // scan at that fraction empirically recalls ~0.3-0.6 of the top
    // 10. The floor pins against silent probe-selection regressions,
    // not against the data's intrinsic hardness.
    assert(recall >= 0.2, s"IVF trained recall@10 $recall < 0.2")
    // the probe really prunes: candidate set is a strict subset
    val probed = facts.withColumn("__cell",
      IvfAnn.cellCol(model, "embedding"))
      .where(col("__cell").isInCollection(
        IvfAnn.probeCells(model, qe, 4))).count()
    val all = facts.count()
    assert(probed < all, s"IVF probed everything ($probed of $all)")
    assert(probed > 0L)
  }

  test("PQ ANN: trained-codebook ADC recall@10 floors vs exact L2") {
    import graft.operators.PqAnn
    val dir = "/root/testdata/sf0.1"
    graft.GraftFunctions.register(spark)
    val e = graft.core.Tables(spark, dir, "embeddings")
    val facts = e.filter(col("vec_id") =!= 0)
    val qe = e.filter(col("vec_id") === 0)
      .select(col("embedding")).collect()(0).getSeq[Float](0)
    val qlit = qe.map(x => s"CAST($x AS FLOAT)").mkString("array(", ",", ")")
    val truth = facts
      .select(col("vec_id"), expr(s"l2sq(embedding, $qlit)").as("d"))
      .orderBy(col("d").asc, col("vec_id"))
      .limit(10).select(col("vec_id").cast("long"))
      .collect().map(_.getLong(0)).toSet
    // PQ is a candidate PREFILTER: production re-ranks the ADC top-C
    // with full-precision vectors, so the metric that matters is how
    // much of the true top-10 the ADC top-C candidate set captures.
    // Config sweep on this data (near-isotropic, see the q96 floor
    // note): m=16/ks=16 dominates (0.6/0.8/0.9 at C=20/50/100) —
    // finer subspaces beat bigger codebooks here. Floors sit under
    // the measured values because MLlib k-means float-reduction
    // order drifts run to run.
    val model = PqAnn.train(facts, "embedding", m = 16, ks = 16, seed = 7L)
    val scored = PqAnn.topK(facts, "embedding", model, qe)
      .orderBy(col("adc_x1e4").asc, col("vec_id"))
    def recallAt(c: Int): Double = {
      val got = scored.limit(c).select(col("vec_id").cast("long"))
        .collect().map(_.getLong(0)).toSet
      (truth & got).size.toDouble / truth.size
    }
    val r50 = recallAt(50)
    val r100 = recallAt(100)
    info(s"PQ m=16 ks=16 candidate recall@50 = $r50, @100 = $r100")
    assert(r50 >= 0.5, s"PQ candidate recall@50 $r50 < 0.5")
    assert(r100 >= 0.7, s"PQ candidate recall@100 $r100 < 0.7")
    assert(r100 >= r50, "candidate sets are nested")
  }

  test("clustered vectors: q96 / q100 / q107 recall floors >= 0.8") {
    // The sf0.1 embeddings are near-isotropic, which caps HONEST
    // sublinear recall (see the floor notes above). On CLUSTERED data
    // — the regime ANN indexes exist for — the same three paths must
    // deliver >= 0.8: 16 well-separated unit centers, 250 members per
    // cluster at noise sigma 0.1 (same-cluster cosine ~0.99,
    // cross-cluster ~0.12), written as a drop-in embeddings table.
    // vec_id % 16 == cluster, so the quantizer sample rows 1..16 span
    // every cluster and vec 0 (the query) sits in cluster 0.
    val dim = 64; val nC = 16; val per = 250
    val rnd = new scala.util.Random(12345)
    def normalize(v: Array[Float]): Array[Float] = {
      val n = math.sqrt(v.map(x => x.toDouble * x).sum).toFloat
      v.map(_ / n)
    }
    val centers = Array.fill(nC)(
      normalize(Array.fill(dim)(rnd.nextGaussian().toFloat)))
    val vecs = (0 until nC * per).map { id =>
      val c = id % nC
      (id.toLong,
        normalize(centers(c).map(x =>
          x + 0.1f * rnd.nextGaussian().toFloat)).toSeq, c)
    }
    val dir = java.nio.file.Files.createTempDirectory("clustered_emb").toString
    spark.createDataFrame(vecs).toDF("vec_id", "embedding", "label")
      .repartition(4)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")

    val q = vecs(0)._2.map(_.toDouble).toArray
    def cos(v: Seq[Float]): Double = {
      var d = 0.0; var i = 0
      while (i < dim) { d += q(i) * v(i); i += 1 }
      d // all vectors are unit-norm
    }
    def l2(v: Seq[Float]): Double = {
      var d = 0.0; var i = 0
      while (i < dim) { val t = q(i) - v(i); d += t * t; i += 1 }
      d
    }
    val byCos = vecs.drop(1).sortBy(r => (-cos(r._2), r._1)).map(_._1)
    val top5 = byCos.take(5).toSet
    val top10 = byCos.take(10).toSet
    val l2Top5 = vecs.drop(1).sortBy(r => (l2(r._2), r._1)).map(_._1)
      .take(5).toSet

    val r96 = (top5 & ids(SimilarityQueries.q96(spark, dir)).toSet)
      .size.toDouble / 5
    assert(r96 >= 0.8, s"q96 clustered recall@5 $r96 < 0.8")
    val r100 = (top10 & ids(SimilarityQueries.q100(spark, dir)).toSet)
      .size.toDouble / 10
    assert(r100 >= 0.8, s"q100 clustered recall@10 $r100 < 0.8")
    // PQ: on tight clusters every same-cluster member encodes to the
    // SAME code, so ADC cannot order WITHIN the cluster (top-10 by
    // ADC is a vec_id tie-break lottery). The PQ contract is the
    // candidate PREFILTER (re-rank exact downstream): pin that the
    // ADC candidate set at the cluster size captures the true top-5,
    // and that the ADC top-10 is pure cluster-0 (precision 1.0).
    graft.GraftFunctions.register(spark)
    val e = graft.core.Tables(spark, dir, "embeddings")
    val model = graft.operators.PqAnn.sampled(
      e.filter(col("vec_id").between(1, 16)), "vec_id", "embedding",
      m = 8, ks = 16)
    val scored = graft.operators.PqAnn.topK(
      e.filter(col("vec_id") =!= 0), "embedding", model,
      vecs(0)._2.toIndexedSeq)
      .orderBy(col("adc_x1e4").asc, col("vec_id"))
    val cand = scored.limit(per).select(col("vec_id").cast("long"))
      .collect().map(_.getLong(0)).toSet
    val r107 = (l2Top5 & cand).size.toDouble / 5
    assert(r107 >= 0.8, s"q107 clustered candidate recall@5-in-$per $r107 < 0.8")
    val prec = ids(scored.limit(10)).count(_ % nC == 0).toDouble / 10
    assert(prec >= 0.8, s"q107 clustered ADC top-10 cluster precision $prec < 0.8")
  }

  test("multi-probe candidates strictly contain the single-probe bucket") {
    // every vector q53 can see, q95 can see too (probe set includes
    // the query's own bucket)
    val single = ids(SimilarityQueries.q53(spark, sfDir)).toSet
    val multi = ids(SimilarityQueries.q95(spark, sfDir))
    // both are top-5 of nested candidate sets ranked by the same
    // score: any single-probe hit missing from multi-probe's top-5
    // must have been displaced by a strictly-better multi-probe hit
    assert(multi.size == 5 || multi.toSet.subsetOf(single) || single.size < 5)
  }
}
