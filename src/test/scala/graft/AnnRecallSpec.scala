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
