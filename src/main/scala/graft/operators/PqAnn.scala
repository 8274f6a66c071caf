package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product-quantization ANN (Jégou, Douze & Schmid, "Product
  * Quantization for Nearest Neighbor Search", IEEE TPAMI 2011; the
  * faiss IndexPQ shape) — the storage-side scale path the IVF coarse
  * quantizer ([[IvfAnn]]) does not cover:
  *
  * A d-dim vector splits into `m` subvectors of d/m dims; each
  * subspace has its own `ks`-centroid codebook, and the vector is
  * stored as the m-tuple of nearest-centroid ids — m·log2(ks) bits
  * instead of 4·d bytes. At 100 TB of embeddings that is the
  * difference between scanning 256-byte vectors and scanning 8-byte
  * codes: the ADC pass reads ~30× less data, and the full-precision
  * column is only fetched for the final top-k re-rank (not done here;
  * compose with a semi-join on the returned ids).
  *
  * Query-time ADC (asymmetric distance computation): the query builds
  * an m×ks lookup table of subspace distances ONCE on the driver;
  * each row's approximate distance is m table lookups + adds — no
  * vector math on the scan side at all.
  *
  * Everything stays exact-integer on the engine side: subspace
  * distances are scaled ×10⁴ and rounded to BIGINT, so the encode
  * argmin and the ADC sum are order-insensitive integer ops that any
  * engine reproduces bit-for-bit (the DuckDB oracle of q107 does).
  *
  * Scale shape: codebooks and LUTs are tiny plan literals
  * (m·ks·(d/m)·4 bytes ≈ 4 KB for 8×16 on 64 dims); encode is m·ks
  * codegen'd `l2sq` kernel calls in ONE narrow projection; the query
  * is one scan + TakeOrderedAndProject — no shuffle, no join.
  *
  * Two codebook sources, mirroring [[IvfAnn]]:
  *  - [[sampled]]: subvectors of the first ks data vectors — a
  *    deterministic quantizer any engine can reproduce (q107's
  *    oracle path).
  *  - [[train]]: per-subspace MLlib k-means — the production path;
  *    float-reduction order makes exact centroids run-dependent, so
  *    tests pin RECALL, not rows (`AnnRecallSpec`).
  *
  * Reference analog: none — the reference's nearest-neighbor surface
  * stops at exact scans; PQ is part of this library's
  * training-pipeline surface.
  */
object PqAnn {

  /** codebooks(j)(c) = centroid c of subspace j (c is 0-based here;
    * emitted codes are 1-based to match SQL array positions). */
  final case class Model(codebooks: Seq[Seq[Seq[Float]]]) {
    require(codebooks.nonEmpty, "empty codebook set")
    require(codebooks.forall(_.size == codebooks.head.size),
      "ragged codebooks")
    def m: Int = codebooks.size
    def ks: Int = codebooks.head.size
    def dsub: Int = codebooks.head.head.size
  }

  /** Deterministic codebooks: subspace slices of the first ks vectors
    * by `idCol` — reproducible by the SQL oracle. */
  def sampled(df: DataFrame, idCol: String, embCol: String,
      m: Int, ks: Int): Model = {
    val rows = df.orderBy(col(idCol)).limit(ks)
      .select(col(embCol)).collect().map(_.getSeq[Float](0))
    require(rows.length == ks, s"need $ks sample vectors, got ${rows.length}")
    val dsub = rows.head.size / m
    Model((0 until m).map(j =>
      rows.map(v => v.slice(j * dsub, (j + 1) * dsub)).toSeq))
  }

  /** Trained codebooks: independent MLlib k-means per subspace —
    * m small models over the (sampled) corpus, the faiss training
    * loop restated as m DataFrame aggregations. */
  def train(df: DataFrame, embCol: String, m: Int, ks: Int,
      seed: Long = 42L, maxIter: Int = 10): Model = {
    import org.apache.spark.ml.functions.array_to_vector
    val dim = df.select(size(col(embCol))).head().getInt(0)
    val dsub = dim / m
    Model((0 until m).map { j =>
      val feats = df.select(array_to_vector(
        slice(col(embCol), j * dsub + 1, dsub).cast("array<double>"))
        .as("features"))
      val km = new org.apache.spark.ml.clustering.KMeans()
        .setK(ks).setSeed(seed + j).setMaxIter(maxIter)
      km.fit(feats).clusterCenters
        .map(_.toArray.map(_.toFloat).toSeq).toSeq
    })
  }

  /** ×10⁴-scaled integer subspace distance between the row's slice j
    * and a centroid literal — one codegen'd l2sq call. */
  private def distInt(embCol: String, j: Int, dsub: Int,
      cent: Seq[Float]): Column =
    round(expr(s"l2sq(slice($embCol, ${j * dsub + 1}, $dsub), " +
      s"${floatArrayLit(cent)})") * lit(10000)).cast("long")

  /** Per-row PQ code: array<int> of m 1-based centroid ids (argmin of
    * the integer distances; ties take the smallest id via
    * array_position's first match). */
  def encodeCol(model: Model, embCol: String): Column =
    array((0 until model.m).map { j =>
      val dists = array(model.codebooks(j).map(c =>
        distInt(embCol, j, model.dsub, c)): _*)
      array_position(dists, array_min(dists)).cast("int")
    }: _*)

  /** ADC distance: Σ_j LUT_j[code_j], LUT built on the driver with
    * the SAME arithmetic as [[distInt]] so encode-side and query-side
    * integers agree. */
  def adcCol(model: Model, query: Seq[Float], codeCol: Column): Column = {
    val luts: Seq[Seq[Long]] = (0 until model.m).map { j =>
      val qs = query.slice(j * model.dsub, (j + 1) * model.dsub)
      model.codebooks(j).map(c => math.round(l2sqDriver(qs, c) * 10000))
    }
    (0 until model.m).map { j =>
      element_at(typedLit(luts(j)), codeCol.getItem(j))
    }.reduce(_ + _)
  }

  /** End-to-end PQ query: encode, ADC-score, caller sorts/limits.
    * One narrow scan — codes and scores in a single projection. */
  def topK(facts: DataFrame, embCol: String, model: Model,
      query: Seq[Float]): DataFrame =
    facts
      .withColumn("pq_code", encodeCol(model, embCol))
      .withColumn("adc_x1e4", adcCol(model, query, col("pq_code")))

  /** Driver-side mirror of CosineSim.l2sq (same order, same ops). */
  private def l2sqDriver(a: Seq[Float], b: Seq[Float]): Double = {
    var acc = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) {
      val d = a(i).toDouble - b(i).toDouble
      acc += d * d
      i += 1
    }
    acc
  }

  private def floatArrayLit(v: Seq[Float]): String =
    v.map(x => s"CAST($x AS FLOAT)").mkString("array(", ", ", ")")
}
