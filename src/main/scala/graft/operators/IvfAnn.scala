package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest neighbor — the classic
  * coarse-quantizer ANN structure (Sivic & Zisserman's Video Google /
  * faiss IndexIVFFlat): every vector is assigned to its nearest of k
  * coarse centroids ("cell"); a query ranks the centroids, probes the
  * `nProbe` nearest cells, and brute-forces cosine only inside them.
  *
  * Scale shape (the reason IVF beats per-bucket LSH when a model can
  * be trained): the cell id is a PARTITION KEY at rest — `assign` +
  * `partitionBy("ivf_cell")` at ingest makes a query read nProbe/k of
  * the data with partition pruning, before any vector math. The probe
  * set is computed on the driver from the (tiny) centroid model at
  * query-planning time — the scan side is ONE narrow codegen'd pass
  * (k `cosine_sim` kernel calls per row) + a literal IN filter +
  * TakeOrderedAndProject: no shuffle, no join, no lambda.
  *
  * Two quantizers:
  *  - [[train]]: k-means centroids via Spark MLlib (cosine distance)
  *    — the production path; centroid quality is data-adaptive but
  *    float-reduction order makes the exact centroids run-dependent,
  *    so tests pin RECALL, not rows.
  *  - [[sampled]]: the first k data vectors as centroids — a
  *    deterministic quantizer (faiss supports arbitrary coarse
  *    quantizers) whose assignment any engine can reproduce exactly;
  *    q100 uses it to stay DuckDB-oracle-checkable.
  *
  * The model is embedded as plan literals — right for k ≤ a few
  * hundred (k·d·4 bytes of plan). For k in the thousands, join the
  * assignment against a broadcast centroid table instead.
  */
object IvfAnn {

  /** cells are 1-based: cell i uses centroids(i-1) */
  final case class Model(centroids: Seq[Seq[Float]]) {
    require(centroids.nonEmpty, "empty centroid set")
    def k: Int = centroids.size
  }

  /** Deterministic quantizer: the first k vectors by `idCol`. */
  def sampled(df: DataFrame, idCol: String, embCol: String, k: Int): Model =
    Model(df.orderBy(col(idCol)).limit(k)
      .select(col(embCol)).collect()
      .map(_.getSeq[Float](0)).toSeq)

  /** Trained quantizer: MLlib k-means with cosine distance on (a
    * sample of) the embedding column. */
  def train(df: DataFrame, embCol: String, k: Int, seed: Long = 42L,
      maxIter: Int = 10): Model = {
    import org.apache.spark.ml.functions.array_to_vector
    val feats = df.select(array_to_vector(col(embCol).cast("array<double>"))
      .as("features"))
    val km = new org.apache.spark.ml.clustering.KMeans()
      .setK(k).setSeed(seed).setMaxIter(maxIter)
      .setDistanceMeasure("cosine")
    Model(km.fit(feats).clusterCenters
      .map(_.toArray.map(_.toFloat).toSeq).toSeq)
  }

  /** Per-row cell assignment: argmax of round(cosine, 4) over the k
    * centroids, smallest cell id on ties — k codegen'd `cosine_sim`
    * calls in one narrow projection. */
  def cellCol(model: Model, embCol: String): Column = {
    val scores = array(model.centroids.map(c =>
      round(expr(s"cosine_sim($embCol, ${floatArrayLit(c)})"), 4)): _*)
    array_position(scores, array_max(scores)).cast("int")
  }

  /** The query's nProbe nearest cells, ranked on the driver (k·d
    * flops at query-planning time, like an ANN index's own probe
    * selection). */
  def probeCells(model: Model, query: Seq[Float], nProbe: Int): Seq[Int] = {
    val qn = math.sqrt(query.map(x => x.toDouble * x.toDouble).sum)
    model.centroids.zipWithIndex.map { case (c, i) =>
      val dot = c.zip(query).map { case (a, b) => a.toDouble * b.toDouble }.sum
      val cn = math.sqrt(c.map(x => x.toDouble * x.toDouble).sum)
      val cos = BigDecimal(dot / (cn * qn))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      (cos, i + 1)
    }.sortBy { case (cos, cid) => (-cos, cid) }
      .take(nProbe).map(_._2)
  }

  /** End-to-end IVF query: assign cells, probe the query's nProbe
    * nearest, exact cosine top-k inside them. One scan, no shuffle. */
  def topK(facts: DataFrame, embCol: String, model: Model,
      query: Seq[Float], k: Int, nProbe: Int): DataFrame = {
    val probes = probeCells(model, query, nProbe)
    facts
      .withColumn("__cell", cellCol(model, embCol))
      .where(col("__cell").isInCollection(probes))
      .withColumn("cosine",
        round(expr(s"cosine_sim($embCol, ${floatArrayLit(query)})"), 4))
      .drop("__cell")
  }

  private def floatArrayLit(v: Seq[Float]): String =
    v.map(x => s"CAST($x AS FLOAT)").mkString("array(", ", ", ")")
}
