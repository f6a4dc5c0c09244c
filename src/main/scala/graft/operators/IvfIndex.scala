package graft.operators

import graft.functions.VectorFunctions.dot
import graft.functions.VectorMeanAggregator
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF (inverted-file) ANN index: a k-means coarse quantizer partitions
  * the corpus into `k` lists; a query scores only the `nProbe` nearest
  * lists. The alternative scale path to hyperplane LSH
  * ([[Similarity.lshTopK]]) — better suited to clustered corpora, at the
  * cost of a training pass.
  *
  * Spark-first construction: Lloyd iterations are two shuffles each —
  * centroids via the [[VectorMeanAggregator]] UDAF (partial-merged
  * map-side), assignment via a broadcast of the k centroids and an argmin
  * window. The corpus is never replicated; at 100 TB the per-iteration
  * cost is one broadcast-join scan + one aggregation, and the final
  * assignment is the only state kept (one int per vector). Squared
  * distance is computed as ‖a‖² + ‖b‖² − 2a·b from precomputed norms and
  * the tight-loop dot expression.
  */
object IvfIndex {

  /** corpus: (vec_id, vec, norm) as produced by [[Similarity.prepared]].
    * Returns (assigned, centroids): assigned = corpus + centroid_id;
    * centroids = (centroid_id, cvec, cnorm). Deterministic: k-means init
    * is vec_id % k and ties break on centroid_id. */
  def build(corpus: DataFrame, k: Int, iters: Int = 2): (DataFrame, DataFrame) = {
    val vmean = udaf(VectorMeanAggregator)
    var assigned = corpus.withColumn("centroid_id", pmod(col("vec_id"), lit(k)))
    var centroids: DataFrame = null
    (0 until iters).foreach { _ =>
      centroids = assigned.groupBy("centroid_id")
        .agg(vmean(col("vec")).as("cvec"))
        .withColumn("cnorm", sqrt(dot(col("cvec"), col("cvec"))))
      val w = Window.partitionBy(col("vec_id"))
        .orderBy(col("d2"), col("centroid_id"))
      assigned = corpus.crossJoin(broadcast(centroids))
        .withColumn("d2",
          col("norm") * col("norm") + col("cnorm") * col("cnorm")
            - lit(2.0) * dot(col("vec"), col("cvec")))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(corpus.columns.map(col).toSeq :+ col("centroid_id"): _*)
    }
    (assigned, centroids)
  }

  /** Top-k by cosine per query, scanning only the `nProbe` nearest lists.
    * Queries (small) are broadcast against the centroid table and then
    * against the probed corpus slices. */
  def probeTopK(assigned: DataFrame, centroids: DataFrame, queries: DataFrame,
                k: Int, nProbe: Int): DataFrame = {
    val wq = Window.partitionBy(col("query_id"))
      .orderBy(col("qd2"), col("centroid_id"))
    val probes = queries
      .select(col("vec_id").as("query_id"), col("vec").as("query_vec"),
        col("norm").as("query_norm"))
      .crossJoin(broadcast(centroids))
      .withColumn("qd2",
        col("query_norm") * col("query_norm") + col("cnorm") * col("cnorm")
          - lit(2.0) * dot(col("query_vec"), col("cvec")))
      .withColumn("rn", row_number().over(wq))
      .filter(col("rn") <= nProbe)
      .select(col("query_id"), col("query_vec"), col("query_norm"), col("centroid_id"))
    val scored = assigned
      .select(col("vec_id").as("cand_id"), col("vec").as("cand_vec"),
        col("norm").as("cand_norm"), col("centroid_id"))
      .join(broadcast(probes), "centroid_id")
      .filter(col("cand_id") =!= col("query_id"))
      .withColumn("cosine",
        when(col("cand_norm") * col("query_norm") === 0.0, lit(null).cast("double"))
          .otherwise(dot(col("cand_vec"), col("query_vec"))
            / (col("cand_norm") * col("query_norm"))))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("cand_id"))
    scored
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("rk"), col("cand_id"), col("cosine"))
  }
}
