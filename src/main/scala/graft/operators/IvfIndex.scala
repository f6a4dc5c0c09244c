package graft.operators

import graft.functions.VectorExpressions.nearestCentroid
import graft.functions.VectorFunctions.dot
import graft.functions.VectorMeanAggregator
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF (inverted-file) ANN index: a k-means coarse quantizer partitions
  * the corpus into `k` lists; a query scores only the `nProbe` nearest
  * lists. The alternative scale path to hyperplane LSH
  * ([[Similarity.lshTopK]]) — better suited to clustered corpora, at the
  * cost of a training pass.
  *
  * Spark-first construction, sized for a 100 TB corpus: each Lloyd
  * iteration is exactly ONE corpus scan — a partial-merged
  * [[VectorMeanAggregator]] groupBy whose k result rows are collected to
  * the driver (k vectors, a few KB) and re-embedded in the plan as a
  * [[graft.functions.VectorExpressions.NearestCentroid]] literal. The
  * assignment step is therefore a pure per-row projection: no
  * corpus×k fan-out, no N×k shuffle, no window. The final `assigned`
  * frame's lineage is one scan + one expression, and `centroids` is a
  * local relation, so downstream consumers ([[probeTopK]]) never
  * re-execute the k-means. This mirrors how Spark MLlib's KMeans
  * broadcasts its (tiny) centroid state rather than joining against it.
  */
object IvfIndex {

  /** corpus: (vec_id, vec, norm) as produced by [[Similarity.prepared]].
    * Returns (assigned, centroids): assigned = corpus + centroid_id;
    * centroids = (centroid_id, cvec, cnorm), a local relation of ≤ k rows.
    * Deterministic: k-means init is vec_id % k; assignment argmin ties
    * break to the lowest centroid_id. Centroid ids are re-numbered to the
    * dense range 0..m-1 after the first aggregation (empty initial lists
    * drop out). */
  def build(corpus: DataFrame, k: Int, iters: Int = 2): (DataFrame, DataFrame) = {
    val spark = corpus.sparkSession
    val vmean = udaf(VectorMeanAggregator)

    def centroidsFor(assign: Column): Seq[Seq[Double]] =
      corpus.withColumn("centroid_id", assign)
        .groupBy("centroid_id").agg(vmean(col("vec")).as("cvec"))
        .collect()
        .map(r => (r.getAs[Number](0).longValue(), r.getSeq[Double](1)))
        .sortBy(_._1)
        .map(_._2)
        .toSeq

    var assign: Column = pmod(col("vec_id"), lit(k)).cast("int")
    var cents: Seq[Seq[Double]] = Nil
    (0 until iters).foreach { _ =>
      cents = centroidsFor(assign) // one corpus scan; ≤ k rows collected
      assign = nearestCentroid(col("vec"), cents)
    }

    // Materialize the assignment behind a Generate (posexplode_outer of a
    // one-element array): probeTopK equi-joins on centroid_id, and with a
    // plain Project the join's inferred isnotnull(centroid_id) constraint
    // gets pushed through the projection as a SECOND evaluation of the
    // k x dim nearest_centroid kernel in the scan Filter. A constraint on
    // a Generate output attribute cannot cross the Generate, so the kernel
    // runs exactly once per corpus row.
    val assigned = corpus
      .select(col("*"), posexplode_outer(array(assign)).as(Seq("__p", "centroid_id")))
      .drop("__p")
    val centroidRows = cents.zipWithIndex.map { case (v, i) =>
      var s = 0.0; var j = 0
      while (j < v.length) { s += v(j) * v(j); j += 1 }
      (i, v, math.sqrt(s))
    }
    import spark.implicits._
    val centroids = centroidRows.toDF("centroid_id", "cvec", "cnorm")
    (assigned, centroids)
  }

  /** Persist the IVF index with one DIRECTORY PER LIST (a parquet table
    * partitioned by `centroid_id`) plus a tiny companion centroid table.
    * This is the PERSISTED form of ANN state — the analogue of the
    * bucketed minhash index for near-dup: build once, then every probe
    * batch reads only its lists. Probing a loaded index is a scan-pruned
    * join: the probe side is broadcast, and Spark's dynamic partition
    * pruning narrows the index scan to the probed `centroid_id`
    * directories — "probe nProbe of k lists" becomes reading nProbe/k of
    * the index BYTES, not a full scan filtered after the fact
    * (plan-guard spec'd: the scan carries a dynamicpruning partition
    * filter). */
  def writeIndex(assigned: DataFrame, centroids: DataFrame, table: String): Unit = {
    assigned.write.mode("overwrite").partitionBy("centroid_id")
      .format("parquet").saveAsTable(table)
    centroids.write.mode("overwrite").format("parquet")
      .saveAsTable(table + "_centroids")
  }

  /** Load a persisted index written by [[writeIndex]]: (assigned,
    * centroids), directly consumable by [[probeTopK]]. */
  def loadIndex(spark: org.apache.spark.sql.SparkSession,
                table: String): (DataFrame, DataFrame) =
    (spark.table(table), spark.table(table + "_centroids"))

  /** Top-k by cosine per query, scanning only the `nProbe` nearest lists.
    * `centroids` is a local relation, so the probe-list selection plans
    * with no corpus access; the corpus is touched by exactly one scan,
    * filtered to probed lists via the broadcast probes join. */
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
    Ranking.topKPerQuery(scored, k)
  }
}
