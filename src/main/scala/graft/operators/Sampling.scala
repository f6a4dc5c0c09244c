package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling and data-mixing for training-data pipelines.
  *
  * `df.sample()` is neither exact (binomial per partition) nor stable
  * across partitionings, which makes experiment reproduction and oracle
  * checking impossible. Here rows are ordered WITHIN each stratum by the
  * md5 of their id — a fixed, content-independent pseudo-random order any
  * engine reproduces bit-identically — and the first
  * `ceil(fraction × stratum_size)` survive. Exact counts, one shuffle
  * (the stratum window), same result on 1 or 1000 executors.
  *
  * Scale note: a giant stratum funnels through one task in the window
  * sort. For corpus-scale strata, pre-aggregate stratum sizes (one cheap
  * count) and filter on `md5(id) < quantile` instead; the window form is
  * exact for the common many-moderate-strata shape of mixing weights.
  */
object Sampling {

  private def hashOrder(id: Column): Seq[Column] =
    Seq(md5(id.cast("string")), id)

  /** Exact-fraction stratified sample with an optional per-stratum cap. */
  def stratified(df: DataFrame, strata: Seq[Column], id: Column,
                 fraction: Double, cap: Long = Long.MaxValue): DataFrame = {
    val w = Window.partitionBy(strata: _*).orderBy(hashOrder(id): _*)
    val cw = Window.partitionBy(strata: _*)
    df.withColumn("__rn", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(cw))
      .filter(col("__rn") <= least(ceil(col("__n") * fraction), lit(cap)))
      .drop("__rn", "__n")
  }

  /** Data mixing: per-stratum sampling weights (e.g. by source). Strata
    * absent from `weights` get `defaultWeight`; weights above 1.0 keep the
    * whole stratum (upsampling is the caller's union). */
  def mixture(df: DataFrame, stratum: Column, id: Column,
              weights: Map[String, Double],
              defaultWeight: Double = 0.0): DataFrame = {
    val wmap = typedLit(weights)
    val w = Window.partitionBy(stratum).orderBy(hashOrder(id): _*)
    val cw = Window.partitionBy(stratum)
    df.withColumn("__w",
        coalesce(element_at(wmap, stratum.cast("string")), lit(defaultWeight)))
      .withColumn("__rn", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(cw))
      .filter(col("__rn") <= ceil(col("__n") * col("__w")))
      .drop("__w", "__rn", "__n")
  }
}
