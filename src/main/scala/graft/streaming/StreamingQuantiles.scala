package graft.streaming

import graft.functions.SketchAggregators
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** A per-bucket KLL quantile-sketch table maintained from a value
  * stream — [[StreamingSketch]]'s pattern with quantiles instead of
  * distinct counts, on the shared [[FencedSketchTable]] implementation;
  * any date-range quantile question is answered from the table alone
  * ([[quantiles]]).
  *
  * Exactly-once honesty: unlike HLL (where re-observing an item cannot
  * move a register), KLL item inserts are NOT idempotent — a replayed
  * batch that escaped the fence would double-weight its values. The
  * batch-id fence is therefore the SINGLE line of defense here, exactly
  * as in [[Scd2Store]]; the spec replays a batch against the fence and
  * asserts the table does not move, then pushes data PAST the fence and
  * asserts it does. */
object StreamingQuantiles {

  private def impl(k: Int) = new FencedSketchTable("kll",
    StructField("value", DoubleType),
    v => SketchAggregators.kllAgg(v, k),
    sk => SketchAggregators.kllUnion(sk, k))

  /** Event schema for [[stream]]: the bucket (e.g. epoch day) and the
    * double value whose per-bucket distribution the table maintains. */
  val eventSchema: StructType = impl(200).eventSchema

  def provision(spark: SparkSession, prefix: String): Unit =
    impl(200).provision(spark, prefix)

  /** The sketch table as of the last applied batch. */
  def current(spark: SparkSession, prefix: String): DataFrame =
    impl(200).current(spark, prefix)

  /** Fold one micro-batch of (bucket, value) rows in. */
  def applyBatch(spark: SparkSession, prefix: String, batch: DataFrame,
                 batchId: Long, k: Int = 200): Boolean =
    impl(k).applyBatch(spark, prefix, batch, batchId)

  /** Quantile estimates over `[lo, hi]` buckets from the stored
    * sketches alone: `[q(r) for r in ranks] ++ [eps]`, empty when the
    * range holds no buckets. */
  def quantiles(spark: SparkSession, prefix: String, lo: Long, hi: Long,
                ranks: Seq[Double], k: Int = 200): Seq[Double] =
    current(spark, prefix).filter(col("bucket").between(lo, hi))
      .agg(SketchAggregators.kllUnionQuantiles(col("sk"), ranks, k).as("q"))
      .head().getSeq[Double](0)

  /** Drive the table from parquet value files arriving in `srcDir`. */
  def stream(spark: SparkSession, srcDir: String, prefix: String,
             ckptDir: String, k: Int = 200,
             trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    val i = impl(k)
    i.stream(spark, srcDir, prefix, ckptDir, trigger)
  }

  def drop(spark: SparkSession, prefix: String): Unit =
    impl(200).drop(spark, prefix)
}
