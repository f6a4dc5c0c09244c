package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** A per-bucket HLL sketch table maintained from an event stream — the
  * streaming half of `q_sketch_rollup`'s pre-aggregation pattern: each
  * micro-batch folds its own per-bucket sketches into the stored ones
  * behind [[FencedStore]]'s batch-id fence (the shared
  * [[FencedSketchTable]] implementation), and any date-range
  * distinct-count question is answered from the table alone
  * ([[estimate]]) — the raw events are never rescanned.
  *
  * Two independent layers make replay exact: the fence gives
  * exactly-once TABLE state, and — defense in depth — HLL item inserts
  * are themselves idempotent (a sketch is a set summary: re-observing
  * the same items cannot move any register), so even a hypothetical
  * double-apply of one batch converges to the same estimates. The spec
  * asserts both: streamed == batch-built sketches by ESTIMATE on every
  * range, and a full fresh-checkpoint replay leaves estimates
  * identical. */
object StreamingSketch {

  private val impl = new FencedSketchTable("hll",
    StructField("item", LongType),
    v => hll_sketch_agg(v), sk => hll_union_agg(sk))

  /** Event schema for [[stream]]: the bucket (e.g. epoch day) and the
    * value whose per-bucket distinct count the table maintains. */
  val eventSchema: StructType = impl.eventSchema

  def provision(spark: SparkSession, prefix: String): Unit =
    impl.provision(spark, prefix)

  /** The sketch table as of the last applied batch. */
  def current(spark: SparkSession, prefix: String): DataFrame =
    impl.current(spark, prefix)

  /** Fold one micro-batch of (bucket, item) events in. */
  def applyBatch(spark: SparkSession, prefix: String, batch: DataFrame,
                 batchId: Long): Boolean =
    impl.applyBatch(spark, prefix, batch, batchId)

  /** Distinct-count estimate over `[lo, hi]` buckets, from the stored
    * sketches alone. */
  def estimate(spark: SparkSession, prefix: String, lo: Long,
               hi: Long): Long =
    current(spark, prefix).filter(col("bucket").between(lo, hi))
      .agg(coalesce(hll_sketch_estimate(hll_union_agg(col("sk"))), lit(0L)))
      .head().getLong(0)

  /** Drive the table from parquet event files arriving in `srcDir`. */
  def stream(spark: SparkSession, srcDir: String, prefix: String,
             ckptDir: String,
             trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    impl.stream(spark, srcDir, prefix, ckptDir, trigger)

  def drop(spark: SparkSession, prefix: String): Unit =
    impl.drop(spark, prefix)
}
