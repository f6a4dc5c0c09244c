package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** A per-bucket HLL sketch table maintained from an event stream — the
  * streaming half of `q_sketch_rollup`'s pre-aggregation pattern: each
  * micro-batch folds its own per-bucket sketches into the stored ones
  * with `hll_union`, behind [[FencedStore]]'s batch-id fence, and any
  * date-range distinct-count question is answered from the table alone
  * ([[estimate]]) — the raw events are never rescanned.
  *
  * Two independent layers make replay exact: the fence gives
  * exactly-once TABLE state, and — defense in depth — HLL item inserts
  * are themselves idempotent (a sketch is a set summary: re-observing
  * the same items cannot move any register), so even a hypothetical
  * double-apply of one batch converges to the same estimates. The spec
  * asserts both: streamed == batch-built sketches by ESTIMATE on every
  * range, and a full fresh-checkpoint replay leaves estimates
  * identical.
  *
  * Scale: per batch, one (bucket)-keyed partial+final sketch aggregate
  * of the delta (sketches merge map-side — fixed-width state), an
  * outer join against the bucket-sized stored table, and a
  * bucket-sized rewrite. Nothing is ever event-history-sized except
  * the one pass over the arriving delta. */
object StreamingSketch {

  /** Event schema for [[stream]]: the bucket (e.g. epoch day) and the
    * value whose per-bucket distinct count the table maintains. */
  val eventSchema: StructType = StructType(Seq(
    StructField("bucket", LongType), StructField("item", LongType)))

  private val tableSchema = StructType(Seq(
    StructField("bucket", LongType), StructField("sk", BinaryType)))

  private def fencePrefix(prefix: String) = s"${prefix}_hll"

  def provision(spark: SparkSession, prefix: String): Unit =
    FencedStore.provision(spark, fencePrefix(prefix), tableSchema)

  /** The sketch table as of the last applied batch. */
  def current(spark: SparkSession, prefix: String): DataFrame =
    FencedStore.current(spark, fencePrefix(prefix))

  /** Fold one micro-batch of (bucket, item) events in. */
  def applyBatch(spark: SparkSession, prefix: String, batch: DataFrame,
                 batchId: Long): Boolean =
    FencedStore.applyBatch(spark, fencePrefix(prefix), tableSchema, batchId) {
      cur =>
        if (batch.isEmpty) None
        else {
          val delta = batch.groupBy(col("bucket"))
            .agg(hll_sketch_agg(col("item")).as("dsk"))
          Some(cur.join(delta, Seq("bucket"), "full_outer")
            .select(col("bucket"),
              when(col("sk").isNull, col("dsk"))
                .when(col("dsk").isNull, col("sk"))
                .otherwise(hll_union(col("sk"), col("dsk"))).as("sk")))
        }
    }

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
             trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    provision(spark, prefix)
    spark.readStream.schema(eventSchema).parquet(srcDir)
      .writeStream.trigger(trigger)
      .option("checkpointLocation", ckptDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(spark, prefix, batch, batchId); ()
      }
      .start()
  }

  def drop(spark: SparkSession, prefix: String): Unit =
    FencedStore.drop(spark, fencePrefix(prefix))
}
