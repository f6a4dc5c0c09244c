package graft.streaming

import graft.functions.SketchAggregators
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** A per-bucket KLL quantile-sketch table maintained from a value
  * stream — [[StreamingSketch]]'s pattern with quantiles instead of
  * distinct counts: each micro-batch builds its own per-bucket KLL
  * sketches ([[SketchAggregators.kllAgg]]) and folds them into the
  * stored ones by UNION-THEN-REAGGREGATE (stored rows and delta rows
  * union, then one `kllUnion` per bucket), behind [[FencedStore]]'s
  * batch-id fence; any date-range quantile question is answered from
  * the table alone ([[quantiles]]).
  *
  * Exactly-once honesty: unlike HLL (where re-observing an item cannot
  * move a register), KLL item inserts are NOT idempotent — a replayed
  * batch that escaped the fence would double-weight its values. The
  * batch-id fence is therefore the SINGLE line of defense here, exactly
  * as in [[Scd2Store]]; the spec replays a batch against the fence and
  * asserts the table bytes do not move.
  *
  * Scale: per batch, one bucket-keyed partial+final sketch aggregate of
  * the delta (map-side merge, fixed ~3 KB state per group at k=200),
  * then a (stored ∪ delta) re-aggregate that is bucket-table-sized —
  * never event-history-sized. */
object StreamingQuantiles {

  /** Event schema for [[stream]]: the bucket (e.g. epoch day) and the
    * double value whose per-bucket distribution the table maintains. */
  val eventSchema: StructType = StructType(Seq(
    StructField("bucket", LongType), StructField("value", DoubleType)))

  private val tableSchema = StructType(Seq(
    StructField("bucket", LongType), StructField("sk", BinaryType)))

  private def fencePrefix(prefix: String) = s"${prefix}_kll"

  def provision(spark: SparkSession, prefix: String): Unit =
    FencedStore.provision(spark, fencePrefix(prefix), tableSchema)

  /** The sketch table as of the last applied batch. */
  def current(spark: SparkSession, prefix: String): DataFrame =
    FencedStore.current(spark, fencePrefix(prefix))

  /** Fold one micro-batch of (bucket, value) rows in. */
  def applyBatch(spark: SparkSession, prefix: String, batch: DataFrame,
                 batchId: Long, k: Int = 200): Boolean =
    FencedStore.applyBatch(spark, fencePrefix(prefix), tableSchema, batchId) {
      cur =>
        if (batch.isEmpty) None
        else {
          val delta = batch.groupBy(col("bucket"))
            .agg(SketchAggregators.kllAgg(col("value"), k).as("sk"))
          Some(cur.select(col("bucket"), col("sk")).unionByName(delta)
            .groupBy(col("bucket"))
            .agg(SketchAggregators.kllUnion(col("sk"), k).as("sk")))
        }
    }

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
    provision(spark, prefix)
    spark.readStream.schema(eventSchema).parquet(srcDir)
      .writeStream.trigger(trigger)
      .option("checkpointLocation", ckptDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(spark, prefix, batch, batchId, k); ()
      }
      .start()
  }

  def drop(spark: SparkSession, prefix: String): Unit =
    FencedStore.drop(spark, fencePrefix(prefix))
}
