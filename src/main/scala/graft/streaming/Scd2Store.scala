package graft.streaming

import graft.operators.Cdc
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** A persisted SCD2 dimension maintained by a CDC stream — the
  * warehouse's "type-2 dimension fed by the change-capture topic",
  * rebuilt on this engine's terms: change batches fold in through
  * [[Cdc.scd2Merge]] (provably identical to a full-history rebuild)
  * and the dimension lives behind [[FencedStore]]'s batch-id fence +
  * ping-pong sides, so foreachBatch's at-least-once replays yield
  * exactly-once dimension state (each crash window is spec'd: die
  * before the flip → the replay re-merges the untouched active side;
  * die after → the replay fences out; re-applying never trips the
  * merge's late-event guard because the guard only ever sees the
  * pre-merge active side).
  *
  * Scale: per batch, [[Cdc.scd2Merge]]'s key-sized guard + batch-sized
  * windows, plus one dimension rewrite. The rewrite is the honest cost
  * of SCD2-on-parquet (closed versions are immutable but co-located);
  * at warehouse scale the same fence+merge drives a MERGE INTO on a
  * table format with row-level replace, with the plan shape unchanged. */
object Scd2Store {

  /** Change-record schema for [[stream]]: `seq` breaks timestamp ties. */
  val changeSchema: StructType = StructType(Seq(
    StructField("key", LongType), StructField("ts", TimestampType),
    StructField("attr", StringType), StructField("seq", LongType)))

  private val dimSchema = StructType(Seq(
    StructField("key", LongType), StructField("attr", StringType),
    StructField("valid_from", TimestampType),
    StructField("valid_to", TimestampType),
    StructField("is_current", BooleanType)))

  private def fencePrefix(prefix: String) = s"${prefix}_scd2"

  /** Create the store if absent. */
  def provision(spark: SparkSession, prefix: String): Unit =
    FencedStore.provision(spark, fencePrefix(prefix), dimSchema)

  /** The dimension as of the last applied batch. */
  def current(spark: SparkSession, prefix: String): DataFrame =
    FencedStore.current(spark, fencePrefix(prefix))

  /** Fold one change batch into the dimension; replay-safe (see class
    * doc). Returns true if the batch was applied, false if fenced. */
  def applyBatch(spark: SparkSession, prefix: String, batch: DataFrame,
                 batchId: Long): Boolean =
    FencedStore.applyBatch(spark, fencePrefix(prefix), dimSchema, batchId) {
      cur =>
        if (batch.isEmpty) None // nothing to merge; fence still advances
        else Some(Cdc.scd2Merge(cur, batch,
          col("key"), col("ts"), col("attr"), Seq(col("seq"))))
    }

  /** Drive the store from parquet change files arriving in `srcDir`
    * ([[changeSchema]] rows); restart with the same `ckptDir` resumes
    * from the last committed micro-batch, and the fence absorbs the
    * replayed one. */
  def stream(spark: SparkSession, srcDir: String, prefix: String,
             ckptDir: String,
             trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    provision(spark, prefix)
    spark.readStream.schema(changeSchema).parquet(srcDir)
      .writeStream.trigger(trigger)
      .option("checkpointLocation", ckptDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(spark, prefix, batch, batchId); ()
      }
      .start()
  }

  /** Drop both sides and the meta table (test/maintenance hygiene). */
  def drop(spark: SparkSession, prefix: String): Unit =
    FencedStore.drop(spark, fencePrefix(prefix))
}
