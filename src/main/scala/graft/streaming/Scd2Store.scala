package graft.streaming

import graft.operators.Cdc
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** A persisted SCD2 dimension maintained by a CDC stream — the
  * warehouse's "type-2 dimension fed by the change-capture topic",
  * rebuilt on this engine's terms: change batches fold in through
  * [[Cdc.scd2Merge]] (provably identical to a full-history rebuild),
  * the dimension lives as a managed parquet table, and EXACTLY-ONCE
  * dimension state is manufactured from `foreachBatch`'s at-least-once
  * replays by a batch-id fence plus ping-pong table versions:
  *
  *  - the STABLE meta table carries `graft.scd2.batch` (the last
  *    applied batch id) and `graft.scd2.active` (`a`/`b` — which side
  *    holds the dimension);
  *  - a batch merges the ACTIVE side and overwrites the INACTIVE one,
  *    then flips both properties in ONE catalog call.
  *
  * Crash windows: die before the flip → the replayed batch re-merges
  * the untouched active side and overwrites the half-written inactive
  * side again; die after → the replay's `batchId <= last` makes it a
  * no-op. In neither window can a reader observe a partial dimension,
  * and re-applying never trips the merge's late-event guard because the
  * guard only ever sees the pre-merge active side.
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

  private def metaTable(prefix: String) = s"${prefix}_scd2"
  private def side(prefix: String, s: String) = s"${prefix}_scd2_$s"

  private def setProps(spark: SparkSession, table: String,
                       props: Map[String, String]): Unit =
    spark.sql(s"ALTER TABLE $table SET TBLPROPERTIES (" +
      props.map { case (k, v) => s"'$k'='$v'" }.mkString(", ") + ")")

  private def prop(spark: SparkSession, table: String, key: String): String = {
    val rows = spark.sql(s"SHOW TBLPROPERTIES $table")
      .filter(col("key") === key).collect()
    require(rows.nonEmpty,
      s"table $table has no '$key' property — not built by Scd2Store?")
    rows(0).getString(1)
  }

  private def emptyDim(spark: SparkSession): DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(
        StructField("key", LongType), StructField("attr", StringType),
        StructField("valid_from", TimestampType),
        StructField("valid_to", TimestampType),
        StructField("is_current", BooleanType))))

  /** Create the store (meta + two empty sides) if absent. A stale
    * warehouse directory without a catalog entry (a past session died
    * mid-provision, or the catalog is fresh while the filesystem is
    * not) is cleared first — the catalog is the source of truth. */
  def provision(spark: SparkSession, prefix: String): Unit =
    if (!spark.catalog.tableExists(metaTable(prefix))) {
      Seq(metaTable(prefix), side(prefix, "a"), side(prefix, "b"))
        .foreach(t => graft.sources.Bucketing.dropManagedTable(spark, t))
      emptyDim(spark).write.saveAsTable(side(prefix, "a"))
      emptyDim(spark).write.saveAsTable(side(prefix, "b"))
      emptyDim(spark).limit(0).write.saveAsTable(metaTable(prefix))
      setProps(spark, metaTable(prefix),
        Map("graft.scd2.batch" -> "-1", "graft.scd2.active" -> "a"))
    }

  /** The dimension as of the last applied batch. */
  def current(spark: SparkSession, prefix: String): DataFrame =
    spark.table(side(prefix, prop(spark, metaTable(prefix), "graft.scd2.active")))

  /** Fold one change batch into the dimension; replay-safe (see class
    * doc). Returns true if the batch was applied, false if fenced. */
  def applyBatch(spark: SparkSession, prefix: String, batch: DataFrame,
                 batchId: Long): Boolean = {
    provision(spark, prefix)
    val last = prop(spark, metaTable(prefix), "graft.scd2.batch").toLong
    if (batchId <= last) return false
    if (batch.isEmpty) {  // nothing to merge; still advance the fence
      setProps(spark, metaTable(prefix),
        Map("graft.scd2.batch" -> batchId.toString))
      return true
    }
    val active = prop(spark, metaTable(prefix), "graft.scd2.active")
    val other = if (active == "a") "b" else "a"
    val merged = Cdc.scd2Merge(spark.table(side(prefix, active)), batch,
        col("key"), col("ts"), col("attr"), Seq(col("seq")))
      .localCheckpoint(true)
    merged.write.mode("overwrite").saveAsTable(side(prefix, other))
    setProps(spark, metaTable(prefix), Map(
      "graft.scd2.batch" -> batchId.toString, "graft.scd2.active" -> other))
    true
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
    Seq(metaTable(prefix), side(prefix, "a"), side(prefix, "b")).foreach { t =>
      if (spark.catalog.tableExists(t))
        graft.sources.Bucketing.dropManagedTable(spark, t)
    }
}
