package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** The one batch-id-fenced ping-pong table implementation (shared by
  * [[Scd2Store]], [[StreamingSketch]], and any future foreachBatch-
  * maintained table): exactly-once TABLE STATE manufactured from
  * at-least-once micro-batch replays.
  *
  *  - `<prefix>_meta` (stable, empty) carries `graft.fence.batch` (last
  *    applied batch id) and `graft.fence.active` (`a`/`b`);
  *  - a batch reads the ACTIVE side, writes its successor to the
  *    INACTIVE side, and flips both properties in ONE catalog call.
  *
  * Crash before the flip → the replay re-reads the untouched active
  * side and overwrites the half-written inactive side; crash after →
  * the replay fences out on the batch id. A reader can never observe a
  * partial table. */
object FencedStore {

  def metaTable(prefix: String): String = s"${prefix}_meta"
  def sideTable(prefix: String, s: String): String = s"${prefix}_$s"

  private def setProps(spark: SparkSession, table: String,
                       props: Map[String, String]): Unit =
    graft.sources.CatalogProps.setProps(spark, table, props)

  private def prop(spark: SparkSession, table: String, key: String): String =
    graft.sources.CatalogProps.prop(spark, table, key, "FencedStore")

  private def emptyOf(spark: SparkSession, schema: StructType): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)

  /** Create meta + two empty sides if absent; stale warehouse
    * directories without catalog entries are cleared first (fresh
    * in-memory catalog over a persistent filesystem). */
  def provision(spark: SparkSession, prefix: String,
                schema: StructType): Unit =
    if (!spark.catalog.tableExists(metaTable(prefix))) {
      Seq(metaTable(prefix), sideTable(prefix, "a"), sideTable(prefix, "b"))
        .foreach(t => graft.sources.Bucketing.dropManagedTable(spark, t))
      emptyOf(spark, schema).write.saveAsTable(sideTable(prefix, "a"))
      emptyOf(spark, schema).write.saveAsTable(sideTable(prefix, "b"))
      emptyOf(spark, schema).limit(0).write.saveAsTable(metaTable(prefix))
      setProps(spark, metaTable(prefix),
        Map("graft.fence.batch" -> "-1", "graft.fence.active" -> "a"))
    }

  /** The table as of the last applied batch. */
  def current(spark: SparkSession, prefix: String): DataFrame =
    spark.table(sideTable(prefix,
      prop(spark, metaTable(prefix), "graft.fence.active")))

  /** Apply one micro-batch: `merge(activeSide)` produces the successor
    * table (return None for a no-op batch — the fence still advances,
    * no rewrite). Returns false if the batch id was already applied. */
  def applyBatch(spark: SparkSession, prefix: String, schema: StructType,
                 batchId: Long)(
                 merge: DataFrame => Option[DataFrame]): Boolean = {
    provision(spark, prefix, schema)
    val last = prop(spark, metaTable(prefix), "graft.fence.batch").toLong
    if (batchId <= last) return false
    val active = prop(spark, metaTable(prefix), "graft.fence.active")
    merge(spark.table(sideTable(prefix, active))) match {
      case None =>
        setProps(spark, metaTable(prefix),
          Map("graft.fence.batch" -> batchId.toString))
      case Some(merged) =>
        val other = if (active == "a") "b" else "a"
        merged.localCheckpoint(true)
          .write.mode("overwrite").saveAsTable(sideTable(prefix, other))
        setProps(spark, metaTable(prefix), Map(
          "graft.fence.batch" -> batchId.toString,
          "graft.fence.active" -> other))
    }
    true
  }

  def drop(spark: SparkSession, prefix: String): Unit =
    Seq(metaTable(prefix), sideTable(prefix, "a"), sideTable(prefix, "b"))
      .foreach { t =>
        if (spark.catalog.tableExists(t))
          graft.sources.Bucketing.dropManagedTable(spark, t)
      }
}
