package graft

import graft.operators.Cdc
import graft.streaming.Scd2Store
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class Scd2StoreSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def changes(rows: (Long, String, String, Long)*) =
    rows.map { case (k, t, a, q) => (k, ts(t), a, q) }
      .toDF("key", "ts", "attr", "seq")

  private val wave1 = Seq(
    (1L, "2024-01-01 10:00:00", "bronze", 1L),
    (1L, "2024-01-02 10:00:00", "silver", 2L),
    (2L, "2024-01-01 12:00:00", "bronze", 3L))
  private val wave2 = Seq(
    (1L, "2024-01-05 09:00:00", "gold", 4L),
    (2L, "2024-01-06 09:00:00", "bronze", 5L),   // no-change: extends
    (3L, "2024-01-06 10:00:00", "silver", 6L))   // new key

  private def rebuilt(rows: Seq[(Long, String, String, Long)]) =
    Cdc.scd2FromHistory(changes(rows: _*), col("key"), col("ts"),
        col("attr"), Seq(col("seq")))
      .orderBy("key", "valid_from")
      .as[(Long, String, Timestamp, Option[Timestamp], Boolean)]
      .collect().toSeq

  private def dim(prefix: String) =
    Scd2Store.current(spark, prefix).orderBy("key", "valid_from")
      .as[(Long, String, Timestamp, Option[Timestamp], Boolean)]
      .collect().toSeq

  // the file source does not recurse: land each wave as a flat file
  private def land(root: String, name: String,
                   rows: Seq[(Long, String, String, Long)]): Unit = {
    val tmp = s"$root/tmp_$name"
    changes(rows: _*).coalesce(1).write.parquet(tmp)
    val part = new java.io.File(tmp).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$root/src"))
    java.nio.file.Files.move(part.toPath,
      java.nio.file.Paths.get(s"$root/src/$name.parquet"))
  }

  test("stream drives the store to the full-history rebuild across restarts") {
    val root = java.nio.file.Files.createTempDirectory("scd2s").toString
    Scd2Store.drop(spark, "t1")
    land(root, "w1", wave1)
    var q = Scd2Store.stream(spark, s"$root/src", "t1", s"$root/ckpt")
    q.awaitTermination()
    assert(dim("t1") == rebuilt(wave1))
    land(root, "w2", wave2)
    q = Scd2Store.stream(spark, s"$root/src", "t1", s"$root/ckpt")
    q.awaitTermination()
    assert(dim("t1") == rebuilt(wave1 ++ wave2),
      "resumed stream must fold only the new files, to the rebuild state")
    Scd2Store.drop(spark, "t1")
  }

  test("fence: a replayed batch id is a no-op; empty batches advance it") {
    Scd2Store.drop(spark, "t2")
    assert(Scd2Store.applyBatch(spark, "t2", changes(wave1: _*), 0L))
    val before = dim("t2")
    assert(!Scd2Store.applyBatch(spark, "t2", changes(wave1: _*), 0L),
      "same batch id must fence")
    assert(dim("t2") == before)
    assert(Scd2Store.applyBatch(spark, "t2",
      changes(wave1: _*).limit(0), 1L))
    assert(!Scd2Store.applyBatch(spark, "t2", changes(wave1: _*), 1L),
      "fence must have advanced past the empty batch")
    Scd2Store.drop(spark, "t2")
  }

  test("crash before the flip: a half-written inactive side is overwritten on replay") {
    Scd2Store.drop(spark, "t3")
    assert(Scd2Store.applyBatch(spark, "t3", changes(wave1: _*), 0L))
    // simulate a batch-1 attempt that died after writing the inactive
    // side but before the property flip: garbage on the inactive side
    val active = spark.sql("SHOW TBLPROPERTIES t3_scd2_meta")
      .filter(col("key") === "graft.fence.active").head().getString(1)
    val other = if (active == "a") "b" else "a"
    changes((99L, "2024-01-01 00:00:00", "junk", 0L))
      .select(col("key"), col("attr"), col("ts").as("valid_from"),
        lit(null).cast("timestamp").as("valid_to"),
        lit(true).as("is_current"))
      .write.mode("overwrite").saveAsTable(s"t3_scd2_$other")
    // the replayed batch 1 re-merges the UNTOUCHED active side
    assert(Scd2Store.applyBatch(spark, "t3", changes(wave2: _*), 1L))
    assert(dim("t3") == rebuilt(wave1 ++ wave2))
    Scd2Store.drop(spark, "t3")
  }
}
