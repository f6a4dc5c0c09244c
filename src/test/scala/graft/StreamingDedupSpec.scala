package graft

import graft.streaming.StreamingDedup
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.nio.file.Files
import java.sql.Timestamp

/** Streaming ingestion dedup: duplicates inside the watermark window are
  * dropped, state expires once the watermark passes, and the key is the
  * fixed-width fingerprint (bounded state however large the documents). */
class StreamingDedupSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("dropDupesWithinWatermark: in-window dupes dropped, state expires") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Timestamp)]
    val deduped = StreamingDedup.dropDupesWithinWatermark(
      input.toDF().toDF("text", "ts"), col("text"), "ts", "10 minutes")
    val ckpt = Files.createTempDirectory("ckpt-dedup").toString
    val q = deduped.writeStream.format("memory").queryName("dedup_out")
      .option("checkpointLocation", ckpt).outputMode("append").start()

    def emitted(): Map[String, Long] =
      spark.table("dedup_out").groupBy("text").count()
        .as[(String, Long)].collect().toMap

    // batch 1: A twice + B once -> one A, one B survive
    input.addData(("docA", ts("2024-01-01 10:00:00")),
      ("docA", ts("2024-01-01 10:01:00")), ("docB", ts("2024-01-01 10:00:30")))
    q.processAllAvailable()
    assert(emitted() == Map("docA" -> 1L, "docB" -> 1L))

    // batch 2: A again within the window -> dropped (state hit)
    input.addData(("docA", ts("2024-01-01 10:02:00")))
    q.processAllAvailable()
    assert(emitted() == Map("docA" -> 1L, "docB" -> 1L))

    // advance event time far past the window so A's state expires...
    input.addData(("docC", ts("2024-01-01 11:00:00")))
    q.processAllAvailable()
    // ...then A re-arrives: admitted again (re-ingest outside the window
    // is reprocessing, not a streaming duplicate)
    input.addData(("docA", ts("2024-01-01 11:01:00")))
    q.processAllAvailable()
    q.stop()
    assert(emitted() == Map("docA" -> 2L, "docB" -> 1L, "docC" -> 1L))
  }

  test("dropDupesUnbounded keeps exactly one row per distinct text") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Timestamp)]
    val deduped = StreamingDedup.dropDupesUnbounded(
      input.toDF().toDF("text", "ts"), col("text"))
    val ckpt = Files.createTempDirectory("ckpt-dedup2").toString
    val q = deduped.writeStream.format("memory").queryName("dedup_out2")
      .option("checkpointLocation", ckpt).outputMode("append").start()
    input.addData(("x", ts("2024-01-01 10:00:00")), ("x", ts("2024-01-01 10:05:00")),
      ("y", ts("2024-01-01 10:01:00")))
    q.processAllAvailable()
    // unbounded: a dupe never re-emits, however far apart
    input.addData(("x", ts("2024-03-01 00:00:00")))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("dedup_out2").select("text").as[String].collect().sorted
    assert(out.toSeq == Seq("x", "y"))
  }
}
