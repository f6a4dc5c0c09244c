package graft

import graft.streaming.StreamingSessionize
import graft.streaming.StreamingSessionize.{Assigned, Event}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Stateful streaming: session state carried across micro-batches, and
  * streaming dedup within a watermark. */
class StreamingStateSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("streaming sessionize: state continues sessions across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = StreamingSessionize.assign(input.toDS(), gapSeconds = 1800)
      .writeStream.outputMode("append")
      .format("memory").queryName("sess_out").start()

    // batch 1: two events 10 min apart -> one session
    input.addData(
      Event(1L, ts("2024-01-01 10:00:00"), 1.0),
      Event(1L, ts("2024-01-01 10:10:00"), 1.0))
    q.processAllAvailable()
    // batch 2: 5 min after last (same session), then a 2h gap (new session)
    input.addData(
      Event(1L, ts("2024-01-01 10:15:00"), 1.0),
      Event(1L, ts("2024-01-01 12:30:00"), 1.0))
    q.processAllAvailable()
    val got = spark.table("sess_out").as[Assigned].collect()
      .map(a => a.ts -> a.session_id).toMap
    q.stop()
    assert(got == Map(
      ts("2024-01-01 10:00:00") -> 1L,
      ts("2024-01-01 10:10:00") -> 1L,
      ts("2024-01-01 10:15:00") -> 1L,   // continued from state across batches
      ts("2024-01-01 12:30:00") -> 2L))
  }

  test("stream-stream interval join attributes clicks within the window") {
    implicit val sqlCtx = spark.sqlContext
    val imps = MemoryStream[(Long, Long, Timestamp)]
    val clicks = MemoryStream[(Long, Long, Timestamp)]
    val joined = graft.streaming.StreamJoin.intervalJoin(
      imps.toDF().toDF("imp_id", "k", "left_ts"),
      clicks.toDF().toDF("click_id", "k", "right_ts"),
      window = "30 minutes", delay = "10 minutes")
    val q = joined.select("imp_id", "click_id")
      .writeStream.outputMode("append")
      .format("memory").queryName("attrib_out").start()

    imps.addData(
      (100L, 1L, ts("2024-01-01 10:00:00")),   // clicked 10 min later
      (101L, 2L, ts("2024-01-01 10:00:00")),   // clicked too late (45 min)
      (102L, 3L, ts("2024-01-01 10:00:00")))   // never clicked
    clicks.addData(
      (900L, 1L, ts("2024-01-01 10:10:00")),
      (901L, 2L, ts("2024-01-01 10:45:00")),
      (902L, 9L, ts("2024-01-01 10:05:00")))   // key with no impression
    q.processAllAvailable()
    val got = spark.table("attrib_out").as[(Long, Long)].collect().toSet
    q.stop()
    assert(got == Set((100L, 900L)))
  }

  test("stream-static join enriches a stream against a dimension table") {
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq((1L, "gold"), (2L, "silver")).toDF("user_id", "tier")
    val input = MemoryStream[Long]
    val joined = input.toDF().toDF("user_id")
      .join(broadcast(dim), Seq("user_id"), "left")
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("enrich_out").start()
    input.addData(1L, 2L, 3L)
    q.processAllAvailable()
    val got = spark.table("enrich_out")
      .as[(Long, Option[String])].collect().toMap
    q.stop()
    assert(got == Map(1L -> Some("gold"), 2L -> Some("silver"), 3L -> None))
  }

  test("streaming dedup within watermark drops replayed ids") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp)]
    val deduped = input.toDF().toDF("id", "ts")
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("id")
    val q = deduped.writeStream.outputMode("append")
      .format("memory").queryName("dedup_out").start()
    input.addData((1L, ts("2024-01-01 10:00:00")), (2L, ts("2024-01-01 10:01:00")))
    q.processAllAvailable()
    input.addData((1L, ts("2024-01-01 10:05:00")), (3L, ts("2024-01-01 10:06:00")))
    q.processAllAvailable()
    val ids = spark.table("dedup_out").select("id").as[Long].collect().sorted
    q.stop()
    assert(ids.toSeq == Seq(1L, 2L, 3L))   // replayed id 1 dropped
  }
}
