package graft

import graft.operators.PrefPrep
import graft.streaming.StreamingPref
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.nio.file.Files
import java.sql.Timestamp

/** StreamingPref: the pair verdict runs on a stream verbatim, the gate
  * drops structural rejects and in-window duplicate PROMPTS, and the
  * streamed verdicts are bitwise the batch operator's on the same
  * rows. */
class StreamingPrefSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def promptCol = transform(col("_3"),
    t => struct(t.getField("_1").as("role"), t.getField("_2").as("content")))

  test("gate: structural rejects and in-window duplicate prompts are " +
       "dropped; valid distinct-prompt pairs pass") {
    implicit val sqlCtx = spark.sqlContext
    val input =
      MemoryStream[(Long, Timestamp, Seq[(String, String)], String, String)]
    val base = input.toDF().select(col("_1").as("pair_id"),
      col("_2").as("ts"), promptCol.as("prompt"),
      col("_4").as("chosen"), col("_5").as("rejected"))
    val gated = StreamingPref.gate(base, col("prompt"), col("chosen"),
      col("rejected"), "ts", "10 minutes")
    val ckpt = Files.createTempDirectory("ckpt-pref").toString
    val q = gated.writeStream.format("memory").queryName("pref_gate")
      .option("checkpointLocation", ckpt).outputMode("append").start()

    val t0 = ts("2024-01-01 10:00:00")
    input.addData(
      (1L, t0, Seq("user" -> "pick one"), "seven", "four"),
      (2L, t0, Seq("user" -> "pick one"), "nine", "two"), // dup prompt
      (3L, t0, Seq("user" -> "tie?"), "same", "same"), // identical
      (4L, t0, Seq("user" -> "empty?"), "a", ""), // rejected empty
      (5L, t0, Seq("user" -> "fresh"), "a", "b"))
    q.processAllAvailable()
    val ids1 = spark.table("pref_gate").select("pair_id")
      .as[Long].collect().toSet
    assert(ids1 == Set(1L, 5L), ids1.toString)

    // in-window duplicate prompt still dropped; a new prompt passes
    input.addData(
      (6L, ts("2024-01-01 10:05:00"), Seq("user" -> "fresh"), "c", "d"),
      (7L, ts("2024-01-01 10:05:00"), Seq("user" -> "brand new"),
        "c", "d"))
    q.processAllAvailable()
    q.stop()
    val ids2 = spark.table("pref_gate").select("pair_id")
      .as[Long].collect().toSet
    assert(ids2 == Set(1L, 5L, 7L), ids2.toString)
  }

  test("streamed rejects carry the batch verdict's named reasons, " +
       "bitwise") {
    implicit val sqlCtx = spark.sqlContext
    val input =
      MemoryStream[(Long, Timestamp, Seq[(String, String)], String, String)]
    val base = input.toDF().select(col("_1").as("pair_id"),
      col("_2").as("ts"), promptCol.as("prompt"),
      col("_4").as("chosen"), col("_5").as("rejected"))
    val rejects = StreamingPref.rejects(base, col("pair_id"),
      col("prompt"), col("chosen"), col("rejected"))
    val ckpt = Files.createTempDirectory("ckpt-pref-r").toString
    val q = rejects.writeStream.format("memory").queryName("pref_rej")
      .option("checkpointLocation", ckpt).outputMode("append").start()
    val t0 = ts("2024-01-01 10:00:00")
    val rows = Seq(
      (1L, t0, Seq("user" -> "ok"), "a", "b"),
      (2L, t0, Seq("user" -> "q", "assistant" -> "dangling"), "a", "b"),
      (3L, t0, Seq("user" -> "q"), "same", "same"),
      (4L, t0, Seq("user" -> "q2"), "", "x"))
    input.addData(rows: _*)
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("pref_rej")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val batch = PrefPrep.validate(
        rows.toDF("pair_id", "ts", "prompt0", "chosen", "rejected")
          .select(col("pair_id"),
            transform(col("prompt0"), t =>
              struct(t.getField("_1").as("role"),
                t.getField("_2").as("content"))).as("prompt"),
            col("chosen"), col("rejected")),
        col("pair_id"), col("prompt"), col("chosen"), col("rejected"))
      .filter(!col("valid"))
      .collect().map(r => (r.getLong(0), r.getString(2))).toSet
    assert(streamed == batch, s"$streamed vs $batch")
    assert(batch == Set((2L, "chosen_role_alternation"),
      (3L, "identical_branches"), (4L, "chosen_empty_content")))
  }
}
