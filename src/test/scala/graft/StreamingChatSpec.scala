package graft

import graft.operators.ChatPrep
import graft.streaming.StreamingChat
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.nio.file.Files
import java.sql.Timestamp

/** StreamingChat: the pure-projection chat ops run on a stream
  * verbatim, the gate drops structural rejects and in-window duplicate
  * assistant content, and the streamed verdicts/renders are bitwise
  * the batch operator's output on the same rows. */
class StreamingChatSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  // (conv_id, ts, turns as (role, content) pairs) -> streaming-shaped DF
  private def turnsCol = transform(col("_3"),
    t => struct(t.getField("_1").as("role"), t.getField("_2").as("content")))

  test("gate: structural rejects and in-window duplicate assistant " +
       "content are dropped; valid distinct conversations pass") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, Seq[(String, String)])]
    val base = input.toDF().select(col("_1").as("conv_id"),
      col("_2").as("ts"), turnsCol.as("turns"))
    val gated = StreamingChat.gate(base, col("turns"), "ts", "10 minutes")
    val ckpt = Files.createTempDirectory("ckpt-chat").toString
    val q = gated.writeStream.format("memory").queryName("chat_gate")
      .option("checkpointLocation", ckpt).outputMode("append").start()

    val t0 = ts("2024-01-01 10:00:00")
    input.addData(
      (1L, t0, Seq("user" -> "q one", "assistant" -> "answer a")),
      (2L, t0, Seq("user" -> "q two", "assistant" -> "answer a")), // dup
      (3L, t0, Seq("assistant" -> "orphan")), // first_not_user
      (4L, t0, Seq("user" -> "q", "assistant" -> ""))) // empty_content
    q.processAllAvailable()
    val ids1 = spark.table("chat_gate").select("conv_id")
      .as[Long].collect().toSet
    assert(ids1 == Set(1L), ids1.toString)

    // next batch: same assistant content still in-window -> dropped;
    // new content admitted
    input.addData(
      (5L, ts("2024-01-01 10:05:00"),
        Seq("user" -> "rephrased", "assistant" -> "answer a")),
      (6L, ts("2024-01-01 10:05:00"),
        Seq("user" -> "q", "assistant" -> "answer b")))
    q.processAllAvailable()
    q.stop()
    val ids2 = spark.table("chat_gate").select("conv_id")
      .as[Long].collect().toSet
    assert(ids2 == Set(1L, 6L), ids2.toString)
  }

  test("streamed verdicts and renders are bitwise the batch operator " +
       "on the same rows; rejects carry the named reasons") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, Seq[(String, String)])]
    val base = input.toDF().select(col("_1").as("conv_id"),
      col("_2").as("ts"), turnsCol.as("turns"))
    val rejects = StreamingChat.rejects(base, col("conv_id"), col("turns"))
    val rendered = StreamingChat.rendered(
      StreamingChat.validOnly(base, col("turns")),
      col("conv_id"), col("turns"))
    val ck1 = Files.createTempDirectory("ckpt-chat-r").toString
    val ck2 = Files.createTempDirectory("ckpt-chat-v").toString
    val q1 = rejects.writeStream.format("memory").queryName("chat_rej")
      .option("checkpointLocation", ck1).outputMode("append").start()
    val q2 = rendered.writeStream.format("memory").queryName("chat_ren")
      .option("checkpointLocation", ck2).outputMode("append").start()

    val t0 = ts("2024-01-01 10:00:00")
    val rows = Seq(
      (1L, t0, Seq("user" -> "hi", "assistant" -> "hello")),
      (2L, t0, Seq("user" -> "q", "user" -> "q2", "assistant" -> "a")),
      (3L, t0, Seq("system" -> "s", "user" -> "q", "assistant" -> "a")),
      (4L, t0, Seq("user" -> "q", "tool" -> "x")))
    input.addData(rows: _*)
    q1.processAllAvailable(); q2.processAllAvailable()
    q1.stop(); q2.stop()

    val streamedRej = spark.table("chat_rej")
      .as[(Long, String)].collect().toSet
    assert(streamedRej ==
      Set(2L -> "role_alternation", 4L -> "bad_role"), streamedRej.toString)

    // batch replay of the same rows through the batch operator
    val batchDf = rows.toDF("conv_id", "ts", "turns")
      .select(col("conv_id"), col("ts"),
        transform(col("turns"), t => struct(t.getField("_1").as("role"),
          t.getField("_2").as("content"))).as("turns"))
    val batchRendered = ChatPrep.render(
      batchDf.filter(ChatPrep.reasonCol(col("turns")).isNull),
      col("conv_id"), col("turns"))
      .select("conv_id", "rendered").as[(Long, String)].collect().toSet
    val streamedRen = spark.table("chat_ren")
      .select("conv_id", "rendered").as[(Long, String)].collect().toSet
    assert(streamedRen == batchRendered, streamedRen.toString)
    assert(streamedRen.map(_._1) == Set(1L, 3L))
  }

  test("gate survives a checkpoint restart: committed batches are not " +
       "re-emitted, dedup state persists across the restart") {
    import org.apache.spark.sql.streaming.Trigger
    import org.apache.spark.sql.types._
    val srcDir = Files.createTempDirectory("chat-src").toString
    val outDir = Files.createTempDirectory("chat-out").toString
    val ckpt = Files.createTempDirectory("chat-ck").toString
    val schema = StructType(Seq(
      StructField("conv_id", LongType),
      StructField("ts", TimestampType),
      StructField("turns", ArrayType(StructType(Seq(
        StructField("role", StringType),
        StructField("content", StringType)))))))
    def mk(rows: Seq[(Long, Timestamp, Seq[(String, String)])]): Unit =
      rows.toDF("conv_id", "ts", "turns")
        .select(col("conv_id"), col("ts"),
          transform(col("turns"), t => struct(t.getField("_1").as("role"),
            t.getField("_2").as("content"))).as("turns"))
        .coalesce(1).write.mode("append").parquet(srcDir)
    def runOnce(): Unit = {
      val src = spark.readStream.schema(schema).parquet(srcDir)
      val q = StreamingChat.gate(src, col("turns"), "ts", "10 minutes")
        .select("conv_id")
        .writeStream.format("parquet").option("path", outDir)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    val t0 = ts("2024-01-01 10:00:00")
    mk(Seq(
      (1L, t0, Seq("user" -> "q", "assistant" -> "answer a")),
      (2L, t0, Seq("user" -> "other q", "assistant" -> "answer a")),
      (3L, t0, Seq("assistant" -> "orphan"))))
    runOnce()
    assert(spark.read.parquet(outDir).select("conv_id")
      .as[Long].collect().toSet == Set(1L))
    // restart over the same checkpoint with a second file: the old
    // batch is not re-emitted, and the dedup state still rejects the
    // in-window duplicate
    mk(Seq(
      (4L, ts("2024-01-01 10:05:00"),
        Seq("user" -> "rephrased", "assistant" -> "answer a")),
      (5L, ts("2024-01-01 10:05:00"),
        Seq("user" -> "q", "assistant" -> "answer b"))))
    runOnce()
    assert(spark.read.parquet(outDir).select("conv_id")
      .as[Long].collect().toSet == Set(1L, 5L))
  }
}
