package graft

import graft.streaming.StreamingNearDup
import graft.streaming.StreamingNearDup.Pair
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Within-stream embedding near-dup: bounded LSH-bucket state across
  * micro-batches, exactly-once pair emission, recall/eviction trades. */
class StreamingNearDupSpec extends SparkSpec {
  import spark.implicits._

  private def ts(millis: Long) = new Timestamp(millis)

  test("streamed planted twins are each detected exactly once across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    // Corpus vectors arrive in batch 1, their planted twins in batch 2 —
    // the same gapped construction the batch oracles anchor on. Planted
    // recall at 8x4 is ~1 (cosine 0.9999); marginal random pairs may be
    // missed (that is the LSH trade), so the assertions are: every
    // planted pair found, every emitted pair exact-cosine-true and
    // arrival-ordered, and NO pair emitted twice despite 4 OR-tables.
    val base = Tables(spark, sfDir).embeddings
      .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
      .as[(Long, Seq[Double])].collect()
    val twins = base.filter(_._1 % 10 == 0).map { case (id, v) =>
      val r = v.reverse
      (id + 100000, v.zip(r).map { case (x, y) => x + y * 0.01 })
    }
    val vecsById = (base ++ twins).toMap
    def cosine(a: Seq[Double], b: Seq[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val input = MemoryStream[(Long, Timestamp, Seq[Double])]
    val q = StreamingNearDup.pairs(
        input.toDF().toDF("vec_id", "ts", "vec"), "ts", threshold = 0.8,
        nPlanes = 8, nTables = 4, maxPerBucket = 1000)
      .writeStream.outputMode("append")
      .format("memory").queryName("snd_out").start()
    try {
      input.addData(base.map { case (id, v) => (id, ts(id), v) }.toIndexedSeq: _*)
      q.processAllAvailable()
      input.addData(twins.map { case (id, v) => (id, ts(id), v) }.toIndexedSeq: _*)
      q.processAllAvailable()
      q.stop()
      val got = spark.table("snd_out").as[Pair].collect()
      // exactly-once: the first-agreeing-band rule, not a distinct
      assert(got.map(p => (p.old_id, p.new_id)).distinct.length == got.length,
        "a pair was emitted from more than one table")
      // precision 1: every emitted pair is cosine-true and arrival-ordered
      got.foreach { p =>
        assert(p.old_id < p.new_id, s"arrival order violated: $p")
        val c = cosine(vecsById(p.old_id), vecsById(p.new_id))
        assert(math.abs(c - p.cosine) < 1e-9 && c >= 0.8, s"false pair: $p vs $c")
      }
      // planted recall: every twin found its original
      val gotSet = got.map(p => (p.old_id, p.new_id)).toSet
      val planted = twins.map { case (id, _) => (id - 100000, id) }.toSet
      assert(planted.nonEmpty && planted.subsetOf(gotSet),
        s"missing planted pairs: ${planted -- gotSet}")
    } finally q.stop()
  }

  test("bucket state survives a query restart from the checkpoint") {
    // The production property: the vectors batch 1 left in bucket state
    // are recovered from the state store when a NEW query starts over
    // the same checkpoint, so twins arriving after the restart still
    // find their originals. File source + AvailableNow + parquet sink —
    // the same restart harness the KV pipeline's resume test uses.
    import java.nio.file.Files
    val inDir = Files.createTempDirectory("snd-in").toString
    val outDir = Files.createTempDirectory("snd-out").toString
    val ckpt = Files.createTempDirectory("snd-ckpt").toString
    val rnd = new scala.util.Random(17)
    val originals = (0L until 50L).map(i =>
      (i, ts(i), Seq.fill(16)(rnd.nextDouble() * 2 - 1)))
    val twins = originals.collect { case (i, _, v) if i % 5 == 0 =>
      (i + 1000L, ts(1000 + i), v.zip(v.reverse).map { case (x, y) => x + y * 0.01 })
    }
    def runOnce(rows: Seq[(Long, java.sql.Timestamp, Seq[Double])]): Unit = {
      rows.toDF("vec_id", "ts", "vec")
        .write.mode("append").parquet(inDir)
      val stream = spark.readStream
        .schema("vec_id LONG, ts TIMESTAMP, vec ARRAY<DOUBLE>")
        .parquet(inDir)
      val q = StreamingNearDup.pairs(stream, "ts", threshold = 0.99,
          nPlanes = 6, nTables = 4)
        .writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    runOnce(originals)   // batch 1: originals fill bucket state
    runOnce(twins)       // RESTARTED query: twins must hit recovered state
    val got = spark.read.parquet(outDir).as[Pair].collect()
      .map(p => (p.old_id, p.new_id)).toSet
    val expect = originals.collect { case (i, _, _) if i % 5 == 0 =>
      (i, i + 1000L) }.toSet
    assert(got == expect,
      s"missing ${expect -- got}, spurious ${got -- expect}")
  }

  test("state caps trade recall only: maxPerBucket and maxAgeMillis evict deterministically") {
    implicit val sqlCtx = spark.sqlContext
    // Three identical vectors across three micro-batches: all buckets
    // agree in every table, so exactly-once emission and eviction are
    // both exercised on a corpus small enough to enumerate.
    val v = Seq.tabulate(16)(i => (i % 5) - 2.0)
    def run(name: String, maxPerBucket: Int, maxAgeMillis: Long,
            times: Seq[Long]): Set[(Long, Long)] = {
      val input = MemoryStream[(Long, Timestamp, Seq[Double])]
      val q = StreamingNearDup.pairs(
          input.toDF().toDF("vec_id", "ts", "vec"), "ts", threshold = 0.99,
          nPlanes = 4, nTables = 2, maxPerBucket = maxPerBucket,
          maxAgeMillis = maxAgeMillis)
        .writeStream.outputMode("append")
        .format("memory").queryName(name).start()
      try {
        times.zipWithIndex.foreach { case (t, i) =>
          input.addData((i + 1L, ts(t), v))
          q.processAllAvailable()
        }
        q.stop()
        spark.table(name).as[Pair].collect()
          .map(p => (p.old_id, p.new_id)).toSet
      } finally q.stop()
    }
    // unbounded enough: every earlier-later pair, each exactly once
    assert(run("snd_all", 64, Long.MaxValue, Seq(0L, 1000L, 2000L)) ==
      Set((1L, 2L), (1L, 3L), (2L, 3L)))
    // cap 1: only the immediately-preceding vector is retained
    assert(run("snd_cap", 1, Long.MaxValue, Seq(0L, 1000L, 2000L)) ==
      Set((1L, 2L), (2L, 3L)))
    // age 1.5 s with arrivals at 0 s, 1 s, 10 s: the 10 s arrival finds
    // an empty bucket
    assert(run("snd_age", 64, 1500L, Seq(0L, 1000L, 10000L)) ==
      Set((1L, 2L)))
  }

  test("event-time idle eviction is replay-deterministic under different pacing") {
    implicit val sqlCtx = spark.sqlContext
    // v's bucket receives one vector, then sits silent for two batches
    // while OTHER traffic (-v: every hyperplane sign flips, so every
    // table's bucket differs) advances the watermark past its expiry —
    // the bucket is evicted on a silent batch, and v's later twin finds
    // empty state. The wall clock appears nowhere: a run paced with
    // sleeps between micro-batches must emit EXACTLY the same pairs,
    // which is the replay/backfill guarantee processing-time eviction
    // cannot give.
    val v = Seq.tabulate(16)(i => (i % 5) - 2.0)
    val nv = v.map(x => -x)
    def run(name: String, pauseMs: Long, idle: Option[Long]): Set[(Long, Long)] = {
      val input = MemoryStream[(Long, Timestamp, Seq[Double])]
      val q = StreamingNearDup.pairs(
          input.toDF().toDF("vec_id", "ts", "vec"), "ts", threshold = 0.99,
          nPlanes = 4, nTables = 2, eventTimeIdleMillis = idle)
        .writeStream.outputMode("append")
        .format("memory").queryName(name).start()
      try {
        Seq((1L, 0L, v), (10L, 5000L, nv), (11L, 6000L, nv), (2L, 7000L, v))
          .foreach { case (id, t, vec) =>
            input.addData((id, ts(t), vec))
            q.processAllAvailable()
            if (pauseMs > 0) Thread.sleep(pauseMs)
          }
        q.stop()
        spark.table(name).as[Pair].collect().map(p => (p.old_id, p.new_id)).toSet
      } finally q.stop()
    }
    // control — no idle eviction: v's bucket survives to its twin
    assert(run("snd_et_none", 0, None) == Set((10L, 11L), (1L, 2L)))
    // event-time idle 1.5 s: watermark (5000 entering batch 3) passes the
    // bucket's expiry (0 + 1500) while it is silent -> evicted -> no (1,2)
    val fast = run("snd_et_fast", 0, Some(1500L))
    val slow = run("snd_et_slow", 800, Some(1500L))
    assert(fast == Set((10L, 11L)), s"expected eviction to drop (1,2), got $fast")
    assert(slow == fast, s"pacing changed event-time eviction: $slow vs $fast")
  }
}
