package graft

import graft.streaming.StreamingSketch
import org.apache.spark.sql.functions._

class StreamingSketchSpec extends SparkSpec {
  import spark.implicits._

  // (bucket, item): 3 buckets, heavy overlap across waves so unions matter
  private def wave(lo: Int, hi: Int) =
    (for (b <- 0L to 2L; i <- lo to hi) yield (b, (i + b * 7) % 400))
      .toDF("bucket", "item")

  private def land(root: String, name: String,
                   df: org.apache.spark.sql.DataFrame): Unit = {
    val tmp = s"$root/tmp_$name"
    df.coalesce(1).write.parquet(tmp)
    val part = new java.io.File(tmp).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$root/src"))
    java.nio.file.Files.move(part.toPath,
      java.nio.file.Paths.get(s"$root/src/$name.parquet"))
  }

  test("streamed sketch table estimates == batch-built; replay leaves them identical") {
    val root = java.nio.file.Files.createTempDirectory("hlls").toString
    StreamingSketch.drop(spark, "hx")
    land(root, "w1", wave(0, 250))
    land(root, "w2", wave(200, 399))   // overlaps w1
    var q = StreamingSketch.stream(spark, s"$root/src", "hx", s"$root/ckpt")
    q.awaitTermination()
    val all = wave(0, 250).union(wave(200, 399))
    val batchEst = all.groupBy(col("bucket"))
      .agg(hll_sketch_agg(col("item")).as("sk"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk")))).as[Long].head()
    val streamed = StreamingSketch.estimate(spark, "hx", 0L, 2L)
    assert(streamed == batchEst,
      s"streamed $streamed vs batch-built $batchEst")
    // per-bucket range slicing works off the table alone
    val b0 = StreamingSketch.estimate(spark, "hx", 0L, 0L)
    val exact0 = all.filter(col("bucket") === 0L)
      .agg(count_distinct(col("item"))).as[Long].head()
    assert(math.abs(b0 - exact0) <= exact0 / 10, s"$b0 vs exact $exact0")
    // full replay with a fresh checkpoint: batch ids restart at 0 and
    // the FENCE absorbs them — layer one of replay safety
    q = StreamingSketch.stream(spark, s"$root/src", "hx", s"$root/ckpt2")
    q.awaitTermination()
    assert(StreamingSketch.estimate(spark, "hx", 0L, 2L) == streamed,
      "fenced replay must not move any estimate")
    assert(!StreamingSketch.applyBatch(spark, "hx", wave(0, 10), 0L))
    // layer two — HLL insert idempotence: re-apply already-seen events
    // PAST the fence (a fresh batch id); registers cannot move
    assert(StreamingSketch.applyBatch(spark, "hx", wave(0, 250), 99L))
    assert(StreamingSketch.estimate(spark, "hx", 0L, 2L) == streamed,
      "re-observed items past the fence must not move any estimate")
    StreamingSketch.drop(spark, "hx")
  }
}
