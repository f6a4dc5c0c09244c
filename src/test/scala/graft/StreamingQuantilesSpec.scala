package graft

import graft.streaming.StreamingQuantiles
import org.apache.spark.sql.functions._

class StreamingQuantilesSpec extends SparkSpec {
  import spark.implicits._

  // (bucket, value): 3 buckets, 61 values per bucket across both waves
  // (183 total) — under k=200 even the CROSS-BUCKET union keeps every
  // value, so streamed and batch-built sketches are EXACT and quantiles
  // compare by equality regardless of merge order.
  private def wave(lo: Int, hi: Int) =
    (for (b <- 0L to 2L; i <- lo to hi) yield (b, (i * 13 % 97) + b * 100.0))
      .toDF("bucket", "value")

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

  test("streamed KLL table == batch-built quantiles; fence alone blocks replay") {
    val root = java.nio.file.Files.createTempDirectory("klls").toString
    StreamingQuantiles.drop(spark, "qx")
    land(root, "w1", wave(0, 30))
    land(root, "w2", wave(31, 60))
    var q = StreamingQuantiles.stream(spark, s"$root/src", "qx", s"$root/ckpt")
    q.awaitTermination()
    val ranks = Seq(0.5, 0.9)
    val all = wave(0, 30).union(wave(31, 60))
    val batch = all.groupBy(col("bucket"))
      .agg(graft.functions.SketchAggregators.kllAgg(col("value")).as("sk"))
      .agg(graft.functions.SketchAggregators
        .kllUnionQuantiles(col("sk"), ranks).as("q"))
      .select(col("q")).as[Seq[Double]].head()
    val streamed = StreamingQuantiles.quantiles(spark, "qx", 0L, 2L, ranks)
    // sub-k sketches are exact: estimates equal, not merely rank-close
    assert(streamed.init == batch.init,
      s"streamed $streamed vs batch-built $batch")
    // range slicing off the table alone: bucket 0's values are < 100,
    // bucket 2's are >= 200 — the per-bucket medians must reflect that
    val m0 = StreamingQuantiles.quantiles(spark, "qx", 0L, 0L, Seq(0.5)).head
    val m2 = StreamingQuantiles.quantiles(spark, "qx", 2L, 2L, Seq(0.5)).head
    assert(m0 < 100.0 && m2 >= 200.0, s"m0=$m0 m2=$m2")
    // empty range → empty result, not a crash
    assert(StreamingQuantiles.quantiles(spark, "qx", 50L, 60L, ranks).isEmpty)
    // KLL inserts are NOT idempotent, so the fence is the single
    // exactly-once layer: a fresh-checkpoint replay (batch ids restart
    // at 0) must be absorbed entirely...
    q = StreamingQuantiles.stream(spark, s"$root/src", "qx", s"$root/ckpt2")
    q.awaitTermination()
    assert(StreamingQuantiles.quantiles(spark, "qx", 0L, 2L, ranks) == streamed,
      "fenced replay must not move any estimate")
    assert(!StreamingQuantiles.applyBatch(spark, "qx", wave(0, 10), 0L))
    // ...and data PAST the fence (fresh batch id) DOES move the table —
    // the documented contrast with HLL's insert idempotence, proving
    // the fence is the load-bearing layer here
    val shift = (1 to 300).map(_ => (0L, 5000.0)).toDF("bucket", "value")
    assert(StreamingQuantiles.applyBatch(spark, "qx", shift, 99L))
    val shifted = StreamingQuantiles.quantiles(spark, "qx", 0L, 0L, Seq(0.9)).head
    assert(shifted == 5000.0, s"p90 must jump to the flood value: $shifted")
    StreamingQuantiles.drop(spark, "qx")
  }
}
