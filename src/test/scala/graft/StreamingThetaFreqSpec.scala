package graft

import graft.streaming.{StreamingFreq, StreamingTheta}
import org.apache.spark.sql.functions._

/** The other two members of the fenced streaming sketch family, and the
  * 2×2 replay-safety matrix made explicit: theta (like HLL) summarizes
  * a SET — re-observed items past the fence cannot move it; freq (like
  * KLL) summarizes a MULTISET — the fence is the single layer. */
class StreamingThetaFreqSpec extends SparkSpec {
  import spark.implicits._

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

  test("theta table: range estimates + intersection off stored bytes; set idempotence past the fence") {
    val root = java.nio.file.Files.createTempDirectory("thst").toString
    StreamingTheta.drop(spark, "tht")
    // buckets 0-3; items overlap between low and high bucket ranges
    def wave(lo: Int, hi: Int) =
      (for (b <- 0L to 3L; i <- lo to hi) yield (b, (i + b * 50) % 400L))
        .toDF("bucket", "item")
    land(root, "w1", wave(0, 150))
    land(root, "w2", wave(100, 250))
    var q = StreamingTheta.stream(spark, s"$root/src", "tht", s"$root/ckpt")
    q.awaitTermination()
    val all = wave(0, 150).union(wave(100, 250))
    def exact(lo: Long, hi: Long) = all
      .filter(col("bucket").between(lo, hi))
      .select(col("item")).distinct().count().toDouble
    // sub-nominal sketches are exact
    assert(StreamingTheta.estimate(spark, "tht", 0L, 3L) == exact(0, 3))
    assert(StreamingTheta.estimate(spark, "tht", 1L, 1L) == exact(1, 1))
    // the set-algebra payoff: intersection of two bucket ranges
    val (est, lb, ub) = StreamingTheta.intersect(spark, "tht",
      (0L, 1L), (2L, 3L))
    val both = all.filter(col("bucket") <= 1L).select(col("item")).distinct()
      .intersect(all.filter(col("bucket") >= 2L).select(col("item")).distinct())
      .count().toDouble
    assert(lb <= both && both <= ub && est == both,
      s"exact-mode intersection must be a point: $est vs $both")
    // replay: fence absorbs a replayed id; set semantics absorb data
    // past the fence — BOTH layers hold
    val before = StreamingTheta.estimate(spark, "tht", 0L, 3L)
    assert(!StreamingTheta.applyBatch(spark, "tht", wave(0, 10), 0L))
    assert(StreamingTheta.applyBatch(spark, "tht", wave(0, 150), 99L))
    assert(StreamingTheta.estimate(spark, "tht", 0L, 3L) == before,
      "re-observed items past the fence must not move a set sketch")
    StreamingTheta.drop(spark, "tht")
  }

  test("freq table: range heavy hitters off stored bytes; fence is the single layer") {
    val root = java.nio.file.Files.createTempDirectory("fqst").toString
    StreamingFreq.drop(spark, "fqt")
    def wave(mult: Int) =
      ((1 to 100 * mult).map(_ => (0L, "hot")) ++
        (1 to 30 * mult).map(_ => (1L, "hot")) ++
        (1 to 40 * mult).map(_ => (0L, "warm")) ++
        (1 to 25).map(i => (1L, s"cold$i")))
        .toDF("bucket", "item")
    land(root, "w1", wave(1))
    val q = StreamingFreq.stream(spark, s"$root/src", "fqt", s"$root/ckpt")
    q.awaitTermination()
    val (maxErr, items) = StreamingFreq.top(spark, "fqt", 0L, 1L)
    assert(maxErr == 0L, "sub-capacity sketch must be exact")
    val m = items.map(r => r._1 -> r._2).toMap
    assert(m("hot") == 130L && m("warm") == 40L, m.toString)
    // bucket slicing off the table alone
    val (_, b1) = StreamingFreq.top(spark, "fqt", 1L, 1L)
    assert(b1.map(r => r._1 -> r._2).toMap.apply("hot") == 30L)
    // multiset: the fence absorbs a replayed id…
    assert(!StreamingFreq.applyBatch(spark, "fqt", wave(1), 0L))
    assert(StreamingFreq.top(spark, "fqt", 0L, 1L)._2
      .map(r => r._1 -> r._2).toMap.apply("hot") == 130L)
    // …but the SAME data past the fence doubles the counts — the fence
    // is demonstrably the single exactly-once layer here
    assert(StreamingFreq.applyBatch(spark, "fqt", wave(1), 99L))
    assert(StreamingFreq.top(spark, "fqt", 0L, 1L)._2
      .map(r => r._1 -> r._2).toMap.apply("hot") == 260L)
    StreamingFreq.drop(spark, "fqt")
  }
}
