package graft

import graft.operators.TimeSeries
import graft.streaming.StreamingTimeSeries
import graft.streaming.StreamingTimeSeries.{Point, Scored}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The batch TimeSeries operators are the contract: the stream must
  * emit bitwise-identical z-scores/flags and fold the identical EWMA,
  * whatever the micro-batch cuts. */
class StreamingTimeSeriesSpec extends SparkSpec {
  import spark.implicits._

  // values with non-terminating binary expansions, so any quantization
  // or op-order drift between batch and stream would show
  private val pts = (for (k <- 0L until 5L; b <- 1L to 30L)
    yield Point(k, b, ((k * 31 + b * 17) % 97).toDouble / 3.0)).toVector

  test("streaming z/flags/ewma == batch operators, across micro-batch cuts") {
    val df = pts.toDF()
    val batchZ = TimeSeries.anomalyZScore(df, col("key"), col("bucket"),
        col("value"), win = 7)
      .select(col("key"), col("bucket"), col("v"), col("n_prior"),
        col("z"), col("is_anomaly"))
      .as[(Long, Long, Double, Long, Option[Double], Boolean)]
      .collect().map(r => (r._1, r._2) -> ((r._3, r._4, r._5, r._6))).toMap
    val batchE = TimeSeries.ewma(df, col("key"), col("bucket"),
        col("value"), alpha = 0.25)
      .select(col("key"), col("ewma")).as[(Long, Double)].collect().toMap

    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Point]
    val q = StreamingTimeSeries.score(input.toDS(), win = 7, alpha = 0.25)
      .writeStream.outputMode("append")
      .format("memory").queryName("ts_scored").start()
    // three cuts, and the middle one arrives bucket-disordered
    input.addData(pts.filter(_.bucket <= 10)); q.processAllAvailable()
    input.addData(scala.util.Random.javaRandomToRandom(
      new java.util.Random(7)).shuffle(
      pts.filter(p => p.bucket > 10 && p.bucket <= 20)))
    q.processAllAvailable()
    input.addData(pts.filter(_.bucket > 20)); q.processAllAvailable()
    val got = spark.table("ts_scored").as[Scored].collect()
    q.stop()

    assert(got.length == pts.length)
    got.foreach { s =>
      val b = batchZ((s.key, s.bucket))
      assert((s.v, s.n_prior, s.z, s.is_anomaly) == b,
        s"row (${s.key},${s.bucket}): stream ${(s.v, s.n_prior, s.z, s.is_anomaly)} vs batch $b")
    }
    val lastPerKey = got.groupBy(_.key).map { case (k, rs) =>
      k -> rs.maxBy(_.bucket).ewma }
    assert(lastPerKey == batchE,
      s"final EWMA levels must match the batch fold: $lastPerKey vs $batchE")
  }
}
