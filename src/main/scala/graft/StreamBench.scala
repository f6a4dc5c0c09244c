package graft

import graft.sources.MockOrderGenerator
import graft.streaming.{InMemoryKVStore, KVStoreRegistry, OrderStreamPipeline}
import org.apache.spark.sql.SparkSession

/** Streaming-path throughput: generates N wire-format order records and
  * drives them through the micro-batch sink path (parse → conditional
  * aggregate → KV deltas), printing records/sec. The reference's design
  * ceiling was 2 cores and tens of records per 10 s batch; this measures
  * the same pipeline shape at millions of records per batch.
  * Usage: runMain graft.StreamBench [numRecords] [numBatches]
  */
object StreamBench {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(1000000L)
    val batches = args.drop(1).headOption.map(_.toInt).getOrElse(4)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.local(cpus)

    KVStoreRegistry.register("bench", new InMemoryKVStore)
    val pipeline = new OrderStreamPipeline("bench")
    val batch = MockOrderGenerator.wireJson(
      MockOrderGenerator.orders(spark, n)).cache()
    batch.count()   // materialize input so generation isn't timed
    // warmup
    pipeline.applyBatch(batch.limit(10000), -1L)
    val t0 = System.nanoTime()
    (0 until batches).foreach(i => pipeline.applyBatch(batch, i.toLong))
    val sec = (System.nanoTime() - t0) / 1e9
    val total = n * batches
    println(f"""{"metric":"stream_records_per_sec","value":${total / sec}%.0f,"records":$total,"sec":$sec%.2f}""")
    spark.stop()
  }
}
