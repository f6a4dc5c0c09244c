package graft

import graft.streaming.{InMemoryKVStore, KVStoreRegistry, OrderStreamPipeline, StreamConfig}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.Trigger

/** The runnable equivalent of the reference's streaming application: Kafka
  * order events → per-day conditional metrics → accumulator KV sink, with
  * offsets managed by the checkpoint WAL. Configure with system
  * properties (fail-fast, see [[StreamConfig]]):
  *
  * {{{
  * spark-submit --class graft.StreamApp \
  *   -Dgraft.kafka.bootstrap.servers=host:9092 -Dgraft.kafka.topic=orders \
  *   -Dgraft.checkpoint.dir=/path/ckpt [-Dgraft.sink.key.prefix=n-ko-] \
  *   [-Dgraft.trigger.seconds=10] [-Dgraft.idempotent=true] app.jar
  * }}}
  *
  * The sink backend defaults to the in-memory store (single-JVM/demo); a
  * production deployment registers a network-backed [[graft.streaming.KVStore]]
  * under the name "default" before start.
  */
object StreamApp {
  def main(args: Array[String]): Unit = {
    val props = sys.props.toMap.collect {
      case (k, v) if k.startsWith("graft.") => k.stripPrefix("graft.") -> v
    }
    val cfg = StreamConfig.fromMap(props)
    val idempotent = props.get("idempotent").exists(_.toBoolean)

    val spark = SparkSession.builder()
      .withExtensions(new GraftExtensions)
      .appName("graft-order-stream")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()

    if (KVStoreRegistry.getOption("default").isEmpty)
      KVStoreRegistry.register("default", new InMemoryKVStore)
    val pipeline = new OrderStreamPipeline("default", cfg.keyPrefix, idempotent)
    val raw = OrderStreamPipeline.kafkaSource(
      spark, cfg.bootstrapServers, cfg.topic)
    val query = pipeline.start(raw, cfg.checkpointDir,
      Trigger.ProcessingTime(s"${cfg.triggerSeconds} seconds"))
    query.awaitTermination()
  }
}
