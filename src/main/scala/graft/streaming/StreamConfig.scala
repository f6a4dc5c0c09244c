package graft.streaming

/** Typed, fail-fast pipeline configuration — the replacement for the
  * reference's `getConfigFiled` (SURVEY.md §2 U1, `CommonUtil.scala:19-31`),
  * which swallowed missing-key exceptions and returned null into the Kafka
  * consumer properties. Missing keys here fail at startup with the key
  * name. */
final case class StreamConfig(
    bootstrapServers: String,
    topic: String,
    keyPrefix: String,
    checkpointDir: String,
    triggerSeconds: Long)

object StreamConfig {
  def fromMap(m: Map[String, String]): StreamConfig = {
    def req(key: String): String = m.getOrElse(key,
      throw new IllegalArgumentException(s"missing required config key '$key'"))
    StreamConfig(
      bootstrapServers = req("kafka.bootstrap.servers"),
      topic = req("kafka.topic"),
      keyPrefix = m.getOrElse("sink.key.prefix", "n-ko-"),
      checkpointDir = req("checkpoint.dir"),
      triggerSeconds = m.getOrElse("trigger.seconds", "10").toLong)
  }
}
