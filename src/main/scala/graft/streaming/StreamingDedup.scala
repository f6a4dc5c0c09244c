package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Streaming ingestion dedup for a training-data pipeline: drop exact
  * duplicates from an unbounded stream with BOUNDED state.
  *
  * Plain `dropDuplicates` on a stream keeps every key forever — state grows
  * with the corpus and the job eventually dies; that is not a 100 TB plan.
  * `dropDuplicatesWithinWatermark` keeps a key only until the watermark
  * passes it, so state is bounded by (event-time window × arrival rate),
  * which matches the practical contract of ingestion dedup: duplicates
  * arrive close together (retries, re-sent batches, crawler revisits) and a
  * re-ingest far outside the window is a reprocessing problem, not a
  * streaming one.
  *
  * Dedup is by content fingerprint (md5 of the dedup column), never by the
  * full text: state rows stay fixed-width regardless of document size, the
  * same design as [[graft.operators.Dedup.exactGroups]].
  */
object StreamingDedup {

  /** Drop rows whose `key` fingerprint was already seen within the
    * watermark window. `tsCol` is the event-time column the watermark is
    * defined on; rows older than `delay` behind the max seen event time
    * may be dropped as late. */
  def dropDupesWithinWatermark(stream: DataFrame, key: Column, tsCol: String,
                               delay: String): DataFrame =
    stream
      .withColumn("__fp", md5(key.cast("string")))
      .withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark("__fp")
      .drop("__fp")

  /** Unbounded-state variant for finite backfills (exactly `dropDuplicates`
    * semantics, fingerprint key). Documented-unsafe on endless streams. */
  def dropDupesUnbounded(stream: DataFrame, key: Column): DataFrame =
    stream
      .withColumn("__fp", md5(key.cast("string")))
      .dropDuplicates("__fp")
      .drop("__fp")
}
