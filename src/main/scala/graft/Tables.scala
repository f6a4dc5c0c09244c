package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Accessors for the driver-generated parquet tables (TESTDATA.md).
  *
  * Every query in [[SparkEntry.queries]] receives `(spark, sfDir)` and loads
  * its inputs through here so the scan path is uniform: parquet with
  * column pruning + predicate pushdown handled by the vectorized reader.
  */
final case class Tables(spark: SparkSession, dir: String) {
  def table(name: String): DataFrame = spark.read.parquet(s"$dir/$name.parquet")

  def region: DataFrame     = table("region")
  def nation: DataFrame     = table("nation")
  def customer: DataFrame   = table("customer")
  def supplier: DataFrame   = table("supplier")
  def part: DataFrame       = table("part")
  def orders: DataFrame     = table("orders")
  def lineitem: DataFrame   = table("lineitem")

  /** `events.ts` has drifted between testdata generations: parquet
    * TIMESTAMP(NANOS) (which Spark's reader only surfaces as raw long nanos
    * under the legacy conf) and plain TIMESTAMP_MICROS (read natively as
    * TIMESTAMP_NTZ). Branch on the schema actually read and normalize both
    * paths to session-TZ [[TimestampType]] — the session TZ is pinned to UTC
    * ([[GraftSession]]), so the NTZ→TZ cast is value-preserving and the
    * output schema stays identical across drifts. Truncation to micros on
    * the nanos path matches external engines at any granularity we
    * aggregate on. */
  def events: DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = table("events")
    df.schema("ts").dataType match {
      case LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        df.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType =>
        df
      case other =>
        throw new IllegalStateException(
          s"events.ts read as unexpected type $other from $dir/events.parquet; " +
            "expected long (TIMESTAMP_NANOS under nanosAsLong), TIMESTAMP_NTZ, or TIMESTAMP")
    }
  }
  def documents: DataFrame  = table("documents")
  def embeddings: DataFrame = table("embeddings")
}
