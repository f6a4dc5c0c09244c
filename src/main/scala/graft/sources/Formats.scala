package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** Batch source/sink format support beyond parquet. Thin, deliberately:
  * Spark's DataSource V2 readers already provide vectorization, predicate
  * pushdown (parquet/orc), partition discovery, and schema enforcement —
  * the engine's job is to expose them with safe defaults:
  *
  *  - reads take an explicit schema (no sampling-based inference jobs on
  *    100 TB inputs; inference is opt-in for exploration only);
  *  - malformed CSV/JSON records are PERMISSIVE-nulled with the raw record
  *    preserved in `_corrupt_record` rather than failing the job;
  *  - writes go through a single API so compression and mode defaults are
  *    uniform.
  */
object Formats {

  val CorruptColumn = "_corrupt_record"

  def readParquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  def readCsv(spark: SparkSession, path: String, schema: StructType,
              header: Boolean = true, delimiter: String = ","): DataFrame =
    spark.read
      .schema(schema.add(CorruptColumn, "string"))
      .option("header", header.toString)
      .option("sep", delimiter)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptColumn)
      .csv(path)

  def readJsonLines(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .schema(schema.add(CorruptColumn, "string"))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptColumn)
      .json(path)

  /** ORC: the other columnar format with vectorized reads + pushdown —
    * same scan contract as parquet (PushedFilters/ReadSchema visible in
    * the plan), no schema argument needed (self-describing). */
  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).orc(path)

  def writeParquet(df: DataFrame, path: String,
                   partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(path)
  }

  /** Parquet with per-column BLOOM FILTERS — the layout lever for
    * point lookups on columns the sort order does NOT serve: min/max
    * statistics prune row groups only for clustered columns (see
    * [[Bucketing.writeZOrdered]]); a bloom filter prunes them for an
    * equality predicate on any enabled column, sorted or not, at the
    * cost of ~1.2 bytes/NDV of footer. Spark's parquet reader applies
    * them during row-group filtering whenever filter pushdown is on, so
    * `WHERE user_id = x` on a time-sorted 100 TB table skips every row
    * group the key never touched — the difference between a point
    * lookup reading kilobytes and scanning the corpus. `expectedNdv`
    * sizes each filter (per ROW GROUP, not per file). */
  def writeParquetBloom(df: DataFrame, path: String, bloomCols: Seq[String],
                        expectedNdv: Long = 100000L): Unit = {
    require(bloomCols.nonEmpty, "need at least one bloom column")
    val w = df.write.mode(SaveMode.Overwrite)
    bloomCols.foldLeft(w) { (acc, c) =>
      acc.option(s"parquet.bloom.filter.enabled#$c", "true")
        .option(s"parquet.bloom.filter.expected.ndv#$c", expectedNdv.toString)
    }.parquet(path)
  }

  def writeCsv(df: DataFrame, path: String, header: Boolean = true): Unit =
    df.write.mode(SaveMode.Overwrite)
      .option("header", header.toString).option("compression", "gzip").csv(path)

  def writeJsonLines(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).option("compression", "gzip").json(path)
}
