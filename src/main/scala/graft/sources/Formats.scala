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

  def writeCsv(df: DataFrame, path: String, header: Boolean = true): Unit =
    df.write.mode(SaveMode.Overwrite)
      .option("header", header.toString).option("compression", "gzip").csv(path)

  def writeJsonLines(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).option("compression", "gzip").json(path)
}
