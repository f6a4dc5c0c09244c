package graft

import graft.operators.{Dedup, Sampling, TextAnalysis}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The runnable preprocessing pipeline — what a user points at a raw
  * document corpus to get training-ready shards out, composing the
  * library's operators in their canonical order:
  *
  *  1. quality gate (token floor, punctuation ceiling, language filter)
  *  2. boilerplate paragraph removal (cross-corpus frequency)
  *  3. PII redaction
  *  4. exact dedup (keep the smallest id per identical text)
  *  5. transitive near-dup dedup (MinHash-LSH clusters, keep cluster min)
  *  6. deterministic shard + training order, written
  *     `partitionBy(shard)` sorted by `pos`, plus the sequence-packing
  *     map for fixed-length loaders
  *
  * Every stage is an operator with its own oracle/spec coverage; this
  * main is the composition glue plus a one-line JSON funnel report.
  *
  * {{{
  * runMain graft.PipelineApp <docsParquetDir> <outDir> \
  *   [minTokens=10] [lang=en] [nShards=8] [seqLen=512]
  * }}}
  *
  * Reads `<docsParquetDir>` expecting (doc_id: long, text: string, …);
  * writes `<outDir>/corpus` (clean sharded documents) and
  * `<outDir>/packing` (the packing map). */
object PipelineApp {

  final case class Config(minTokens: Int = 10, maxPunctRatio: Double = 0.2,
                          lang: String = "en", minBoilerplateDocs: Int = 3,
                          nShards: Int = 8, seqLen: Int = 512,
                          salt: String = "graft")

  /** The full funnel as a DataFrame transform — reusable from tests and
    * notebooks without the write side. Returns (clean corpus with
    * shard/pos, packing map). */
  def run(docs: DataFrame, cfg: Config): (DataFrame, DataFrame) = {
    val punctRatio = when(length(col("text")) > 0,
      TextAnalysis.punctCount(col("text")).cast("double") / length(col("text")))
      .otherwise(lit(0.0))
    val gated = docs
      .filter(TextAnalysis.tokenCount(col("text")) >= cfg.minTokens &&
        punctRatio < cfg.maxPunctRatio &&
        TextAnalysis.langId(col("text")) === cfg.lang)
      .select(col("doc_id"), col("text"))
    val stripped = TextAnalysis.stripBoilerplate(gated, col("doc_id"),
        col("text"), minDocs = cfg.minBoilerplateDocs)
      .withColumnRenamed("clean_text", "text")
      .filter(length(col("text")) > 0)
    val redacted = stripped.select(col("doc_id"),
      TextAnalysis.redactPii(col("text")).as("text"))
    val exact = redacted.join(
      Dedup.exactGroups(redacted, col("text"), col("doc_id"))
        .select(col("keep_id").as("doc_id")), "doc_id")
    val kept = exact.join(
      Dedup.minhashClusters(exact, col("doc_id"), col("text"))
        .filter(col("doc_id") === col("cluster_id")).select("doc_id"), "doc_id")
    val sharded = Sampling.shuffleShards(kept, col("doc_id"),
      cfg.nShards, cfg.salt)
    val packing = Sampling.packSequences(kept, col("doc_id"), col("text"),
      cfg.nShards, cfg.seqLen, cfg.salt)
    (sharded, packing)
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: PipelineApp <docsParquetDir> <outDir> " +
      "[minTokens] [lang] [nShards] [seqLen]")
    val Array(inDir, outDir) = args.take(2)
    val cfg = Config(
      minTokens = args.lift(2).map(_.toInt).getOrElse(10),
      lang = args.lift(3).getOrElse("en"),
      nShards = args.lift(4).map(_.toInt).getOrElse(8),
      seqLen = args.lift(5).map(_.toInt).getOrElse(512))
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
    val docs = spark.read.parquet(inDir)
    val nIn = docs.count()
    val (sharded, packing) = run(docs, cfg)
    sharded.repartition(cfg.nShards, col("shard"))
      .sortWithinPartitions(col("shard"), col("pos"))
      .write.mode("overwrite").partitionBy("shard")
      .parquet(s"$outDir/corpus")
    packing.write.mode("overwrite").parquet(s"$outDir/packing")
    val out = spark.read.parquet(s"$outDir/corpus")
    val nOut = out.count()
    val nSeq = spark.read.parquet(s"$outDir/packing")
      .select(col("shard"), col("seq_id")).distinct().count()
    println(s"""{"metric":"pipeline_app","docs_in":$nIn,"docs_out":$nOut,"sequences":$nSeq,"shards":${cfg.nShards},"seq_len":${cfg.seqLen}}""")
    spark.stop()
  }
}
