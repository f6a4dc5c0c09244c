package graft

import graft.operators.{Dedup, Similarity}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The runnable ingest-admission pipeline — the counterpart of
  * [[PipelineApp]] for the CONTINUOUS case: a corpus already exists
  * (and is indexed once); each new batch must be admitted or rejected
  * against it without re-reading or re-hashing the corpus, composing
  * the library's ingest-time operators in their canonical order.
  *
  * Documents mode:
  *  0. exact dup vs corpus ([[Dedup.bloomAdmit]] against the fingerprint
  *     index, Bloom-prefiltered — rejects byte-identical re-crawls with a
  *     broadcast membership test before any LSH machinery runs; later
  *     stages see only the exact-new survivors)
  *  1. near-dup vs corpus ([[Dedup.minhashIncrementalPairs]] against the
  *     prebuilt minhash index)
  *  2. span-overlap vs corpus ([[Dedup.spanIncrementalStats]] against the
  *     window-hash index; rejects documents whose indexed-window fraction
  *     exceeds `maxSpanFrac` even when no whole-document pair fires)
  *  3. within-batch near-dup (the batch self-checked with
  *     [[Dedup.minhashLshPairs]]; smallest id of each pair survives)
  *
  * Vectors mode: the same shape over embeddings —
  * [[Similarity.cosineIncrementalPairs]] against the prebuilt
  * [[Similarity.lshIndex]], then [[Similarity.cosineNearDupPairsLsh]]
  * within the batch.
  *
  * Each stage is an operator with its own oracle/spec coverage; this
  * main is composition glue plus a one-line JSON admission report.
  * Rejection reasons are kept per row in the `rejects` output so an
  * operator downstream (or a human) can audit every refusal.
  *
  * {{{
  * runMain graft.IngestApp docs <corpusParquet> <batchParquet> <outDir> \
  *   [threshold=0.8] [maxSpanFrac=0.5]
  * runMain graft.IngestApp vecs <corpusParquet> <batchParquet> <outDir> \
  *   [threshold=0.9] [nPlanes=auto] [nTables=4]
  * }}}
  *
  * Writes `<outDir>/admitted` and `<outDir>/rejects` (id, reason).
  * At production scale the index halves are persisted bucketed
  * ([[graft.sources.Bucketing.writeBucketed]] on (band, sig) / wh /
  * (band, bucket)) so the per-batch joins are exchange-free on the
  * corpus side — this main rebuilds them inline, which is the same
  * plan minus the bucketed-scan saving. */
object IngestApp {

  /** Documents admission. Returns (admitted, rejects(doc_id, reason)).
    *
    * Stage 0 is the Bloom-prefiltered EXACT check ([[Dedup.bloomAdmit]]):
    * byte-identical re-crawls are rejected by a broadcast membership test
    * plus a candidate-sized confirm join, and only the exact-new survivors
    * enter the LSH / span-index joins — in a re-crawl-heavy batch that is
    * most of the admission cost gone before the expensive stages start. */
  def runDocs(corpus: DataFrame, batch: DataFrame, threshold: Double = 0.8,
              maxSpanFrac: Double = 0.5): (DataFrame, DataFrame) = {
    val fpIdx = Dedup.admissionIndex(corpus, col("text"))
    val bloom = batch.sparkSession.sparkContext
      .broadcast(Dedup.admissionBloom(fpIdx))
    val survivors = Dedup.bloomAdmit(fpIdx, bloom, batch,
      col("doc_id"), col("text"))
    val exactDup = batch.join(survivors.select("doc_id"), Seq("doc_id"), "left_anti")
      .select(col("doc_id"), lit("exact_dup_of_corpus").as("reason"))
    val nearIdx = Dedup.minhashIndex(corpus, col("doc_id"), col("text"))
    val nearDup = Dedup.minhashIncrementalPairs(nearIdx, corpus, survivors,
        col("doc_id"), col("text"), threshold = threshold)
      .select(col("new_id").as("doc_id"), lit("near_dup_of_corpus").as("reason"))
      .distinct()
    val spanIdx = Dedup.spanIndex(corpus, col("doc_id"), col("text"))
    val spanHeavy = Dedup.spanIncrementalStats(spanIdx, survivors,
        col("doc_id"), col("text"))
      .filter(col("overlap_frac") > maxSpanFrac)
      .select(col("doc_id"), lit("span_overlap_with_corpus").as("reason"))
    val withinBatch = Dedup.minhashLshPairs(survivors, col("doc_id"), col("text"),
        threshold = threshold)
      .select(greatest(col("id_a"), col("id_b")).as("doc_id"),
        lit("near_dup_within_batch").as("reason"))
      .distinct()
    val rejects = exactDup.unionByName(nearDup).unionByName(spanHeavy)
      .unionByName(withinBatch)
    val admitted = batch.join(
      rejects.select("doc_id").distinct(), Seq("doc_id"), "left_anti")
    (admitted, rejects)
  }

  /** Vectors admission. Returns (admitted, rejects(vec_id, reason)).
    * `nPlanes = 0` (the default) self-provisions from the measured
    * `planes = log2(N)+1` rule ([[Similarity.lshAutoPlanes]], one corpus
    * count) so callers get a selective config at any corpus size. */
  def runVecs(corpus: DataFrame, batch: DataFrame, threshold: Double = 0.9,
              nPlanes: Int = 0, nTables: Int = 4): (DataFrame, DataFrame) = {
    val c = Similarity.prepared(corpus, col("vec_id"), col("embedding"))
    val b = Similarity.prepared(batch, col("vec_id"), col("embedding"))
    val planes =
      if (nPlanes > 0) nPlanes
      else math.max(8, Similarity.lshAutoPlanes(math.max(1L, c.count())))
    val index = Similarity.lshIndex(c, planes, nTables)
    val vsCorpus = Similarity.cosineIncrementalPairs(index, c, b, threshold,
        planes, nTables)
      .select(col("new_id").as("vec_id"), lit("near_dup_of_corpus").as("reason"))
      .distinct()
    val withinBatch = Similarity.cosineNearDupPairsLsh(b, threshold,
        planes, nTables)
      .select(greatest(col("id_a"), col("id_b")).as("vec_id"),
        lit("near_dup_within_batch").as("reason"))
      .distinct()
    val rejects = vsCorpus.unionByName(withinBatch)
    val admitted = batch.join(
      rejects.select("vec_id").distinct(), Seq("vec_id"), "left_anti")
    (admitted, rejects)
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 4,
      "usage: IngestApp docs|vecs <corpusParquet> <batchParquet> <outDir> [...]")
    val Array(mode, corpusPath, batchPath, outDir) = args.take(4)
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    try {
      val corpus = spark.read.parquet(corpusPath)
      val batch = spark.read.parquet(batchPath)
      val (admitted, rejects) = mode match {
        case "docs" => runDocs(corpus, batch,
          threshold = args.lift(4).map(_.toDouble).getOrElse(0.8),
          maxSpanFrac = args.lift(5).map(_.toDouble).getOrElse(0.5))
        case "vecs" => runVecs(corpus, batch,
          threshold = args.lift(4).map(_.toDouble).getOrElse(0.9),
          nPlanes = args.lift(5).map(_.toInt).getOrElse(0),   // 0 = lshAutoPlanes
          nTables = args.lift(6).map(_.toInt).getOrElse(4))
        case other => throw new IllegalArgumentException(
          s"unknown mode '$other' (docs|vecs)")
      }
      admitted.write.mode("overwrite").parquet(s"$outDir/admitted")
      rejects.write.mode("overwrite").parquet(s"$outDir/rejects")
      val nBatch = batch.count()
      val nAdmitted = spark.read.parquet(s"$outDir/admitted").count()
      val byReason = spark.read.parquet(s"$outDir/rejects")
        .groupBy("reason").count().collect()
        .map(r => s""""${r.getString(0)}":${r.getLong(1)}""").sorted.mkString(",")
      println(s"""{"metric":"ingest_admission","mode":"$mode","batch":$nBatch,"admitted":$nAdmitted,"rejects":{$byReason}}""")
    } finally spark.stop()
  }
}
