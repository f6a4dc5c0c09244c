package graft

import graft.operators.{Dedup, Dsir, Similarity, TextAnalysis}
import graft.sources.IndexStore
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
  * The `docs`/`vecs` modes build the corpus indexes inline (one-shot
  * shape); the `build-*`/`admit-*` modes run the CLOSED loop over a
  * persisted [[graft.sources.IndexStore]] — indexes bucketed on their
  * join keys (exchange-free corpus side, plan-guard spec'd), each
  * admitted batch appended back so the next batch is checked against
  * everything admitted before it. */
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
    val nearIdx = Dedup.minhashIndex(corpus, col("doc_id"), col("text"))
    val spanIdx = Dedup.spanIndex(corpus, col("doc_id"), col("text"))
    runDocsWith(fpIdx, nearIdx, spanIdx, corpus, batch,
      IndexStore.DocConfig(), threshold, maxSpanFrac)
  }

  /** QUALITY GATE for admission — the filter stage a production pipeline
    * runs BEFORE paying dedup-index joins for junk: rejects
    * `(doc_id, reason)` rows for documents whose composite
    * [[graft.operators.TextAnalysis.qualityFeatures]] score falls below
    * `minQuality` (`"low_quality"`) or whose predicted language is
    * outside the `langs` allowlist (`"lang_not_allowed"`; empty set =
    * no language gating). Map-side only — two codegen'd expression
    * passes, no joins, no shuffle — so gating N documents costs one
    * scan regardless of corpus/index size. A document failing both
    * checks carries both reasons (the audit contract: every refusal
    * explains itself). */
  /** TRAINED model signals for the admission gate — the CCNet/FineWeb
    * production shape, where heuristics are only the first pass and the
    * real gate is a trained LM and/or classifier:
    *  - `lm`: a stupid-backoff trigram model
    *    ([[TextAnalysis.ngramTrain]], typically trained on the trusted
    *    corpus) plus the max average negative log-probability — a batch
    *    document scoring ABOVE the cutoff (high perplexity under the
    *    trusted distribution) is rejected as `lm_perplexity`.
    *  - `nb`: a naive-Bayes quality classifier
    *    ([[TextAnalysis.nbTrain]], curated-vs-crawl labels) — a document
    *    it predicts NEGATIVE is rejected as `classifier_rejected`.
    *  - `dsir`: a trained DSIR importance model
    *    ([[graft.operators.Dsir.model]], typically loaded from
    *    [[graft.sources.DsirStore]]) plus the minimum admissible
    *    log-weight — a document whose importance log-weight under the
    *    target-vs-raw model falls below the threshold is rejected as
    *    `dsir_out_of_domain` (Xie et al. 2023 as a persistent gate).
    * lm/nb apply map-side against broadcast/vocabulary-shaped model
    * tables (per-document cost model-size-independent); dsir pays ONE
    * feature-keyed exchange per batch against the vocabulary-shaped
    * ratio table — still independent of the training corpora's size.
    * Blank documents carry no model evidence and pass all three model
    * gates (the heuristic quality gate is what rejects them). */
  final case class ModelGate(
      lm: Option[(TextAnalysis.NgramModel, Double)] = None,
      nb: Option[TextAnalysis.NbModel] = None,
      dsir: Option[(Dsir.Model, Double)] = None)

  def qualityRejects(batch: DataFrame, minQuality: Double,
                     langs: Set[String] = Set.empty,
                     models: ModelGate = ModelGate()): DataFrame = {
    val q = TextAnalysis.qualityFeatures(batch, col("doc_id"), col("text"))
      .filter(col("quality_score") < minQuality)
      .select(col("doc_id"), lit("low_quality").as("reason"))
    val withLang =
      if (langs.isEmpty) q
      else q.unionByName(
        batch.filter(!TextAnalysis.langId(col("text"))
            .isin(langs.toSeq.sorted.map(lit(_)): _*))
          .select(col("doc_id"), lit("lang_not_allowed").as("reason")))
    val withLm = models.lm.fold(withLang) { case (model, maxNegLogP) =>
      withLang.unionByName(
        TextAnalysis.ngramScore(batch, col("doc_id"), col("text"), model)
          .filter(col("avg_neg_logp") > maxNegLogP)
          .select(col("doc_id"), lit("lm_perplexity").as("reason")))
    }
    val withNb = models.nb.fold(withLm) { model =>
      withLm.unionByName(
        TextAnalysis.nbScore(batch, col("doc_id"), col("text"), model)
          .filter(!col("predict_pos"))
          .select(col("doc_id"), lit("classifier_rejected").as("reason")))
    }
    models.dsir.fold(withNb) { case (model, minLogw) =>
      withNb.unionByName(
        Dsir.gateRejects(batch, model, col("doc_id"), col("text"),
          minLogw))
    }
  }

  /** [[runDocs]] with the quality gate composed IN FRONT: gated-out
    * documents never enter the bloom/LSH/span stages (junk should not
    * cost index joins), so a document rejected for quality is never
    * also labeled a duplicate — gate reasons take precedence by
    * construction. Returns (admitted, rejects) like [[runDocs]], with
    * gate and dedup reasons unioned in one audit frame. */
  def runDocsGated(corpus: DataFrame, batch: DataFrame,
                   minQuality: Double, langs: Set[String] = Set.empty,
                   threshold: Double = 0.8,
                   maxSpanFrac: Double = 0.5,
                   models: ModelGate = ModelGate()): (DataFrame, DataFrame) = {
    val gate = qualityRejects(batch, minQuality, langs, models)
      .localCheckpoint(true)
    val surviving = batch.join(
      gate.select("doc_id").distinct(), Seq("doc_id"), "left_anti")
    val (admitted, dupRejects) =
      runDocs(corpus, surviving, threshold, maxSpanFrac)
    (admitted, gate.unionByName(dupRejects))
  }

  /** The documents-admission core against EXTERNALLY-SUPPLIED indexes —
    * the persisted-store path: `fpIdx`/`mhIdx`/`spanIdx` are the three
    * admission indexes (inline-built by [[runDocs]], catalog tables in
    * [[admitDocs]]), `corpus` is the (doc_id, text) side verification
    * fetches candidate texts from, and `cfg` must be the configuration
    * the indexes were HASHED under — stale configs are exactly what
    * [[graft.sources.IndexStore]]'s recorded properties exist to
    * prevent. `prebuiltBloom` skips the per-batch bloom aggregation —
    * at production index sizes that is a full fp-index scan per batch;
    * the caller MUST keep the filter current with every append
    * ([[graft.sources.IndexStore]] does), because a bloom miss is
    * admitted with no confirm join. */
  def runDocsWith(fpIdx: DataFrame, mhIdx: DataFrame, spanIdx: DataFrame,
                  corpus: DataFrame, batch: DataFrame,
                  cfg: IndexStore.DocConfig, threshold: Double,
                  maxSpanFrac: Double,
                  prebuiltBloom: Option[org.apache.spark.util.sketch.BloomFilter]
                    = None): (DataFrame, DataFrame) = {
    val bloom = batch.sparkSession.sparkContext
      .broadcast(prebuiltBloom.getOrElse(Dedup.admissionBloom(fpIdx)))
    // Pin the exact-new survivors ONCE (eager checkpoint): four stages
    // consume this frame (exact-reject derivation, minhash-vs-corpus,
    // span-vs-corpus, within-batch), and without pinning each re-runs
    // the bloom probe + confirm join over the batch — pinning cut
    // isolated admission wall 30% at sf0.1 (4.5 -> 3.2 s, fresh JVMs).
    // Batch-sized memory. NOTE this pins stage 0 only: the RETURNED
    // rejects/admitted frames are still lazy plans over the live index
    // tables, so the read-your-own-append contract stands — callers
    // must materialize the decision (localCheckpoint the rejects, as
    // ingest_loop and StreamingIngest do) BEFORE appending.
    val survivors = Dedup.bloomAdmit(fpIdx, bloom, batch,
      col("doc_id"), col("text")).localCheckpoint(true)
    val exactDup = batch.join(survivors.select("doc_id"), Seq("doc_id"), "left_anti")
      .select(col("doc_id"), lit("exact_dup_of_corpus").as("reason"))
    val nearDup = Dedup.minhashIncrementalPairs(mhIdx, corpus, survivors,
        col("doc_id"), col("text"), cfg.ngram, cfg.numHashes, cfg.bands,
        threshold = threshold)
      .select(col("new_id").as("doc_id"), lit("near_dup_of_corpus").as("reason"))
      .distinct()
    val spanHeavy = Dedup.spanIncrementalStats(spanIdx, survivors,
        col("doc_id"), col("text"), cfg.spanK)
      .filter(col("overlap_frac") > maxSpanFrac)
      .select(col("doc_id"), lit("span_overlap_with_corpus").as("reason"))
    val withinBatch = Dedup.minhashLshPairs(survivors, col("doc_id"), col("text"),
        cfg.ngram, cfg.numHashes, cfg.bands, threshold = threshold)
      .select(greatest(col("id_a"), col("id_b")).as("doc_id"),
        lit("near_dup_within_batch").as("reason"))
      .distinct()
    val rejects = exactDup.unionByName(nearDup).unionByName(spanHeavy)
      .unionByName(withinBatch)
    val admitted = batch.join(
      rejects.select("doc_id").distinct(), Seq("doc_id"), "left_anti")
    (admitted, rejects)
  }

  /** Documents admission against a persisted [[graft.sources.IndexStore]]:
    * reads the four store tables and the recorded config from the catalog
    * and runs [[runDocsWith]] — per batch, the corpus is touched only by
    * the bucketed index scans and the candidate-sized text fetch. Does
    * NOT append; callers close the loop with
    * [[graft.sources.IndexStore.appendDocs]] AFTER materializing the
    * admitted frame (it reads the very tables the append writes). */
  def admitDocs(spark: SparkSession, prefix: String, batch: DataFrame,
                threshold: Double = 0.8,
                maxSpanFrac: Double = 0.5): (DataFrame, DataFrame) =
    runDocsWith(spark.table(IndexStore.fpTable(prefix)),
      spark.table(IndexStore.mhTable(prefix)),
      spark.table(IndexStore.spanTable(prefix)),
      spark.table(IndexStore.docsTable(prefix)), batch,
      IndexStore.docConfig(spark, prefix), threshold, maxSpanFrac,
      prebuiltBloom = Some(IndexStore.readBloom(spark, prefix)))

  /** Vectors admission. Returns (admitted, rejects(vec_id, reason)).
    * `nPlanes = 0` (the default) self-provisions from the measured
    * `planes = log2(N)+1` rule ([[Similarity.lshAutoPlanes]], one corpus
    * count) so callers get a selective config at any corpus size. */
  def runVecs(corpus: DataFrame, batch: DataFrame, threshold: Double = 0.9,
              nPlanes: Int = 0, nTables: Int = 4): (DataFrame, DataFrame) = {
    val c = Similarity.prepared(corpus, col("vec_id"), col("embedding"))
    val planes =
      if (nPlanes > 0) nPlanes
      else math.max(8, Similarity.lshAutoPlanes(math.max(1L, c.count())))
    runVecsWith(Similarity.lshIndex(c, planes, nTables), c, batch,
      threshold, planes, nTables)
  }

  /** The vectors-admission core against an externally-supplied
    * [[Similarity.lshIndex]]. `corpusPrepared` is in [[Similarity.prepared]]
    * shape; (planes, tables) must be the index's build config — enforced
    * from recorded properties on the store path, and double-checked by
    * `cosineIncrementalPairs`' sampled layout self-test. */
  def runVecsWith(index: DataFrame, corpusPrepared: DataFrame, batch: DataFrame,
                  threshold: Double, planes: Int,
                  nTables: Int): (DataFrame, DataFrame) = {
    val b = Similarity.prepared(batch, col("vec_id"), col("embedding"))
    val vsCorpus = Similarity.cosineIncrementalPairs(index, corpusPrepared, b,
        threshold, planes, nTables)
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

  /** Vectors admission against a persisted [[graft.sources.IndexStore]];
    * same contract as [[admitDocs]] (no append — materialize, then
    * [[graft.sources.IndexStore.appendVecs]]). */
  def admitVecs(spark: SparkSession, prefix: String, batch: DataFrame,
                threshold: Double = 0.9): (DataFrame, DataFrame) = {
    val cfg = IndexStore.vecConfig(spark, prefix)
    runVecsWith(spark.table(IndexStore.lshTable(prefix)),
      spark.table(IndexStore.vecsTable(prefix)), batch,
      threshold, cfg.nPlanes, cfg.nTables)
  }

  /** Vectors admission in SEMANTIC-INDEX (PQ) mode: the near-dup check
    * probes the persisted `_ivfpq` sidecar instead of the LSH band
    * index — the admission-time form of the semantic-dedup family, so a
    * store can run ingest with ONE ANN layout serving both search and
    * admission. Per batch vector:
    *  1. assign to its `nProbe` nearest STORED centroids (pure
    *     projection against the broadcast `_ivfc` table — rows and
    *     probes keep agreeing on the frozen quantizer, the
    *     [[graft.sources.IndexStore.buildIvf]] contract);
    *  2. ADC-score the probed cells' 16-byte codes (the scan reads
    *     ~nProbe/kLists of the code bytes via the literal-IN bucket
    *     prune — never the float vectors);
    *  3. exact-re-check ONLY near-threshold candidates
    *     (ADC ≥ threshold − margin, the [[Similarity.semDedupPqKeep]]
    *     margin contract) against `_vecs` — bucketed on `vec_id`, so
    *     the fetch join is exchange-free on the store side.
    * Within-batch pairs are CELL-BLOCKED: batch rows sharing a probed
    * top-1 cell pair up for an exact cosine check, smaller id survives —
    * the same colocation trade the semantic-dedup family documents
    * (cross-cell twins straddling a Voronoi edge are the accepted miss;
    * raise nProbe to shrink the corpus-side version of it).
    *
    * Identity is NOT excluded: a crash-replayed vector meets its stored
    * self at cosine 1.0 and is rejected `sem_dup_of_corpus`, which is
    * exactly what makes the streaming loop idempotent on the store.
    * Non-finite batch vectors produce NaN ADC/cosine scores, every
    * `>= threshold` comparison is false, and they admit — identical to
    * what the exact brute-force check would decide, so no special
    * routing is needed. */
  def admitVecsPq(spark: SparkSession, prefix: String, batch: DataFrame,
                  threshold: Double = 0.9, nProbe: Int = 1,
                  margin: Double = 0.3): (DataFrame, DataFrame) =
    admitVecsSemantic(spark, prefix, batch, threshold, nProbe, margin,
      residual = false)

  /** [[admitVecsPq]] against the RESIDUAL (`_ivfr`) sidecar instead of
    * the global-codebook `_ivfpq` — the finer 16-byte codes (measured
    * ADC recall 0.32 vs 0.24 at equal geometry) buy a tighter candidate
    * set at the same margin, i.e. fewer exact re-checks per admitted
    * batch. Same contract in every other respect: stored-centroid
    * assignment, margin + exact re-check, cell-blocked within-batch,
    * identity not excluded (replay self-rejects at cosine 1.0), and the
    * residual family's own version fences validated up front. */
  def admitVecsIvfr(spark: SparkSession, prefix: String, batch: DataFrame,
                    threshold: Double = 0.9, nProbe: Int = 1,
                    margin: Double = 0.3): (DataFrame, DataFrame) =
    admitVecsSemantic(spark, prefix, batch, threshold, nProbe, margin,
      residual = true)

  private def admitVecsSemantic(spark: SparkSession, prefix: String,
                                batch: DataFrame, threshold: Double,
                                nProbe: Int, margin: Double,
                                residual: Boolean): (DataFrame, DataFrame) = {
    import graft.functions.VectorExpressions
    import graft.operators.PqCodec
    val b = Similarity.prepared(batch, col("vec_id"), col("embedding"))
    // nProbe nearest stored cells per batch row, ranked and LUT'd by the
    // ONE probe-ranking the family's search path uses (probesRanked /
    // probesRankedResidual — admission must replay the same argmin the
    // stored rows were assigned under); the probes frame is delta-sized
    // and broadcasts. Both families score the unified cosine
    // (qc + adcDot) / (crn · ‖q‖): the residual decomposition's per-list
    // scalar qc is identically 0 for global codes (which quantize the
    // raw vector, no centroid term), and crn is derived per row for
    // global codes but STORED for residual ones.
    val (probesRaw, codesRaw) =
      if (residual) {
        val (model, centroids) = IndexStore.loadIvfResidual(spark, prefix)
        (PqCodec.probesRankedResidual(b, centroids, nProbe, model),
          spark.table(IndexStore.ivfrTable(prefix))
            .select(col("vec_id").as("cand_id"), col("centroid_id"),
              col("code"), col("crn")))
      } else {
        val model = IndexStore.loadPqModel(spark, prefix)
        val centroids = IndexStore.loadIvfCentroids(spark, prefix)
        (PqCodec.probesRanked(b, centroids, nProbe, model)
            .withColumn("qc", lit(0.0)),
          PqCodec.withCrn(spark.table(IndexStore.ivfPqTable(prefix)),
            model, extra = Seq("centroid_id")))
      }
    val probes = probesRaw
      .localCheckpoint(true) // batch × nProbe rows; also feeds the IN below
    val lists = probes.select(col("centroid_id")).distinct()
      .collect().map(_.getInt(0)).toSeq
    val codes = codesRaw.filter(col("centroid_id").isInCollection(lists))
    val candidates = codes.join(broadcast(probes), "centroid_id")
      .withColumn("acos",
        when(col("crn") * col("query_norm") === 0.0, lit(null).cast("double"))
          .otherwise((col("qc")
            + VectorExpressions.pqAdcDot(col("lut"), col("code")))
            / (col("crn") * col("query_norm"))))
      .filter(col("acos") >= threshold - margin)
      .select(col("query_id"), col("cand_id"))
    val stored = spark.table(IndexStore.vecsTable(prefix))
      .select(col("vec_id").as("cand_id"), col("vec").as("cvec2"),
        col("norm").as("cnorm2"))
    val qSide = b.select(col("vec_id").as("query_id"),
      col("vec").as("qvec"), col("norm").as("qnorm"))
    val vsCorpus = candidates
      .join(stored, "cand_id")
      .join(broadcast(qSide), "query_id")
      .withColumn("cosine",
        graft.functions.VectorFunctions.dot(col("qvec"), col("cvec2"))
          / (col("cnorm2") * col("qnorm")))
      .filter(col("cosine") >= threshold)
      .select(col("query_id").as("vec_id"),
        lit("sem_dup_of_corpus").as("reason"))
      .distinct()
    // cell-blocked within-batch: top-1 assigned cell pairs, exact cosine
    val cells = probes.filter(col("rn") === 1)
      .select(col("query_id").as("vec_id"), col("centroid_id"))
    val ba = b.join(cells, "vec_id")
      .select(col("centroid_id"), col("vec_id").as("id_a"),
        col("vec").as("va"), col("norm").as("na"))
    val bb = b.join(cells, "vec_id")
      .select(col("centroid_id"), col("vec_id").as("id_b"),
        col("vec").as("vb"), col("norm").as("nb"))
    val withinBatch = ba.join(bb, Seq("centroid_id"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cosine",
        graft.functions.VectorFunctions.dot(col("va"), col("vb"))
          / (col("na") * col("nb")))
      .filter(col("cosine") >= threshold)
      .select(col("id_b").as("vec_id"),
        lit("sem_dup_within_batch").as("reason"))
      .distinct()
    val rejects = vsCorpus.unionByName(withinBatch)
    val admitted = batch.join(
      rejects.select("vec_id").distinct(), Seq("vec_id"), "left_anti")
    (admitted, rejects)
  }

  /** Write admission output, print the one-line JSON report, and return
    * the RE-READ admitted frame — materialized through parquet, so a
    * subsequent index append never writes tables its own input plan is
    * still reading. The expensive admission DAG executes ONCE (for the
    * rejects); the admitted side is re-derived as `batch` anti-join the
    * written reject ids — definitionally what runDocsWith/runVecsWith
    * return, at the cost of one batch scan instead of a second full
    * admission pass. */
  private def writeAndReport(spark: SparkSession, mode: String, idCol: String,
                             batch: DataFrame, rejects: DataFrame,
                             outDir: String): DataFrame = {
    rejects.write.mode("overwrite").parquet(s"$outDir/rejects")
    val rejectsBack = spark.read.parquet(s"$outDir/rejects")
    batch.join(rejectsBack.select(idCol).distinct(), Seq(idCol), "left_anti")
      .write.mode("overwrite").parquet(s"$outDir/admitted")
    val nBatch = batch.count()
    val admittedBack = spark.read.parquet(s"$outDir/admitted")
    val byReason = rejectsBack
      .groupBy("reason").count().collect()
      .map(r => s""""${r.getString(0)}":${r.getLong(1)}""").sorted.mkString(",")
    println(s"""{"metric":"ingest_admission","mode":"$mode","batch":$nBatch,"admitted":${admittedBack.count()},"rejects":{$byReason}}""")
    admittedBack
  }

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty,
      "usage: IngestApp docs|vecs <corpus> <batch> <outDir> [...] | " +
        "docs-gated <corpus> <batch> <outDir> [minQuality] [langs-csv] [threshold] [maxSpanFrac] | " +
        "build-docs <corpus> <prefix> [buckets] | " +
        "admit-docs <batch> <prefix> <outDir> [threshold] [maxSpanFrac] | " +
        "build-vecs <corpus> <prefix> [buckets] [nPlanes] [nTables] | " +
        "admit-vecs <batch> <prefix> <outDir> [threshold] | " +
        "stream-docs <srcDir> <prefix> <outDir> [threshold] [maxSpanFrac] [compactEvery] | " +
        "stream-docs-gated <srcDir> <prefix> <outDir> [minQuality] [langs-csv] [threshold] [maxSpanFrac] [compactEvery] | " +
        "stream-vecs <srcDir> <prefix> <outDir> [threshold] [compactEvery] | " +
        "stream-vecs-pq <srcDir> <prefix> <outDir> [threshold] [nProbe] [margin] [compactEvery] | " +
        "stream-vecs-ivfr <srcDir> <prefix> <outDir> [threshold] [nProbe] [margin] [compactEvery] | " +
        "compact-docs <prefix> | compact-vecs <prefix> | " +
        "remove-docs <ids> <prefix> | remove-vecs <ids> <prefix> | " +
        "rebuild-vecs <prefix> [nPlanes] [nTables] | " +
        "rebuild-docs <prefix> [bands] [spanK] [ngram] [numHashes] [buckets] | " +
        "build-pq <prefix> [m] [ks] | rebuild-pq <prefix> [m] [ks]")
    val mode = args(0)
    val spark = GraftSession.local(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    try mode match {
      // one-shot admission: corpus indexes built inline, nothing persisted
      case "docs" | "vecs" =>
        require(args.length >= 4, s"usage: IngestApp $mode <corpus> <batch> <outDir> [...]")
        val corpus = spark.read.parquet(args(1))
        val batch = spark.read.parquet(args(2))
        val (_, rejects) =
          if (mode == "docs") runDocs(corpus, batch,
            threshold = args.lift(4).map(_.toDouble).getOrElse(0.8),
            maxSpanFrac = args.lift(5).map(_.toDouble).getOrElse(0.5))
          else runVecs(corpus, batch,
            threshold = args.lift(4).map(_.toDouble).getOrElse(0.9),
            nPlanes = args.lift(5).map(_.toInt).getOrElse(0), // 0 = lshAutoPlanes
            nTables = args.lift(6).map(_.toInt).getOrElse(4))
        writeAndReport(spark, mode, if (mode == "docs") "doc_id" else "vec_id",
          batch, rejects, args(3))

      // one-shot admission with the quality/language gate in front
      case "docs-gated" =>
        require(args.length >= 4,
          "usage: IngestApp docs-gated <corpus> <batch> <outDir> " +
            "[minQuality] [langs-csv] [threshold] [maxSpanFrac]")
        val corpus = spark.read.parquet(args(1))
        val batch = spark.read.parquet(args(2))
        val (_, rejects) = runDocsGated(corpus, batch,
          minQuality = args.lift(4).map(_.toDouble).getOrElse(0.1),
          langs = args.lift(5).map(_.split(",").map(_.trim)
            .filter(_.nonEmpty).toSet).getOrElse(Set.empty),
          threshold = args.lift(6).map(_.toDouble).getOrElse(0.8),
          maxSpanFrac = args.lift(7).map(_.toDouble).getOrElse(0.5))
        writeAndReport(spark, mode, "doc_id", batch, rejects, args(3))

      // the continuous loop: build once ...
      case "build-docs" =>
        require(args.length >= 3, "usage: IngestApp build-docs <corpus> <prefix> [buckets]")
        IndexStore.buildDocs(spark.read.parquet(args(1)), col("doc_id"),
          col("text"), args(2), IndexStore.DocConfig(
            buckets = args.lift(3).map(_.toInt).getOrElse(32)))
        println(s"""{"metric":"ingest_build","mode":"docs","prefix":"${args(2)}","rows":${spark.table(IndexStore.docsTable(args(2))).count()}}""")
      case "build-vecs" =>
        require(args.length >= 3, "usage: IngestApp build-vecs <corpus> <prefix> [buckets] [nPlanes] [nTables]")
        IndexStore.buildVecs(spark.read.parquet(args(1)), col("vec_id"),
          col("embedding"), args(2),
          nPlanes = args.lift(4).map(_.toInt).getOrElse(0),
          nTables = args.lift(5).map(_.toInt).getOrElse(4),
          buckets = args.lift(3).map(_.toInt).getOrElse(32))
        println(s"""{"metric":"ingest_build","mode":"vecs","prefix":"${args(2)}","rows":${spark.table(IndexStore.vecsTable(args(2))).count()}}""")

      // ... then admit + append per batch, forever
      case "admit-docs" =>
        require(args.length >= 4, "usage: IngestApp admit-docs <batch> <prefix> <outDir> [threshold] [maxSpanFrac]")
        val batch = spark.read.parquet(args(1))
        val (_, rejects) = admitDocs(spark, args(2), batch,
          threshold = args.lift(4).map(_.toDouble).getOrElse(0.8),
          maxSpanFrac = args.lift(5).map(_.toDouble).getOrElse(0.5))
        val admittedBack = writeAndReport(spark, mode, "doc_id", batch, rejects, args(3))
        IndexStore.appendDocs(admittedBack, col("doc_id"), col("text"), args(2))
      case "admit-vecs" =>
        require(args.length >= 4, "usage: IngestApp admit-vecs <batch> <prefix> <outDir> [threshold]")
        val batch = spark.read.parquet(args(1))
        val (_, rejects) = admitVecs(spark, args(2), batch,
          threshold = args.lift(4).map(_.toDouble).getOrElse(0.9))
        val admittedBack = writeAndReport(spark, mode, "vec_id", batch, rejects, args(3))
        IndexStore.appendVecs(admittedBack, col("vec_id"), col("embedding"), args(2))

      // the same loop as a structured stream: drain available source
      // files as micro-batches (admit → log rejects → append), then exit;
      // rerun with the same outDir to resume from the checkpoint
      case "stream-docs" | "stream-docs-gated" | "stream-vecs" |
           "stream-vecs-pq" | "stream-vecs-ivfr" =>
        require(args.length >= 4, s"usage: IngestApp $mode <srcDir> <prefix> <outDir> [...]")
        val q =
          if (mode == "stream-docs-gated")
            graft.streaming.StreamingIngest.docsStreamGated(spark, args(1),
              args(2), args(3),
              minQuality = args.lift(4).map(_.toDouble).getOrElse(0.1),
              langs = args.lift(5).map(_.split(",").map(_.trim)
                .filter(_.nonEmpty).toSet).getOrElse(Set.empty),
              threshold = args.lift(6).map(_.toDouble).getOrElse(0.8),
              maxSpanFrac = args.lift(7).map(_.toDouble).getOrElse(0.5),
              compactEvery = args.lift(8).map(_.toInt).getOrElse(0))
          else if (mode == "stream-docs")
            graft.streaming.StreamingIngest.docsStream(spark, args(1), args(2),
              args(3), threshold = args.lift(4).map(_.toDouble).getOrElse(0.8),
              maxSpanFrac = args.lift(5).map(_.toDouble).getOrElse(0.5),
              compactEvery = args.lift(6).map(_.toInt).getOrElse(0))
          else if (mode == "stream-vecs")
            graft.streaming.StreamingIngest.vecsStream(spark, args(1), args(2),
              args(3), threshold = args.lift(4).map(_.toDouble).getOrElse(0.9),
              compactEvery = args.lift(5).map(_.toInt).getOrElse(0))
          else
            graft.streaming.StreamingIngest.vecsStreamPq(spark, args(1), args(2),
              args(3), threshold = args.lift(4).map(_.toDouble).getOrElse(0.9),
              nProbe = args.lift(5).map(_.toInt).getOrElse(1),
              margin = args.lift(6).map(_.toDouble).getOrElse(0.3),
              residual = mode == "stream-vecs-ivfr",
              compactEvery = args.lift(7).map(_.toInt).getOrElse(0))
        q.awaitTermination()
        println(s"""{"metric":"ingest_stream","mode":"$mode","prefix":"${args(2)}","batches":${q.recentProgress.length}}""")

      // maintenance: fold appended file sets back to one file per bucket
      case "compact-docs" =>
        require(args.length >= 2, "usage: IngestApp compact-docs <prefix>")
        IndexStore.compactDocs(spark, args(1))
      case "compact-vecs" =>
        require(args.length >= 2, "usage: IngestApp compact-vecs <prefix>")
        IndexStore.compactVecs(spark, args(1))

      // forget documents/vectors by id: the takedown half of maintenance
      // (<ids> = parquet whose first column holds the ids)
      case "remove-docs" =>
        require(args.length >= 3, "usage: IngestApp remove-docs <ids> <prefix>")
        IndexStore.removeDocs(spark, args(2), spark.read.parquet(args(1)))
        println(s"""{"metric":"ingest_remove","mode":"docs","prefix":"${args(2)}","rows":${spark.table(IndexStore.docsTable(args(2))).count()}}""")
      case "remove-vecs" =>
        require(args.length >= 3, "usage: IngestApp remove-vecs <ids> <prefix>")
        IndexStore.removeVecs(spark, args(2), spark.read.parquet(args(1)))
        println(s"""{"metric":"ingest_remove","mode":"vecs","prefix":"${args(2)}","rows":${spark.table(IndexStore.vecsTable(args(2))).count()}}""")

      // re-provision the LSH index against the grown corpus (nPlanes 0 =
      // re-run auto-provisioning at the current count)
      case "rebuild-vecs" =>
        require(args.length >= 2, "usage: IngestApp rebuild-vecs <prefix> [nPlanes] [nTables]")
        IndexStore.rebuildVecs(spark, args(1),
          nPlanes = args.lift(2).map(_.toInt).getOrElse(0),
          nTables = args.lift(3).map(_.toInt).getOrElse(0))
        val cfg = IndexStore.vecConfig(spark, args(1))
        println(s"""{"metric":"ingest_rebuild","mode":"vecs","prefix":"${args(1)}","nPlanes":${cfg.nPlanes},"nTables":${cfg.nTables}}""")

      // PQ sidecar: provision / re-provision the 32x-smaller probe
      // surface (0 = keep the stored geometry on rebuild)
      case "build-pq" =>
        require(args.length >= 2, "usage: IngestApp build-pq <prefix> [m] [ks]")
        IndexStore.buildPq(spark, args(1),
          m = args.lift(2).map(_.toInt).getOrElse(16),
          ks = args.lift(3).map(_.toInt).getOrElse(16))
        println(s"""{"metric":"ingest_build","mode":"pq","prefix":"${args(1)}","rows":${spark.table(IndexStore.pqTable(args(1))).count()}}""")
      case "rebuild-pq" =>
        require(args.length >= 2, "usage: IngestApp rebuild-pq <prefix> [m] [ks]")
        IndexStore.rebuildPq(spark, args(1),
          m = args.lift(2).map(_.toInt).getOrElse(0),
          ks = args.lift(3).map(_.toInt).getOrElse(0))
        val pm = IndexStore.loadPqModel(spark, args(1))
        println(s"""{"metric":"ingest_rebuild","mode":"pq","prefix":"${args(1)}","m":${pm.m},"ks":${pm.ks}}""")

      // re-derive the docs indexes under a new config (unspecified knobs
      // keep their recorded values; the bloom is always re-provisioned
      // against the current corpus size)
      case "rebuild-docs" =>
        require(args.length >= 2,
          "usage: IngestApp rebuild-docs <prefix> [bands] [spanK] [ngram] [numHashes] [buckets]")
        // read the current config only when the live _docs exists — in
        // the mid-swap crash state (live dropped, temp present) there is
        // no config to read, and rebuildDocs' recovery branch ignores the
        // passed config anyway (it only finishes the renames)
        val cfg =
          if (spark.catalog.tableExists(IndexStore.docsTable(args(1)))) {
            // unfenced read: rebuild IS the migration path for a store
            // built under an old fingerprint algorithm — the fenced
            // docConfig would reject exactly the store we are fixing
            val cur = IndexStore.docConfigUnfenced(spark, args(1))
            cur.copy(
              bands = args.lift(2).map(_.toInt).getOrElse(cur.bands),
              spanK = args.lift(3).map(_.toInt).getOrElse(cur.spanK),
              ngram = args.lift(4).map(_.toInt).getOrElse(cur.ngram),
              numHashes = args.lift(5).map(_.toInt).getOrElse(cur.numHashes),
              buckets = args.lift(6).map(_.toInt).getOrElse(cur.buckets),
              bloomN = 0L)
          } else IndexStore.DocConfig() // recovery call: unused
        IndexStore.rebuildDocs(spark, args(1), cfg)
        val after = IndexStore.docConfig(spark, args(1))
        println(s"""{"metric":"ingest_rebuild","mode":"docs","prefix":"${args(1)}","bands":${after.bands},"spanK":${after.spanK},"bloomN":${after.bloomN}}""")

      case other => throw new IllegalArgumentException(
        s"unknown mode '$other' (docs|vecs|build-docs|admit-docs|build-vecs|" +
          "admit-vecs|stream-docs|stream-vecs|compact-docs|compact-vecs|" +
          "remove-docs|remove-vecs|rebuild-vecs|rebuild-docs)")
    } finally spark.stop()
  }
}
