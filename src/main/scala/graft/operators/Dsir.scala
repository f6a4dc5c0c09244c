package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** DSIR — Data Selection with Importance Resampling (Xie et al. 2023,
  * "Data Selection for Language Models via Importance Resampling"):
  * score every raw document by how much more likely its features are
  * under a TARGET-domain distribution than under the raw-corpus
  * distribution, then keep the top of the raw corpus by that importance
  * weight — the standard way a pretraining team skews a web crawl
  * toward a quality/domain sample without training a classifier.
  *
  * Features are the document's 1..n-gram token multiset, HASHED into
  * `nBuckets` md5 buckets by default ([[DefaultBuckets]]) — the paper's
  * own form: at 100 TB an unhashed n-gram vocabulary is not
  * "vocabulary-shaped", it is corpus-shaped in the tail, while hashed
  * buckets bound the feature space a priori AND pool the rare-gram tail
  * into well-estimated buckets instead of each rare gram meeting
  * Laplace smoothing alone. The raw-gram space (`nBuckets = 0`) stays
  * available behind a MEASURED pre-screen guard (one map-side
  * approx-distinct pass; over `maxFeatures` the call fails by name
  * citing the hashing lever — the [[TextAnalysis.ngramTrain]] pattern).
  * Both distributions are Laplace-smoothed over the SHARED feature
  * vocabulary V (every feature seen in either corpus):
  * `p(f) = (n_f + 1) / (N + |V|)` — no zero anywhere, so the
  * log-ratio is total.
  *
  * ENGINE-EXACT: each feature's log importance ratio
  * `ln(p_tgt(f) / p_raw(f))` is rounded ONCE to 6 dp, and a document's
  * log-weight is the occurrence-weighted DECIMAL sum of those rounded
  * ratios — exact, associativity-free, bit-equal on any engine (the
  * n-gram-LM contract).
  *
  * The PRODUCTION LOOP — a pretraining team uses DSIR as a persistent
  * gate, not a one-shot query:
  *  - [[model]] trains once (two counting scans); persist it with
  *    [[graft.sources.DsirStore]] (build/stamp/fence lifecycle, the
  *    TokenizerStore pattern) and load it from any later session.
  *  - [[scoreAgainst]] scores ANY batch against the trained model —
  *    features unseen at training time take the Laplace-default ratio
  *    (counts 0/0 under the trained totals), so the score is total on
  *    novel text.
  *  - [[gateRejects]] is the admission form: reject a batch document
  *    whose log-weight falls below a calibrated threshold — composes
  *    with [[graft.IngestApp]]'s gate chain
  *    (`ModelGate(dsir = Some(model -> minLogw))`) for both batch and
  *    streaming ingestion.
  *  - [[sampled]] is the paper's actual resampling: Gumbel-top-k over
  *    the log-weights ([[Sampling.gumbelTopK]]) — a deterministic,
  *    engine-replayable draw from softmax(logw) without replacement.
  *    [[select]] remains the expectation-shaped greedy top-k.
  *
  * Scale shape: two counting aggregates (one scan per corpus), one
  * vocabulary-sized join to build the ratio table, then the scored
  * docs' exploded features join the ratios on the feature key (shuffle
  * on the feature — the same exchange the LM scorers pay) and fold back
  * to one row per document. Selection is a rank-limited top-k
  * (TakeOrderedAndProject), never a global sort. Nothing is ever
  * corpus-×-corpus.
  */
object Dsir {

  private val dec = DecimalType(38, 6)

  /** Default hashed-feature-space size. The paper uses 10k buckets; a
    * larger power of two keeps per-bucket pooling mild while the ratio
    * table stays trivially vocabulary-shaped (65536 rows max). */
  val DefaultBuckets: Int = 1 << 16

  /** A trained DSIR importance model: the ratio table
    * `(f, tgt_n, raw_n, logr)` plus the training totals that make
    * scoring total on unseen features. `nFeatures` = |V| (= ratio-table
    * rows), `nRawOcc`/`nTgtOcc` = total feature occurrences per side.
    * `minLogw` is the CALIBRATED admission threshold when the store
    * carries one ([[graft.sources.DsirStore.buildCalibrated]] stamps
    * it; [[calibrateThreshold]] derives it) — None on an uncalibrated
    * model. Persist/load via [[graft.sources.DsirStore]]. */
  final case class Model(ratios: DataFrame, ngram: Int, nBuckets: Int,
                         nFeatures: Long, nRawOcc: Long, nTgtOcc: Long,
                         minLogw: Option[Double] = None) {
    /** The Laplace-default log-ratio of a feature UNSEEN at training
      * time — exactly the table formula at counts 0/0:
      * `round(ln(1/(NT+V)) − ln(1/(NR+V)), 6)`. Same float op order as
      * the table rows, so any engine re-derives it from the stamped
      * totals. */
    def logr0: Column = round(
      log(lit(1.0) / lit(nTgtOcc + nFeatures).cast("double")) -
        log(lit(1.0) / lit(nRawOcc + nFeatures).cast("double")), 6)
  }

  /** The 1..n-gram feature multiset of a text column, exploded:
    * one row per occurrence. */
  private def features(df: DataFrame, id: Column, text: Column,
                       ngram: Int, nBuckets: Int): DataFrame = {
    val toks = TextAnalysis.tokens(text)
    // k-grams built from (k-1)-grams: pair gram i with token i+k-1 —
    // grams stay contiguous (never skip or cross token boundaries)
    val byLen = (2 to ngram).scanLeft(toks) { (prev, k) =>
      zip_with(
        slice(prev, lit(1), greatest(size(toks) - (k - 1), lit(0))),
        slice(toks, lit(k), greatest(size(toks) - (k - 1), lit(0))),
        (a, b) => concat(a, lit(" "), b))
    }
    val exploded = df.select(id.as("doc_id"),
      explode(byLen.reduce(concat(_, _))).as("__g"))
    // the paper's HASHED feature space: md5-bucket the gram (the
    // portable-hash convention — both engines re-derive the identical
    // bucket), so the long tail POOLS into well-estimated buckets
    // instead of each rare gram meeting Laplace smoothing alone
    val f =
      if (nBuckets > 0)
        pmod(conv(substring(md5(col("__g")), 1, 8), 16, 10).cast("long"),
          lit(nBuckets.toLong)).cast("string")
      else col("__g")
    exploded.select(col("doc_id"), f.as("f"))
  }

  /** Train the importance model: per-feature raw/target counts
    * (full-outer joined over the shared vocabulary, pinned), the
    * corpus totals collected ONCE (three numbers), and the round-once
    * log-ratio table derived from them. Eager — the counts materialize
    * here (deployment persists the result via
    * [[graft.sources.DsirStore]] and never retrains per batch).
    *
    * `nBuckets = 0` (raw grams) runs the measured pre-screen first:
    * one map-side approx-distinct pass over both feature streams; an
    * estimate over `maxFeatures` fails by name citing the hashing
    * lever before any corpus-shaped table is built. */
  def model(raw: DataFrame, target: DataFrame, id: Column, text: Column,
            ngram: Int = 2, nBuckets: Int = DefaultBuckets,
            maxFeatures: Long = 4L << 20): Model = {
    require(ngram >= 1 && ngram <= 3, s"need 1 <= ngram <= 3: $ngram")
    require(nBuckets >= 0, s"need nBuckets >= 0: $nBuckets")
    require(maxFeatures >= 1, s"need maxFeatures >= 1: $maxFeatures")
    if (nBuckets == 0) {
      // raw-gram mode: measure BEFORE building (partial agg, one small
      // result row — no corpus-shaped materialization on the guard).
      // The estimate is approximate (rsd 2%), so the guard keeps a 5%
      // safety margin (> 2 rsd) and fails CLOSED near the boundary: a
      // space the estimator might be under-reading never slips past
      // the limit it exists to enforce.
      val est = features(raw, id, text, ngram, 0).select(col("f"))
        .unionAll(features(target, id, text, ngram, 0).select(col("f")))
        .agg(approx_count_distinct(col("f"), 0.02).as("v"))
        .head().getLong(0)
      require(est <= maxFeatures - maxFeatures / 20,
        s"Dsir: raw-gram feature space is ~$est distinct grams (approx, " +
          "rsd 2%; the guard keeps a 5% margin under " +
          s"maxFeatures=$maxFeatures) — past the limit the ratio table " +
          "is corpus-shaped in the tail, not vocabulary-shaped; hash " +
          "the feature space with nBuckets (the paper's form) or raise " +
          "maxFeatures")
    }
    val rawCnt = features(raw, id, text, ngram, nBuckets)
      .groupBy(col("f")).agg(count(lit(1)).as("raw_n"))
    val tgtCnt = features(target, id, text, ngram, nBuckets)
      .groupBy(col("f")).agg(count(lit(1)).as("tgt_n"))
    val joined = rawCnt.join(tgtCnt, Seq("f"), "full_outer")
      .na.fill(0L, Seq("raw_n", "tgt_n"))
      .localCheckpoint()
    val st: Row = joined.agg(
      count(lit(1)).as("v"),
      sum(col("raw_n")).as("nr"),
      sum(col("tgt_n")).as("nt")).head()
    // a featureless pair of corpora (all-blank text) would otherwise
    // surface as a null-sum NPE here or an infinite logr0 downstream —
    // fail by name at the training boundary instead
    require(st.getLong(0) > 0,
      "Dsir: the corpora produced ZERO features — blank or empty " +
        "raw+target input cannot train an importance model")
    val (v, nr, nt) = (st.getLong(0), st.getLong(1), st.getLong(2))
    val ratios = joined.select(col("f"), col("tgt_n"), col("raw_n"),
      round(
        log((col("tgt_n") + 1).cast("double") /
            lit(nt + v).cast("double")) -
        log((col("raw_n") + 1).cast("double") /
            lit(nr + v).cast("double")), 6).as("logr"))
    Model(ratios, ngram, nBuckets, v, nr, nt)
  }

  /** Per-feature importance log-ratio table:
    * `(f, tgt_n, raw_n, logr)` where `logr = round(ln(p_tgt/p_raw), 6)`
    * under Laplace smoothing over the shared vocabulary. Vocabulary-
    * sized. For n-gram features of k > 2 the second slice shifts by
    * k−1 — grams never cross token boundaries. */
  def ratioTable(raw: DataFrame, target: DataFrame, id: Column,
                 text: Column, ngram: Int = 2,
                 nBuckets: Int = DefaultBuckets,
                 maxFeatures: Long = 4L << 20): DataFrame =
    model(raw, target, id, text, ngram, nBuckets, maxFeatures).ratios

  /** Per-document importance log-weights over the raw corpus:
    * `(doc_id, n_feats, logw)` — the DECIMAL-summed rounded ratios.
    * Documents with no features (blank) score 0 with 0 features —
    * faithfully the paper's importance ratio of 1 for an empty feature
    * vector, which typically OUTRANKS out-of-domain text; a real
    * pipeline filters empties upstream (the quality gate owns them).
    * The TARGET sample must be large enough that Laplace smoothing
    * doesn't flatten p_tgt toward uniform (a handful of target tokens
    * over a web-scale vocabulary scores everything near zero —
    * estimate-quality is the caller's dial, per the paper). */
  def weights(raw: DataFrame, target: DataFrame, id: Column,
              text: Column, ngram: Int = 2,
              nBuckets: Int = DefaultBuckets,
              maxFeatures: Long = 4L << 20): DataFrame =
    weightsWith(raw,
      model(raw, target, id, text, ngram, nBuckets, maxFeatures),
      id, text)

  /** [[weights]] against a PRE-BUILT model over the model's own raw
    * corpus — every feature is in the table by construction, so the
    * join is inner. For a batch the model has never seen, use
    * [[scoreAgainst]] (left join + Laplace default). */
  def weightsWith(raw: DataFrame, m: Model, id: Column,
                  text: Column): DataFrame = {
    val ratios = m.ratios.select(col("f"), col("logr"))
    val docF = features(raw, id, text, m.ngram, m.nBuckets)
    val scored = docF.join(ratios, Seq("f"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_feats"),
        sum(col("logr").cast(dec)).cast("double").as("logw"))
    raw.select(id.as("doc_id"))
      .join(scored, Seq("doc_id"), "left")
      .na.fill(0L, Seq("n_feats")).na.fill(0.0, Seq("logw"))
  }

  /** Score an ARBITRARY batch against a trained model — the deployment
    * form ([[graft.sources.DsirStore.load]] then score every new
    * crawl): `(doc_id, n_feats, n_unseen, logw)`. Features absent from
    * the trained vocabulary take [[Model.logr0]], the Laplace-default
    * ratio at counts 0/0 — the score stays total on novel text, and
    * `n_unseen` reports how much of the batch the model had no
    * evidence for (a high unseen fraction means the model is stale —
    * the retrain signal). One feature-keyed exchange; per-batch cost
    * is independent of the training corpora. */
  def scoreAgainst(batch: DataFrame, m: Model, id: Column,
                   text: Column): DataFrame = {
    val ratios = m.ratios.select(col("f"), col("logr"))
    val docF = features(batch, id, text, m.ngram, m.nBuckets)
    val scored = docF.join(ratios, Seq("f"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_feats"),
        sum(when(col("logr").isNull, 1L).otherwise(0L)).as("n_unseen"),
        sum(coalesce(col("logr"), m.logr0).cast(dec)).cast("double")
          .as("logw"))
    batch.select(id.as("doc_id"))
      .join(scored, Seq("doc_id"), "left")
      .na.fill(0L, Seq("n_feats", "n_unseen")).na.fill(0.0, Seq("logw"))
  }

  /** The ADMISSION form: `(doc_id, reason)` rejects for batch documents
    * scoring below `minLogw` — the persistent-gate shape a pretraining
    * team actually runs (threshold calibrated offline against the
    * model; see [[graft.IngestApp.ModelGate]] for the gate-chain
    * composition, batch and streaming). Documents with NO features
    * carry no model evidence and PASS (the ModelGate convention — the
    * heuristic quality gate owns blanks). */
  def gateRejects(batch: DataFrame, m: Model, id: Column, text: Column,
                  minLogw: Double): DataFrame =
    scoreAgainst(batch, m, id, text)
      .filter(col("n_feats") > 0 && col("logw") < minLogw)
      .select(col("doc_id"), lit("dsir_out_of_domain").as("reason"))

  /** [[gateRejects]] with the threshold THE MODEL CARRIES — the stored
    * calibration ([[graft.sources.DsirStore.buildCalibrated]] /
    * [[calibrateThreshold]]); fails by name on an uncalibrated model so
    * a deployment can never silently gate at an unconfigured constant. */
  def gateRejects(batch: DataFrame, m: Model, id: Column,
                  text: Column): DataFrame = {
    require(m.minLogw.isDefined,
      "Dsir.gateRejects: model carries no calibrated minLogw — build the " +
        "store with DsirStore.buildCalibrated (or pass an explicit " +
        "threshold)")
    gateRejects(batch, m, id, text, m.minLogw.get)
  }

  /** Calibrate the admission threshold from the training corpus's OWN
    * log-weight distribution instead of a hand-picked constant: the KLL
    * q-quantile of `logw` (k = 200 → normalized rank error ~1.3%),
    * returned as `(minLogw, eps)` with eps read from the sketch itself.
    * One partial-aggregating scan over the weights — the sketch is
    * mergeable ([[graft.functions.SketchAggregators]], the
    * q_quantile_rollup machinery), so at any corpus size the driver
    * sees ONE sketch, never the weights. Deployment stamps the result
    * into [[graft.sources.DsirStore]] so every later session loads the
    * threshold with the model; the exact rank of the returned value is
    * certifiable in one extra pass (|CDF(minLogw) − q| ≤ 2·eps — the
    * registered query attests exactly that). */
  def calibrateThreshold(weights: DataFrame, q: Double): (Double, Double) = {
    require(q > 0.0 && q < 1.0, s"need 0 < q < 1: $q")
    import graft.functions.SketchAggregators
    val arr = weights
      .agg(SketchAggregators.kllAgg(col("logw"), 200).as("sk"))
      .agg(SketchAggregators.kllUnionQuantiles(col("sk"), Seq(q), 200)
        .as("qe"))
      .head().getSeq[Double](0)
    require(arr.nonEmpty,
      "Dsir.calibrateThreshold: the weights frame is EMPTY — an empty " +
        "corpus cannot calibrate an admission threshold")
    (arr(0), arr(1))
  }

  /** The STALENESS MONITOR over [[scoreAgainst]]'s `n_unseen` signal —
    * per group: docs, total features, unseen features, the unseen
    * FRACTION (quant6 of the exact bigint quotient — engine-exact), and
    * the verdict against `staleFrac`. A rising unseen fraction means the
    * trained vocabulary no longer covers the stream — THE retrain
    * signal (the score itself stays total via the Laplace default, so
    * nothing else surfaces the drift). Registered like the Drift
    * family; one feature-keyed exchange + one group-keyed fold. */
  def stalenessReport(batch: DataFrame, m: Model, id: Column, text: Column,
                      groups: Seq[(String, Column)],
                      staleFrac: Double): DataFrame = {
    require(groups.nonEmpty, "stalenessReport: need at least one group col")
    val dims = batch.select(
      (id.as("doc_id") +: groups.map { case (n, c) => c.as(n) }): _*)
    scoreAgainst(batch, m, id, text)
      .join(dims, Seq("doc_id"))
      .groupBy(groups.map(g => col(g._1)): _*)
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_feats")).as("n_feats"),
        sum(col("n_unseen")).as("n_unseen"))
      .withColumn("unseen_frac",
        when(col("n_feats") > 0, TextAnalysis.quant6(
          col("n_unseen").cast("double") / col("n_feats").cast("double")))
          .otherwise(lit(0.0)))
      .withColumn("stale", col("unseen_frac") > staleFrac)
  }

  /** The selection: top-`k` raw documents by `(logw DESC, doc_id)` —
    * deterministic, rank-limited. This is the EXPECTATION-shaped form
    * of the paper's Gumbel resampling (greedy top-k by weight); the
    * sampled form is [[sampled]]. */
  def select(raw: DataFrame, target: DataFrame, id: Column, text: Column,
             k: Int, ngram: Int = 2, nBuckets: Int = DefaultBuckets,
             maxFeatures: Long = 4L << 20): DataFrame = {
    require(k >= 1, s"need k >= 1: $k")
    weights(raw, target, id, text, ngram, nBuckets, maxFeatures)
      .orderBy(col("logw").desc, col("doc_id"))
      .limit(k)
  }

  /** The paper's ACTUAL resampling: k documents drawn WITHOUT
    * replacement with probability proportional to the importance
    * weight `exp(logw)` — the Gumbel-top-k draw
    * ([[Sampling.gumbelTopK]]: per-doc priority
    * `round(logw − ln(−ln(u(doc_id))), 6)`, u deterministic from
    * md5(doc_id)), entirely in log space so web-scale |logw| never
    * overflows, deterministic and engine-replayable like every other
    * seeded draw in [[Sampling]]. Returns the winners with their
    * priorities; rank-limited top-k, never a global sort. */
  def sampled(raw: DataFrame, target: DataFrame, id: Column, text: Column,
              k: Int, ngram: Int = 2, nBuckets: Int = DefaultBuckets,
              maxFeatures: Long = 4L << 20): DataFrame = {
    require(k >= 1, s"need k >= 1: $k")
    Sampling.gumbelTopK(
      weights(raw, target, id, text, ngram, nBuckets, maxFeatures),
      col("doc_id"), col("logw"), k)
  }

  // ---- multi-target: one crawl, several target domains at once -------

  /** A MULTI-TARGET importance model (the paper's practical deployment:
    * one crawl gated against SEVERAL target domains at once): per-domain
    * ratio rows STACKED under a `domain` key —
    * `(domain, f, tgt_n, raw_n, logr)`, a FULL GRID of k rows per
    * vocabulary feature (k·|V| rows, still vocabulary-shaped for small
    * k) — so scoring all k domains is ONE feature-keyed exchange into
    * the stacked table, never k passes over the corpus. Smoothing runs
    * over the SHARED vocabulary V (every feature seen in raw or ANY
    * target): `p_d(f) = (n_{d,f}+1)/(N_d+|V|)` with the raw side
    * common — one consistent denominator family, so scores are
    * comparable ACROSS domains (the per-domain-budget composition,
    * [[Sampling.gumbelStratifiedTopK]], needs exactly that). */
  final case class MultiModel(ratios: DataFrame, ngram: Int, nBuckets: Int,
                              nFeatures: Long, nRawOcc: Long,
                              domains: Seq[String],
                              nTgtOcc: Map[String, Long]) {
    /** The PER-DOMAIN Laplace-default log-ratio of a feature unseen at
      * training time — the table formula at counts 0/0 under domain
      * `d`'s totals (the [[Model.logr0]] convention, one per domain). */
    def logr0(d: String): Column = round(
      log(lit(1.0) / lit(nTgtOcc(d) + nFeatures).cast("double")) -
        log(lit(1.0) / lit(nRawOcc + nFeatures).cast("double")), 6)
  }

  /** Train the multi-target model: one raw counting scan, one scan per
    * target (unioned into a single domain-keyed aggregate), the shared
    * vocabulary pinned once, per-domain totals collected as k numbers,
    * and the stacked round-once ratio grid derived from them. Eager,
    * like [[model]]. A target whose corpus yields zero features fails
    * by name (its smoothed distribution would be uniform noise). */
  def modelMulti(raw: DataFrame, targets: Seq[(String, DataFrame)],
                 id: Column, text: Column, ngram: Int = 2,
                 nBuckets: Int = DefaultBuckets,
                 maxFeatures: Long = 4L << 20): MultiModel = {
    require(targets.nonEmpty, "Dsir.modelMulti: need >= 1 target domain")
    require(targets.map(_._1).distinct.size == targets.size,
      s"Dsir.modelMulti: duplicate domain names in ${targets.map(_._1)}")
    require(ngram >= 1 && ngram <= 3, s"need 1 <= ngram <= 3: $ngram")
    require(nBuckets >= 0, s"need nBuckets >= 0: $nBuckets")
    if (nBuckets == 0) {
      val est = targets.map(t => features(t._2, id, text, ngram, 0))
        .foldLeft(features(raw, id, text, ngram, 0))(_ unionAll _)
        .agg(approx_count_distinct(col("f"), 0.02).as("v"))
        .head().getLong(0)
      require(est <= maxFeatures - maxFeatures / 20,
        s"Dsir.modelMulti: raw-gram feature space is ~$est distinct " +
          "grams (approx, rsd 2%; 5% margin) — hash with nBuckets or " +
          s"raise maxFeatures=$maxFeatures")
    }
    val rawCnt = features(raw, id, text, ngram, nBuckets)
      .groupBy(col("f")).agg(count(lit(1)).as("raw_n"))
    val tgtCnt = targets.map { case (d, df) =>
        features(df, id, text, ngram, nBuckets)
          .select(lit(d).as("domain"), col("f"))
      }.reduce(_ unionAll _)
      .groupBy(col("domain"), col("f")).agg(count(lit(1)).as("tgt_n"))
      .localCheckpoint()
    // shared vocabulary: every feature in raw or ANY target, raw counts
    // restored (vocabulary-shaped; pinned — the grid and the totals
    // both read it)
    val vocab = rawCnt.select(col("f"))
      .unionAll(tgtCnt.select(col("f"))).distinct()
      .join(rawCnt, Seq("f"), "left")
      .na.fill(0L, Seq("raw_n"))
      .localCheckpoint()
    val st: Row = vocab.agg(count(lit(1)).as("v"),
      sum(col("raw_n")).as("nr")).head()
    require(st.getLong(0) > 0,
      "Dsir.modelMulti: the corpora produced ZERO features — blank or " +
        "empty input cannot train an importance model")
    val (v, nr) = (st.getLong(0), st.getLong(1))
    val totals = tgtCnt.groupBy(col("domain"))
      .agg(sum(col("tgt_n")).as("nt")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    targets.foreach { case (d, _) =>
      require(totals.contains(d),
        s"Dsir.modelMulti: target domain '$d' trained ZERO features — " +
          "a blank target cannot define a domain distribution")
    }
    val spark = raw.sparkSession
    import scala.jdk.CollectionConverters._
    val totalsDf = spark.createDataFrame(
      targets.map(t => Row(t._1, totals(t._1))).asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("domain",
          org.apache.spark.sql.types.StringType, nullable = false),
        org.apache.spark.sql.types.StructField("nt",
          org.apache.spark.sql.types.LongType, nullable = false))))
    val grid = vocab.select(col("f"), col("raw_n"),
        explode(array(targets.map(t => lit(t._1)): _*)).as("domain"))
      .join(tgtCnt, Seq("domain", "f"), "left")
      .na.fill(0L, Seq("tgt_n"))
      .join(broadcast(totalsDf), Seq("domain"))
    // pin the stacked grid (k·|V| rows — vocabulary-shaped): scoring
    // then joins a materialized table, so k domains plan exactly the
    // same exchanges as one (spec-asserted), and the grid's own joins
    // never replay per batch
    val ratios = grid.select(col("domain"), col("f"), col("tgt_n"),
      col("raw_n"),
      round(
        log((col("tgt_n") + 1).cast("double") /
            (col("nt") + lit(v)).cast("double")) -
        log((col("raw_n") + 1).cast("double") /
            lit(nr + v).cast("double")), 6).as("logr"))
      .localCheckpoint()
    MultiModel(ratios, ngram, nBuckets, v, nr, targets.map(_._1), totals)
  }

  /** Per-document, PER-DOMAIN importance log-weights of the model's own
    * raw corpus: `(doc_id, domain, n_feats, logw)`. The features explode
    * ONCE and join the stacked grid on the feature key alone — one
    * exchange scores every domain (each occurrence fans out to its k
    * domain rows on the join's probe side, map-side), then one
    * (doc, domain)-keyed DECIMAL fold. Zero-feature docs surface once
    * per domain with logw 0 (the [[weightsWith]] convention; the
    * restore side is a broadcast of the k-row domain dimension).
    * Composes with [[Sampling.gumbelStratifiedTopK]] on `domain` for
    * per-domain resampling budgets. */
  def weightsMultiWith(raw: DataFrame, mm: MultiModel, id: Column,
                       text: Column): DataFrame = {
    val scored = features(raw, id, text, mm.ngram, mm.nBuckets)
      .join(mm.ratios.select(col("f"), col("domain"), col("logr")),
        Seq("f"))
      .groupBy(col("doc_id"), col("domain"))
      .agg(count(lit(1)).as("n_feats"),
        sum(col("logr").cast(dec)).cast("double").as("logw"))
    val spark = raw.sparkSession
    import spark.implicits._
    val dims = broadcast(mm.domains.toDF("domain"))
    raw.select(id.as("doc_id")).crossJoin(dims)
      .join(scored, Seq("doc_id", "domain"), "left")
      .na.fill(0L, Seq("n_feats")).na.fill(0.0, Seq("logw"))
  }

  /** [[scoreAgainst]]'s MULTI-TARGET form: an ARBITRARY batch scored
    * against EVERY domain of the trained model in the same single
    * feature-keyed pass — `(doc_id, domain, n_feats, n_unseen, logw)`.
    * Features absent from the shared trained vocabulary miss the grid
    * entirely (no domain rows off the left join), so they are counted
    * ONCE per document and every domain charges them its OWN Laplace
    * default ([[MultiModel.logr0]] — counts 0/0 under that domain's
    * totals): each domain's score stays total on novel text, and
    * `n_unseen` (domain-independent by construction) keeps the
    * staleness signal. Exact DECIMAL arithmetic throughout:
    * `logw = Σ seen logr + n_unseen × logr0_d` — identical to folding
    * the default into the occurrence sum, in any order. */
  def scoreAgainstMulti(batch: DataFrame, mm: MultiModel, id: Column,
                        text: Column): DataFrame = {
    val docF = features(batch, id, text, mm.ngram, mm.nBuckets)
      .join(mm.ratios.select(col("f"), col("domain"), col("logr")),
        Seq("f"), "left")
    val seen = docF.filter(col("domain").isNotNull)
      .groupBy(col("doc_id"), col("domain"))
      .agg(count(lit(1)).as("n_seen"),
        sum(col("logr").cast(dec)).as("seen_sum"))
    val unseenCnt = docF.filter(col("domain").isNull)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_unseen"))
    val lr0 = {
      val first = when(col("domain") === mm.domains.head,
        mm.logr0(mm.domains.head))
      mm.domains.tail.foldLeft(first) { (c, d) =>
        c.when(col("domain") === d, mm.logr0(d))
      }
    }
    val spark = batch.sparkSession
    import spark.implicits._
    val dims = broadcast(mm.domains.toDF("domain"))
    batch.select(id.as("doc_id")).crossJoin(dims)
      .join(seen, Seq("doc_id", "domain"), "left")
      .join(unseenCnt, Seq("doc_id"), "left")
      .na.fill(0L, Seq("n_seen", "n_unseen"))
      .select(col("doc_id"), col("domain"),
        (col("n_seen") + col("n_unseen")).as("n_feats"),
        col("n_unseen"),
        (coalesce(col("seen_sum"), lit(0).cast(dec)) +
          col("n_unseen") * lr0.cast(dec)).cast("double").as("logw"))
  }
}
