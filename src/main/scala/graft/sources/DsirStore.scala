package graft.sources

import graft.operators.Dsir
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Persisted DSIR importance model ([[Dsir.Model]]) — the deployment
  * shape of data selection: train ONCE (two counting scans over the
  * raw/target corpora), persist the vocabulary-shaped ratio table plus
  * the training totals, and GATE every later crawl from any session,
  * stream, or cluster without retraining — the same
  * train/store/score split as the tokenizer, ANN, and BM25 stores.
  *
  * One catalog table `<prefix>_dsir` `(f, tgt_n, raw_n, logr)`, stamped
  * with the feature-space config (`ngram`, `nBuckets`), the training
  * totals (`|V|`, raw/target occurrence counts — what makes scoring
  * total on unseen features via [[Dsir.Model.logr0]]), and a
  * completeness marker written LAST: a torn build or a mistakenly
  * pointed prefix is a NAMED failure at load time, never a silently
  * truncated ratio table — a missing tail of ratios would shift every
  * admission verdict quietly, the worst kind of gate corruption. */
object DsirStore {

  def table(prefix: String): String = s"${prefix}_dsir"

  /** Train a [[Dsir.model]] on the corpora and persist it. Drops any
    * previous store under the prefix first (rebuild semantics). */
  def build(spark: SparkSession, prefix: String, raw: DataFrame,
            target: DataFrame, id: Column, text: Column, ngram: Int = 2,
            nBuckets: Int = Dsir.DefaultBuckets,
            maxFeatures: Long = 4L << 20): Unit =
    buildFrom(spark, prefix,
      Dsir.model(raw, target, id, text, ngram, nBuckets, maxFeatures))

  /** [[build]] + threshold calibration in ONE lifecycle: train, persist,
    * score the raw corpus against its own model, and stamp the KLL
    * q-quantile of that log-weight distribution as the admission
    * threshold ([[Dsir.calibrateThreshold]]) — so every later
    * [[load]] hands back a model that CARRIES its `minLogw` and
    * [[Dsir.gateRejects]] needs no hand-picked constant. Returns the
    * calibrated model. */
  def buildCalibrated(spark: SparkSession, prefix: String, raw: DataFrame,
                      target: DataFrame, id: Column, text: Column,
                      q: Double = 0.5, ngram: Int = 2,
                      nBuckets: Int = Dsir.DefaultBuckets,
                      maxFeatures: Long = 4L << 20): Dsir.Model = {
    val m = Dsir.model(raw, target, id, text, ngram, nBuckets, maxFeatures)
    buildFrom(spark, prefix, m)
    calibrateAndStamp(spark, prefix, Dsir.weightsWith(raw, m, id, text), q)
    m.copy(minLogw = loadMinLogw(spark, prefix))
  }

  /** Stamp a calibrated threshold onto an EXISTING complete store: the
    * KLL q-quantile of `weights.logw` (plus q and the sketch's eps, so
    * a later reader can re-certify the rank) — the composable half of
    * [[buildCalibrated]] for callers that already persisted the model
    * ([[buildFrom]]) and hold its training weights. */
  def calibrateAndStamp(spark: SparkSession, prefix: String,
                        weights: DataFrame, q: Double): Double = {
    val t = table(prefix)
    require(spark.catalog.tableExists(t) &&
        CatalogProps.propOption(spark, t, "graft.dsir.complete")
          .contains("true"),
      s"DsirStore: no complete store under $t to stamp a calibration " +
        "onto — build first")
    val (thr, eps) = Dsir.calibrateThreshold(weights, q)
    CatalogProps.setProps(spark, t, Map(
      "graft.dsir.minlogw" -> thr.toString,
      "graft.dsir.calq" -> q.toString,
      "graft.dsir.caleps" -> eps.toString))
    thr
  }

  /** The stamped calibration threshold, if the store carries one
    * (None on a missing or never-calibrated store). */
  def loadMinLogw(spark: SparkSession, prefix: String): Option[Double] =
    if (!spark.catalog.tableExists(table(prefix))) None
    else CatalogProps.propOption(spark, table(prefix), "graft.dsir.minlogw")
      .map(_.toDouble)

  /** The stamped calibration rank `q` and sketch eps (present iff
    * [[calibrateAndStamp]] ran) — what a certification pass needs to
    * re-attest |CDF(minLogw) − q| ≤ 2·eps. */
  def loadCalibration(spark: SparkSession,
                      prefix: String): Option[(Double, Double, Double)] =
    for {
      thr <- loadMinLogw(spark, prefix)
      q <- CatalogProps.propOption(spark, table(prefix), "graft.dsir.calq")
      eps <- CatalogProps.propOption(spark, table(prefix),
        "graft.dsir.caleps")
    } yield (thr, q.toDouble, eps.toDouble)

  /** Persist an ALREADY-TRAINED model under the prefix — the hand-off
    * for callers that train once and store (e.g. a production-depth
    * scale probe). */
  def buildFrom(spark: SparkSession, prefix: String,
                m: Dsir.Model): Unit = {
    // validate the NEW model BEFORE touching any existing store: a
    // failed consistency check (or a crash inside this materialization)
    // must leave a previously good, complete store loadable — the drop
    // runs only once the replacement is proven whole. model() pinned
    // the joined counts; the ratio projection is vocabulary-shaped —
    // pin it once more so count + write share one materialization.
    val ratios = m.ratios.localCheckpoint(true)
    val n = ratios.count()
    require(n == m.nFeatures,
      s"DsirStore: model declares ${m.nFeatures} features but its ratio " +
        s"table holds $n rows — inconsistent model, refusing to persist")
    Bucketing.dropManagedTable(spark, table(prefix))
    ratios.write.saveAsTable(table(prefix))
    // marker LAST: a crash before this line leaves a table without its
    // completeness stamp, which load rejects by name
    CatalogProps.setProps(spark, table(prefix), Map(
      "graft.dsir.ngram" -> m.ngram.toString,
      "graft.dsir.nbuckets" -> m.nBuckets.toString,
      "graft.dsir.v" -> m.nFeatures.toString,
      "graft.dsir.nraw" -> m.nRawOcc.toString,
      "graft.dsir.ntgt" -> m.nTgtOcc.toString,
      "graft.dsir.complete" -> "true"))
  }

  /** The stored model, fenced: fails by name on a missing table, an
    * unstamped (torn) build, or a row count disagreeing with the
    * stamped |V| — partial ratio data must never gate a corpus. The
    * returned model scores batches with the EXACT feature space it was
    * trained under (ngram/nBuckets ride the stamp, not the caller). */
  def load(spark: SparkSession, prefix: String): Dsir.Model = {
    val t = table(prefix)
    require(spark.catalog.tableExists(t),
      s"DsirStore: no table $t — build with DsirStore.build")
    require(CatalogProps.propOption(spark, t, "graft.dsir.complete")
        .contains("true"),
      s"DsirStore $t lacks its completeness stamp — torn build; " +
        "rebuild with DsirStore.build")
    val ngram = CatalogProps.prop(spark, t, "graft.dsir.ngram",
      "DsirStore").toInt
    val nBuckets = CatalogProps.prop(spark, t, "graft.dsir.nbuckets",
      "DsirStore").toInt
    val v = CatalogProps.prop(spark, t, "graft.dsir.v", "DsirStore").toLong
    val nr = CatalogProps.prop(spark, t, "graft.dsir.nraw",
      "DsirStore").toLong
    val nt = CatalogProps.prop(spark, t, "graft.dsir.ntgt",
      "DsirStore").toLong
    val actual = spark.table(t).count()
    require(actual == v,
      s"DsirStore $t: stamped $v features but holds $actual rows — " +
        "partial data; rebuild with DsirStore.build")
    Dsir.Model(spark.table(t), ngram, nBuckets, v, nr, nt,
      minLogw = loadMinLogw(spark, prefix))
  }

  def drop(spark: SparkSession, prefix: String): Unit =
    Bucketing.dropManagedTable(spark, table(prefix))
}
