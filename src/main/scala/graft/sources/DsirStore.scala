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

  /** Persist an ALREADY-TRAINED model under the prefix — the hand-off
    * for callers that train once and store (e.g. a production-depth
    * scale probe). */
  def buildFrom(spark: SparkSession, prefix: String,
                m: Dsir.Model): Unit = {
    Bucketing.dropManagedTable(spark, table(prefix))
    // model() pinned the joined counts; the ratio projection is
    // vocabulary-shaped — pin it once more so count + write share one
    // materialization
    val ratios = m.ratios.localCheckpoint(true)
    val n = ratios.count()
    require(n == m.nFeatures,
      s"DsirStore: model declares ${m.nFeatures} features but its ratio " +
        s"table holds $n rows — inconsistent model, refusing to persist")
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
    Dsir.Model(spark.table(t), ngram, nBuckets, v, nr, nt)
  }

  def drop(spark: SparkSession, prefix: String): Unit =
    Bucketing.dropManagedTable(spark, table(prefix))
}
