package graft

import graft.operators.Similarity
import graft.sources.IndexStore
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The residual-IVFADC sidecar of a vectors store: true per-list
  * residual codes persisted with their OWN codebooks, list-pruned
  * probing, lockstep maintenance independent of the `_pq` family, and
  * named version-fence failures. */
class IvfResidualStoreSpec extends SparkSpec {

  private lazy val allVecs = Tables(spark, sfDir).embeddings
    .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))

  private def materialize(df: DataFrame): DataFrame =
    spark.createDataFrame(java.util.Arrays.asList(df.collect(): _*), df.schema)

  private def prepared(df: DataFrame): DataFrame =
    Similarity.prepared(df, col("vec_id"), col("embedding"))

  private def copiesOf(corpus: DataFrame, n: Int): DataFrame =
    corpus.filter(col("vec_id") < n)
      .select((col("vec_id") + 100000).as("vec_id"), col("vec"), col("norm"))

  test("buildIvfResidual + searchIvfResidual: twins exact; probed lists prune buckets") {
    val p = "ivfr_a"
    IndexStore.dropVecs(spark, p)
    try {
      IndexStore.buildVecs(allVecs.filter(col("vec_id") < 300),
        col("vec_id"), col("embedding"), p, nTables = 4, buckets = 8)
      IndexStore.buildIvfResidual(spark, p, kLists = 8, m = 16, ks = 16)
      val ivfr = spark.table(IndexStore.ivfrTable(p))
      assert(ivfr.count() == 300)
      // crn stored per row, strictly positive on this corpus
      assert(ivfr.filter(col("crn") <= 0.0 || col("crn").isNull).count() == 0)
      // twin queries replay the stored-centroid argmin -> nProbe=1 exact
      val corpus = prepared(allVecs.filter(col("vec_id") < 300))
      val got = IndexStore.searchIvfResidual(spark, p, copiesOf(corpus, 10),
          k = 1, nProbe = 1, rerank = 32)
        .select("query_id", "cand_id").collect()
      assert(got.length == 10)
      got.foreach(r => assert(r.getLong(1) == r.getLong(0) - 100000,
        s"query ${r.getLong(0)} found ${r.getLong(1)}"))
      // the literal IN of probed lists must prune buckets on the scan
      val formatted = IndexStore.searchIvfResidual(spark, p,
          copiesOf(corpus, 2), k = 1, nProbe = 1, rerank = 4)
        .queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
      val sel = "SelectedBucketsCount: (\\d+) out of (\\d+)".r
        .findAllMatchIn(formatted)
        .map(m => (m.group(1).toInt, m.group(2).toInt)).toList
      assert(sel.nonEmpty && sel.exists { case (s, t) => s < t },
        s"no bucket pruning on the _ivfr scan: $sel")
    } finally IndexStore.dropVecs(spark, p)
  }

  test("residual family is self-contained: works without _pq, survives its drop") {
    val p = "ivfr_b"
    IndexStore.dropVecs(spark, p)
    try {
      IndexStore.buildVecs(allVecs.filter(col("vec_id") < 150),
        col("vec_id"), col("embedding"), p, nTables = 4, buckets = 4)
      // no buildPq at all — the residual family must provision and probe
      IndexStore.buildIvfResidual(spark, p, kLists = 4, m = 16, ks = 16)
      val corpus = prepared(allVecs.filter(col("vec_id") < 150))
      val got = IndexStore.searchIvfResidual(spark, p, copiesOf(corpus, 5),
          k = 1, nProbe = 1, rerank = 32)
        .select("query_id", "cand_id").collect()
      assert(got.length == 5)
      got.foreach(r => assert(r.getLong(1) == r.getLong(0) - 100000))
      // an append also works with no _pq/_ivfpq present
      IndexStore.appendVecs(
        materialize(allVecs.filter(col("vec_id").between(150, 159))),
        col("vec_id"), col("embedding"), p)
      assert(spark.table(IndexStore.ivfrTable(p)).count() == 160)
    } finally IndexStore.dropVecs(spark, p)
  }

  test("appends encode residuals with the STORED model and stay searchable") {
    val p = "ivfr_c"
    IndexStore.dropVecs(spark, p)
    try {
      IndexStore.buildVecs(allVecs.filter(col("vec_id") < 200),
        col("vec_id"), col("embedding"), p, nTables = 4, buckets = 4)
      IndexStore.buildIvfResidual(spark, p, kLists = 8, m = 16, ks = 16)
      val centsBefore = spark.table(IndexStore.ivfrCentTable(p))
        .orderBy(col("centroid_id")).collect().map(_.getDouble(2)).toSeq
      IndexStore.appendVecs(
        materialize(allVecs.filter(col("vec_id").between(200, 249))),
        col("vec_id"), col("embedding"), p)
      assert(spark.table(IndexStore.ivfrTable(p)).count() == 250,
        "appended batch must land in _ivfr")
      val centsAfter = spark.table(IndexStore.ivfrCentTable(p))
        .orderBy(col("centroid_id")).collect().map(_.getDouble(2)).toSeq
      assert(centsAfter == centsBefore, "append must not retrain centroids")
      // appended rows' codes equal a fresh encode under the stored pieces
      // (bit-equality of the lockstep — the replay-safety invariant)
      val (model, centroids) = IndexStore.loadIvfResidual(spark, p)
      val cents = centroids.orderBy(col("centroid_id"))
        .collect().map(_.getSeq[Double](1).toSeq).toSeq
      val batchPrep = prepared(allVecs.filter(col("vec_id").between(200, 249)))
      val assigned = batchPrep
        .select(col("*"), posexplode_outer(array(
            graft.functions.VectorExpressions.nearestCentroid(col("vec"), cents)))
          .as(Seq("__p", "centroid_id")))
        .drop("__p")
      val fresh = graft.operators.PqCodec.encodeResidual(assigned, centroids, model)
        .select(col("vec_id"), col("centroid_id"), hex(col("code")))
        .collect().map(_.toString).toSet
      val stored = spark.table(IndexStore.ivfrTable(p))
        .filter(col("vec_id").between(200, 249))
        .select(col("vec_id"), col("centroid_id"), hex(col("code")))
        .collect().map(_.toString).toSet
      assert(stored == fresh, "appended codes must equal a fresh stored-model encode")
      // an appended vector's twin finds it through the store
      val corpus = prepared(allVecs.filter(col("vec_id") < 250))
      val q = corpus.filter(col("vec_id").between(200, 204))
        .select((col("vec_id") + 100000).as("vec_id"), col("vec"), col("norm"))
      val got = IndexStore.searchIvfResidual(spark, p, q,
          k = 1, nProbe = 1, rerank = 32)
        .select("query_id", "cand_id").collect()
      assert(got.length == 5)
      got.foreach(r => assert(r.getLong(1) == r.getLong(0) - 100000))
    } finally IndexStore.dropVecs(spark, p)
  }

  test("remove + compact keep the residual layout consistent") {
    val p = "ivfr_d"
    IndexStore.dropVecs(spark, p)
    try {
      IndexStore.buildVecs(allVecs.filter(col("vec_id") < 200),
        col("vec_id"), col("embedding"), p, nTables = 4, buckets = 4)
      IndexStore.buildIvfResidual(spark, p, kLists = 8, m = 16, ks = 16)
      import spark.implicits._
      IndexStore.removeVecs(spark, p, Seq(3L, 7L).toDF("vec_id"))
      assert(spark.table(IndexStore.ivfrTable(p)).count() == 198)
      IndexStore.compactVecs(spark, p)
      assert(spark.table(IndexStore.ivfrTable(p)).count() == 198)
      val corpus = prepared(allVecs.filter(col("vec_id") < 200))
      val got = IndexStore.searchIvfResidual(spark, p,
          copiesOf(corpus, 10), k = 1, nProbe = 1, rerank = 32)
        .select("query_id", "cand_id").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(!got.values.exists(Set(3L, 7L)), "removed ids must never surface")
      Seq(0L, 1L, 2L, 4L, 5L).foreach(i =>
        assert(got(i + 100000) == i, s"surviving twin $i must still be found"))
    } finally IndexStore.dropVecs(spark, p)
  }

  test("version fences: torn build and a stale-fence append are NAMED failures") {
    val p = "ivfr_e"
    IndexStore.dropVecs(spark, p)
    try {
      IndexStore.buildVecs(allVecs.filter(col("vec_id") < 150),
        col("vec_id"), col("embedding"), p, nTables = 4, buckets = 4)
      IndexStore.buildIvfResidual(spark, p, kLists = 4, m = 16, ks = 16)
      val corpus = prepared(allVecs.filter(col("vec_id") < 150))
      IndexStore.searchIvfResidual(spark, p, copiesOf(corpus, 2), k = 1).collect()
      // crash window: one table's stamp diverges → probe AND append fail
      // by name, append before any table takes the batch
      spark.sql(s"ALTER TABLE ${IndexStore.ivfrCentTable(p)} " +
        "SET TBLPROPERTIES ('graft.ivfr.version'='torn')")
      val e1 = intercept[IllegalArgumentException] {
        IndexStore.searchIvfResidual(spark, p, copiesOf(corpus, 2), k = 1)
      }
      assert(e1.getMessage.contains("buildIvfResidual"), e1.getMessage)
      val before = Seq(IndexStore.vecsTable(p), IndexStore.lshTable(p),
        IndexStore.ivfrTable(p))
        .map(t => t -> spark.table(t).count()).toMap
      intercept[IllegalArgumentException] {
        IndexStore.appendVecs(
          materialize(allVecs.filter(col("vec_id").between(150, 159))),
          col("vec_id"), col("embedding"), p)
      }
      before.foreach { case (t, n) =>
        assert(spark.table(t).count() == n,
          s"$t took a half-applied append: ${spark.table(t).count()} != $n")
      }
      // a half-dropped family is ALSO a named failure, and blocks the
      // append whole (before any table writes)
      spark.sql(s"DROP TABLE ${IndexStore.ivfrModelTable(p)}")
      val e2 = intercept[IllegalArgumentException] {
        IndexStore.searchIvfResidual(spark, p, copiesOf(corpus, 2), k = 1)
      }
      assert(e2.getMessage.contains("half-dropped"), e2.getMessage)
      intercept[IllegalArgumentException] {
        IndexStore.appendVecs(
          materialize(allVecs.filter(col("vec_id").between(150, 159))),
          col("vec_id"), col("embedding"), p)
      }
      assert(spark.table(IndexStore.vecsTable(p)).count() == 150,
        "_vecs took a half-applied append under a half-dropped sidecar")
      // re-provisioning heals probe and append
      IndexStore.buildIvfResidual(spark, p, kLists = 4, m = 16, ks = 16)
      IndexStore.appendVecs(
        materialize(allVecs.filter(col("vec_id").between(150, 159))),
        col("vec_id"), col("embedding"), p)
      assert(spark.table(IndexStore.ivfrTable(p)).count() == 160)
      IndexStore.searchIvfResidual(spark, p, copiesOf(corpus, 2), k = 1).collect()
    } finally IndexStore.dropVecs(spark, p)
  }
}
