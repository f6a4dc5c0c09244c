package graft

import graft.operators.Similarity
import graft.sources.IndexStore
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The IVF-PQ sidecar of a vectors store: list-pruned probing over the
  * persisted codes, lockstep maintenance, and the version fences that
  * make every stale/crashed state a NAMED failure instead of a silent
  * wrong answer. */
class IvfPqStoreSpec extends SparkSpec {

  private lazy val allVecs = Tables(spark, sfDir).embeddings
    .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))

  private def materialize(df: DataFrame): DataFrame =
    spark.createDataFrame(java.util.Arrays.asList(df.collect(): _*), df.schema)

  private def prepared(df: DataFrame): DataFrame =
    Similarity.prepared(df, col("vec_id"), col("embedding"))

  private def copiesOf(corpus: DataFrame, n: Int): DataFrame =
    corpus.filter(col("vec_id") < n)
      .select((col("vec_id") + 100000).as("vec_id"), col("vec"), col("norm"))

  test("buildIvf + searchIvfPq: planted twins found at rank 1 through the probed list") {
    val p = "ivfpqs_a"
    IndexStore.dropVecs(spark, p)
    try {
      IndexStore.buildVecs(allVecs.filter(col("vec_id") < 300),
        col("vec_id"), col("embedding"), p, nTables = 4, buckets = 4)
      IndexStore.buildPq(spark, p, m = 16, ks = 16)
      IndexStore.buildIvf(spark, p, kLists = 8)
      assert(spark.table(IndexStore.ivfPqTable(p)).count() == 300)
      // a twin-copy query replays the same argmin over the same stored
      // centroids as its twin's assignment, so nProbe=1 is exact
      val corpus = prepared(allVecs.filter(col("vec_id") < 300))
      val got = IndexStore.searchIvfPq(spark, p, copiesOf(corpus, 10),
          k = 1, nProbe = 1, rerank = 32)
        .select("query_id", "cand_id").collect()
      assert(got.length == 10)
      got.foreach(r => assert(r.getLong(1) == r.getLong(0) - 100000,
        s"query ${r.getLong(0)} found ${r.getLong(1)}"))
    } finally IndexStore.dropVecs(spark, p)
  }

  test("the probed-list filter prunes buckets on the _ivfpq scan") {
    val p = "ivfpqs_b"
    IndexStore.dropVecs(spark, p)
    try {
      IndexStore.buildVecs(allVecs.filter(col("vec_id") < 300),
        col("vec_id"), col("embedding"), p, nTables = 4, buckets = 8)
      IndexStore.buildPq(spark, p, m = 16, ks = 16)
      IndexStore.buildIvf(spark, p, kLists = 8)
      val corpus = prepared(allVecs.filter(col("vec_id") < 300))
      val df = IndexStore.searchIvfPq(spark, p, copiesOf(corpus, 2),
        k = 1, nProbe = 1, rerank = 4)
      val formatted = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      // the scan section of the bucketed _ivfpq table must report
      // SelectedBucketsCount < total — the literal IN of probed lists
      // reached the reader, so the probe reads a fraction of the codes
      val sel = "SelectedBucketsCount: (\\d+) out of (\\d+)".r
        .findAllMatchIn(formatted)
        .map(m => (m.group(1).toInt, m.group(2).toInt)).toList
      assert(sel.nonEmpty, s"expected a bucketed scan in:\n$formatted")
      assert(sel.exists { case (s, t) => s < t },
        s"no scan was bucket-pruned: $sel\n$formatted")
    } finally IndexStore.dropVecs(spark, p)
  }

  test("append into _ivfpq-without-_pq fails whole, before any table writes") {
    // a dropped/half-removed PQ sidecar must not let an append land in
    // _vecs while the IVF-PQ sidecar silently goes stale
    val p = "ivfpqs_orphan"
    IndexStore.dropVecs(spark, p)
    try {
      IndexStore.buildVecs(allVecs.filter(col("vec_id") < 100),
        col("vec_id"), col("embedding"), p, nTables = 4, buckets = 4)
      IndexStore.buildPq(spark, p, m = 16, ks = 16)
      IndexStore.buildIvf(spark, p, kLists = 4)
      spark.sql(s"DROP TABLE ${IndexStore.pqTable(p)}")
      val before = spark.table(IndexStore.vecsTable(p)).count()
      val batch = allVecs.filter(col("vec_id") >= 100 && col("vec_id") < 110)
      val e = intercept[IllegalArgumentException] {
        IndexStore.appendVecs(batch, col("vec_id"), col("embedding"), p)
      }
      assert(e.getMessage.contains("sidecar"), e.getMessage)
      assert(spark.table(IndexStore.vecsTable(p)).count() == before,
        "append partially applied despite the orphaned-sidecar failure")
    } finally IndexStore.dropVecs(spark, p)
  }

  test("appends assign with the STORED centroids and stay searchable") {
    val p = "ivfpqs_c"
    IndexStore.dropVecs(spark, p)
    try {
      IndexStore.buildVecs(allVecs.filter(col("vec_id") < 200),
        col("vec_id"), col("embedding"), p, nTables = 4, buckets = 4)
      IndexStore.buildPq(spark, p, m = 16, ks = 16)
      IndexStore.buildIvf(spark, p, kLists = 8)
      val centsBefore = spark.table(IndexStore.ivfCentTable(p))
        .orderBy(col("centroid_id")).collect().map(_.getDouble(2)).toSeq
      IndexStore.appendVecs(
        materialize(allVecs.filter(col("vec_id").between(200, 249))),
        col("vec_id"), col("embedding"), p)
      val ivfpq = spark.table(IndexStore.ivfPqTable(p))
      assert(ivfpq.count() == 250, "appended batch must land in _ivfpq")
      // the quantizer must NOT have silently re-clustered
      val centsAfter = spark.table(IndexStore.ivfCentTable(p))
        .orderBy(col("centroid_id")).collect().map(_.getDouble(2)).toSeq
      assert(centsAfter == centsBefore, "append must not retrain centroids")
      // an appended vector's twin query finds it: row and probe agree on
      // the same stored quantizer
      val corpus = prepared(allVecs.filter(col("vec_id") < 250))
      val q = corpus.filter(col("vec_id").between(200, 204))
        .select((col("vec_id") + 100000).as("vec_id"), col("vec"), col("norm"))
      val got = IndexStore.searchIvfPq(spark, p, q, k = 1, nProbe = 1, rerank = 32)
        .select("query_id", "cand_id").collect()
      assert(got.length == 5)
      got.foreach(r => assert(r.getLong(1) == r.getLong(0) - 100000))
    } finally IndexStore.dropVecs(spark, p)
  }

  test("remove forgets vectors from the list layout; compact preserves search") {
    val p = "ivfpqs_d"
    IndexStore.dropVecs(spark, p)
    try {
      IndexStore.buildVecs(allVecs.filter(col("vec_id") < 200),
        col("vec_id"), col("embedding"), p, nTables = 4, buckets = 4)
      IndexStore.buildPq(spark, p, m = 16, ks = 16)
      IndexStore.buildIvf(spark, p, kLists = 8)
      import spark.implicits._
      IndexStore.removeVecs(spark, p, Seq(3L, 7L).toDF("vec_id"))
      assert(spark.table(IndexStore.ivfPqTable(p)).count() == 198)
      assert(spark.table(IndexStore.ivfPqTable(p))
        .filter(col("vec_id").isin(3L, 7L)).count() == 0)
      IndexStore.compactVecs(spark, p)
      assert(spark.table(IndexStore.ivfPqTable(p)).count() == 198)
      // a removed vector's twin query now finds someone ELSE (never the
      // removed id); a surviving vector's twin still finds it
      val corpus = prepared(allVecs.filter(col("vec_id") < 200))
      val got = IndexStore.searchIvfPq(spark, p,
          copiesOf(corpus, 10), k = 1, nProbe = 1, rerank = 32)
        .select("query_id", "cand_id").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(!got.values.exists(Set(3L, 7L)), "removed ids must never surface")
      Seq(0L, 1L, 2L, 4L, 5L).foreach(i =>
        assert(got(i + 100000) == i, s"surviving twin $i must still be found"))
    } finally IndexStore.dropVecs(spark, p)
  }

  test("a stale sidecar fails an append BEFORE any table takes the batch") {
    // rebuildPq without buildIvf leaves the IVF sidecar stale by design;
    // the next append must fail WHOLE — a fence error after _vecs/_lsh/
    // _pq already appended would make the natural retry double-insert
    val p = "ivfpqs_f"
    IndexStore.dropVecs(spark, p)
    try {
      IndexStore.buildVecs(allVecs.filter(col("vec_id") < 100),
        col("vec_id"), col("embedding"), p, nTables = 4, buckets = 4)
      IndexStore.buildPq(spark, p, m = 16, ks = 16)
      IndexStore.buildIvf(spark, p, kLists = 4)
      // a geometry change guarantees a NEW model version (the content-
      // derived fence rightly treats an identical rebuild as non-stale)
      IndexStore.rebuildPq(spark, p, m = 8, ks = 16) // sidecar now stale
      val before = Seq(IndexStore.vecsTable(p), IndexStore.lshTable(p),
        IndexStore.pqTable(p), IndexStore.ivfPqTable(p))
        .map(t => t -> spark.table(t).count()).toMap
      intercept[IllegalArgumentException] {
        IndexStore.appendVecs(
          materialize(allVecs.filter(col("vec_id").between(100, 109))),
          col("vec_id"), col("embedding"), p)
      }
      before.foreach { case (t, n) =>
        assert(spark.table(t).count() == n,
          s"$t took a half-applied append: ${spark.table(t).count()} != $n")
      }
      // healing the sidecar lets the same append through, once
      IndexStore.buildIvf(spark, p, kLists = 4)
      IndexStore.appendVecs(
        materialize(allVecs.filter(col("vec_id").between(100, 109))),
        col("vec_id"), col("embedding"), p)
      assert(spark.table(IndexStore.vecsTable(p)).count() == 110)
      assert(spark.table(IndexStore.ivfPqTable(p)).count() == 110)
    } finally IndexStore.dropVecs(spark, p)
  }

  test("version fences: crash window and a rebuilt PQ model are NAMED failures") {
    val p = "ivfpqs_e"
    IndexStore.dropVecs(spark, p)
    try {
      IndexStore.buildVecs(allVecs.filter(col("vec_id") < 150),
        col("vec_id"), col("embedding"), p, nTables = 4, buckets = 4)
      IndexStore.buildPq(spark, p, m = 16, ks = 16)
      IndexStore.buildIvf(spark, p, kLists = 4)
      val corpus = prepared(allVecs.filter(col("vec_id") < 150))
      // healthy
      IndexStore.searchIvfPq(spark, p, copiesOf(corpus, 2), k = 1).collect()
      // a rebuildPq since the sidecar was built → dead codebooks, named
      IndexStore.rebuildPq(spark, p, m = 8, ks = 16)
      val e1 = intercept[IllegalArgumentException] {
        IndexStore.searchIvfPq(spark, p, copiesOf(corpus, 2), k = 1)
      }
      assert(e1.getMessage.contains("buildIvf"), e1.getMessage)
      // re-provision heals it
      IndexStore.buildIvf(spark, p, kLists = 4)
      IndexStore.searchIvfPq(spark, p, copiesOf(corpus, 2), k = 1).collect()
      // crash window: centroid/codes versions diverge → named
      spark.sql(s"ALTER TABLE ${IndexStore.ivfCentTable(p)} " +
        "SET TBLPROPERTIES ('graft.ivf.version'='torn')")
      val e2 = intercept[IllegalArgumentException] {
        IndexStore.searchIvfPq(spark, p, copiesOf(corpus, 2), k = 1)
      }
      assert(e2.getMessage.contains("crashed between"), e2.getMessage)
    } finally IndexStore.dropVecs(spark, p)
  }
}
