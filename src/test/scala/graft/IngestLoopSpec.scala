package graft

import graft.operators.Dedup
import graft.sources.{Bucketing, IndexStore}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The closed admission loop over a persisted [[IndexStore]]: build once,
  * admit a batch, append the admitted rows back, and the NEXT batch is
  * rejected against everything admitted before it — with the appended
  * store provably identical to one rebuilt from scratch, and the
  * per-batch joins still exchange-free on the store side. */
class IngestLoopSpec extends SparkSpec {
  import spark.implicits._

  private lazy val allDocs = Tables(spark, sfDir).documents
    .select(col("doc_id"), col("text"))
  private lazy val corpusDocs = allDocs.filter(col("doc_id") < 200)

  private def textOf(df: DataFrame, id: Long): String =
    df.filter(col("doc_id") === id).select("text").as[String].head()

  private def multisetEqual(a: DataFrame, b: DataFrame, what: String): Unit = {
    val bb = b.select(a.columns.map(col): _*)
    assert(a.exceptAll(bb).isEmpty && bb.exceptAll(a).isEmpty,
      s"$what differs between appended and rebuilt store")
  }

  /** Materialize an admission output before appending it — the append
    * writes the very tables the admitted plan reads. Mirrors the main's
    * write-to-parquet-then-reread, driver-side. */
  private def materialize(df: DataFrame): DataFrame =
    spark.createDataFrame(java.util.Arrays.asList(df.collect(): _*), df.schema)

  private def dropDocStore(prefix: String): Unit =
    IndexStore.dropDocs(spark, prefix)

  private def dropVecStore(prefix: String): Unit =
    IndexStore.dropVecs(spark, prefix)

  test("documents loop: cross-batch dedup via append; appended == rebuilt") {
    val p = "il_docs"
    dropDocStore(p); dropDocStore(p + "_rb")
    try {
      IndexStore.buildDocs(corpusDocs, col("doc_id"), col("text"), p,
        IndexStore.DocConfig(buckets = 4))
      // bloomN round-trips RESOLVED (0 = auto-provision at build: 4x the
      // corpus, floor 1M), so every later append merges a same-sized filter
      assert(IndexStore.docConfig(spark, p) ==
        IndexStore.DocConfig(buckets = 4, bloomN = 1000000L),
        "config must round-trip the catalog with bloomN resolved")

      // batch 1: natural fresh docs + planted outcomes of every kind
      val freshPair = "graft ingest loop alpha beta gamma delta epsilon " +
        "zeta eta theta iota kappa spec document"
      val c5 = textOf(corpusDocs, 5)
      val c7 = textOf(corpusDocs, 7)
      val c13tok = textOf(corpusDocs, 13).split(" ")
      val spanMix = (c13tok.take(30) ++ Seq("wholly", "novel", "suffix",
        "tokens", "appended", "for", "the", "span", "overlap", "plant",
        "one", "two", "three", "four", "five")).mkString(" ")
      val batch1 = allDocs.filter(col("doc_id").between(200, 249))
        .unionByName(Seq(
          (9200L, c5),                       // exact dup of corpus
          (9201L, c7 + " extra tail token"), // near dup of corpus
          (9202L, freshPair),                // within-batch twins:
          (9203L, freshPair),                //   larger id rejected
          (9204L, spanMix)                   // span overlap, not a near-dup
        ).toDF("doc_id", "text"))
      val (adm1, rej1) = IngestApp.admitDocs(spark, p, batch1)
      val reasons1 = rej1.as[(Long, String)].collect().groupBy(_._1)
        .map { case (id, rs) => id -> rs.map(_._2).toSet }
      assert(reasons1(9200L) == Set("exact_dup_of_corpus"))
      assert(reasons1(9201L).contains("near_dup_of_corpus"))
      assert(reasons1(9203L) == Set("near_dup_within_batch"))
      assert(reasons1(9204L).contains("span_overlap_with_corpus") &&
        !reasons1(9204L).contains("near_dup_of_corpus"),
        s"span plant should fail on window overlap alone, got ${reasons1(9204L)}")
      val adm1Ids = adm1.select("doc_id").as[Long].collect().toSet
      assert(adm1Ids.contains(9202L), "first of the within-batch twins survives")
      // admitted and rejected partition the batch
      assert(adm1Ids ++ reasons1.keySet ==
        batch1.select("doc_id").as[Long].collect().toSet)
      assert(adm1Ids.intersect(reasons1.keySet).isEmpty)

      val adm1M = materialize(adm1)
      IndexStore.appendDocs(adm1M, col("doc_id"), col("text"), p)

      // batch 2: duplicates of batch-1 ADMISSIONS must now be rejected —
      // the whole point of the append
      val t205 = textOf(allDocs, 205)
      val t210 = textOf(allDocs, 210)
      val batch2 = allDocs.filter(col("doc_id").between(250, 269))
        .unionByName(Seq(
          (9300L, t205),                      // exact dup of a b1 admission
          (9301L, t210 + " trailing drift"),  // near dup of a b1 admission
          (9302L, freshPair)                  // exact dup of the SURVIVING twin
        ).toDF("doc_id", "text"))
      val (adm2, rej2) = IngestApp.admitDocs(spark, p, batch2)
      val reasons2 = rej2.as[(Long, String)].collect().groupBy(_._1)
        .map { case (id, rs) => id -> rs.map(_._2).toSet }
      assert(reasons2(9300L) == Set("exact_dup_of_corpus"))
      assert(reasons2(9301L).contains("near_dup_of_corpus"))
      assert(reasons2(9302L) == Set("exact_dup_of_corpus"))
      val adm2M = materialize(adm2)
      IndexStore.appendDocs(adm2M, col("doc_id"), col("text"), p)

      // appended store == store rebuilt from (corpus + both admissions)
      val full = corpusDocs
        .unionByName(adm1M.select(col("doc_id"), col("text")))
        .unionByName(adm2M.select(col("doc_id"), col("text")))
      IndexStore.buildDocs(full, col("doc_id"), col("text"), p + "_rb",
        IndexStore.DocConfig(buckets = 4))
      multisetEqual(spark.table(IndexStore.docsTable(p)),
        spark.table(IndexStore.docsTable(p + "_rb")), "docs table")
      multisetEqual(spark.table(IndexStore.fpTable(p)),
        spark.table(IndexStore.fpTable(p + "_rb")), "fingerprint index")
      multisetEqual(spark.table(IndexStore.mhTable(p)),
        spark.table(IndexStore.mhTable(p + "_rb")), "minhash index")
      // the span table is an unmerged count-delta log: equality holds on
      // the aggregate, not the rows
      multisetEqual(
        spark.table(IndexStore.spanTable(p))
          .groupBy("wh").agg(sum("n").as("n")),
        spark.table(IndexStore.spanTable(p + "_rb"))
          .groupBy("wh").agg(sum("n").as("n")), "span index (aggregated)")
    } finally { dropDocStore(p); dropDocStore(p + "_rb") }
  }

  test("span stats tolerate the append-log form: duplicate wh rows don't double-count") {
    val corpus = corpusDocs.limit(50)
    val batch = allDocs.filter(col("doc_id").between(50, 59))
      .unionByName(Seq((9400L, textOf(corpusDocs, 3))).toDF("doc_id", "text"))
    val idx = Dedup.spanIndex(corpus, col("doc_id"), col("text"), k = 6)
    // a compaction + two deltas re-listing the same hashes
    val logForm = idx.unionByName(idx).unionByName(idx)
    val single = Dedup.spanIncrementalStats(idx, batch,
        col("doc_id"), col("text"), k = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val logged = Dedup.spanIncrementalStats(logForm, batch,
        col("doc_id"), col("text"), k = 6)
    assert(logged.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      == single)
    val fracs = logged.select("overlap_frac").as[Double].collect()
    assert(fracs.forall(_ <= 1.0), s"overlap_frac must stay <= 1, got ${fracs.max}")
    assert(logged.filter(col("doc_id") === 9400L)
      .select("overlap_frac").as[Double].head() == 1.0)
  }

  test("vectors loop: cross-batch twin rejected via append; appended lsh == rebuilt") {
    val p = "il_vecs"
    dropVecStore(p); dropVecStore(p + "_rb")
    val allVecs = Tables(spark, sfDir).embeddings
      .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
    def twinOf(src: DataFrame, id: Long, newId: Long): DataFrame =
      src.filter(col("vec_id") === id)
        .select(lit(newId).as("vec_id"),
          zip_with(col("embedding"), reverse(col("embedding")),
            (x, y) => x + y * lit(0.01)).as("embedding"))
    try {
      val corpus = allVecs.filter(col("vec_id") < 200)
      IndexStore.buildVecs(corpus, col("vec_id"), col("embedding"), p,
        nTables = 4, buckets = 4)
      val cfg = IndexStore.vecConfig(spark, p)
      assert(cfg.nPlanes == 9 && cfg.nTables == 4,
        s"auto-provisioning should record log2(200)+1 = 9 planes, got $cfg")

      val batch1 = allVecs.filter(col("vec_id").between(200, 249))
        .unionByName(twinOf(allVecs, 3L, 9100L))
      val (adm1, rej1) = IngestApp.admitVecs(spark, p, batch1)
      assert(rej1.as[(Long, String)].collect().toSet ==
        Set((9100L, "near_dup_of_corpus")))
      val adm1M = materialize(adm1)
      IndexStore.appendVecs(adm1M, col("vec_id"), col("embedding"), p)

      val batch2 = allVecs.filter(col("vec_id").between(250, 259))
        .unionByName(twinOf(allVecs, 205L, 9101L))
      val (adm2, rej2) = IngestApp.admitVecs(spark, p, batch2)
      assert(rej2.as[(Long, String)].collect().toSet ==
        Set((9101L, "near_dup_of_corpus")),
        "a twin of a batch-1 ADMISSION must be rejected after the append")
      val adm2M = materialize(adm2)
      IndexStore.appendVecs(adm2M, col("vec_id"), col("embedding"), p)

      val full = corpus
        .unionByName(adm1M.select(col("vec_id"), col("embedding")))
        .unionByName(adm2M.select(col("vec_id"), col("embedding")))
      // rebuild pinned to the RECORDED planes: auto would re-provision for
      // the grown corpus and produce a different (equally valid) layout
      IndexStore.buildVecs(full, col("vec_id"), col("embedding"), p + "_rb",
        nPlanes = cfg.nPlanes, nTables = cfg.nTables, buckets = 4)
      multisetEqual(spark.table(IndexStore.vecsTable(p)),
        spark.table(IndexStore.vecsTable(p + "_rb")), "vectors table")
      multisetEqual(spark.table(IndexStore.lshTable(p)),
        spark.table(IndexStore.lshTable(p + "_rb")), "lsh index")
    } finally { dropVecStore(p); dropVecStore(p + "_rb") }
  }

  test("plan guard: admission joins stay exchange-free on APPENDED store tables") {
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    val p = "il_guard"
    dropDocStore(p)
    IndexStore.buildDocs(corpusDocs, col("doc_id"), col("text"), p,
      IndexStore.DocConfig(buckets = 4))
    val delta = allDocs.filter(col("doc_id").between(200, 229))
    IndexStore.appendDocs(materialize(delta), col("doc_id"), col("text"), p)
    val batch = allDocs.filter(col("doc_id").between(230, 249))
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      def bucketedScans(sp: SparkPlan) =
        sp.collect { case f: FileSourceScanExec if f.bucketedScan => f }
      // minhash: the appended (multi-file-per-bucket) index still scans
      // bucketed, and nothing above it shuffles more than candidate ids
      val mh = Dedup.minhashIncrementalPairs(spark.table(IndexStore.mhTable(p)),
        spark.table(IndexStore.docsTable(p)), batch, col("doc_id"), col("text"))
      val mhRoot = mh.queryExecution.executedPlan
      assert(bucketedScans(mhRoot).nonEmpty, s"appended mh index must scan bucketed:\n$mhRoot")
      mhRoot.collect {
        case e: ShuffleExchangeLike if bucketedScans(e.asInstanceOf[SparkPlan]).nonEmpty => e
      }.foreach { e =>
        val names = e.asInstanceOf[SparkPlan].output.map(_.name)
        assert(names.toSet.subsetOf(Set("old_id", "new_id")),
          s"exchange above appended index scan carries $names:\n$mhRoot")
      }
      // span: the presence-distinct over the appended log rides the
      // table's wh-bucketing — no exchange may repartition index rows by
      // wh (the per-doc rollup exchange downstream of the join is the
      // operator's own id-keyed aggregation and carries fixed-width rows)
      val sp = Dedup.spanIncrementalStats(spark.table(IndexStore.spanTable(p)),
        batch, col("doc_id"), col("text"))
      val spRoot = sp.queryExecution.executedPlan
      assert(bucketedScans(spRoot).nonEmpty, s"appended span index must scan bucketed:\n$spRoot")
      spRoot.collect {
        case e: ShuffleExchangeLike if bucketedScans(e.asInstanceOf[SparkPlan]).nonEmpty => e
      }.foreach { e =>
        val out = e.asInstanceOf[SparkPlan].output
        assert(!out.exists(_.name == "wh") &&
          !out.exists(_.dataType == org.apache.spark.sql.types.StringType),
          s"index rows re-shuffled above the appended span index scan:\n$spRoot")
      }
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      dropDocStore(p)
    }
  }

  test("appendBucketed rejects a mismatched bucket spec instead of corrupting") {
    val t = "il_bucket_mismatch"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    try {
      Bucketing.writeBucketed(corpusDocs, t, Seq("doc_id"), buckets = 4)
      val e = intercept[Exception] {
        Bucketing.appendBucketed(allDocs.filter(col("doc_id") === 300), t,
          Seq("doc_id"), buckets = 8)
      }
      assert(e.getMessage.toLowerCase.contains("bucket"),
        s"expected a bucket-spec error, got: ${e.getMessage}")
    } finally spark.sql(s"DROP TABLE IF EXISTS $t")
  }
}
