package graft

import graft.sources.IndexStore
import graft.streaming.StreamingIngest
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The maintenance and continuous halves of the ingest loop: bucketed
  * compaction (appended file sets folded back to one sorted file per
  * bucket, store provably unchanged) and the structured-streaming form
  * of admit-and-append (checkpointed micro-batches, crash-replay
  * idempotent through the admission check itself). */
class IngestMaintenanceSpec extends SparkSpec {
  import spark.implicits._

  private lazy val allDocs = Tables(spark, sfDir).documents
    .select(col("doc_id"), col("text"))
  private lazy val corpusDocs = allDocs.filter(col("doc_id") < 200)

  private def textOf(id: Long): String =
    allDocs.filter(col("doc_id") === id).select("text").as[String].head()

  private def multisetEqual(a: DataFrame, b: DataFrame, what: String): Unit = {
    val bb = b.select(a.columns.map(col): _*)
    assert(a.exceptAll(bb).isEmpty && bb.exceptAll(a).isEmpty,
      s"$what changed across compaction/stream")
  }

  private def materialize(df: DataFrame): DataFrame =
    spark.createDataFrame(java.util.Arrays.asList(df.collect(): _*), df.schema)

  private def dataFileCount(table: String): Int = {
    val wh = new java.net.URI(
      spark.conf.get("spark.sql.warehouse.dir")).getPath
    val dir = new java.io.File(wh, table.toLowerCase)
    dir.listFiles().count(_.getName.endsWith(".parquet"))
  }

  test("docs compaction: one file per bucket, identical store, admission intact") {
    val p = "mt_docs"
    IndexStore.dropDocs(spark, p)
    try {
      IndexStore.buildDocs(corpusDocs, col("doc_id"), col("text"), p,
        IndexStore.DocConfig(buckets = 4))
      // two appends -> three file sets per bucket across every table
      IndexStore.appendDocs(
        materialize(allDocs.filter(col("doc_id").between(200, 229))),
        col("doc_id"), col("text"), p)
      IndexStore.appendDocs(
        materialize(allDocs.filter(col("doc_id").between(230, 259))),
        col("doc_id"), col("text"), p)
      val tables = Seq(IndexStore.docsTable(p), IndexStore.fpTable(p),
        IndexStore.mhTable(p), IndexStore.spanTable(p))
      val before = tables.map(t => t -> dataFileCount(t)).toMap
      assert(before.values.forall(_ > 4),
        s"appends should leave multiple files per bucket, got $before")
      val docsBefore = spark.table(tables(0)).collect()
      val fpBefore = spark.table(tables(1)).collect()
      val mhBefore = spark.table(tables(2)).collect()
      // the span log compacts MERGED: compare against the aggregate
      val spanBefore = spark.table(tables(3))
        .groupBy("wh").agg(sum("n").as("n")).collect()
      val cfgBefore = IndexStore.docConfig(spark, p)

      IndexStore.compactDocs(spark, p)

      tables.foreach { t =>
        assert(dataFileCount(t) == 4,
          s"$t should compact to one file per bucket, got ${dataFileCount(t)}")
      }
      Seq((tables(0), docsBefore), (tables(1), fpBefore), (tables(2), mhBefore),
        (tables(3), spanBefore)).foreach { case (t, rows) =>
        val now = spark.table(t)
        multisetEqual(spark.createDataFrame(
          java.util.Arrays.asList(rows: _*), now.schema), now, t)
      }
      assert(IndexStore.docConfig(spark, p) == cfgBefore,
        "config properties must survive compaction")

      // the compacted store still admits: a dup of an APPENDED doc and a
      // fresh doc keep their outcomes, through the persisted bloom
      val probe = Seq((9600L, textOf(245)), (9601L, "wholly fresh compact " +
        "probe document with plenty of novel tokens to stand alone"))
        .toDF("doc_id", "text")
      val (adm, rej) = IngestApp.admitDocs(spark, p, probe)
      assert(rej.as[(Long, String)].collect().toMap
        .get(9600L).contains("exact_dup_of_corpus"))
      assert(adm.select("doc_id").as[Long].collect().toSet == Set(9601L))
    } finally IndexStore.dropDocs(spark, p)
  }

  test("vecs compaction: one file per bucket, identical tables, config kept") {
    val p = "mt_vecs"
    IndexStore.dropVecs(spark, p)
    val allVecs = Tables(spark, sfDir).embeddings
      .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
    try {
      IndexStore.buildVecs(allVecs.filter(col("vec_id") < 200),
        col("vec_id"), col("embedding"), p, nTables = 4, buckets = 4)
      IndexStore.appendVecs(
        materialize(allVecs.filter(col("vec_id").between(200, 249))),
        col("vec_id"), col("embedding"), p)
      val tables = Seq(IndexStore.vecsTable(p), IndexStore.lshTable(p))
      assert(tables.forall(dataFileCount(_) > 4))
      val vecsBefore = spark.table(tables(0)).collect()
      val lshBefore = spark.table(tables(1)).collect()
      val cfgBefore = IndexStore.vecConfig(spark, p)

      IndexStore.compactVecs(spark, p)

      tables.foreach(t => assert(dataFileCount(t) == 4,
        s"$t should compact to one file per bucket, got ${dataFileCount(t)}"))
      Seq((tables(0), vecsBefore), (tables(1), lshBefore)).foreach {
        case (t, rows) =>
          val now = spark.table(t)
          multisetEqual(spark.createDataFrame(
            java.util.Arrays.asList(rows: _*), now.schema), now, t)
      }
      assert(IndexStore.vecConfig(spark, p) == cfgBefore)
    } finally IndexStore.dropVecs(spark, p)
  }

  test("gated streaming ingest: junk/off-language gated per batch, never appended; replay idempotent") {
    val p = "mt_gated"
    IndexStore.dropDocs(spark, p)
    val srcDir = java.nio.file.Files.createTempDirectory("gate-src").toString
    val outDir = java.nio.file.Files.createTempDirectory("gate-out").toString
    val replayOut = java.nio.file.Files.createTempDirectory("gate-rp").toString
    try {
      IndexStore.buildDocs(corpusDocs, col("doc_id"), col("text"), p,
        IndexStore.DocConfig(buckets = 4))
      // fresh docs + planted junk + an exact corpus re-crawl
      allDocs.filter(col("doc_id").between(200, 209))
        .unionByName(Seq(
          (9600L, "!!! ??? ### $$$ %%% ^^^ &&& *** ((( )))"),
          (9601L, textOf(5))).toDF("doc_id", "text"))
        .write.mode("append").parquet(srcDir)
      StreamingIngest.docsStreamGated(spark, srcDir, p, outDir,
        minQuality = 0.1).awaitTermination()
      val rejects = spark.read.parquet(s"$outDir/rejects")
        .select("doc_id", "reason").as[(Long, String)].collect().toSet
      assert(rejects.contains((9600L, "low_quality")), rejects.toString)
      assert(rejects.contains((9601L, "exact_dup_of_corpus")), rejects.toString)
      val storeIds = spark.table(IndexStore.docsTable(p))
        .select("doc_id").as[Long].collect().toSet
      assert(!storeIds.contains(9600L), "gated junk must never append")
      assert(storeIds.contains(205L), "clean batch docs must append")
      // fresh-checkpoint replay: the gate re-fires deterministically and
      // the appended survivors self-reject as exact dups — store unchanged
      StreamingIngest.docsStreamGated(spark, srcDir, p, replayOut,
        minQuality = 0.1).awaitTermination()
      val afterReplay = spark.table(IndexStore.docsTable(p))
        .select("doc_id").as[Long].collect().toSet
      assert(afterReplay == storeIds, "replay must not grow the store")
      val replayRejects = spark.read.parquet(s"$replayOut/rejects")
        .select("doc_id", "reason").as[(Long, String)].collect().toSet
      assert(replayRejects.contains((9600L, "low_quality")),
        "the gate reason must be stable across replay")
    } finally {
      IndexStore.dropDocs(spark, p)
      Seq(srcDir, outDir, replayOut).foreach { d =>
        org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(d))
      }
    }
  }

  test("model-gated streaming ingest: LM-perplexity and classifier gates " +
       "fire per batch with audit reasons; replay idempotent") {
    import graft.operators.TextAnalysis
    val p = "mt_mgated"
    IndexStore.dropDocs(spark, p)
    val srcDir = java.nio.file.Files.createTempDirectory("mgate-src").toString
    val outDir = java.nio.file.Files.createTempDirectory("mgate-out").toString
    val replayOut = java.nio.file.Files.createTempDirectory("mgate-rp").toString
    try {
      IndexStore.buildDocs(corpusDocs, col("doc_id"), col("text"), p,
        IndexStore.DocConfig(buckets = 4))
      // LM trained on the trusted corpus, tables PINNED (the documented
      // streaming shape: a lazy model would replay training per batch)
      val lm0 = TextAnalysis.ngramTrain(corpusDocs, col("text"), minCount = 2)
      val lm = lm0.copy(uni = lm0.uni.localCheckpoint(true),
        bi = lm0.bi.localCheckpoint(true),
        tri = lm0.tri.localCheckpoint(true),
        total = lm0.total.localCheckpoint(true))
      // NB classifier on a tiny labeled curated-vs-spam fixture. The
      // positive side speaks the corpus vocabulary (query/data/window…)
      // so clean documents accumulate positive evidence; token totals
      // are BALANCED (8 vs 8) so out-of-vocabulary tokens score an
      // exactly-zero llr and only real evidence decides.
      val nb = TextAnalysis.nbTrain(Seq(
          (true, "query data window table join part"),
          (true, "spark filter"),
          (false, "casino spam bonus click jackpot win"),
          (false, "casino spam")).toDF("y", "text"),
        col("y"), col("text"))
      allDocs.filter(col("doc_id").between(210, 219))
        .unionByName(Seq(
          (9700L, "zxqv jkwpt vvxzq qqzzk wplm zzkrw xqvnp kkwzz"),
          (9701L, "casino spam click casino bonus casino spam"))
          .toDF("doc_id", "text"))
        .write.mode("append").parquet(srcDir)
      val models = graft.IngestApp.ModelGate(
        lm = Some((lm, 8.0)), nb = Some(nb))
      StreamingIngest.docsStreamGated(spark, srcDir, p, outDir,
        minQuality = 0.0, models = models).awaitTermination()
      val rejects = spark.read.parquet(s"$outDir/rejects")
        .select("doc_id", "reason").as[(Long, String)].collect().toSet
      assert(rejects.contains((9700L, "lm_perplexity")), rejects.toString)
      assert(rejects.contains((9701L, "classifier_rejected")), rejects.toString)
      val storeIds = spark.table(IndexStore.docsTable(p))
        .select("doc_id").as[Long].collect().toSet
      assert(!storeIds.contains(9700L) && !storeIds.contains(9701L),
        "model-gated docs must never append")
      assert(storeIds.contains(215L), "clean batch docs must append")
      // fresh-checkpoint replay: model gating is deterministic, so the
      // reasons re-fire identically and the store does not grow
      StreamingIngest.docsStreamGated(spark, srcDir, p, replayOut,
        minQuality = 0.0, models = models).awaitTermination()
      assert(spark.table(IndexStore.docsTable(p))
        .select("doc_id").as[Long].collect().toSet == storeIds)
      val replayRejects = spark.read.parquet(s"$replayOut/rejects")
        .select("doc_id", "reason").as[(Long, String)].collect().toSet
      assert(replayRejects.contains((9700L, "lm_perplexity")) &&
        replayRejects.contains((9701L, "classifier_rejected")),
        replayRejects.toString)
    } finally {
      IndexStore.dropDocs(spark, p)
      Seq(srcDir, outDir, replayOut).foreach { d =>
        org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(d))
      }
    }
  }

  test("DSIR-gated streaming ingest: the STORE-loaded importance model " +
       "gates micro-batches as dsir_out_of_domain; replay idempotent") {
    import graft.sources.DsirStore
    val p = "mt_dsir"
    IndexStore.dropDocs(spark, p)
    val srcDir = java.nio.file.Files.createTempDirectory("dsir-src").toString
    val outDir = java.nio.file.Files.createTempDirectory("dsir-out").toString
    val replayOut = java.nio.file.Files.createTempDirectory("dsir-rp").toString
    try {
      IndexStore.buildDocs(corpusDocs, col("doc_id"), col("text"), p,
        IndexStore.DocConfig(buckets = 4))
      // the production loop's streaming half: train ONCE on the planted
      // corpora, PERSIST through the fenced store, LOAD, gate forever
      val raw = spark.range(80).select(col("id").as("doc_id"),
        concat(concat_ws(" ", transform(sequence(lit(0), lit(11)), i =>
            concat(lit("w"), pmod(xxhash64(col("id"), i), lit(40))
              .cast("string")))),
          when(pmod(col("id"), lit(10)) === 0,
            lit(" quantum flux capacitor")).otherwise(lit("")))
          .as("text"))
      val tgt = spark.range(12).select((col("id") + 200).as("doc_id"),
        lit("quantum flux capacitor quantum flux").as("text"))
      DsirStore.drop(spark, "mt_dsirm")
      DsirStore.build(spark, "mt_dsirm", raw, tgt, col("doc_id"),
        col("text"), ngram = 2, nBuckets = 1024)
      val m = DsirStore.load(spark, "mt_dsirm")
      Seq((9800L, "w1 w2 w3 quantum flux capacitor w4"),
          (9801L, "w5 w6 w7 w8 w9 w10 w11 w12"),
          (9802L, "quantum flux capacitor quantum flux w2"),
          (9803L, "w13 w14 w15 w16 w17 w18"))
        .toDF("doc_id", "text").write.mode("append").parquet(srcDir)
      val models = graft.IngestApp.ModelGate(dsir = Some(m -> 1.0))
      StreamingIngest.docsStreamGated(spark, srcDir, p, outDir,
        minQuality = 0.0, models = models).awaitTermination()
      val rejects = spark.read.parquet(s"$outDir/rejects")
        .select("doc_id", "reason").as[(Long, String)].collect().toSet
      assert(rejects.contains((9801L, "dsir_out_of_domain")) &&
        rejects.contains((9803L, "dsir_out_of_domain")), rejects.toString)
      val storeIds = spark.table(IndexStore.docsTable(p))
        .select("doc_id").as[Long].collect().toSet
      assert(storeIds.contains(9800L) && storeIds.contains(9802L),
        "in-domain batch docs must append")
      assert(!storeIds.contains(9801L) && !storeIds.contains(9803L),
        "out-of-domain docs must never append")
      // fresh-checkpoint replay: scoring against the stored model is
      // deterministic, so verdicts re-fire identically, store unchanged
      StreamingIngest.docsStreamGated(spark, srcDir, p, replayOut,
        minQuality = 0.0, models = models).awaitTermination()
      assert(spark.table(IndexStore.docsTable(p))
        .select("doc_id").as[Long].collect().toSet == storeIds)
      val replayRejects = spark.read.parquet(s"$replayOut/rejects")
        .select("doc_id", "reason").as[(Long, String)].collect().toSet
      assert(replayRejects.contains((9801L, "dsir_out_of_domain")) &&
        replayRejects.contains((9803L, "dsir_out_of_domain")),
        replayRejects.toString)
    } finally {
      DsirStore.drop(spark, "mt_dsirm")
      IndexStore.dropDocs(spark, p)
      Seq(srcDir, outDir, replayOut).foreach { d =>
        org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(d))
      }
    }
  }

  test("streaming ingest: checkpointed micro-batches admit+append; replay is idempotent") {
    val p = "mt_stream"
    IndexStore.dropDocs(spark, p)
    val srcDir = java.nio.file.Files.createTempDirectory("ingest-src").toString
    val outDir = java.nio.file.Files.createTempDirectory("ingest-out").toString
    val replayOut = java.nio.file.Files.createTempDirectory("ingest-rp").toString
    try {
      IndexStore.buildDocs(corpusDocs, col("doc_id"), col("text"), p,
        IndexStore.DocConfig(buckets = 4))

      // batch 1 arrives: fresh docs + an exact re-crawl of the corpus
      allDocs.filter(col("doc_id").between(200, 219))
        .unionByName(Seq((9500L, textOf(5))).toDF("doc_id", "text"))
        .write.mode("append").parquet(srcDir)
      StreamingIngest.docsStream(spark, srcDir, p, outDir).awaitTermination()

      // batch 2 arrives: fresh docs + an exact dup of a BATCH-1 admission —
      // only the stream's append can have taught the store to reject it
      allDocs.filter(col("doc_id").between(220, 239))
        .unionByName(Seq((9501L, textOf(205))).toDF("doc_id", "text"))
        .write.mode("append").parquet(srcDir)
      StreamingIngest.docsStream(spark, srcDir, p, outDir).awaitTermination()

      val storeIds = spark.table(IndexStore.docsTable(p))
        .select("doc_id").as[Long].collect().toSet
      val rejects = spark.read.parquet(s"$outDir/rejects")
        .select("doc_id", "reason", "batch_id")
        .as[(Long, String, Long)].collect().toSet
      // the loop invariant: store = corpus + every source row not rejected
      val srcIds = (200L to 239L).toSet ++ Set(9500L, 9501L)
      assert(storeIds == (0L until 200L).toSet ++ (srcIds -- rejects.map(_._1)),
        "store must hold corpus + exactly the non-rejected source rows")
      assert((srcIds -- rejects.map(_._1)).nonEmpty, "some rows must admit")
      assert(rejects.exists(r => r._1 == 9500L &&
        r._2 == "exact_dup_of_corpus"), s"batch-1 re-crawl missing: $rejects")
      assert(rejects.exists(r => r._1 == 9501L &&
        r._2 == "exact_dup_of_corpus" && r._3 > 0),
        s"cross-batch dup must be rejected in a LATER micro-batch: $rejects")

      // crash-replay: a FRESH checkpoint reprocesses every source file
      // against the final store — the admission check rejects all of it
      // (each doc is now its own exact dup), so the store is unchanged:
      // at-least-once delivery, exactly-once state
      StreamingIngest.docsStream(spark, srcDir, p, replayOut).awaitTermination()
      val afterReplay = spark.table(IndexStore.docsTable(p))
        .select("doc_id").as[Long].collect().toSet
      assert(afterReplay == storeIds, "replay must not grow the store")
      val replayRejects = spark.read.parquet(s"$replayOut/rejects")
      assert(replayRejects.count() == 42,
        "every replayed doc (40 admitted + 2 planted) must be rejected")
    } finally {
      IndexStore.dropDocs(spark, p)
      Seq(srcDir, outDir, replayOut).foreach { d =>
        org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(d))
      }
    }
  }

  test("streaming vecs ingest: cross-batch twin rejected; replay idempotent via self-similarity") {
    val p = "mt_vstream"
    IndexStore.dropVecs(spark, p)
    val srcDir = java.nio.file.Files.createTempDirectory("vingest-src").toString
    val outDir = java.nio.file.Files.createTempDirectory("vingest-out").toString
    val replayOut = java.nio.file.Files.createTempDirectory("vingest-rp").toString
    val allVecs = Tables(spark, sfDir).embeddings
      .select(col("vec_id"), col("embedding"))
    def twinOf(id: Long, newId: Long): DataFrame =
      allVecs.filter(col("vec_id") === id)
        .select(lit(newId).as("vec_id"),
          zip_with(col("embedding"), reverse(col("embedding")),
            (x, y) => x + y * lit(0.01f)).as("embedding"))
    try {
      IndexStore.buildVecs(allVecs.filter(col("vec_id") < 200),
        col("vec_id"), col("embedding"), p, nTables = 4, buckets = 4)

      allVecs.filter(col("vec_id").between(200, 249))
        .write.mode("append").parquet(srcDir)
      StreamingIngest.vecsStream(spark, srcDir, p, outDir).awaitTermination()

      // a twin of a batch-1 ADMISSION: rejectable only through the append
      allVecs.filter(col("vec_id").between(250, 259))
        .unionByName(twinOf(205L, 9700L))
        .write.mode("append").parquet(srcDir)
      StreamingIngest.vecsStream(spark, srcDir, p, outDir).awaitTermination()

      val rejects = spark.read.parquet(s"$outDir/rejects")
        .select("vec_id", "reason").as[(Long, String)].collect().toSet
      assert(rejects.contains((9700L, "near_dup_of_corpus")),
        s"cross-batch twin must be rejected, got $rejects")
      val nStore = spark.table(IndexStore.vecsTable(p)).count()
      assert(nStore == 260, s"store must hold 200 + 60 admitted, got $nStore")

      // replay against the final store: every vector is cosine-1 with its
      // own stored copy, and identical vectors share every LSH bucket, so
      // recall on self-pairs is exact -> everything rejected
      StreamingIngest.vecsStream(spark, srcDir, p, replayOut).awaitTermination()
      assert(spark.table(IndexStore.vecsTable(p)).count() == nStore,
        "replay must not grow the store")
    } finally {
      IndexStore.dropVecs(spark, p)
      Seq(srcDir, outDir, replayOut).foreach { d =>
        org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(d))
      }
    }
  }

  test("streaming vecs ingest, SEMANTIC (PQ) mode: cross-batch twin rejected " +
       "via the stream's own sidecar append; store byte-identical under replay") {
    val p = "mt_vpq"
    IndexStore.dropVecs(spark, p)
    val srcDir = java.nio.file.Files.createTempDirectory("vpq-src").toString
    val outDir = java.nio.file.Files.createTempDirectory("vpq-out").toString
    val replayOut = java.nio.file.Files.createTempDirectory("vpq-rp").toString
    val allVecs = Tables(spark, sfDir).embeddings
      .select(col("vec_id"), col("embedding"))
    def twinOf(id: Long, newId: Long): DataFrame =
      allVecs.filter(col("vec_id") === id)
        .select(lit(newId).as("vec_id"),
          zip_with(col("embedding"), reverse(col("embedding")),
            (x, y) => x + y * lit(0.01f)).as("embedding"))
    try {
      // a stream without the sidecars must fail FAST, not fall back
      IndexStore.buildVecs(allVecs.filter(col("vec_id") < 200),
        col("vec_id"), col("embedding"), p, nTables = 4, buckets = 4)
      val e = intercept[IllegalArgumentException] {
        StreamingIngest.vecsStreamPq(spark, srcDir, p, outDir)
      }
      assert(e.getMessage.contains("sidecar"), e.getMessage)
      IndexStore.buildPq(spark, p, m = 16, ks = 16)
      IndexStore.buildIvf(spark, p, kLists = 8)

      allVecs.filter(col("vec_id").between(200, 249))
        .write.mode("append").parquet(srcDir)
      StreamingIngest.vecsStreamPq(spark, srcDir, p, outDir).awaitTermination()

      // a twin of a batch-1 ADMISSION (205 admitted in batch 1): its
      // codes exist in _ivfpq ONLY through the stream's own appendVecs
      // lockstep — rejecting it proves admission reads the appended
      // sidecar, not just the built one
      allVecs.filter(col("vec_id").between(250, 259))
        .unionByName(twinOf(205L, 9700L))
        .write.mode("append").parquet(srcDir)
      StreamingIngest.vecsStreamPq(spark, srcDir, p, outDir).awaitTermination()

      val rejects = spark.read.parquet(s"$outDir/rejects")
        .select("vec_id", "reason").as[(Long, String)].collect().toSet
      assert(rejects.contains((9700L, "sem_dup_of_corpus")),
        s"cross-batch semantic twin must be rejected, got $rejects")
      val nStore = spark.table(IndexStore.vecsTable(p)).count()
      assert(nStore == 260, s"store must hold 200 + 60 admitted, got $nStore")

      // store state snapshot BEFORE replay: vecs rows, pq codes,
      // ivfpq codes — all three must be bit-equal after replay
      def snap(): Seq[Set[String]] = Seq(
        spark.table(IndexStore.vecsTable(p))
          .select(col("vec_id"), col("vec").cast("string")),
        spark.table(IndexStore.pqTable(p))
          .select(col("vec_id"), hex(col("code"))),
        spark.table(IndexStore.ivfPqTable(p))
          .select(col("vec_id"), col("centroid_id"), hex(col("code"))))
        .map(_.collect().map(_.toString).toSet)
      val before = snap()

      // replay all input with a fresh checkpoint: every vector meets its
      // stored self at cosine 1.0 in its own probed cell -> rejected,
      // nothing appended, every table byte-identical
      StreamingIngest.vecsStreamPq(spark, srcDir, p, replayOut).awaitTermination()
      assert(snap() == before,
        "replay must leave vecs, _pq, and _ivfpq byte-identical")
      // 60 stored rows self-reject + the never-admitted twin 9700
      // rejects again (vs stored 205) = 61 corpus-dup rows
      val replayRejects = spark.read.parquet(s"$replayOut/rejects")
        .filter(col("reason") === "sem_dup_of_corpus")
        .select("vec_id").distinct().count()
      assert(replayRejects == 61,
        s"all 61 replayed vectors must reject vs the store, got $replayRejects")
    } finally {
      IndexStore.dropVecs(spark, p)
      Seq(srcDir, outDir, replayOut).foreach { d =>
        org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(d))
      }
    }
  }

  test("streaming vecs ingest, RESIDUAL (IVFADC) mode: twin rejected via the " +
       "stream's own _ivfr append; replay leaves the residual store byte-identical") {
    val p = "mt_vivfr"
    IndexStore.dropVecs(spark, p)
    val srcDir = java.nio.file.Files.createTempDirectory("vivfr-src").toString
    val outDir = java.nio.file.Files.createTempDirectory("vivfr-out").toString
    val replayOut = java.nio.file.Files.createTempDirectory("vivfr-rp").toString
    val allVecs = Tables(spark, sfDir).embeddings
      .select(col("vec_id"), col("embedding"))
    def twinOf(id: Long, newId: Long): DataFrame =
      allVecs.filter(col("vec_id") === id)
        .select(lit(newId).as("vec_id"),
          zip_with(col("embedding"), reverse(col("embedding")),
            (x, y) => x + y * lit(0.01f)).as("embedding"))
    try {
      IndexStore.buildVecs(allVecs.filter(col("vec_id") < 200),
        col("vec_id"), col("embedding"), p, nTables = 4, buckets = 4)
      // residual mode fails fast without ITS family — the _pq/_ivfpq
      // sidecars do not satisfy it
      val e = intercept[IllegalArgumentException] {
        StreamingIngest.vecsStreamPq(spark, srcDir, p, outDir, residual = true)
      }
      assert(e.getMessage.contains("residual"), e.getMessage)
      IndexStore.buildIvfResidual(spark, p, kLists = 8, m = 16, ks = 16)

      allVecs.filter(col("vec_id").between(200, 249))
        .write.mode("append").parquet(srcDir)
      StreamingIngest.vecsStreamPq(spark, srcDir, p, outDir, residual = true)
        .awaitTermination()
      // twin of a batch-1 admission: its residual codes reached _ivfr
      // only through the stream's own appendVecs lockstep
      allVecs.filter(col("vec_id").between(250, 259))
        .unionByName(twinOf(205L, 9700L))
        .write.mode("append").parquet(srcDir)
      StreamingIngest.vecsStreamPq(spark, srcDir, p, outDir, residual = true)
        .awaitTermination()
      val rejects = spark.read.parquet(s"$outDir/rejects")
        .select("vec_id", "reason").as[(Long, String)].collect().toSet
      assert(rejects.contains((9700L, "sem_dup_of_corpus")),
        s"cross-batch twin must be rejected via the residual codes, got $rejects")
      assert(spark.table(IndexStore.vecsTable(p)).count() == 260)
      assert(spark.table(IndexStore.ivfrTable(p)).count() == 260)

      def snap(): Set[String] = spark.table(IndexStore.ivfrTable(p))
        .select(col("vec_id"), col("centroid_id"), hex(col("code")), col("crn"))
        .collect().map(_.toString).toSet
      val before = snap()
      StreamingIngest.vecsStreamPq(spark, srcDir, p, replayOut, residual = true)
        .awaitTermination()
      assert(snap() == before, "replay must leave _ivfr byte-identical")
      assert(spark.table(IndexStore.vecsTable(p)).count() == 260,
        "replay must not grow the store")
    } finally {
      IndexStore.dropVecs(spark, p)
      Seq(srcDir, outDir, replayOut).foreach { d =>
        org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(d))
      }
    }
  }

  test("docs removal: forgotten docs re-admittable, shared text survives, store == rebuild") {
    val p = "mt_rm_docs"
    val pRef = "mt_rm_ref"
    IndexStore.dropDocs(spark, p)
    IndexStore.dropDocs(spark, pRef)
    try {
      // build corpus includes a doc-7 text twin under id 9000: the two
      // collapse onto ONE _fp row, the removal edge the fp rewrite must
      // get right (forget a fingerprint only when no survivor shares it)
      val buildCorpus = corpusDocs
        .unionByName(Seq((9000L, textOf(7))).toDF("doc_id", "text"))
      IndexStore.buildDocs(buildCorpus, col("doc_id"), col("text"), p,
        IndexStore.DocConfig(buckets = 4))
      IndexStore.appendDocs(
        materialize(allDocs.filter(col("doc_id").between(200, 229))),
        col("doc_id"), col("text"), p)
      val cfgBefore = IndexStore.docConfig(spark, p)

      // remove a build doc, the twin of doc 7, and an appended doc
      IndexStore.removeDocs(spark, p, Seq(5L, 9000L, 210L).toDF("doc_id"))

      // reference: the store a from-scratch build over the survivors gives
      val survivors = buildCorpus
        .unionByName(allDocs.filter(col("doc_id").between(200, 229)))
        .filter(!col("doc_id").isin(5L, 9000L, 210L))
      IndexStore.buildDocs(survivors, col("doc_id"), col("text"), pRef,
        IndexStore.DocConfig(buckets = 4))
      multisetEqual(spark.table(IndexStore.docsTable(p)),
        spark.table(IndexStore.docsTable(pRef)), "_docs after removal")
      multisetEqual(spark.table(IndexStore.fpTable(p)),
        spark.table(IndexStore.fpTable(pRef)), "_fp after removal")
      multisetEqual(spark.table(IndexStore.mhTable(p)),
        spark.table(IndexStore.mhTable(pRef)), "_mh after removal")
      multisetEqual(
        spark.table(IndexStore.spanTable(p))
          .groupBy("wh").agg(sum("n").as("n")),
        spark.table(IndexStore.spanTable(pRef))
          .groupBy("wh").agg(sum("n").as("n")), "_span totals after removal")
      assert(IndexStore.docConfig(spark, p) == cfgBefore,
        "config properties must survive removal")
      // removal doubles as compaction: back to one file per bucket
      Seq(IndexStore.docsTable(p), IndexStore.fpTable(p),
        IndexStore.mhTable(p), IndexStore.spanTable(p)).foreach { t =>
        assert(dataFileCount(t) == 4,
          s"$t should be compacted by removal, got ${dataFileCount(t)}")
      }

      // probes through the rewritten store AND its persisted bloom:
      // a re-crawl of a removed text is new again; the shared text is
      // still remembered through its survivor; survivor dups still reject
      val probe = Seq(
        (9601L, textOf(210)),          // removed -> forgotten -> admit
        (9602L, textOf(7)),            // twin removed, doc 7 survives -> reject
        (9603L, textOf(220)),          // surviving appended doc -> reject
        (9604L, "wholly fresh removal probe document with plenty of " +
          "novel tokens to stand alone")).toDF("doc_id", "text")
      val (adm, rej) = IngestApp.admitDocs(spark, p, probe)
      assert(adm.select("doc_id").as[Long].collect().toSet == Set(9601L, 9604L),
        "removed text must be re-admittable, fresh text admitted")
      val reasons = rej.as[(Long, String)].collect().toMap
      assert(reasons.get(9602L).contains("exact_dup_of_corpus"),
        s"shared text must survive its twin's removal: $reasons")
      assert(reasons.get(9603L).contains("exact_dup_of_corpus"), s"$reasons")
      // and the reference store decides identically
      val (admRef, rejRef) = IngestApp.admitDocs(spark, pRef, probe)
      assert(admRef.select("doc_id").as[Long].collect().toSet ==
        adm.select("doc_id").as[Long].collect().toSet)
      assert(rejRef.as[(Long, String)].collect().toMap == reasons)

      // the rewritten store still appends (bucket spec + props intact)
      IndexStore.appendDocs(
        materialize(allDocs.filter(col("doc_id").between(230, 239))),
        col("doc_id"), col("text"), p)
      val (_, rej2) = IngestApp.admitDocs(spark, p,
        Seq((9605L, textOf(235))).toDF("doc_id", "text"))
      assert(rej2.as[(Long, String)].collect().toMap
        .get(9605L).contains("exact_dup_of_corpus"),
        "store must keep admitting/appending after a removal rewrite")
    } finally {
      IndexStore.dropDocs(spark, p)
      IndexStore.dropDocs(spark, pRef)
    }
  }

  test("vecs removal: twin of removed vector admitted again, tables == rebuild") {
    val p = "mt_rm_vecs"
    val pRef = "mt_rm_vref"
    IndexStore.dropVecs(spark, p)
    IndexStore.dropVecs(spark, pRef)
    val allVecs = Tables(spark, sfDir).embeddings
      .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
    def twinOf(id: Long, newId: Long): DataFrame =
      allVecs.filter(col("vec_id") === id)
        .select(lit(newId).as("vec_id"),
          zip_with(col("embedding"), reverse(col("embedding")),
            (x, y) => x + y * lit(0.01)).as("embedding"))
    try {
      IndexStore.buildVecs(allVecs.filter(col("vec_id") < 200),
        col("vec_id"), col("embedding"), p, nTables = 4, buckets = 4)
      IndexStore.appendVecs(
        materialize(allVecs.filter(col("vec_id").between(200, 249))),
        col("vec_id"), col("embedding"), p)
      val cfg = IndexStore.vecConfig(spark, p)

      IndexStore.removeVecs(spark, p, Seq(5L, 210L).toDF("vec_id"))

      // rebuild reference pinned to the SAME plane provisioning (the
      // store was provisioned for the build corpus, not the survivors)
      IndexStore.buildVecs(
        allVecs.filter(col("vec_id") < 250 && !col("vec_id").isin(5L, 210L)),
        col("vec_id"), col("embedding"), pRef,
        nPlanes = cfg.nPlanes, nTables = cfg.nTables, buckets = cfg.buckets)
      multisetEqual(spark.table(IndexStore.vecsTable(p)),
        spark.table(IndexStore.vecsTable(pRef)), "_vecs after removal")
      multisetEqual(spark.table(IndexStore.lshTable(p)),
        spark.table(IndexStore.lshTable(pRef)), "_lsh after removal")
      assert(IndexStore.vecConfig(spark, p) == cfg)

      // a near-twin of the removed vector sails through; a twin of a
      // survivor is still caught
      val probe = twinOf(210L, 9700L).unionByName(twinOf(220L, 9701L))
      val (adm, rej) = IngestApp.admitVecs(spark, p, materialize(probe))
      assert(adm.select("vec_id").as[Long].collect().toSet == Set(9700L),
        "twin of a removed vector must be admitted")
      assert(rej.select("vec_id").as[Long].collect().toSet == Set(9701L),
        "twin of a surviving vector must still be rejected")
    } finally {
      IndexStore.dropVecs(spark, p)
      IndexStore.dropVecs(spark, pRef)
    }
  }

  test("fingerprint-algorithm fence: a docs store stamped under another " +
       "version (or pre-versioning) is rejected by name; rebuild migrates") {
    val p = "mt_fpver"
    IndexStore.dropDocs(spark, p)
    try {
      IndexStore.buildDocs(corpusDocs, col("doc_id"), col("text"), p,
        IndexStore.DocConfig(buckets = 4))
      // a fresh build is stamped with the current version and loads fine
      val cfg = IndexStore.docConfig(spark, p)
      // simulate a store built under the pre-NFC fingerprint (v1)
      spark.sql(s"ALTER TABLE ${IndexStore.docsTable(p)} " +
        "SET TBLPROPERTIES ('graft.fpAlgo'='1')")
      val e = intercept[Exception](IndexStore.docConfig(spark, p))
      assert(messageChain(e).contains("fingerprint") &&
        messageChain(e).contains("algorithm version 1"), messageChain(e))
      // an UNSTAMPED store (built before versioning existed) also fails
      spark.sql(s"ALTER TABLE ${IndexStore.docsTable(p)} " +
        "UNSET TBLPROPERTIES ('graft.fpAlgo')")
      val e2 = intercept[Exception](IndexStore.docConfig(spark, p))
      assert(messageChain(e2).contains("unstamped"), messageChain(e2))
      // the migration path reads config UNFENCED and the rebuild
      // re-fingerprints + re-stamps, after which the fenced read works
      val cur = IndexStore.docConfigUnfenced(spark, p)
      IndexStore.rebuildDocs(spark, p, cur)
      assert(IndexStore.docConfig(spark, p) == cfg,
        "rebuilt store must load through the fence with its config intact")
    } finally IndexStore.dropDocs(spark, p)
  }
}
