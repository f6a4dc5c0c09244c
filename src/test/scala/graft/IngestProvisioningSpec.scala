package graft

import graft.sources.IndexStore
import graft.streaming.StreamingIngest
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Round-10 maintenance additions: the broadcast-guard fallback in
  * takedown ([[IndexStore.removeDocs]] with a tiny `maxBroadcastRows`),
  * LSH re-provisioning ([[IndexStore.rebuildVecs]]), and the streaming
  * compaction cadence ([[StreamingIngest.docsStream]] `compactEvery`). */
class IngestProvisioningSpec extends SparkSpec {
  import spark.implicits._

  private lazy val allDocs = Tables(spark, sfDir).documents
    .select(col("doc_id"), col("text"))

  private def multisetEqual(a: DataFrame, b: DataFrame, what: String): Unit = {
    val bb = b.select(a.columns.map(col): _*)
    assert(a.exceptAll(bb).isEmpty && bb.exceptAll(a).isEmpty, s"$what differs")
  }

  private def materialize(df: DataFrame): DataFrame =
    spark.createDataFrame(java.util.Arrays.asList(df.collect(): _*), df.schema)

  private def dataFileCount(table: String): Int = {
    val wh = new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath
    new java.io.File(wh, table.toLowerCase)
      .listFiles().count(_.getName.endsWith(".parquet"))
  }

  test("removeDocs shuffle fallback (guard tripped) equals rebuild-without-removed") {
    val p = "pv_rm_fb"
    val pRef = "pv_rm_fbref"
    IndexStore.dropDocs(spark, p)
    IndexStore.dropDocs(spark, pRef)
    try {
      val corpus = allDocs.filter(col("doc_id") < 200)
      IndexStore.buildDocs(corpus, col("doc_id"), col("text"), p,
        IndexStore.DocConfig(buckets = 4))
      // maxBroadcastRows = 1 trips the guard on every removal-derived
      // frame (ids, fps, span index all exceed one row), forcing the
      // shuffle-fallback rewrite the 100-TB takedown path relies on
      IndexStore.removeDocs(spark, p, Seq(5L, 17L, 42L).toDF("doc_id"),
        maxBroadcastRows = 1L)
      IndexStore.buildDocs(corpus.filter(!col("doc_id").isin(5L, 17L, 42L)),
        col("doc_id"), col("text"), pRef, IndexStore.DocConfig(buckets = 4))
      multisetEqual(spark.table(IndexStore.docsTable(p)),
        spark.table(IndexStore.docsTable(pRef)), "_docs (fallback removal)")
      multisetEqual(spark.table(IndexStore.fpTable(p)),
        spark.table(IndexStore.fpTable(pRef)), "_fp (fallback removal)")
      multisetEqual(spark.table(IndexStore.mhTable(p)),
        spark.table(IndexStore.mhTable(pRef)), "_mh (fallback removal)")
      multisetEqual(
        spark.table(IndexStore.spanTable(p)).groupBy("wh").agg(sum("n").as("n")),
        spark.table(IndexStore.spanTable(pRef)).groupBy("wh").agg(sum("n").as("n")),
        "_span totals (fallback removal)")
      // and admission still works through the rewritten store + bloom
      val (adm, rej) = IngestApp.admitDocs(spark, p, Seq(
        (9650L, allDocs.filter(col("doc_id") === 5L).select("text").as[String].head()),
        (9651L, allDocs.filter(col("doc_id") === 20L).select("text").as[String].head()))
        .toDF("doc_id", "text"))
      assert(adm.select("doc_id").as[Long].collect().toSet == Set(9650L),
        "removed text must re-admit after a fallback removal")
      assert(rej.select("doc_id").as[Long].collect().toSet == Set(9651L),
        "surviving text must still reject after a fallback removal")
    } finally {
      IndexStore.dropDocs(spark, p)
      IndexStore.dropDocs(spark, pRef)
    }
  }

  test("rebuildVecs at 2x corpus == fresh build; store swapped atomically") {
    val p = "pv_rb_vecs"
    val pRef = "pv_rb_vref"
    IndexStore.dropVecs(spark, p)
    IndexStore.dropVecs(spark, pRef)
    val allVecs = Tables(spark, sfDir).embeddings
      .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
    try {
      // build at 150 vectors, append past 2x the build size — the decay
      // regime rebuildVecs exists for
      IndexStore.buildVecs(allVecs.filter(col("vec_id") < 150),
        col("vec_id"), col("embedding"), p, nTables = 4, buckets = 4)
      IndexStore.appendVecs(
        materialize(allVecs.filter(col("vec_id").between(150, 349))),
        col("vec_id"), col("embedding"), p)

      IndexStore.rebuildVecs(spark, p)

      // reference: a fresh auto-provisioned build over the SAME corpus —
      // same count -> same auto plane count -> identical deterministic LSH
      IndexStore.buildVecs(allVecs.filter(col("vec_id") < 350),
        col("vec_id"), col("embedding"), pRef, nTables = 4, buckets = 4)
      assert(IndexStore.vecConfig(spark, p) == IndexStore.vecConfig(spark, pRef),
        "rebuild must re-provision planes to the current corpus size")
      multisetEqual(spark.table(IndexStore.lshTable(p)),
        spark.table(IndexStore.lshTable(pRef)), "_lsh after rebuild")
      multisetEqual(spark.table(IndexStore.vecsTable(p)),
        spark.table(IndexStore.vecsTable(pRef)), "_vecs after rebuild")
      assert(!spark.catalog.tableExists(s"${IndexStore.lshTable(p)}__rebuild"),
        "write-aside temp must be renamed away")
      assert(dataFileCount(IndexStore.lshTable(p)) == 4,
        "rebuilt index is one file per bucket")

      // the rebuilt store still probes and appends under the new config
      val (adm, _) = IngestApp.admitVecs(spark, p,
        materialize(allVecs.filter(col("vec_id").between(350, 354))))
      assert(adm.count() > 0, "rebuilt store must keep admitting")
    } finally {
      IndexStore.dropVecs(spark, p)
      IndexStore.dropVecs(spark, pRef)
    }
  }

  test("rebuildDocs under a new config == fresh build; bloom re-provisioned; admission intact") {
    val p = "pv_rb_docs"
    val pRef = "pv_rb_dref"
    IndexStore.dropDocs(spark, p)
    IndexStore.dropDocs(spark, pRef)
    try {
      // build with one config, append past it, then re-provision with
      // different bands/spanK (the selectivity knobs) and auto bloom
      IndexStore.buildDocs(allDocs.filter(col("doc_id") < 150),
        col("doc_id"), col("text"), p,
        IndexStore.DocConfig(bands = 16, spanK = 6, buckets = 4))
      IndexStore.appendDocs(
        materialize(allDocs.filter(col("doc_id").between(150, 299))),
        col("doc_id"), col("text"), p)
      val newCfg = IndexStore.DocConfig(bands = 32, spanK = 8, buckets = 4)

      IndexStore.rebuildDocs(spark, p, newCfg)

      IndexStore.buildDocs(allDocs.filter(col("doc_id") < 300),
        col("doc_id"), col("text"), pRef, newCfg)
      val cfgP = IndexStore.docConfig(spark, p)
      val cfgRef = IndexStore.docConfig(spark, pRef)
      assert(cfgP == cfgRef,
        s"rebuild must record the new config incl. re-provisioned bloom: $cfgP vs $cfgRef")
      multisetEqual(spark.table(IndexStore.docsTable(p)),
        spark.table(IndexStore.docsTable(pRef)), "_docs after rebuild")
      multisetEqual(spark.table(IndexStore.fpTable(p)),
        spark.table(IndexStore.fpTable(pRef)), "_fp after rebuild")
      multisetEqual(spark.table(IndexStore.mhTable(p)),
        spark.table(IndexStore.mhTable(pRef)), "_mh after rebuild")
      multisetEqual(
        spark.table(IndexStore.spanTable(p)).groupBy("wh").agg(sum("n").as("n")),
        spark.table(IndexStore.spanTable(pRef)).groupBy("wh").agg(sum("n").as("n")),
        "_span totals after rebuild")
      Seq(IndexStore.docsTable _, IndexStore.fpTable _,
        IndexStore.mhTable _, IndexStore.spanTable _).foreach { t =>
        assert(!spark.catalog.tableExists(t(s"${p}__rebuild")),
          s"temp ${t(s"${p}__rebuild")} must be renamed away")
      }

      // the rebuilt store admits through its re-provisioned bloom: a dup
      // of an APPENDED doc still rejects, fresh text still admits, and
      // the reference store decides identically
      val probe = Seq(
        (9660L, allDocs.filter(col("doc_id") === 250L).select("text").as[String].head()),
        (9661L, "wholly fresh rebuild probe document with plenty of novel " +
          "tokens to stand alone")).toDF("doc_id", "text")
      val (adm, rej) = IngestApp.admitDocs(spark, p, probe)
      assert(rej.select("doc_id").as[Long].collect().toSet == Set(9660L))
      assert(adm.select("doc_id").as[Long].collect().toSet == Set(9661L))
      val (admRef, rejRef) = IngestApp.admitDocs(spark, pRef, probe)
      assert(admRef.select("doc_id").as[Long].collect().toSet ==
        adm.select("doc_id").as[Long].collect().toSet)
      assert(rejRef.select("doc_id").as[Long].collect().toSet ==
        rej.select("doc_id").as[Long].collect().toSet)
    } finally {
      IndexStore.dropDocs(spark, p)
      IndexStore.dropDocs(spark, pRef)
    }
  }

  test("rebuildVecs crash recovery records the crashed call's config, not its own") {
    val p = "pv_rb_crash"
    IndexStore.dropVecs(spark, p)
    val allVecs = Tables(spark, sfDir).embeddings
      .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
      .filter(col("vec_id") < 150)
    try {
      IndexStore.buildVecs(allVecs, col("vec_id"), col("embedding"), p,
        nTables = 4, buckets = 4)
      // simulate rebuildVecs(nPlanes = 29) crashing between dropTable(lsh)
      // and the rename: temp index exists with ITS config recorded, live
      // index gone
      val prep = spark.table(IndexStore.vecsTable(p))
      val lsh = IndexStore.lshTable(p)
      val tmp = s"${lsh}__rebuild"
      graft.sources.Bucketing.writeBucketed(
        graft.operators.Similarity.lshIndex(prep, 29, 4), tmp,
        Seq("band", "bucket"), 4)
      spark.sql(s"ALTER TABLE $tmp SET TBLPROPERTIES " +
        "('graft.nPlanes'='29', 'graft.nTables'='4')")
      val tmpRows = spark.table(tmp).collect()
      IndexStore.dropTable(spark, lsh)

      // the recovery call passes NO config — it must finish the rename
      // and record 29 (the temp's recorded planes), not re-auto-provision
      IndexStore.rebuildVecs(spark, p)

      val cfg = IndexStore.vecConfig(spark, p)
      assert(cfg.nPlanes == 29 && cfg.nTables == 4,
        s"recovered config must be the crashed call's (29 planes), got $cfg")
      multisetEqual(spark.createDataFrame(
        java.util.Arrays.asList(tmpRows: _*), spark.table(lsh).schema),
        spark.table(lsh), "recovered _lsh content")
    } finally IndexStore.dropVecs(spark, p)
  }

  test("appendDocs self-heals a bloom whose provisioning mismatches the recorded config") {
    val p = "pv_bloom_heal"
    IndexStore.dropDocs(spark, p)
    try {
      val corpus = allDocs.filter(col("doc_id") < 150)
      IndexStore.buildDocs(corpus, col("doc_id"), col("text"), p,
        IndexStore.DocConfig(buckets = 4, bloomN = 1000000L))
      // simulate the interrupted-rebuild state: properties say 1M but the
      // persisted filter is provisioned at a different size
      val stale = graft.operators.Dedup.admissionBloom(
        spark.table(IndexStore.fpTable(p)), 250000L, 0.01)
      val path = new org.apache.hadoop.fs.Path(
        spark.conf.get("spark.sql.warehouse.dir"), s"${p}_bloom/filter.bin")
      val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val out = fs.create(path, true)
      try stale.writeTo(out) finally out.close()

      // the next append must NOT throw IncompatibleMergeException — it
      // rebuilds the filter at the recorded provisioning instead
      IndexStore.appendDocs(
        materialize(allDocs.filter(col("doc_id").between(150, 179))),
        col("doc_id"), col("text"), p)

      // and the healed bloom covers BOTH corpus and appended docs: dups
      // of each reject, fresh text admits
      val probe = Seq(
        (9720L, allDocs.filter(col("doc_id") === 5L).select("text").as[String].head()),
        (9721L, allDocs.filter(col("doc_id") === 160L).select("text").as[String].head()),
        (9722L, "wholly fresh bloom heal probe document with plenty of " +
          "novel tokens to stand alone")).toDF("doc_id", "text")
      val (adm, rej) = IngestApp.admitDocs(spark, p, probe)
      assert(rej.select("doc_id").as[Long].collect().toSet == Set(9720L, 9721L))
      assert(adm.select("doc_id").as[Long].collect().toSet == Set(9722L))
    } finally IndexStore.dropDocs(spark, p)
  }

  test("streaming rejects log: a replayed micro-batch replaces its rows, not appends") {
    val p = "pv_replay_log"
    IndexStore.dropDocs(spark, p)
    val outDir = java.nio.file.Files.createTempDirectory("replay-log").toString
    try {
      IndexStore.buildDocs(allDocs.filter(col("doc_id") < 150),
        col("doc_id"), col("text"), p, IndexStore.DocConfig(buckets = 4))
      val batch = materialize(allDocs.filter(col("doc_id").between(150, 169)))
      def runBatch(): Unit =
        StreamingIngest.admitAppend(spark, batch, 7L, "doc_id", outDir) { b =>
          IngestApp.admitDocs(spark, p, b)._2
        } { adm => IndexStore.appendDocs(adm, col("doc_id"), col("text"), p) }

      runBatch() // original attempt: fresh docs admitted + appended
      val firstRejects = spark.read.parquet(s"$outDir/rejects")
        .select("doc_id").as[Long].collect().toSet
      val admitted = (150L to 169L).toSet -- firstRejects
      assert(admitted.nonEmpty, "some docs must admit on the first attempt")
      val storeAfterFirst = spark.table(IndexStore.docsTable(p)).count()

      runBatch() // crash-replay of the SAME batch id

      val log = spark.read.parquet(s"$outDir/rejects")
        .select(col("doc_id"), col("reason"), col("batch_id").cast("long"))
        .as[(Long, String, Long)].collect()
      // every doc rejected (admitted ones are now their own exact dups),
      // all rows carry the replayed batch id, and — the fix — each
      // first-attempt-admitted doc appears ONLY under the replay's
      // exact-dup view, never alongside a stale first-attempt row set
      assert(log.map(_._1).toSet == (150L to 169L).toSet, s"${log.toSeq}")
      assert(log.forall(_._3 == 7L), s"${log.toSeq}")
      admitted.foreach { id =>
        val rows = log.filter(_._1 == id).toSeq
        assert(rows == Seq((id, "exact_dup_of_corpus", 7L)),
          s"replaced log for admitted doc $id must be the replay's single row: $rows")
      }
      assert(spark.table(IndexStore.docsTable(p)).count() == storeAfterFirst,
        "replay must not grow the store")
    } finally {
      IndexStore.dropDocs(spark, p)
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(outDir))
    }
  }

  test("streaming ingest compactEvery: store compacted on cadence, results unchanged") {
    val p = "pv_ce"
    val pRef = "pv_ce_ref"
    IndexStore.dropDocs(spark, p)
    IndexStore.dropDocs(spark, pRef)
    val srcDir = java.nio.file.Files.createTempDirectory("ce-src").toString
    val srcDirRef = java.nio.file.Files.createTempDirectory("ceref-src").toString
    val outDir = java.nio.file.Files.createTempDirectory("ce-out").toString
    val outDirRef = java.nio.file.Files.createTempDirectory("ceref-out").toString
    try {
      val corpus = allDocs.filter(col("doc_id") < 200)
      IndexStore.buildDocs(corpus, col("doc_id"), col("text"), p,
        IndexStore.DocConfig(buckets = 4))
      IndexStore.buildDocs(corpus, col("doc_id"), col("text"), pRef,
        IndexStore.DocConfig(buckets = 4))

      // two micro-batches, compaction after each (cadence 1); the
      // reference stream never compacts
      for ((lo, hi) <- Seq((200, 219), (220, 239))) {
        allDocs.filter(col("doc_id").between(lo, hi))
          .write.mode("append").parquet(srcDir)
        StreamingIngest.docsStream(spark, srcDir, p, outDir, compactEvery = 1)
          .awaitTermination()
        allDocs.filter(col("doc_id").between(lo, hi))
          .write.mode("append").parquet(srcDirRef)
        StreamingIngest.docsStream(spark, srcDirRef, pRef, outDirRef)
          .awaitTermination()
      }

      val tables = Seq(IndexStore.docsTable _, IndexStore.fpTable _,
        IndexStore.mhTable _, IndexStore.spanTable _)
      tables.foreach { t =>
        assert(dataFileCount(t(p)) == 4,
          s"${t(p)} must be back to one file per bucket, got ${dataFileCount(t(p))}")
        assert(dataFileCount(t(pRef)) > 4,
          s"${t(pRef)} (no cadence) should hold appended file sets")
      }
      // cadence must not change WHAT the stream computed, only the layout
      multisetEqual(spark.table(IndexStore.docsTable(p)),
        spark.table(IndexStore.docsTable(pRef)), "_docs (cadence vs none)")
      multisetEqual(
        spark.table(IndexStore.spanTable(p)).groupBy("wh").agg(sum("n").as("n")),
        spark.table(IndexStore.spanTable(pRef)).groupBy("wh").agg(sum("n").as("n")),
        "_span totals (cadence vs none)")
      multisetEqual(spark.read.parquet(s"$outDir/rejects").drop("batch_id"),
        spark.read.parquet(s"$outDirRef/rejects").drop("batch_id"),
        "rejects (cadence vs none)")
    } finally {
      IndexStore.dropDocs(spark, p)
      IndexStore.dropDocs(spark, pRef)
      Seq(srcDir, srcDirRef, outDir, outDirRef).foreach { d =>
        org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(d))
      }
    }
  }

  test("appendDocs self-heals a MISSING bloom (rebuild swap interrupted mid-move)") {
    val p = "pv_bloom_gone"
    IndexStore.dropDocs(spark, p)
    try {
      IndexStore.buildDocs(allDocs.filter(col("doc_id") < 150),
        col("doc_id"), col("text"), p, IndexStore.DocConfig(buckets = 4))
      // simulate the worst interrupted-swap state: the live bloom
      // directory is simply gone
      val dir = new org.apache.hadoop.fs.Path(
        spark.conf.get("spark.sql.warehouse.dir"), s"${p}_bloom")
      val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(dir, true)

      // append must heal (rebuild from the fp index), not hard-fail on
      // readBloom's require
      IndexStore.appendDocs(
        materialize(allDocs.filter(col("doc_id").between(150, 179))),
        col("doc_id"), col("text"), p)

      // healed filter covers corpus AND the appended batch
      val probe = Seq(
        (9730L, allDocs.filter(col("doc_id") === 5L).select("text").as[String].head()),
        (9731L, allDocs.filter(col("doc_id") === 160L).select("text").as[String].head()),
        (9732L, "entirely new post-heal probe document with plenty of " +
          "novel standalone tokens")).toDF("doc_id", "text")
      val (adm, rej) = IngestApp.admitDocs(spark, p, probe)
      assert(rej.select("doc_id").as[Long].collect().toSet == Set(9730L, 9731L))
      assert(adm.select("doc_id").as[Long].collect().toSet == Set(9732L))
    } finally IndexStore.dropDocs(spark, p)
  }

  test("rebuildDocs bloom swap leaves no __old leftover and a readable filter") {
    val p = "pv_bloom_swap"
    IndexStore.dropDocs(spark, p)
    try {
      IndexStore.buildDocs(allDocs.filter(col("doc_id") < 120),
        col("doc_id"), col("text"), p, IndexStore.DocConfig(buckets = 4))
      // plant a stale aside-dir from a hypothetical prior crash — the
      // swap must clear it, not trip over it
      val wh = spark.conf.get("spark.sql.warehouse.dir")
      val oldDir = new org.apache.hadoop.fs.Path(wh, s"${p}_bloom__old")
      val fs = oldDir.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.mkdirs(oldDir)
      IndexStore.rebuildDocs(spark, p,
        IndexStore.DocConfig(buckets = 4, bands = 8))
      assert(!fs.exists(oldDir), "aside dir must be deleted after the swap")
      assert(IndexStore.readBloom(spark, p) != null)
      // and the swapped filter actually admits/rejects correctly
      val probe = Seq(
        (9740L, allDocs.filter(col("doc_id") === 3L).select("text").as[String].head()),
        (9741L, "post-swap probe document full of fresh unseen tokens " +
          "standing on its own")).toDF("doc_id", "text")
      val (adm, rej) = IngestApp.admitDocs(spark, p, probe)
      assert(rej.select("doc_id").as[Long].collect().toSet == Set(9740L))
      assert(adm.select("doc_id").as[Long].collect().toSet == Set(9741L))
    } finally IndexStore.dropDocs(spark, p)
  }

  test("docsStream fails fast on a legacy (root-level) rejects log layout") {
    val p = "pv_legacy_rej"
    val srcDir = java.nio.file.Files.createTempDirectory("legacy-src").toString
    val outDir = java.nio.file.Files.createTempDirectory("legacy-out").toString
    try {
      // a pre-r10 outDir: rejects rows live as files at the rejects/ ROOT
      // with batch_id as a data column
      Seq((1L, 7L, "exact_dup_of_corpus")).toDF("batch_id", "doc_id", "reason")
        .coalesce(1).write.mode("overwrite").parquet(s"$outDir/rejects")
      val e = intercept[IllegalArgumentException] {
        StreamingIngest.docsStream(spark, srcDir, p, outDir)
      }
      assert(e.getMessage.contains("legacy"),
        s"error must name the legacy layout: ${e.getMessage}")
      // a partitioned-layout outDir starts fine (empty source, no store
      // access before the first micro-batch arrives — none does)
      val outDir2 = java.nio.file.Files.createTempDirectory("legacy-ok").toString
      try {
        Seq((7L, "r")).toDF("doc_id", "reason")
          .write.mode("overwrite").parquet(s"$outDir2/rejects/batch_id=0")
        StreamingIngest.docsStream(spark, srcDir, p, outDir2).stop()
      } finally org.apache.commons.io.FileUtils.deleteDirectory(
        new java.io.File(outDir2))
    } finally Seq(srcDir, outDir).foreach { d =>
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(d))
    }
  }
}
