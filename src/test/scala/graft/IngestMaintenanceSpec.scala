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
}
