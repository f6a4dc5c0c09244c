package graft.sources

import graft.operators.TextAnalysis
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Persisted inverted index for BM25 retrieval — the text analogue of
  * the vector store family: pay the corpus tokenization + postings
  * shuffle ONCE, then serve every query from token-bucketed tables.
  *
  *  - `<prefix>_tf`   — postings `(token, doc_id, tf)`, BUCKETED and
  *    sorted by `token`: a query's term set becomes an `IN` filter the
  *    scan prunes to ~|terms|/nBuckets of the postings bytes
  *    (SelectedBucketsCount — spec-guarded, the same probe shape as the
  *    `_ivfpq` sidecar);
  *  - `<prefix>_dl`   — document lengths, bucketed by `doc_id` (the
  *    candidate join key);
  *  - `<prefix>_stats`— the 1-row corpus statistics (N, total tokens).
  *
  * All three carry one shared content-derived version property stamped
  * at build (stats → dl → tf write order), so a torn build or a
  * half-dropped family is a NAMED failure at search time, never a
  * silently inconsistent ranking. Search replays
  * [[TextAnalysis.bm25Search]]'s exact expression shapes over the
  * stored frames, so the in-query operator's DuckDB oracle holds the
  * whole persisted pipeline to hash equality. */
object TextIndexStore {

  def tfTable(prefix: String): String = s"${prefix}_tf"
  def dlTable(prefix: String): String = s"${prefix}_dl"
  def statsTable(prefix: String): String = s"${prefix}_stats"

  private def setProps(spark: SparkSession, table: String,
                       props: Map[String, String]): Unit =
    CatalogProps.setProps(spark, table, props)

  private def prop(spark: SparkSession, table: String, key: String): String =
    CatalogProps.prop(spark, table, key, "TextIndexStore")

  /** Build (or rebuild) the index from the corpus. One corpus pass
    * builds the postings; `dl` and `stats` derive from the postings
    * frame, never re-reading text. */
  def build(spark: SparkSession, prefix: String, docs: DataFrame,
            id: Column, text: Column, nBuckets: Int = 16): Unit = {
    Seq(tfTable(prefix), dlTable(prefix), statsTable(prefix))
      .foreach(t => Bucketing.dropManagedTable(spark, t))
    val tf = TextAnalysis.bm25Postings(docs, id, text)
    val dl = tf.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl"))
      .localCheckpoint(true)
    val stats = dl.agg(count(lit(1)).as("n_docs"),
      sum(col("dl")).as("total_tokens")).localCheckpoint(true)
    val r = stats.head()
    val version = s"${r.getLong(0)}_${r.getLong(1)}"
    stats.write.saveAsTable(statsTable(prefix))
    Bucketing.writeBucketed(dl, dlTable(prefix), Seq("doc_id"), nBuckets)
    Bucketing.writeBucketed(tf, tfTable(prefix), Seq("token"), nBuckets)
    Seq(statsTable(prefix), dlTable(prefix), tfTable(prefix)).foreach(t =>
      setProps(spark, t, Map("graft.text.version" -> version)))
  }

  /** Fold new documents into the index without a rebuild: delta
    * postings/lengths append bucket-aligned (each touched bucket gains
    * one file set — [[Bucketing.compactTable]] cadence applies, as in
    * the vector stores), the 1-row stats table is recomputed from the
    * appended `dl` (never re-reading text), and the shared version
    * restamps all three LAST — a crash mid-append leaves a version
    * mismatch, so the torn state is a named failure at search time,
    * not a silently mis-ranked corpus. Caller contract: `docs` are NEW
    * doc_ids (an id re-appended would double its postings — run exact
    * dedup upstream, as the ingest loop does). */
  def append(spark: SparkSession, prefix: String, docs: DataFrame,
             id: Column, text: Column, nBuckets: Int = 16): Unit = {
    val tables = Seq(statsTable(prefix), dlTable(prefix), tfTable(prefix))
    val vs = tables.map(t => prop(spark, t, "graft.text.version"))
    require(vs.distinct.size == 1 && !vs.head.startsWith("torn_"),
      s"TextIndexStore $prefix version fence tripped ($vs) before append — " +
        "rebuild with TextIndexStore.build")
    // invalidate the fence BEFORE the first data write: the appends and
    // the stats rewrite are three non-atomic steps, and data-file
    // appends alone would leave the old (matching!) version in place —
    // a crash between them must trip the fence, not rank silently wrong
    tables.foreach(t => setProps(spark, t,
      Map("graft.text.version" -> s"torn_append_of_${vs.head}")))
    val tf = TextAnalysis.bm25Postings(docs, id, text)
    val dl = tf.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl"))
      .localCheckpoint(true)
    Bucketing.appendBucketed(dl, dlTable(prefix), Seq("doc_id"), nBuckets)
    Bucketing.appendBucketed(tf, tfTable(prefix), Seq("token"), nBuckets)
    val stats = spark.table(dlTable(prefix))
      .agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("total_tokens"))
      .localCheckpoint(true)
    val r = stats.head()
    val version = s"${r.getLong(0)}_${r.getLong(1)}"
    stats.write.mode("overwrite").saveAsTable(statsTable(prefix))
    Seq(statsTable(prefix), dlTable(prefix), tfTable(prefix)).foreach(t =>
      setProps(spark, t, Map("graft.text.version" -> version)))
  }

  /** BM25 top-k against the stored index — the pure-probe deployment
    * shape: no tokenization, no corpus scan; the term filter prunes the
    * postings scan to the terms' buckets, everything downstream is
    * candidate-sized. Scoring is [[TextAnalysis.bm25Search]] shape for
    * shape (round-6 per-term scores, exact DECIMAL sum, rank-limited
    * top-k). */
  def search(spark: SparkSession, prefix: String, queryTerms: Seq[String],
             k: Int, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "search needs at least one query term")
    val vs = Seq(statsTable(prefix), dlTable(prefix), tfTable(prefix))
      .map(t => prop(spark, t, "graft.text.version"))
    require(vs.distinct.size == 1 && !vs.head.startsWith("torn_"),
      s"TextIndexStore $prefix version fence tripped ($vs) — torn build, " +
        "interrupted append, or partial drop; rebuild with " +
        "TextIndexStore.build")
    val qtf = spark.table(tfTable(prefix))
      .filter(col("token").isin(queryTerms.distinct: _*))
    // the ONE scorer, shared with TextAnalysis.bm25Search — store and
    // in-query ranking cannot diverge
    TextAnalysis.bm25Score(qtf, spark.table(dlTable(prefix)),
      spark.table(statsTable(prefix)), k, k1, b)
  }

  /** Drive the index from parquet document files arriving in `srcDir`
    * (`doc_id` LONG, `text` STRING rows) — the text-side ingest loop:
    * per micro-batch, documents whose `doc_id` the index already holds
    * are dropped by an anti-join against the doc-bucketed `_dl` (the
    * cheap membership side), and only the fresh remainder appends. That
    * admission step is what makes at-least-once delivery exactly-once
    * STORE state: a crash-replayed, already-appended document is its
    * own duplicate and self-rejects, so the replay appends nothing and
    * the tables stay byte-identical (spec'd). A crash in the MIDDLE of
    * an append is the documented torn window — the version fence trips
    * and the next batch fails by name (`rebuild`, always possible: the
    * index is derived data), never ranks silently wrong. */
  def stream(spark: SparkSession, srcDir: String, prefix: String,
             ckptDir: String,
             trigger: org.apache.spark.sql.streaming.Trigger =
               org.apache.spark.sql.streaming.Trigger.AvailableNow(),
             nBuckets: Int = 16)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType)))
    spark.readStream.schema(schema).parquet(srcDir)
      .writeStream.trigger(trigger)
      .option("checkpointLocation", ckptDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // A TORN APPEND must fail by name, never route to build():
        // the replayed batch is the only data the checkpoint will ever
        // re-deliver, so "rebuild" here would silently shrink the index
        // to one batch's documents. Only an absent or crashed-BUILD
        // store (whose sole data batch is exactly the one being
        // replayed) may build from the batch.
        val tornAppend = Seq(statsTable(prefix), dlTable(prefix),
            tfTable(prefix))
          .filter(spark.catalog.tableExists)
          .exists(t => CatalogProps.propOption(spark, t, "graft.text.version")
            .exists(_.startsWith("torn_append_of_")))
        if (tornAppend) throw new IllegalStateException(
          s"TextIndexStore $prefix: a prior append crashed mid-write " +
            "(torn version fence); the stream cannot recover it from one " +
            "replayed batch — rebuild with TextIndexStore.build over the " +
            "full corpus, then restart the stream")
        val complete = isComplete(spark, prefix)
        val fresh =
          if (!complete) batch.dropDuplicates("doc_id")
          else batch.dropDuplicates("doc_id")
            .join(spark.table(dlTable(prefix)).select(col("doc_id")),
              Seq("doc_id"), "left_anti")
        val f = fresh.localCheckpoint(true)
        if (!f.isEmpty) {
          if (complete)
            append(spark, prefix, f, col("doc_id"), col("text"), nBuckets)
          else
            build(spark, prefix, f, col("doc_id"), col("text"), nBuckets)
        }
      }
      .start()
  }

  /** True iff all three tables exist AND carry one consistent, non-torn
    * version — the build-if-absent predicate: a crash between build's
    * table writes and the version stamp leaves tables that EXIST but
    * can never serve, and a bare tableExists check would skip the
    * rebuild forever. */
  def isComplete(spark: SparkSession, prefix: String): Boolean = {
    val tables = Seq(statsTable(prefix), dlTable(prefix), tfTable(prefix))
    tables.forall(spark.catalog.tableExists) && {
      val vs = tables.map(t =>
        CatalogProps.propOption(spark, t, "graft.text.version"))
      vs.forall(_.isDefined) && vs.distinct.size == 1 &&
        !vs.head.get.startsWith("torn_")
    }
  }

  /** Drop the whole family (maintenance/test hygiene). */
  def drop(spark: SparkSession, prefix: String): Unit =
    Seq(tfTable(prefix), dlTable(prefix), statsTable(prefix))
      .foreach(t => Bucketing.dropManagedTable(spark, t))
}
