package graft.streaming

import graft.IngestApp
import graft.sources.IndexStore
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.{ArrayType, FloatType, LongType, StringType, StructField, StructType}

/** The ingest-admission loop as a STRUCTURED STREAM: a file-source of
  * arriving batches, each micro-batch admitted against the persisted
  * [[IndexStore]] and the admissions appended back — the continuous
  * form of `IngestApp build-* / admit-*`, with progress tracking and
  * restart handled by the streaming checkpoint instead of an external
  * scheduler. This is the library's analogue of the reference's whole
  * program shape (a DStream loop that checks arriving records against
  * accumulated state and folds them in), re-expressed as Structured
  * Streaming over bucketed index tables.
  *
  * Per micro-batch (inside `foreachBatch`):
  *  1. [[IngestApp.admitDocs]]/[[IngestApp.admitVecs]] against the store
  *     (bloom → vs-corpus minhash/span → within-batch; corpus side
  *     exchange-free on the bucketed tables),
  *  2. rejects pinned with `localCheckpoint` (the append below mutates
  *     the very tables their lazy plan reads) and appended to a
  *     `rejects` parquet log with the micro-batch id,
  *  3. admitted = batch anti-join reject ids (one admission execution),
  *     appended to the store ([[IndexStore.appendDocs]]/`appendVecs`).
  *
  * Delivery semantics: `foreachBatch` is at-least-once — after a crash
  * between sink writes and checkpoint commit, the whole micro-batch
  * replays. The loop is nevertheless IDEMPOTENT on the store, not by a
  * transaction but by the admission check itself: every document the
  * crashed attempt already appended is rejected by the replay as
  * `exact_dup_of_corpus` (the persisted bloom + fp index now contain
  * it), so nothing is appended twice — state converges to exactly the
  * no-crash outcome (spec: replaying ALL input against the final store
  * admits zero rows). The rejects log inherits at-least-once: audit
  * readers key by (batch_id, id, reason) or dedupe on read.
  *
  * Scale: per-batch cost is the admission joins (delta × index-bucket
  * reads) plus a delta-sized append — flat in corpus size; the growing
  * cost is file count per bucket, paid down by
  * [[IndexStore.compactDocs]] on whatever cadence the deployment likes
  * (e.g. every N batches, from the same driver between triggers). */
object StreamingIngest {

  val docSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType)))

  val vecSchema: StructType = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType))))

  /** Start the documents ingest stream over parquet files arriving in
    * `srcDir`. `outDir` holds the rejects log and the checkpoint;
    * restart with the same `outDir` resumes from the last committed
    * micro-batch.
    *
    * `compactEvery = N > 0` runs [[IndexStore.compactDocs]] inside every
    * Nth micro-batch (after its append), folding the store's per-append
    * file growth back to one sorted file per bucket on a fixed cadence —
    * without it a long-running stream degrades its own admission scans
    * until an operator intervenes. Placement matters: compaction runs
    * INSIDE `foreachBatch`, so it is serialized against admissions (the
    * write-aside swap is not safe under a concurrent reader of the same
    * session's catalog) and a crash mid-compaction replays the batch,
    * whose admission-idempotence already covers the re-run; the
    * compacted store is equal row-wise to the uncompacted one, so
    * results are cadence-independent. The cadence counts micro-batches,
    * not rows — size N so compaction cost (a full store rewrite)
    * amortizes over the appends between runs. */
  def docsStream(spark: SparkSession, srcDir: String, prefix: String,
                 outDir: String, threshold: Double = 0.8,
                 maxSpanFrac: Double = 0.5,
                 trigger: Trigger = Trigger.AvailableNow(),
                 readerOptions: Map[String, String] = Map.empty,
                 compactEvery: Int = 0): StreamingQuery = {
    requireRejectsLayout(spark, outDir)
    spark.readStream.options(readerOptions).schema(docSchema).parquet(srcDir)
      .writeStream.trigger(trigger)
      .option("checkpointLocation", s"$outDir/ckpt")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        admitAppend(spark, batch, batchId, "doc_id", outDir) { b =>
          IngestApp.admitDocs(spark, prefix, b, threshold, maxSpanFrac)._2
        } { adm => IndexStore.appendDocs(adm, col("doc_id"), col("text"), prefix) }
        if (compactEvery > 0 && (batchId + 1) % compactEvery == 0)
          IndexStore.compactDocs(spark, prefix)
      }
      .start()
  }

  /** Start the vectors ingest stream; same contract as [[docsStream]],
    * including the `compactEvery` cadence ([[IndexStore.compactVecs]]). */
  /** [[docsStream]] with the quality/language gate composed in front of
    * every micro-batch's admission ([[IngestApp.runDocsGated]]
    * semantics): gated documents never pay the index joins and never
    * append; their audit reasons land in the same per-batch rejects log
    * as the dedup reasons. Crash-replay stays idempotent THROUGH the
    * gate — gating is a deterministic per-document function, so a
    * replayed batch re-gates identically and the dedup stages re-reject
    * the already-appended survivors as their own exact duplicates.
    *
    * `models` adds the TRAINED gate signals ([[IngestApp.ModelGate]]:
    * LM perplexity cutoff, NB classifier, and/or the DSIR importance
    * gate) in the same position — model scoring is a deterministic
    * function of the batch against fixed model tables (map-side for
    * lm/nb; one feature-keyed exchange for dsir), so replay idempotence
    * is unchanged. Train (or load) the models ONCE before starting the
    * stream and pin their tables (localCheckpoint; [[graft.sources
    * .DsirStore.load]] returns catalog tables, already stable); a
    * lazily-derived model would replay its training scan every
    * micro-batch. */
  def docsStreamGated(spark: SparkSession, srcDir: String, prefix: String,
                      outDir: String, minQuality: Double,
                      langs: Set[String] = Set.empty,
                      threshold: Double = 0.8,
                      maxSpanFrac: Double = 0.5,
                      trigger: Trigger = Trigger.AvailableNow(),
                      readerOptions: Map[String, String] = Map.empty,
                      compactEvery: Int = 0,
                      models: IngestApp.ModelGate = IngestApp.ModelGate())
      : StreamingQuery = {
    requireRejectsLayout(spark, outDir)
    spark.readStream.options(readerOptions).schema(docSchema).parquet(srcDir)
      .writeStream.trigger(trigger)
      .option("checkpointLocation", s"$outDir/ckpt")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        admitAppend(spark, batch, batchId, "doc_id", outDir) { b =>
          val gate = IngestApp.qualityRejects(b, minQuality, langs, models)
            .localCheckpoint(true)
          val surviving = b.join(gate.select("doc_id").distinct(),
            Seq("doc_id"), "left_anti")
          gate.unionByName(IngestApp
            .admitDocs(spark, prefix, surviving, threshold, maxSpanFrac)._2)
        } { adm => IndexStore.appendDocs(adm, col("doc_id"), col("text"), prefix) }
        if (compactEvery > 0 && (batchId + 1) % compactEvery == 0)
          IndexStore.compactDocs(spark, prefix)
      }
      .start()
  }

  def vecsStream(spark: SparkSession, srcDir: String, prefix: String,
                 outDir: String, threshold: Double = 0.9,
                 trigger: Trigger = Trigger.AvailableNow(),
                 readerOptions: Map[String, String] = Map.empty,
                 compactEvery: Int = 0): StreamingQuery = {
    requireRejectsLayout(spark, outDir)
    spark.readStream.options(readerOptions).schema(vecSchema).parquet(srcDir)
      .writeStream.trigger(trigger)
      .option("checkpointLocation", s"$outDir/ckpt")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        admitAppend(spark, batch, batchId, "vec_id", outDir) { b =>
          IngestApp.admitVecs(spark, prefix, b, threshold)._2
        } { adm => IndexStore.appendVecs(adm, col("vec_id"), col("embedding"), prefix) }
        if (compactEvery > 0 && (batchId + 1) % compactEvery == 0)
          IndexStore.compactVecs(spark, prefix)
      }
      .start()
  }

  /** Start the vectors ingest stream in SEMANTIC (PQ) admission mode:
    * each micro-batch is admitted via [[IngestApp.admitVecsPq]] — batch
    * vectors assign to their `nProbe` nearest STORED centroids (pure
    * projection), the probed cells' 16-byte codes ADC-score them, and
    * only near-threshold candidates get the exact re-check — then
    * appended with the same [[IndexStore.appendVecs]], which keeps the
    * `_pq` and `_ivfpq` sidecars in lockstep. That lockstep is what
    * closes the cross-batch loop: a twin arriving N batches after its
    * original is rejected against codes the STREAM ITSELF appended,
    * no rebuild in between. Idempotence under crash-replay is inherited
    * unchanged — a replayed vector meets its stored self at cosine 1.0
    * and rejects as `sem_dup_of_corpus`, so the store converges to the
    * no-crash bytes.
    *
    * Fails fast at start if the store lacks the probed sidecar
    * (`_pq` + `_ivfpq` by default; the `_ivfr` family when
    * `residual = true` — then [[IngestApp.admitVecsIvfr]] runs the
    * check against the finer residual codes): a stream that silently
    * fell back to another index would change admission semantics
    * mid-deployment. */
  def vecsStreamPq(spark: SparkSession, srcDir: String, prefix: String,
                   outDir: String, threshold: Double = 0.9, nProbe: Int = 1,
                   margin: Double = 0.3, residual: Boolean = false,
                   trigger: Trigger = Trigger.AvailableNow(),
                   readerOptions: Map[String, String] = Map.empty,
                   compactEvery: Int = 0): StreamingQuery = {
    requireRejectsLayout(spark, outDir)
    if (residual)
      require(spark.catalog.tableExists(IndexStore.ivfrTable(prefix)),
        s"store '$prefix' has no residual (IVFADC) sidecar — provision " +
          "with IndexStore.buildIvfResidual before starting the stream")
    else
      require(spark.catalog.tableExists(IndexStore.pqTable(prefix)) &&
          spark.catalog.tableExists(IndexStore.ivfPqTable(prefix)),
        s"store '$prefix' has no PQ/IVF-PQ sidecar — semantic admission " +
          "needs both; provision with IngestApp build-pq and " +
          "IndexStore.buildIvf before starting the stream")
    spark.readStream.options(readerOptions).schema(vecSchema).parquet(srcDir)
      .writeStream.trigger(trigger)
      .option("checkpointLocation", s"$outDir/ckpt")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        admitAppend(spark, batch, batchId, "vec_id", outDir) { b =>
          if (residual)
            IngestApp.admitVecsIvfr(spark, prefix, b, threshold, nProbe, margin)._2
          else
            IngestApp.admitVecsPq(spark, prefix, b, threshold, nProbe, margin)._2
        } { adm => IndexStore.appendVecs(adm, col("vec_id"), col("embedding"), prefix) }
        if (compactEvery > 0 && (batchId + 1) % compactEvery == 0)
          IndexStore.compactVecs(spark, prefix)
      }
      .start()
  }

  /** Refuse to resume into an `outDir` whose rejects log was written by
    * the pre-partitioned layout (append-mode files at the `rejects/` root
    * with `batch_id` as a DATA column). Mixing that with the current
    * `rejects/batch_id=N` directories makes `spark.read.parquet(rejects)`
    * fail partition discovery (root files vs partition dirs, duplicate
    * `batch_id`), so the stream fails FAST at start with the migration
    * story instead of corrupting the log further. Checkpoint/_spark_
    * metadata files are not data and are ignored. */
  private def requireRejectsLayout(spark: SparkSession, outDir: String): Unit = {
    val root = new org.apache.hadoop.fs.Path(s"$outDir/rejects")
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(root)) {
      val legacy = fs.listStatus(root).filter { st =>
        st.isFile && !st.getPath.getName.startsWith("_") &&
          !st.getPath.getName.startsWith(".")
      }
      require(legacy.isEmpty,
        s"outDir '$outDir' holds a legacy (pre-partitioned) rejects log — " +
          s"root-level data files like ${legacy.take(3).map(_.getPath.getName).mkString(", ")}. " +
          "The log is now hive-partitioned as rejects/batch_id=N/ and the two " +
          "layouts cannot be read together. Migrate each legacy file's rows " +
          "into rejects/batch_id=<its batch_id column>/ (dropping the column) " +
          "or start the stream with a fresh outDir.")
    }
  }

  /** The shared micro-batch body: one admission execution (rejects),
    * reject-log write, admitted re-derived and appended to the store.
    *
    * The rejects log is written per-batch into a hive-partitioned
    * directory (`rejects/batch_id=N`, mode OVERWRITE) so a crash-replay
    * of micro-batch N REPLACES its own log rows instead of appending a
    * second, contradictory set: on replay, docs the crashed attempt
    * already appended are re-classified `exact_dup_of_corpus`, and an
    * append-mode log would keep both the original "admitted" outcome
    * and the replay's wrong-reason rows forever — rows no read-side
    * dedup could remove. With per-batch overwrite the log converges to
    * the LAST attempt's view, under which the store state is exactly
    * what that attempt observed; readers get `batch_id` back as a
    * partition column.
    *
    * The admitted frame is RE-HOMED onto the driving session before the
    * append: `batch` belongs to the micro-batch's CLONED SparkSession,
    * and an append executed through the clone refreshes only the
    * clone's relation cache — the driving session (which the next
    * micro-batch's admission reads the store tables through) would keep
    * serving the pre-append file listing and silently re-admit
    * duplicates. `createDataFrame` over the checkpointed RDD moves the
    * plan, not the rows — nothing is collected to the driver. */
  private[graft] def admitAppend(spark: SparkSession, batch: DataFrame, batchId: Long,
                          idCol: String, outDir: String)(
                          admit: DataFrame => DataFrame)(
                          append: DataFrame => Unit): Unit = {
    val rejM = admit(batch).localCheckpoint(true)
    rejM.write.mode("overwrite").parquet(s"$outDir/rejects/batch_id=$batchId")
    val admitted = batch
      .join(rejM.select(idCol).distinct(), Seq(idCol), "left_anti")
      .localCheckpoint(true)
    append(spark.createDataFrame(admitted.rdd, admitted.schema))
  }
}
