package graft.sources

import graft.operators.{Dedup, Similarity}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.{BloomFilter, IncompatibleMergeException}

/** The persisted state of a continuous ingest-admission loop — the piece
  * that turns the incremental operators ([[Dedup.bloomAdmit]],
  * [[Dedup.minhashIncrementalPairs]], [[Dedup.spanIncrementalStats]],
  * [[Similarity.cosineIncrementalPairs]]) from one-shot demos into a
  * pipeline: build the bucketed index tables ONCE from the existing
  * corpus, admit each new batch against them, then APPEND the admitted
  * batch's index rows back, so the next batch is checked against
  * everything that came before without re-reading or re-hashing a single
  * already-ingested document.
  *
  * A store is a table-name prefix owning:
  *  - docs store: `<prefix>_docs` (doc_id, text; bucketed by doc_id — the
  *    candidate-sized text fetch side of verification), `<prefix>_fp`
  *    (fp; bucketed by fp), `<prefix>_mh` (doc_id, band, sig; bucketed by
  *    (band, sig)), `<prefix>_span` (wh, n; bucketed by wh).
  *  - vecs store: `<prefix>_vecs` ([[Similarity.prepared]] rows; bucketed
  *    by vec_id), `<prefix>_lsh` ([[Similarity.lshIndex]] rows; bucketed
  *    by (band, bucket)).
  *
  * The hash configuration (ngram/numHashes/bands/spanK, or
  * nPlanes/nTables) is recorded as table properties AT BUILD TIME and
  * every append/admit reads it back from the catalog — a batch hashed
  * under a different config than the index can therefore never be
  * appended or probed (the classic silent-recall-loss failure;
  * [[Similarity.cosineIncrementalPairs]]'s sampled layout check now has a
  * config source of truth instead of a convention). Bucket-spec drift is
  * independently rejected by `saveAsTable(Append)` itself.
  *
  * Append semantics per table:
  *  - `_docs`, `_mh`, `_vecs`, `_lsh`: admitted ids are NEW (that is what
  *    admission established), so appended rows are disjoint from existing
  *    rows and the appended table equals a from-scratch rebuild exactly
  *    (spec-verified).
  *  - `_fp`: admitted texts are distinct from every indexed text, so the
  *    same holds. (Consumers tolerate duplicate `fp` rows anyway — the
  *    confirm path is a semi/anti join.)
  *  - `_span`: the SAME window hash legitimately recurs across appends;
  *    the table is an unmerged count delta log, total occurrence count =
  *    `sum(n)` per `wh`. [[Dedup.spanIncrementalStats]] reads presence
  *    through a distinct that is exchange-free on the wh-bucketed table,
  *    so no per-append compaction is needed; compact (groupBy wh, sum n,
  *    rewrite) only if append count grows into many small files.
  *
  * Scale (100 TB): each append pays one delta-sized shuffle into the
  * existing bucket layout; per-batch admission joins stay exchange-free
  * on the corpus side (the existing plan-guard specs, now also asserted
  * over APPENDED tables). One caveat is deliberate: the LSH plane count
  * is fixed at build time (`lshAutoPlanes` of the BUILD corpus), and
  * bucket selectivity decays as appends grow the corpus past ~2× the
  * build size — the candidate-count guards then degrade gracefully
  * (shuffle fallback / abort-with-config), and the fix is a rebuild at
  * the new size, which is the standard LSH re-provisioning trade.
  */
object IndexStore {

  def docsTable(prefix: String): String = s"${prefix}_docs"
  def fpTable(prefix: String): String   = s"${prefix}_fp"
  def mhTable(prefix: String): String   = s"${prefix}_mh"
  def spanTable(prefix: String): String = s"${prefix}_span"
  def vecsTable(prefix: String): String = s"${prefix}_vecs"
  def lshTable(prefix: String): String  = s"${prefix}_lsh"
  def pqTable(prefix: String): String   = s"${prefix}_pq"
  def pqModelTable(prefix: String): String = s"${prefix}_pq_model"

  /** Hash/bucket configuration of a documents store. `bloomN` is the
    * Bloom filter's PROVISIONED capacity — it must cover the corpus plus
    * expected append growth, because the persisted filter is merged
    * incrementally and never resized (0 = provision at build time for 4×
    * the build corpus, floor 1M). An over-full filter degrades fpp, not
    * correctness: admission stays exact, the confirm join just sees more
    * candidates. */
  case class DocConfig(ngram: Int = 3, numHashes: Int = 64, bands: Int = 16,
                       spanK: Int = 6, buckets: Int = 32,
                       bloomN: Long = 0L, bloomFpp: Double = 0.01)

  /** Hash/bucket configuration of a vectors store. `nPlanes` here is
    * always the RESOLVED plane count (auto-provisioning happens once, at
    * build). */
  case class VecConfig(nPlanes: Int, nTables: Int, buckets: Int)

  /** Drop a managed table AND its warehouse directory. The in-memory
    * session catalog forgets tables when the JVM exits but the warehouse
    * directory persists, so a fresh session's `CREATE` would fail with
    * LOCATION_ALREADY_EXISTS after any uncleaned previous run — rebuild
    * paths must clear both. */
  def dropTable(spark: SparkSession, table: String): Unit =
    Bucketing.dropManagedTable(spark, table)

  /** Drop every table of a documents store (catalog + location), plus
    * the persisted bloom. */
  def dropDocs(spark: SparkSession, prefix: String): Unit = {
    Seq(docsTable(prefix), fpTable(prefix), mhTable(prefix), spanTable(prefix))
      .foreach(dropTable(spark, _))
    val dir = bloomPath(spark, prefix).getParent
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(dir)) fs.delete(dir, true)
    // a rebuildDocs crash can leave the aside-renamed previous bloom
    val oldDir = new org.apache.hadoop.fs.Path(
      dir.getParent, dir.getName + "__old")
    if (fs.exists(oldDir)) fs.delete(oldDir, true)
  }

  /** Drop every table of a vectors store (catalog + location), including
    * the PQ and IVF-PQ sidecars and any crash-left rebuild temps. */
  def dropVecs(spark: SparkSession, prefix: String): Unit =
    Seq(vecsTable(prefix), lshTable(prefix), pqTable(prefix),
      pqModelTable(prefix), s"${pqTable(prefix)}__rebuild",
      ivfPqTable(prefix), ivfCentTable(prefix),
      s"${ivfPqTable(prefix)}__rebuild",
      ivfrTable(prefix), ivfrModelTable(prefix), ivfrCentTable(prefix),
      s"${ivfrTable(prefix)}__rebuild")
      .foreach(dropTable(spark, _))

  private def setProps(spark: SparkSession, table: String,
                       props: Map[String, String]): Unit =
    CatalogProps.setProps(spark, table, props)

  private def prop(spark: SparkSession, table: String, key: String): String =
    CatalogProps.prop(spark, table, key, "IndexStore")

  private def bloomPath(spark: SparkSession, prefix: String) =
    new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), s"${prefix}_bloom/filter.bin")

  /** Persist the admission Bloom filter next to the store tables. */
  private def writeBloom(spark: SparkSession, prefix: String,
                         bloom: BloomFilter): Unit = {
    val path = bloomPath(spark, prefix)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(path, true)
    try bloom.writeTo(out) finally out.close()
  }

  /** The store's persisted admission Bloom filter — built once, merged on
    * every append, loaded per batch instead of re-aggregated from the fp
    * table (at production index sizes the rebuild is a full index scan
    * per batch; the load is an O(bits) file read). */
  def readBloom(spark: SparkSession, prefix: String): BloomFilter = {
    val path = bloomPath(spark, prefix)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(path),
      s"no persisted bloom at $path — store '$prefix' not built by buildDocs, " +
        "or a rebuild swap was interrupted (appendDocs self-heals this case)")
    val in = fs.open(path)
    try BloomFilter.readFrom(in) finally in.close()
  }

  /** Whether the store's persisted bloom filter file exists — the probe
    * behind [[appendDocs]]'s missing-filter self-heal. */
  private def bloomExists(spark: SparkSession, prefix: String): Boolean = {
    val path = bloomPath(spark, prefix)
    path.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(path)
  }

  /** Build the documents store: corpus + the three admission indexes,
    * all bucketed on their join keys, config recorded on `_docs`. */
  def buildDocs(corpus: DataFrame, id: Column, text: Column, prefix: String,
                cfg: DocConfig = DocConfig()): Unit = {
    val spark = corpus.sparkSession
    val docs = corpus.select(id.as("doc_id"), text.as("text"))
    Bucketing.writeBucketed(docs, docsTable(prefix), Seq("doc_id"), cfg.buckets)
    Bucketing.writeBucketed(Dedup.admissionIndex(docs, col("text")),
      fpTable(prefix), Seq("fp"), cfg.buckets)
    Bucketing.writeBucketed(
      Dedup.minhashIndex(docs, col("doc_id"), col("text"),
        cfg.ngram, cfg.numHashes, cfg.bands),
      mhTable(prefix), Seq("band", "sig"), cfg.buckets)
    Bucketing.writeBucketed(
      Dedup.spanIndex(docs, col("doc_id"), col("text"), cfg.spanK),
      spanTable(prefix), Seq("wh"), cfg.buckets)
    // provision the persisted bloom for append growth, then build it
    // from the just-written fp table (one fixed-width scan, at build only)
    val bloomN =
      if (cfg.bloomN > 0) cfg.bloomN
      else math.max(spark.table(fpTable(prefix)).count() * 4, 1000L * 1000)
    writeBloom(spark, prefix, Dedup.admissionBloom(
      spark.table(fpTable(prefix)), bloomN, cfg.bloomFpp))
    setProps(spark, docsTable(prefix), docProps(cfg.copy(bloomN = bloomN)))
  }

  /** The full docs-store property map — ONE derivation for every site
    * that (re)writes the `_docs` table (build, compaction, removal): a
    * rewrite that re-recorded a hand-copied subset would silently drop
    * the fingerprint-version stamp and trip the [[docConfig]] fence. The
    * `graft.fpAlgo` stamp is always the CURRENT algorithm version —
    * rewrite paths run behind the fence, so the store's fingerprints are
    * already known to be current. */
  private def docProps(cfg: DocConfig): Map[String, String] = Map(
    "graft.ngram" -> cfg.ngram.toString,
    "graft.numHashes" -> cfg.numHashes.toString,
    "graft.bands" -> cfg.bands.toString,
    "graft.spanK" -> cfg.spanK.toString,
    "graft.buckets" -> cfg.buckets.toString,
    "graft.bloomN" -> cfg.bloomN.toString,
    "graft.bloomFpp" -> cfg.bloomFpp.toString,
    "graft.fpAlgo" -> graft.operators.TextAnalysis.fingerprintAlgoVersion.toString)

  /** The build-time configuration of a documents store, from the catalog.
    * Also the fingerprint-ALGORITHM fence: every admit/append path reads
    * config through here, so a store whose `_fp` rows were hashed under a
    * different (or pre-versioning) fingerprint algorithm is rejected by
    * name before it can silently stop matching re-crawls. */
  def docConfig(spark: SparkSession, prefix: String): DocConfig = {
    val t = docsTable(prefix)
    val want = graft.operators.TextAnalysis.fingerprintAlgoVersion
    val got = CatalogProps.propOption(spark, t, "graft.fpAlgo")
    require(got.contains(want.toString),
      s"IndexStore: docs store '$prefix' was built with fingerprint " +
        s"algorithm version ${got.getOrElse("<unstamped, pre-v" + want + ">")} " +
        s"but this build computes version $want (NFC-first) — its _fp/" +
        "bloom rows would silently stop matching composition-variant " +
        "re-crawls. Rebuild the store (rebuildDocs) to re-fingerprint.")
    docConfigUnfenced(spark, prefix)
  }

  /** Raw config read WITHOUT the fingerprint-version fence — for the
    * rebuild path only, which exists precisely to migrate a store built
    * under an old fingerprint algorithm (rebuildDocs re-fingerprints the
    * corpus, so the fence would deadlock the one operation that fixes
    * the mismatch it rejects). */
  def docConfigUnfenced(spark: SparkSession, prefix: String): DocConfig = {
    val t = docsTable(prefix)
    DocConfig(prop(spark, t, "graft.ngram").toInt,
      prop(spark, t, "graft.numHashes").toInt,
      prop(spark, t, "graft.bands").toInt, prop(spark, t, "graft.spanK").toInt,
      prop(spark, t, "graft.buckets").toInt, prop(spark, t, "graft.bloomN").toLong,
      prop(spark, t, "graft.bloomFpp").toDouble)
  }

  /** Append an ADMITTED batch to the documents store: one delta-sized
    * bucketed append per table, hashed under the store's own recorded
    * config. Call only with the admitted output of an admission run
    * against this store — that is what makes appended ≡ rebuilt hold. */
  def appendDocs(admitted: DataFrame, id: Column, text: Column,
                 prefix: String): Unit = {
    val spark = admitted.sparkSession
    val cfg = docConfig(spark, prefix)
    val docs = admitted.select(id.as("doc_id"), text.as("text"))
    // an all-rejected batch appends nothing: skip the four table writes
    // (file-count hygiene) and the bloom merge (stat.bloomFilter over
    // zero rows yields a null sketch buffer)
    if (docs.isEmpty) return
    Bucketing.appendBucketed(docs, docsTable(prefix), Seq("doc_id"), cfg.buckets)
    val deltaFp = Dedup.admissionIndex(docs, col("text"))
    Bucketing.appendBucketed(deltaFp, fpTable(prefix), Seq("fp"), cfg.buckets)
    // merge the delta into the persisted bloom: same provisioned
    // (n, fpp) -> compatible mergeInPlace. Skipping this would be a
    // CORRECTNESS bug for the next batch, not a perf trade — a bloom
    // miss is taken as "definitively new" with no confirm join, so a
    // re-crawl of a just-appended doc would sail through.
    // SELF-HEAL covers BOTH stale-filter shapes an interrupted
    // rebuildDocs can leave behind: a filter provisioned under the old
    // config next to new-config properties (mergeInPlace throws
    // IncompatibleMergeException — caught directly rather than inferred
    // from bit size, since equal bit counts can still carry different
    // hash counts), and a MISSING filter (crash inside the bloom
    // directory swap). Either way the filter is rebuilt from the
    // just-appended fp index at the recorded provisioning — one
    // fixed-width scan, and the rebuilt filter already covers the delta.
    val delta = Dedup.admissionBloom(deltaFp, cfg.bloomN, cfg.bloomFpp)
    def rebuilt(why: String): BloomFilter = {
      System.err.println(
        s"[graft] appendDocs: $why (stale state from an interrupted " +
          "rebuild?) — rebuilding the persisted bloom from the fp index")
      Dedup.admissionBloom(spark.table(fpTable(prefix)), cfg.bloomN, cfg.bloomFpp)
    }
    val next =
      if (!bloomExists(spark, prefix)) rebuilt("no persisted bloom filter")
      else {
        val persisted = readBloom(spark, prefix)
        try { persisted.mergeInPlace(delta); persisted }
        catch { case e: IncompatibleMergeException =>
          rebuilt(s"persisted bloom incompatible with the provisioned delta (${e.getMessage})")
        }
      }
    writeBloom(spark, prefix, next)
    Bucketing.appendBucketed(
      Dedup.minhashIndex(docs, col("doc_id"), col("text"),
        cfg.ngram, cfg.numHashes, cfg.bands),
      mhTable(prefix), Seq("band", "sig"), cfg.buckets)
    Bucketing.appendBucketed(
      Dedup.spanIndex(docs, col("doc_id"), col("text"), cfg.spanK),
      spanTable(prefix), Seq("wh"), cfg.buckets)
  }

  /** Re-derive every index of a documents store from its own `_docs`
    * table under a NEW configuration — the docs-path twin of
    * [[rebuildVecs]], and the answer to the docs store's two decay
    * modes: the persisted bloom filling past its provisioned capacity
    * (fpp degrades → confirm-join volume grows) and a band/spanK choice
    * tuned for the build corpus losing selectivity as appends grow it.
    * `cfg.bloomN = 0` re-provisions the bloom against the CURRENT
    * corpus (4× headroom — the same rule as first build, at the new
    * size).
    *
    * The rebuild goes through a TEMP PREFIX (`<prefix>__rebuild`): a
    * full [[buildDocs]] of the current corpus into the temp store, then
    * a per-table drop + RENAME swap plus a bloom-directory move —
    * nothing replaces the live store until the replacement is fully
    * written. A crash mid-swap is recovered by the next call: a missing
    * live table with its temp present finishes the rename instead of
    * rebuilding (config properties travel with the renamed `_docs`). */
  def rebuildDocs(spark: SparkSession, prefix: String, cfg: DocConfig): Unit = {
    val tmpPrefix = s"${prefix}__rebuild"
    val tables: Seq[String => String] =
      Seq(docsTable _, fpTable _, mhTable _, spanTable _)
    if (spark.catalog.tableExists(docsTable(prefix))) {
      dropDocs(spark, tmpPrefix)
      buildDocs(spark.table(docsTable(prefix)), col("doc_id"), col("text"),
        tmpPrefix, cfg)
    } else require(spark.catalog.tableExists(docsTable(tmpPrefix)),
      s"neither $prefix nor $tmpPrefix holds a docs table — nothing to rebuild or recover")
    tables.foreach { t =>
      if (spark.catalog.tableExists(t(tmpPrefix))) {
        dropTable(spark, t(prefix))
        spark.sql(s"ALTER TABLE ${t(tmpPrefix)} RENAME TO ${t(prefix)}")
      }
    }
    // Move the rebuilt bloom into place. Rename the LIVE directory aside
    // before renaming the temp in — never delete-then-rename: a crash in
    // that window would leave the store with NO bloom at all, and the
    // appendDocs missing-filter self-heal is a recovery path, not the
    // protocol. With the aside swap every crash point leaves either the
    // old or the new filter readable (a crash between the two renames
    // leaves the temp dir, which the next rebuild/recovery call moves
    // in; appendDocs heals the interim).
    val fs = bloomPath(spark, prefix)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val liveDir = bloomPath(spark, prefix).getParent
    val tmpDir = bloomPath(spark, tmpPrefix).getParent
    val oldDir = new org.apache.hadoop.fs.Path(
      liveDir.getParent, liveDir.getName + "__old")
    if (fs.exists(oldDir)) fs.delete(oldDir, true) // prior crash leftover
    if (fs.exists(tmpDir)) {
      if (fs.exists(liveDir)) fs.rename(liveDir, oldDir)
      fs.rename(tmpDir, liveDir)
      if (fs.exists(oldDir)) fs.delete(oldDir, true)
    }
  }

  /** Compact every table of a documents store back to one sorted file
    * per bucket ([[Bucketing.compactTable]]) — the maintenance half of a
    * long-running loop: admission cost per batch is flat, but each
    * append leaves another file set per bucket, and scan overhead grows
    * with file count until a compaction folds it back. The span table is
    * an unmerged count-delta log, so its rewrite also folds `sum(n)` per
    * window hash (exchange-free — already bucketed on `wh`). Config
    * properties and the persisted bloom survive: the bloom is exact over
    * fingerprints, which compaction does not change. */
  def compactDocs(spark: SparkSession, prefix: String): Unit = {
    val cfg = docConfig(spark, prefix)
    Bucketing.compactTable(spark, docsTable(prefix), Seq("doc_id"), cfg.buckets)
    Bucketing.compactTable(spark, fpTable(prefix), Seq("fp"), cfg.buckets)
    Bucketing.compactTable(spark, mhTable(prefix), Seq("band", "sig"), cfg.buckets)
    Bucketing.compactTable(spark, spanTable(prefix), Seq("wh"), cfg.buckets,
      transform = _.groupBy("wh").agg(sum("n").as("n")))
    // the rewrite replaced the docs table wholesale; re-record its config
    setProps(spark, docsTable(prefix), docProps(cfg))
  }

  /** Compact both tables of a vectors store; same contract as
    * [[compactDocs]]. */
  def compactVecs(spark: SparkSession, prefix: String): Unit = {
    val cfg = vecConfig(spark, prefix)
    Bucketing.compactTable(spark, vecsTable(prefix), Seq("vec_id"), cfg.buckets)
    Bucketing.compactTable(spark, lshTable(prefix), Seq("band", "bucket"), cfg.buckets)
    if (spark.catalog.tableExists(pqTable(prefix))) {
      val ver = prop(spark, pqTable(prefix), "graft.pq.version")
      Bucketing.compactTable(spark, pqTable(prefix), Seq("vec_id"), cfg.buckets)
      setProps(spark, pqTable(prefix), Map("graft.pq.version" -> ver))
    }
    if (spark.catalog.tableExists(ivfPqTable(prefix))) {
      val iv = prop(spark, ivfPqTable(prefix), "graft.ivf.version")
      val pv = prop(spark, ivfPqTable(prefix), "graft.pq.version")
      Bucketing.compactTable(spark, ivfPqTable(prefix), Seq("centroid_id"), cfg.buckets)
      setProps(spark, ivfPqTable(prefix), Map(
        "graft.ivf.version" -> iv, "graft.pq.version" -> pv))
    }
    if (spark.catalog.tableExists(ivfrTable(prefix))) {
      val rv = prop(spark, ivfrTable(prefix), "graft.ivfr.version")
      Bucketing.compactTable(spark, ivfrTable(prefix), Seq("centroid_id"), cfg.buckets)
      setProps(spark, ivfrTable(prefix), Map("graft.ivfr.version" -> rv))
    }
    // the rewrites replaced the tables holding the config; re-record
    // (the compaction does not change what the index was hashed under)
    setProps(spark, lshTable(prefix), Map(
      "graft.nPlanes" -> cfg.nPlanes.toString,
      "graft.nTables" -> cfg.nTables.toString))
    setProps(spark, vecsTable(prefix), Map(
      "graft.nPlanes" -> cfg.nPlanes.toString,
      "graft.nTables" -> cfg.nTables.toString,
      "graft.buckets" -> cfg.buckets.toString))
  }

  /** Remove documents from the store by id — the takedown/right-to-erase
    * half of maintenance: after it, a re-crawl of a removed text is
    * ADMITTED again (nothing in the store remembers it), while every
    * admission decision about surviving documents is unchanged
    * (spec: removed-then-probed store ≡ store rebuilt without the
    * removed docs). Rewrites are [[Bucketing.compactTable]] passes with
    * the removal folded into the `transform`, so removal doubles as a
    * compaction: zero-shuffle bucket-local rewrites, one sorted file per
    * bucket after. The removal set is broadcast (a takedown batch is
    * operationally tiny next to the corpus; batch large backfills
    * through several calls if it ever isn't).
    *
    * Per-table semantics:
    *  - `_docs`, `_mh`: rows carry `doc_id` — plain anti-join.
    *  - `_fp`: rows are distinct fingerprints WITHOUT ids, and a build
    *    corpus may hold two docs with identical text collapsed onto one
    *    row — so forget a removed doc's fingerprint only if NO surviving
    *    doc shares it (one map-only fingerprint pass over survivors,
    *    semi-joined against the delta-sized removed-fp set).
    *  - `_span`: an unmerged count-delta log without ids — fold
    *    `sum(n)` per window hash (exchange-free on the `wh`-bucketed
    *    scan) and subtract the removed docs' own window counts,
    *    dropping hashes that reach zero. Shared windows survive with
    *    reduced counts, exactly the rebuild-without-removed state.
    *  - bloom: rebuilt from the rewritten `_fp` at the provisioned
    *    (n, fpp). A STALE bloom would still be CORRECT — a bloom
    *    positive is confirmed against `_fp` before rejection, so ghosts
    *    of removed docs only cost confirm-join work — but this pass
    *    already rewrote `_fp`, so refreshing is one fixed-width scan.
    *
    * Every removal-derived frame is pinned (`localCheckpoint`) BEFORE
    * the first table rewrite: their lazy plans read the very tables the
    * rewrites replace. Each is then broadcast only under a MEASURED
    * count guard (the [[Dedup.minhashIncrementalPairs]] pattern) — a
    * takedown batch is operationally tiny, but `rmSpan` is the removed
    * docs' span index (k-gram windows × doc length), which a
    * large-document backfill inflates far past the id count; above
    * `maxBroadcastRows` the hint is dropped and the rewrite degrades to
    * a shuffle join that completes instead of an 8 GB broadcast-cap /
    * driver-OOM failure. Counting is cheap: every frame is already an
    * eagerly materialized checkpoint. */
  def removeDocs(spark: SparkSession, prefix: String, ids: DataFrame,
                 maxBroadcastRows: Long = 1000L * 1000): Unit = {
    val cfg = docConfig(spark, prefix)
    def guarded(df: DataFrame, what: String): DataFrame =
      if (df.count() <= maxBroadcastRows) broadcast(df)
      else {
        System.err.println(
          s"[graft] removeDocs: $what exceeds $maxBroadcastRows rows — " +
            "dropping the broadcast hint; the table rewrite degrades to a " +
            "shuffle join (correct, no longer bucket-local)")
        df
      }
    val rm = guarded(ids
      .select(col(ids.columns.head).cast("long").as("doc_id"))
      .distinct().localCheckpoint(true), "removal id set")
    if (rm.isEmpty) return
    val removedDocs = spark.table(docsTable(prefix))
      .join(rm, Seq("doc_id"), "left_semi").localCheckpoint(true)
    val removedFps = guarded(
      Dedup.admissionIndex(removedDocs, col("text")).localCheckpoint(true),
      "removed fingerprint set")
    val survivorShared = spark.table(docsTable(prefix))
      .join(rm, Seq("doc_id"), "left_anti")
      .select(Dedup.textFingerprint(col("text")).as("fp"))
      .join(removedFps, Seq("fp"), "left_semi").distinct()
    val fpForget = guarded(removedFps
      .join(survivorShared, Seq("fp"), "left_anti").localCheckpoint(true),
      "forgettable fingerprint set")
    val rmSpan = guarded(
      Dedup.spanIndex(removedDocs, col("doc_id"), col("text"), cfg.spanK)
        .withColumnRenamed("n", "n_rm").localCheckpoint(true),
      "removed span index")
    Bucketing.compactTable(spark, docsTable(prefix), Seq("doc_id"), cfg.buckets,
      transform = _.join(rm, Seq("doc_id"), "left_anti"))
    Bucketing.compactTable(spark, fpTable(prefix), Seq("fp"), cfg.buckets,
      transform = _.join(fpForget, Seq("fp"), "left_anti"))
    Bucketing.compactTable(spark, mhTable(prefix), Seq("band", "sig"), cfg.buckets,
      transform = _.join(rm, Seq("doc_id"), "left_anti"))
    Bucketing.compactTable(spark, spanTable(prefix), Seq("wh"), cfg.buckets,
      transform = _.groupBy("wh").agg(sum("n").as("n"))
        .join(rmSpan, Seq("wh"), "left")
        .select(col("wh"),
          (col("n") - coalesce(col("n_rm"), lit(0L))).as("n"))
        .filter(col("n") > 0))
    // the docs-table rewrite replaced the table holding the config
    setProps(spark, docsTable(prefix), docProps(cfg))
    writeBloom(spark, prefix, Dedup.admissionBloom(
      spark.table(fpTable(prefix)), cfg.bloomN, cfg.bloomFpp))
  }

  /** Remove vectors from the store by id; same contract and mechanics as
    * [[removeDocs]] — both tables carry `vec_id`, so both rewrites are a
    * plain anti-join folded into a compaction pass, and there is no
    * bloom to refresh. The removal set gets the same measured-count
    * broadcast guard. */
  def removeVecs(spark: SparkSession, prefix: String, ids: DataFrame,
                 maxBroadcastRows: Long = 1000L * 1000): Unit = {
    val cfg = vecConfig(spark, prefix)
    val rmBase = ids
      .select(col(ids.columns.head).cast("long").as("vec_id"))
      .distinct().localCheckpoint(true)
    val rm =
      if (rmBase.count() <= maxBroadcastRows) broadcast(rmBase)
      else {
        System.err.println(
          s"[graft] removeVecs: removal id set exceeds $maxBroadcastRows rows — " +
            "dropping the broadcast hint (shuffle fallback)")
        rmBase
      }
    if (rm.isEmpty) return
    Bucketing.compactTable(spark, vecsTable(prefix), Seq("vec_id"), cfg.buckets,
      transform = _.join(rm, Seq("vec_id"), "left_anti"))
    Bucketing.compactTable(spark, lshTable(prefix), Seq("band", "bucket"), cfg.buckets,
      transform = _.join(rm, Seq("vec_id"), "left_anti"))
    if (spark.catalog.tableExists(pqTable(prefix))) {
      val ver = prop(spark, pqTable(prefix), "graft.pq.version")
      Bucketing.compactTable(spark, pqTable(prefix), Seq("vec_id"), cfg.buckets,
        transform = _.join(rm, Seq("vec_id"), "left_anti"))
      setProps(spark, pqTable(prefix), Map("graft.pq.version" -> ver))
    }
    if (spark.catalog.tableExists(ivfPqTable(prefix))) {
      val iv = prop(spark, ivfPqTable(prefix), "graft.ivf.version")
      val pv = prop(spark, ivfPqTable(prefix), "graft.pq.version")
      Bucketing.compactTable(spark, ivfPqTable(prefix), Seq("centroid_id"), cfg.buckets,
        transform = _.join(rm, Seq("vec_id"), "left_anti"))
      setProps(spark, ivfPqTable(prefix), Map(
        "graft.ivf.version" -> iv, "graft.pq.version" -> pv))
    }
    if (spark.catalog.tableExists(ivfrTable(prefix))) {
      val rv = prop(spark, ivfrTable(prefix), "graft.ivfr.version")
      Bucketing.compactTable(spark, ivfrTable(prefix), Seq("centroid_id"), cfg.buckets,
        transform = _.join(rm, Seq("vec_id"), "left_anti"))
      setProps(spark, ivfrTable(prefix), Map("graft.ivfr.version" -> rv))
    }
    setProps(spark, lshTable(prefix), Map(
      "graft.nPlanes" -> cfg.nPlanes.toString,
      "graft.nTables" -> cfg.nTables.toString))
    setProps(spark, vecsTable(prefix), Map(
      "graft.nPlanes" -> cfg.nPlanes.toString,
      "graft.nTables" -> cfg.nTables.toString,
      "graft.buckets" -> cfg.buckets.toString))
  }

  /** Build the vectors store. `nPlanes = 0` auto-provisions from the
    * measured `log2(N)+1` rule against the BUILD corpus size and records
    * the resolved value, so every later append and probe agrees. */
  def buildVecs(corpus: DataFrame, id: Column, vec: Column, prefix: String,
                nPlanes: Int = 0, nTables: Int = 4, buckets: Int = 32): Unit = {
    val spark = corpus.sparkSession
    val prep = Similarity.prepared(corpus, id, vec)
    val planes =
      if (nPlanes > 0) nPlanes
      else math.max(8, Similarity.lshAutoPlanes(math.max(1L, prep.count())))
    Bucketing.writeBucketed(prep, vecsTable(prefix), Seq("vec_id"), buckets)
    Bucketing.writeBucketed(Similarity.lshIndex(prep, planes, nTables),
      lshTable(prefix), Seq("band", "bucket"), buckets)
    // the plane config ALSO lives on the lsh table itself (authoritative
    // — see vecConfig): the index and the config describing it then
    // travel together through any drop/rename swap, so no crash window
    // can pair an index with a mismatched recorded config
    setProps(spark, lshTable(prefix), Map(
      "graft.nPlanes" -> planes.toString,
      "graft.nTables" -> nTables.toString))
    setProps(spark, vecsTable(prefix), Map(
      "graft.nPlanes" -> planes.toString,
      "graft.nTables" -> nTables.toString,
      "graft.buckets" -> buckets.toString))
  }

  /** Re-derive the LSH index of a vectors store from its own `_vecs`
    * table under a NEW plane/table configuration — the re-provisioning
    * path the store's scale story depends on: bucket selectivity decays
    * once appends grow the corpus past ~2× the build-time size (the
    * plane count was auto-provisioned against the BUILD corpus), and the
    * standard LSH answer is a rebuild at the new size. Without this
    * helper a user had to hand-orchestrate drop + re-read + re-write and
    * got the config-properties bookkeeping wrong for free.
    *
    * `nPlanes = 0` re-runs the `log2(N)+1` auto-provisioning rule
    * against the CURRENT corpus count (the whole point of the call);
    * `nTables = 0` keeps the store's recorded value. Only `_lsh` is
    * rewritten — `_vecs` rows are config-independent.
    *
    * Swap is write-aside + drop + RENAME (the [[Bucketing.compactTable]]
    * protocol): the new index is fully written before the old one goes,
    * and a crash between drop and rename is recovered by the next call
    * (missing `_lsh` + present temp → finish the rename, skip the
    * rewrite). The plane config is recorded ON THE TEMP INDEX before
    * anything is dropped and travels through the rename, so the
    * recovered index always carries the config it was actually hashed
    * under — a recovery call's own (possibly different) arguments
    * cannot be mis-recorded against the crashed call's index. Readers
    * planned against the old table must re-resolve. */
  def rebuildVecs(spark: SparkSession, prefix: String,
                  nPlanes: Int = 0, nTables: Int = 0): Unit = {
    val cfg = vecConfig(spark, prefix)
    val lsh = lshTable(prefix)
    val tmp = s"${lsh}__rebuild"
    if (spark.catalog.tableExists(lsh)) {
      val prep = spark.table(vecsTable(prefix))
      val planes =
        if (nPlanes > 0) nPlanes
        else math.max(8, Similarity.lshAutoPlanes(math.max(1L, prep.count())))
      val tables = if (nTables > 0) nTables else cfg.nTables
      dropTable(spark, tmp)
      // repartition on the bucket key (same Murmur3-mod-buckets hash the
      // bucket spec uses) so each write task holds exactly one bucket and
      // the rebuilt index lands compact: one sorted file per bucket
      Bucketing.writeBucketed(
        Similarity.lshIndex(prep, planes, tables)
          .repartition(cfg.buckets, col("band"), col("bucket")),
        tmp, Seq("band", "bucket"), cfg.buckets)
      setProps(spark, tmp, Map(
        "graft.nPlanes" -> planes.toString,
        "graft.nTables" -> tables.toString))
      dropTable(spark, lsh)
    } else require(spark.catalog.tableExists(tmp),
      s"neither $lsh nor $tmp exists — store '$prefix' has no LSH index to rebuild")
    spark.sql(s"ALTER TABLE $tmp RENAME TO $lsh")
    // mirror the renamed index's own recorded config onto _vecs (legacy
    // location) — read back from the index, never from this call's args
    setProps(spark, vecsTable(prefix), Map(
      "graft.nPlanes" -> prop(spark, lsh, "graft.nPlanes"),
      "graft.nTables" -> prop(spark, lsh, "graft.nTables"),
      "graft.buckets" -> cfg.buckets.toString))
  }

  /** The build-time configuration of a vectors store, from the catalog.
    * Plane/table counts prefer the `_lsh` table's OWN properties (written
    * at build/rebuild time, inseparable from the index data through any
    * rename swap); stores written before those existed fall back to the
    * `_vecs` mirror. Buckets always come from `_vecs`. */
  def vecConfig(spark: SparkSession, prefix: String): VecConfig = {
    val t = vecsTable(prefix)
    val lsh = lshTable(prefix)
    def lshProp(key: String): Option[String] =
      if (!spark.catalog.tableExists(lsh)) None
      else spark.sql(s"SHOW TBLPROPERTIES $lsh")
        .filter(col("key") === key).collect().headOption.map(_.getString(1))
    VecConfig(
      lshProp("graft.nPlanes").getOrElse(prop(spark, t, "graft.nPlanes")).toInt,
      lshProp("graft.nTables").getOrElse(prop(spark, t, "graft.nTables")).toInt,
      prop(spark, t, "graft.buckets").toInt)
  }

  /** Append an ADMITTED vector batch to the vectors store, hashed under
    * the store's recorded (nPlanes, nTables). */
  def appendVecs(admitted: DataFrame, id: Column, vec: Column,
                 prefix: String): Unit = {
    val spark = admitted.sparkSession
    val cfg = vecConfig(spark, prefix)
    // EVERY sidecar's version fence is validated BEFORE the first write:
    // a stale sidecar (rebuildPq without buildIvf, or a crash window)
    // must fail the append whole, not after _vecs/_lsh/_pq already took
    // the batch — a half-applied append makes the natural retry
    // double-insert into the tables that did succeed
    val model =
      if (spark.catalog.tableExists(pqTable(prefix)))
        Some(loadPqModel(spark, prefix))
      else None
    val hasIvf = spark.catalog.tableExists(ivfPqTable(prefix))
    // the IVF-PQ sidecar encodes with the PQ codebooks, so `_ivfpq`
    // without `_pq` (a dropped/half-removed PQ sidecar) cannot take this
    // batch — fail the WHOLE append before any table writes, rather than
    // appending `_vecs` while the IVF sidecar silently goes stale
    require(!hasIvf || model.isDefined,
      s"appendVecs: store '$prefix' has an ${ivfPqTable(prefix)} sidecar " +
        s"but no ${pqTable(prefix)} codebook table — the IVF-PQ sidecar " +
        "cannot encode this batch; re-provision with buildPq + buildIvf " +
        "(or remove the stale sidecar) before appending")
    val cents =
      if (hasIvf)
        Some(loadIvfCentroids(spark, prefix)
          .orderBy(col("centroid_id"))
          .collect().map(_.getSeq[Double](1).toSeq).toSeq)
      else None
    // the residual sidecar's fence is likewise validated up front: its
    // model/centroids/codes stamps must agree before ANY table writes.
    // Trigger on ANY of the family's tables — checking only `_ivfr`
    // would let a buildIvfResidual that crashed between its codes-drop
    // and rename (model+centroids present, codes absent) take appends
    // with no sidecar rows; after the natural rename-recovery the three
    // stamps would AGREE and the staleness would be undetectable forever
    val ivfr =
      if (Seq(ivfrTable(prefix), ivfrModelTable(prefix), ivfrCentTable(prefix))
          .exists(spark.catalog.tableExists))
        Some(loadIvfResidual(spark, prefix))
      else None
    val prep = Similarity.prepared(admitted, id, vec)
    if (prep.isEmpty) return // all-rejected batch: nothing to append
    Bucketing.appendBucketed(prep, vecsTable(prefix), Seq("vec_id"), cfg.buckets)
    Bucketing.appendBucketed(
      Similarity.lshIndex(prep, cfg.nPlanes, cfg.nTables),
      lshTable(prefix), Seq("band", "bucket"), cfg.buckets)
    // a provisioned PQ sidecar stays in lockstep: the batch is encoded
    // with the STORED codebooks (appends never retrain — codebook drift
    // is answered by rebuildPq, the same trade as the LSH plane rule)
    model.foreach { m =>
      Bucketing.appendBucketed(
        graft.operators.PqCodec.encode(prep, m),
        pqTable(prefix), Seq("vec_id"), cfg.buckets)
      // and so does the IVF-PQ sidecar: the batch is ASSIGNED with the
      // STORED centroids (a pure projection — rows and probes keep
      // agreeing on one quantizer; drift is answered by re-running
      // buildIvf, never by silently re-clustering under an append)
      cents.foreach { cs =>
        Bucketing.appendBucketed(
          prep.select(col("vec_id"),
            graft.functions.VectorExpressions
              .nearestCentroid(col("vec"), cs).as("centroid_id"),
            graft.functions.VectorExpressions
              .pqEncode(col("vec"), m.codebooks).as("code")),
          ivfPqTable(prefix), Seq("centroid_id"), cfg.buckets)
      }
    }
    // the residual sidecar keeps ITS lockstep independently of `_pq`:
    // assign with the stored coarse centroids, encode residuals with the
    // stored residual codebooks — both pure projections
    ivfr.foreach { case (rm, rCentroids) =>
      val rCents = rCentroids.orderBy(col("centroid_id"))
        .collect().map(_.getSeq[Double](1).toSeq).toSeq
      val assigned = prep
        .select(col("*"), posexplode_outer(array(
            graft.functions.VectorExpressions.nearestCentroid(col("vec"), rCents)))
          .as(Seq("__p", "centroid_id")))
        .drop("__p")
      Bucketing.appendBucketed(
        graft.operators.PqCodec.encodeResidual(assigned, rCentroids, rm),
        ivfrTable(prefix), Seq("centroid_id"), cfg.buckets)
    }
  }

  // -------------------------------------------------------------------
  // PQ codes sidecar: the 32×-smaller probe surface of a vectors store
  // -------------------------------------------------------------------
  // `<prefix>_pq` (vec_id, code: binary; bucketed by vec_id like
  // `_vecs`) plus the tiny `<prefix>_pq_model` codebook table. Once
  // provisioned, ANN probes scan CODE BYTES instead of float vectors
  // ([[searchPq]] → [[graft.operators.PqCodec.topKFromCodesFetch]]:
  // ADC candidates off `_pq`, exact re-rank fetching survivors from
  // `_vecs` by key) and every maintenance verb keeps the sidecar in
  // lockstep: append encodes with the stored codebooks, compaction and
  // takedown rewrite it bucket-locally with the other tables, and
  // [[rebuildPq]] is the re-provisioning verb when the corpus drifts
  // from the training sample. Model/codes consistency across crashes is
  // fenced by a shared version id recorded on both tables: a crash
  // between the two swaps leaves a version mismatch that [[loadPqModel]]
  // rejects by name instead of silently decoding with foreign codebooks.

  /** Provision the PQ sidecar from the store's own `_vecs`: codebooks
    * train on a ≤`sampleMax` systematic sample (published practice —
    * training must not scale with the corpus), the full corpus encodes
    * in one projection pass. */
  def buildPq(spark: SparkSession, prefix: String, m: Int = 16,
              ks: Int = 16, sampleMax: Long = 100000L): Unit =
    buildPqSwap(spark, prefix, m, ks, sampleMax)

  /** Retrain + re-encode against the CURRENT corpus — the
    * re-provisioning verb, for when appends have drifted the corpus away
    * from the build-time training sample. `m = 0` / `ks = 0` keep the
    * stored geometry. Swap order: new model first (new version id), then
    * codes write-aside + drop + rename; a crash between them leaves a
    * version mismatch that [[loadPqModel]] rejects with the re-run
    * instruction, never a silent codebook/codes mismatch. */
  def rebuildPq(spark: SparkSession, prefix: String, m: Int = 0,
                ks: Int = 0, sampleMax: Long = 100000L): Unit = {
    val stored = loadPqModelUnchecked(spark, prefix)
    buildPqSwap(spark, prefix,
      if (m > 0) m else stored.m, if (ks > 0) ks else stored.ks, sampleMax)
  }

  private def buildPqSwap(spark: SparkSession, prefix: String, m: Int,
                          ks: Int, sampleMax: Long): Unit = {
    val cfg = vecConfig(spark, prefix)
    val prep = spark.table(vecsTable(prefix))
    val n = math.max(1L, prep.count())
    val step = math.max(1L, n / sampleMax)
    val sample = prep.filter(pmod(col("vec_id"), lit(step)) === 0)
    val model = graft.operators.PqCodec.train(sample, m, ks)
    val version = java.util.UUID.nameUUIDFromBytes(
      s"$prefix:$m:$ks:$n:${model.cn2.sum}".getBytes("UTF-8")).toString
    writePqModel(spark, pqModelTable(prefix), model, version)
    val pq = pqTable(prefix)
    val tmp = s"${pq}__rebuild"
    dropTable(spark, tmp)
    Bucketing.writeBucketed(
      graft.operators.PqCodec.encode(prep, model)
        .repartition(cfg.buckets, col("vec_id")),
      tmp, Seq("vec_id"), cfg.buckets)
    setProps(spark, tmp, Map("graft.pq.version" -> version))
    dropTable(spark, pq)
    spark.sql(s"ALTER TABLE $tmp RENAME TO $pq")
  }

  private def writePqModel(spark: SparkSession, table: String,
                           model: graft.operators.PqCodec.PqModel,
                           version: String): Unit = {
    import spark.implicits._
    model.codebooks.zipWithIndex
      .map { case (cb, j) => (j, cb) }
      .toDF("sub", "cb")
      .write.mode("overwrite").format("parquet").saveAsTable(table)
    setProps(spark, table, Map(
      "graft.pq.m" -> model.m.toString,
      "graft.pq.ks" -> model.ks.toString,
      "graft.pq.version" -> version))
  }

  private def loadPqModelUnchecked(spark: SparkSession,
                                   prefix: String): graft.operators.PqCodec.PqModel = {
    val t = pqModelTable(prefix)
    val m = prop(spark, t, "graft.pq.m").toInt
    val ks = prop(spark, t, "graft.pq.ks").toInt
    val rows = spark.table(t).orderBy(col("sub")).collect()
    require(rows.length == m, s"PQ model table $t holds ${rows.length} subspaces, expected $m")
    val cbs = rows.map(_.getSeq[Double](1))
    val dsub = cbs.head.length / ks
    graft.operators.PqCodec.PqModel(m, ks, dsub, cbs.toSeq)
  }

  /** Load the stored codebooks, fencing the model/codes version pair: a
    * mismatch (crashed [[rebuildPq]] between its two swaps) fails by
    * name with the recovery instruction. */
  def loadPqModel(spark: SparkSession, prefix: String): graft.operators.PqCodec.PqModel = {
    val mv = prop(spark, pqModelTable(prefix), "graft.pq.version")
    val cv = prop(spark, pqTable(prefix), "graft.pq.version")
    require(mv == cv,
      s"PQ model/codes version mismatch for store '$prefix' ($mv vs $cv) — " +
        s"a rebuildPq crashed between its model and codes swaps; " +
        s"re-run IndexStore.rebuildPq to restore consistency")
    loadPqModelUnchecked(spark, prefix)
  }

  /** ANN top-k against the store through the PQ sidecar: ADC candidate
    * generation scans `_pq` (32× fewer bytes than `_vecs`), exact
    * re-rank fetches only the driver-bounded survivors from `_vecs` by
    * key ([[graft.operators.PqCodec.topKFromCodesFetch]]). */
  def searchPq(spark: SparkSession, prefix: String, queries: DataFrame,
               k: Int, rerank: Int = 10): DataFrame = {
    val model = loadPqModel(spark, prefix)
    graft.operators.PqCodec.topKFromCodesFetch(
      spark.table(pqTable(prefix)), spark.table(vecsTable(prefix)),
      queries, k, model, rerank)
  }

  // -------------------------------------------------------------------
  // IVF-PQ sidecar: list-pruned probing over the persisted codes
  // -------------------------------------------------------------------
  // [[searchPq]]'s flat ADC still SCANS every code row; at corpus scale
  // the probe cost is that scan. The IVF sidecar stores the codes AGAIN
  // under a coarse-quantizer layout — `<prefix>_ivfpq` (vec_id,
  // centroid_id, code), bucketed AND sorted by `centroid_id`, plus the
  // tiny `<prefix>_ivfc` centroid table — so a probe's nProbe nearest
  // lists become a LITERAL IN filter that prunes buckets and row groups:
  // the probe reads ~nProbe/kLists of the code bytes instead of all of
  // them ([[searchIvfPq]]). Duplicating the 16-byte codes (not the
  // vectors) costs 1/64th of the vector table — the standard price of a
  // second index layout.
  //
  // Consistency contract: the sidecar is fenced to BOTH its own build
  // version (shared by `_ivfc` and `_ivfpq` — a crash between their
  // swaps is a version mismatch, named at load) and the PQ model
  // version it encoded under (a `rebuildPq` invalidates the sidecar by
  // mismatch — re-run [[buildIvf]]). Appends stay in lockstep CHEAPLY:
  // the batch is assigned with the STORED centroids (a pure projection —
  // probes and rows keep agreeing on the same quantizer; centroid drift
  // under heavy append is answered by re-running buildIvf, the same
  // trade as the LSH plane rule and rebuildPq). Compaction and removal
  // rewrite it with the other tables.

  def ivfPqTable(prefix: String): String = s"${prefix}_ivfpq"
  def ivfCentTable(prefix: String): String = s"${prefix}_ivfc"

  /** Provision the IVF-PQ sidecar from the store's own `_vecs` (requires
    * the `_pq` sidecar's model — codes are re-derived by projection with
    * the stored codebooks, one scan). The coarse quantizer trains on a
    * ≤`sampleMax` systematic sample — the repo-wide convention
    * (buildPq, trainTwoLevel): Lloyd scans must not run at corpus
    * scale; the full corpus is touched only by the one-projection
    * assignment-and-encode pass that writes the sidecar. Swap order:
    * centroid table first (carrying the new version), then codes
    * write-aside + rename; any crash window leaves a version mismatch
    * that [[loadIvfCentroids]] names. */
  def buildIvf(spark: SparkSession, prefix: String, kLists: Int = 16,
               sampleMax: Long = 1000000L): Unit = {
    val cfg = vecConfig(spark, prefix)
    val model = loadPqModel(spark, prefix)
    val pqVer = prop(spark, pqTable(prefix), "graft.pq.version")
    val prep = spark.table(vecsTable(prefix))
    val n = math.max(1L, prep.count())
    val step = math.max(1L, n / sampleMax)
    val (_, centroids) = graft.operators.IvfIndex.build(
      prep.filter(pmod(col("vec_id"), lit(step)) === 0), kLists)
    val cents = centroids.orderBy(col("centroid_id"))
      .collect().map(_.getSeq[Double](1).toSeq).toSeq
    // full-corpus assignment as a projection, behind a Generate (the
    // IvfIndex.build double-eval guard)
    val assigned = prep
      .select(col("*"), posexplode_outer(array(
          graft.functions.VectorExpressions.nearestCentroid(col("vec"), cents)))
        .as(Seq("__p", "centroid_id")))
      .drop("__p")
    // content-derived version (the buildPqSwap convention): deterministic
    // for identical inputs, different whenever the quantizer changed
    val version = java.util.UUID.nameUUIDFromBytes(
      s"$prefix:ivf:$kLists:$pqVer:${
        centroids.agg(sum(col("cnorm"))).head().getDouble(0)}"
        .getBytes("UTF-8")).toString
    centroids.write.mode("overwrite").format("parquet")
      .saveAsTable(ivfCentTable(prefix))
    setProps(spark, ivfCentTable(prefix), Map(
      "graft.ivf.version" -> version, "graft.pq.version" -> pqVer,
      "graft.ivf.k" -> kLists.toString))
    val t = ivfPqTable(prefix)
    val tmp = s"${t}__rebuild"
    dropTable(spark, tmp)
    Bucketing.writeBucketed(
      assigned.select(col("vec_id"), col("centroid_id"),
          graft.functions.VectorExpressions
            .pqEncode(col("vec"), model.codebooks).as("code"))
        .repartition(cfg.buckets, col("centroid_id")),
      tmp, Seq("centroid_id"), cfg.buckets)
    setProps(spark, tmp, Map(
      "graft.ivf.version" -> version, "graft.pq.version" -> pqVer))
    dropTable(spark, t)
    spark.sql(s"ALTER TABLE $tmp RENAME TO $t")
  }

  /** Load the stored coarse quantizer, fencing every version pair: the
    * `_ivfc`/`_ivfpq` build versions must match (crash window), and both
    * must reference the CURRENT PQ model version (a rebuildPq leaves the
    * sidecar encoding with dead codebooks). */
  def loadIvfCentroids(spark: SparkSession, prefix: String): DataFrame = {
    val cv = prop(spark, ivfCentTable(prefix), "graft.ivf.version")
    val pv = prop(spark, ivfPqTable(prefix), "graft.ivf.version")
    require(cv == pv,
      s"IVF sidecar version mismatch for store '$prefix' ($cv vs $pv) — " +
        "a buildIvf crashed between its centroid and codes swaps; " +
        "re-run IndexStore.buildIvf")
    val pqNow = prop(spark, pqTable(prefix), "graft.pq.version")
    val pqAt = prop(spark, ivfCentTable(prefix), "graft.pq.version")
    require(pqNow == pqAt,
      s"IVF sidecar of store '$prefix' encodes under PQ model $pqAt but " +
        s"the store's model is now $pqNow (rebuildPq ran since) — " +
        "re-run IndexStore.buildIvf")
    spark.table(ivfCentTable(prefix))
  }

  /** List-pruned ANN top-k against the store: probed lists become a
    * literal IN on the `centroid_id`-bucketed `_ivfpq` scan (bucket +
    * row-group pruning — the probe reads ~nProbe/kLists of the code
    * bytes), ADC scores the survivors, exact re-rank key-fetches from
    * `_vecs` ([[graft.operators.PqCodec.ivfTopKFromCodesFetch]]). */
  def searchIvfPq(spark: SparkSession, prefix: String, queries: DataFrame,
                  k: Int, nProbe: Int = 1, rerank: Int = 10): DataFrame = {
    val model = loadPqModel(spark, prefix)
    val centroids = loadIvfCentroids(spark, prefix)
    graft.operators.PqCodec.ivfTopKFromCodesFetch(
      spark.table(ivfPqTable(prefix)), spark.table(vecsTable(prefix)),
      queries, centroids, k, model, nProbe, rerank)
  }

  // -------------------------------------------------------------------
  // IVFADC (residual) sidecar: true residual codes, persisted
  // -------------------------------------------------------------------
  // The `_ivfpq` sidecar above deliberately shares the `_pq` family's
  // global codebooks (one codes table serves flat AND list-pruned
  // probes). This family persists the OTHER point in that trade — true
  // IVFADC ([[graft.operators.PqCodec.trainResidual]]): codes quantize
  // per-list residuals with their OWN codebooks, buying measurably finer
  // quantization at the same 16-byte rate (ADC-only recall@5 0.32 vs
  // 0.24 at equal geometry on the sf0.1 corpus). Three tables, fully
  // self-contained (no `_pq` coupling — dropping the global sidecar
  // cannot strand this one):
  //   `<prefix>_ivfr`       (vec_id, centroid_id, code, crn) — bucketed
  //                         + sorted by centroid_id (list-pruned scans);
  //                         `crn` = ‖centroid + r̂‖ stored at encode time
  //                         (query-independent under cosine)
  //   `<prefix>_ivfr_model` residual codebooks
  //   `<prefix>_ivfrc`      coarse centroids
  // One content-derived version is recorded on all three; swap order is
  // model → centroids → codes (write-aside + rename), so any crash
  // window leaves a version mismatch that [[loadIvfResidual]] names.
  // Appends assign with the STORED centroids and encode with the STORED
  // codebooks (pure projections — drift is answered by re-running
  // [[buildIvfResidual]], never silent retraining); compaction and
  // removal rewrite the codes bucket-locally with the other tables.

  def ivfrTable(prefix: String): String = s"${prefix}_ivfr"
  def ivfrModelTable(prefix: String): String = s"${prefix}_ivfr_model"
  def ivfrCentTable(prefix: String): String = s"${prefix}_ivfrc"

  /** Provision the residual-IVFADC sidecar from the store's own `_vecs`:
    * coarse quantizer AND residual codebooks train on a ≤`sampleMax`
    * systematic sample (Lloyd never runs at corpus scale); the full
    * corpus is touched by one assignment+encode projection pass. */
  def buildIvfResidual(spark: SparkSession, prefix: String,
                       kLists: Int = 16, m: Int = 16, ks: Int = 16,
                       sampleMax: Long = 100000L): Unit = {
    val cfg = vecConfig(spark, prefix)
    val prep = spark.table(vecsTable(prefix))
    val n = math.max(1L, prep.count())
    val step = math.max(1L, n / sampleMax)
    val sample = prep.filter(pmod(col("vec_id"), lit(step)) === 0)
    val (_, centroids) = graft.operators.IvfIndex.build(sample, kLists)
    val cents = centroids.orderBy(col("centroid_id"))
      .collect().map(_.getSeq[Double](1).toSeq).toSeq
    def assignWith(df: DataFrame): DataFrame = df
      .select(col("*"), posexplode_outer(array(
          graft.functions.VectorExpressions.nearestCentroid(col("vec"), cents)))
        .as(Seq("__p", "centroid_id")))
      .drop("__p")
    val model = graft.operators.PqCodec.trainResidual(
      assignWith(sample), centroids, m, ks)
    val version = java.util.UUID.nameUUIDFromBytes(
      s"$prefix:ivfr:$kLists:$m:$ks:$n:${model.cn2.sum}:${
        centroids.agg(sum(col("cnorm"))).head().getDouble(0)}"
        .getBytes("UTF-8")).toString
    writePqModel(spark, ivfrModelTable(prefix), model, version)
    setProps(spark, ivfrModelTable(prefix),
      Map("graft.ivfr.version" -> version))
    centroids.write.mode("overwrite").format("parquet")
      .saveAsTable(ivfrCentTable(prefix))
    setProps(spark, ivfrCentTable(prefix), Map(
      "graft.ivfr.version" -> version, "graft.ivf.k" -> kLists.toString))
    val t = ivfrTable(prefix)
    val tmp = s"${t}__rebuild"
    dropTable(spark, tmp)
    Bucketing.writeBucketed(
      graft.operators.PqCodec.encodeResidual(assignWith(prep), centroids, model)
        .repartition(cfg.buckets, col("centroid_id")),
      tmp, Seq("centroid_id"), cfg.buckets)
    setProps(spark, tmp, Map("graft.ivfr.version" -> version))
    dropTable(spark, t)
    spark.sql(s"ALTER TABLE $tmp RENAME TO $t")
  }

  /** Load the residual sidecar's model + centroid table, fencing all
    * three version stamps: any pairwise mismatch is a crash window of
    * [[buildIvfResidual]] (or a half-dropped family) and fails by name
    * with the re-run instruction. */
  def loadIvfResidual(spark: SparkSession,
                      prefix: String): (graft.operators.PqCodec.PqModel, DataFrame) = {
    val missing = Seq(ivfrTable(prefix), ivfrModelTable(prefix),
      ivfrCentTable(prefix)).filterNot(spark.catalog.tableExists)
    require(missing.isEmpty,
      s"IVFADC sidecar of store '$prefix' is half-dropped — missing " +
        s"${missing.mkString(", ")}; re-run IndexStore.buildIvfResidual " +
        "(or drop the remaining tables) before probing or appending")
    val mv = prop(spark, ivfrModelTable(prefix), "graft.ivfr.version")
    val cv = prop(spark, ivfrCentTable(prefix), "graft.ivfr.version")
    val kv = prop(spark, ivfrTable(prefix), "graft.ivfr.version")
    require(mv == cv && cv == kv,
      s"IVFADC sidecar version mismatch for store '$prefix' " +
        s"(model $mv / centroids $cv / codes $kv) — a buildIvfResidual " +
        "crashed between its swaps; re-run IndexStore.buildIvfResidual")
    val t = ivfrModelTable(prefix)
    val m = prop(spark, t, "graft.pq.m").toInt
    val ks = prop(spark, t, "graft.pq.ks").toInt
    val rows = spark.table(t).orderBy(col("sub")).collect()
    require(rows.length == m,
      s"residual model table $t holds ${rows.length} subspaces, expected $m")
    val cbs = rows.map(_.getSeq[Double](1))
    (graft.operators.PqCodec.PqModel(m, ks, cbs.head.length / ks, cbs.toSeq),
      spark.table(ivfrCentTable(prefix)))
  }

  /** List-pruned ANN top-k through the RESIDUAL sidecar
    * ([[graft.operators.PqCodec.ivfResidualTopKFromCodes]]): probed
    * lists become a literal IN on the `centroid_id`-bucketed `_ivfr`
    * scan, one residual LUT per query serves every probed list (the
    * cosine decomposition), stored `crn` replaces any per-row norm
    * derivation, exact re-rank key-fetches from `_vecs`. */
  def searchIvfResidual(spark: SparkSession, prefix: String,
                        queries: DataFrame, k: Int, nProbe: Int = 1,
                        rerank: Int = 10): DataFrame = {
    val (model, centroids) = loadIvfResidual(spark, prefix)
    graft.operators.PqCodec.ivfResidualTopKFromCodes(
      spark.table(ivfrTable(prefix)), spark.table(vecsTable(prefix)),
      queries, centroids, k, model, nProbe, rerank)
  }
}
