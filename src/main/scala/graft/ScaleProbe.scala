package graft

import graft.operators.{Dedup, Similarity}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale-up probe: generates synthetic corpora 10-100x the sf0.1 document
  * count (with planted near-duplicates) and times MinHash-LSH end-to-end,
  * to show the dedup path scales linearly in corpus size rather than
  * quadratically in pairs; plus an ANN probe timing quantized-code top-k
  * against full-precision brute force on the same synthetic vectors.
  * Usage: runMain graft.ScaleProbe [sizes...]
  * SPARK_GRAFT_PROBES=minhash,ann,ivf,emb selects a probe subset.
  */
object ScaleProbe {
  /** The probes' shared synthetic embedding corpus: n deterministic
    * 64-dim vectors plus one planted near-twin (v + 0.01·reverse(v),
    * cosine ≈ 0.9999, id + n) per 100 vectors — one definition so the
    * semdedup / semdedup_ivf / semdedup_hier probes can never drift
    * onto different corpora. */
  private def synthTwinVectors(spark: SparkSession, n: Int) = {
    val baseV = spark.range(0L, n.toLong, 1L, math.max(32, n / 250000))
      .select(col("id").as("vec_id"),
        transform(sequence(lit(0), lit(63)),
          i => (pmod(xxhash64(col("id"), i), lit(1000)).cast("double") - 500.0)
            / 500.0).as("vec"))
    val twinsV = baseV.filter(pmod(col("vec_id"), lit(100)) === 0)
      .select((col("vec_id") + n).as("vec_id"),
        zip_with(col("vec"), reverse(col("vec")),
          (x, y) => x + y * lit(0.01)).as("vec"))
    baseV.unionByName(twinsV)
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    val children = f.listFiles()
    if (children != null) children.foreach(deleteRecursively)
    f.delete()
  }

  def main(args: Array[String]): Unit = {
    val sizes = if (args.nonEmpty) args.map(_.toInt).toSeq
                else Seq(5000, 50000, 200000)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val want = sys.env.get("SPARK_GRAFT_PROBES")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    def on(p: String): Boolean = want.forall(_.contains(p))
    val spark = GraftSession.local(cpus)
    // warm the session so the smallest corpus isn't charged JVM startup
    spark.range(1000000).selectExpr("sum(id)").collect()

    val vocab = Seq("spark", "data", "engine", "query", "row", "batch",
      "join", "scan", "hash", "sort", "merge", "fast", "slow", "table",
      "key", "value", "stream", "window", "group", "filter")
    val vocabCol = typedLit(vocab)

    sizes.foreach { n =>
      // deterministic 60-token docs; doc i with i%100==1 shares its base
      // text with doc i-1 plus a suffix => one planted near-dup pair per
      // hundred docs (shingle jaccard ≈ 0.95)
      val gid = col("id") -
        when(pmod(col("id"), lit(100)) === 1, 1L).otherwise(0L)
      val docs = spark.range(n.toLong)
        .select(col("id").as("doc_id"),
          concat_ws(" ", transform(sequence(lit(0), lit(59)),
            i => element_at(vocabCol,
              (pmod(xxhash64(gid, i), lit(vocab.size)) + 1).cast("int")))).as("text"))
        .withColumn("text",
          when(pmod(col("doc_id"), lit(100)) === 1,
            concat(col("text"), lit(" extra"))).otherwise(col("text")))
      if (on("minhash")) {
      docs.cache().count()
      val t0 = System.nanoTime()
      val pairs = Dedup.minhashLshPairs(docs, col("doc_id"), col("text")).count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"""{"metric":"minhash_lsh_scale","docs":$n,"sec":$sec%.2f,"pairs":$pairs}""")

      // Skew probe: same corpus size, but 20% of rows are ONE identical
      // document. Without the exact-collapse guard every band bucket would
      // hold the whole cluster (candidate pairs ~ bands x (n/5)^2); with it,
      // runtime should stay in the same ballpark as the uniform corpus
      // while the output contains the full C(n/5, 2) duplicate pairs.
      // SPARK_GRAFT_SKIP_SKEW=1 skips the skew sub-probe (output-bound:
      // ~26 min at 1M docs emitting 20B verified pairs) so the uniform +
      // clustering curves can be refreshed quickly at large sizes.
      if (!sys.env.contains("SPARK_GRAFT_SKIP_SKEW")) {
      val clusterSize = n / 5
      val skewed = docs.filter(col("doc_id") < n - clusterSize)
        .unionByName(spark.range(n - clusterSize.toLong, n.toLong)
          .select(col("id").as("doc_id"),
            lit(vocab.take(12).mkString(" ") + " " + vocab.drop(8).mkString(" ")).as("text")))
      skewed.cache().count()
      val t1 = System.nanoTime()
      val skewPairs = Dedup.minhashLshPairs(skewed, col("doc_id"), col("text")).count()
      val sec1 = (System.nanoTime() - t1) / 1e9
      val expectDup = clusterSize.toLong * (clusterSize - 1) / 2
      println(f"""{"metric":"minhash_lsh_skew","docs":$n,"cluster":$clusterSize,"sec":$sec1%.2f,"pairs":$skewPairs,"min_expected":$expectDup}""")
      skewed.unpersist()
      }

      // Transitive clustering over the same uniform corpus: the planted
      // pair graph is n/100 two-doc components, so the label loop should
      // converge in one round regardless of n.
      val t2 = System.nanoTime()
      val nClusters = Dedup.minhashClusters(docs, col("doc_id"), col("text"))
        .select(col("cluster_id")).distinct().count()
      val sec2 = (System.nanoTime() - t2) / 1e9
      println(f"""{"metric":"minhash_clusters_scale","docs":$n,"sec":$sec2%.2f,"clusters":$nClusters}""")

      // Same clustering with the driver union-find DISABLED
      // (driverMaxEdges = 0): forces the distributed pointer-jumping
      // propagateLabels loop — the >1M-edge fallback — end-to-end on a
      // real corpus. Cluster count must equal the hybrid path's.
      val t2b = System.nanoTime()
      val nClustersDist = Dedup.minhashClusters(docs, col("doc_id"), col("text"),
          driverMaxEdges = 0)
        .select(col("cluster_id")).distinct().count()
      val sec2b = (System.nanoTime() - t2b) / 1e9
      println(f"""{"metric":"minhash_clusters_distributed","docs":$n,"sec":$sec2b%.2f,"clusters":$nClustersDist,"clusters_hybrid":$nClusters}""")
      docs.unpersist()
      }

      // Span-dedup probe over the same corpora: the planted pairs share
      // their whole 60-token base text, so each contributes ~55 duplicated
      // windows per side. Both operators shuffle only fixed-width rows
      // (hash-keyed counts, broadcast start-lists), so the curve should be
      // scan-bound and near-linear. The default 20-word vocabulary makes
      // 6-gram collisions DENSE (worst-case mark density);
      // SPARK_GRAFT_SPAN_VOCAB=50000 swaps in synthetic w<i> tokens for a
      // realistic sparse corpus where only the planted runs repeat.
      if (on("span")) {
      val spanDocs = sys.env.get("SPARK_GRAFT_SPAN_VOCAB").map { v =>
        val vs = v.toInt
        val gid = col("id") -
          when(pmod(col("id"), lit(100)) === 1, 1L).otherwise(0L)
        spark.range(n.toLong)
          .select(col("id").as("doc_id"),
            concat_ws(" ", transform(sequence(lit(0), lit(59)),
              i => concat(lit("w"), pmod(xxhash64(gid, i), lit(vs))))).as("text"))
          .withColumn("text",
            when(pmod(col("doc_id"), lit(100)) === 1,
              concat(col("text"), lit(" extra"))).otherwise(col("text")))
      }.getOrElse(docs)
      spanDocs.cache().count()
      val ts1 = System.nanoTime()
      val st = Dedup.spanStats(spanDocs, col("doc_id"), col("text"), k = 6)
        .agg(count(lit(1)).as("n"),
          sum(when(col("n_dup_windows") > 0, 1L).otherwise(0L)).as("dup_docs"))
        .head()
      val secS1 = (System.nanoTime() - ts1) / 1e9
      println(f"""{"metric":"span_stats_scale","docs":$n,"sec":$secS1%.2f,"docs_with_dups":${st.getLong(1)},"expected_min":${2 * (n / 100)}}""")
      val ts2 = System.nanoTime()
      val ex = Dedup.spanExcise(spanDocs, col("doc_id"), col("text"), k = 6)
        .agg(count(lit(1)).as("n"), sum(length(col("clean_text"))).as("bytes"))
        .head()
      val secS2 = (System.nanoTime() - ts2) / 1e9
      println(f"""{"metric":"span_excise_scale","docs":$n,"sec":$secS2%.2f,"rows":${ex.getLong(0)},"clean_bytes":${ex.getLong(1)}}""")
      spanDocs.unpersist()
      }

      // Fuzzy-key-join probe: n synthetic ~25-char keys (two vocab words +
      // 16 hex chars of a row hash — random keys land at edit distance ≥ 2
      // essentially always), with one planted 1-deletion variant per
      // hundred keys. Deletion banding is linear in keys × key length;
      // the pair count must track the planted n/100.
      if (on("fuzzy")) {
      val gidK = col("id") -
        when(pmod(col("id"), lit(100)) === 1, 1L).otherwise(0L)
      val baseKey = concat_ws("-",
        element_at(vocabCol, (pmod(xxhash64(gidK, lit(1)), lit(vocab.size)) + 1).cast("int")),
        element_at(vocabCol, (pmod(xxhash64(gidK, lit(2)), lit(vocab.size)) + 1).cast("int")),
        lower(hex(xxhash64(gidK, lit(3)))))
      val keys = spark.range(n.toLong)
        .select(col("id"),
          when(pmod(col("id"), lit(100)) === 1,
            concat(substring(baseKey, 1, 3), substring(baseKey, 5, 1000)))
            .otherwise(baseKey).as("key"))
      keys.cache().count()
      val tf0 = System.nanoTime()
      val fuzzyPairs = graft.operators.FuzzyJoin
        .editDistancePairs(keys, col("key")).count()
      val secF = (System.nanoTime() - tf0) / 1e9
      println(f"""{"metric":"fuzzy_join_scale","keys":$n,"sec":$secF%.2f,"pairs":$fuzzyPairs,"planted":${n / 100}}""")
      keys.unpersist()
      }

      // SCD2 at scale: n change rows over n/1000 keys, ~1/3 of
      // consecutive observations unchanged (they must collapse). Times
      // the full-history build and the 80/20 incremental merge, and
      // asserts merge == rebuild by version count and closed-version
      // count — the operator's central contract, re-checked at volume.
      if (on("scd2")) {
        val nKeys = math.max(1, n / 1000)
        // a key's consecutive observations are ids k, k+nKeys, … with
        // ts = id div nKeys — so run grouping must key on (k, ts run),
        // NOT on raw id arithmetic (ids of one key are nKeys apart):
        // runs of 3 ts values share a value → ~2/3 of successions are
        // guaranteed unchanged and MUST collapse
        val tsCol = expr(s"id DIV $nKeys")
        val ch = spark.range(n.toLong)
          .select((col("id") % nKeys).as("k"), tsCol.as("ts"),
            col("id").as("seq"),
            pmod(xxhash64(col("id") % nKeys, tsCol - pmod(tsCol, lit(3))),
              lit(5)).cast("string").as("v"))
        ch.cache().count()
        val t0 = System.nanoTime()
        val full = graft.operators.Cdc.scd2FromHistory(ch, col("k"),
          col("ts"), col("v"), Seq(col("seq")))
        val fr = full.agg(count(lit(1)),
          sum(when(col("is_current"), 0L).otherwise(1L))).head()
        val secB = (System.nanoTime() - t0) / 1e9
        val split = (n.toLong / nKeys) * 4 / 5
        val dim = graft.operators.Cdc.scd2FromHistory(
          ch.filter(col("ts") < split), col("k"), col("ts"), col("v"),
          Seq(col("seq"))).localCheckpoint(true)
        val t1 = System.nanoTime()
        val mr = graft.operators.Cdc.scd2Merge(dim,
            ch.filter(col("ts") >= split), col("k"), col("ts"), col("v"),
            Seq(col("seq")))
          .agg(count(lit(1)),
            sum(when(col("is_current"), 0L).otherwise(1L))).head()
        val secM = (System.nanoTime() - t1) / 1e9
        assert(mr.getLong(0) == fr.getLong(0) && mr.getLong(1) == fr.getLong(1),
          s"merge must equal rebuild at volume: $mr vs $fr")
        // targeted late-event repair: 1% of keys rebuilt from the full
        // history must cost a small fraction of the full build — the
        // claim that makes the scd2Merge guard an operation, not a wall
        val fullDim = full.localCheckpoint(true)
        val lateKeys = spark.range(math.max(1, nKeys / 100))
          .select((col("id") * 100 % nKeys).as("key")).localCheckpoint(true)
        val t2 = System.nanoTime()
        val rb = graft.operators.Cdc.rebuildKeys(fullDim, ch, col("k"),
            col("ts"), col("v"), lateKeys, Seq(col("seq")))
          .agg(count(lit(1)),
            sum(when(col("is_current"), 0L).otherwise(1L))).head()
        val secR = (System.nanoTime() - t2) / 1e9
        assert(rb.getLong(0) == fr.getLong(0) && rb.getLong(1) == fr.getLong(1),
          s"rebuildKeys of already-correct keys must be identity: $rb vs $fr")
        println(f"""{"metric":"scd2_scale","changes":$n,"keys":$nKeys,"versions":${fr.getLong(0)},"build_sec":$secB%.2f,"merge_sec":$secM%.2f,"rebuild1pct_sec":$secR%.2f}""")
        ch.unpersist()
      }

      // PageRank at scale: an undirected preferential-ish multigraph of
      // n directed edges over n/100 nodes (dst skewed toward low ids by
      // a squared hash, so degree is hub-heavy like a real graph), 5
      // power iterations. Undirected = no dangling mass, so the rank
      // sum must come back to 1 within quantization slack — a built-in
      // exactness check at volume, not just a timing.
      if (on("pagerank")) {
        val nNodes = math.max(2, n / 100)
        val u = pmod(xxhash64(col("id"), lit(1)), lit(nNodes))
        val h = pmod(xxhash64(col("id"), lit(2)), lit(nNodes))
          .cast("double").divide(lit(nNodes))
        val w = pmod(xxhash64(col("id"), lit(3)), lit(nNodes))
          .cast("double").divide(lit(nNodes))
        val fwd = spark.range(n.toLong)
          .select(u.as("a"), floor(h * w * nNodes).cast("long").as("b"))
          .filter(col("a") =!= col("b"))
        val edges = fwd.unionByName(
          fwd.select(col("b").as("a"), col("a").as("b")))
        edges.cache().count()
        val t0 = System.nanoTime()
        val pr = graft.operators.Graph.pageRank(edges, col("a"), col("b"),
          iters = 5)
        val row = pr.agg(count(lit(1)), sum(col("rank"))).head()
        val secP = (System.nanoTime() - t0) / 1e9
        val mass = row.getDouble(1)
        assert(math.abs(mass - 1.0) < 1e-3,
          s"undirected rank mass must be ~1: $mass")
        println(f"""{"metric":"pagerank_scale","edges":$n,"nodes":${row.getLong(0)},"iters":5,"sec":$secP%.2f,"mass":$mass%.6f}""")
        // the STANDARD-definition mode on the DIRECTED half (every
        // node that never appears as src is a sink): prices the one
        // extra node-sized semi-join scalar aggregate per iteration,
        // and mass must still be ~1 BECAUSE of the redistribution
        fwd.cache().count()
        val t1 = System.nanoTime()
        val prd = graft.operators.Graph.pageRank(fwd, col("a"), col("b"),
          iters = 5, danglingRedistribution = true)
        val rowD = prd.agg(count(lit(1)), sum(col("rank"))).head()
        val secD = (System.nanoTime() - t1) / 1e9
        val massD = rowD.getDouble(1)
        assert(math.abs(massD - 1.0) < 1e-3,
          s"dangling redistribution must conserve mass: $massD")
        println(f"""{"metric":"pagerank_dangling_scale","edges":${n / 2},"nodes":${rowD.getLong(0)},"iters":5,"sec":$secD%.2f,"mass":$massD%.6f}""")
        fwd.unpersist()
        edges.unpersist()
      }

      // Label propagation at scale: same synthetic undirected graph as
      // the pagerank probe — per round one edge-sized join + two node-
      // sized aggregates, so the wall should be linear in edges ×
      // rounds. The assertion is structural: labels are a partition
      // refinement of connected components (no label crosses a
      // component — checked via the components operator on the same
      // edges).
      if (on("labelprop")) {
        val nNodes = math.max(2, n / 100)
        val u = pmod(xxhash64(col("id"), lit(1)), lit(nNodes))
        val h = pmod(xxhash64(col("id"), lit(2)), lit(nNodes))
          .cast("double").divide(lit(nNodes))
        val w = pmod(xxhash64(col("id"), lit(3)), lit(nNodes))
          .cast("double").divide(lit(nNodes))
        val fwd = spark.range(n.toLong)
          .select(u.as("a"), floor(h * w * nNodes).cast("long").as("b"))
          .filter(col("a") =!= col("b"))
        val edges = fwd.unionByName(
          fwd.select(col("b").as("a"), col("a").as("b")))
        edges.cache().count()
        val t0 = System.nanoTime()
        val lp = graft.operators.Graph.labelPropagation(edges, col("a"),
          col("b"), iters = 4).cache()
        val nLabels = lp.select(count_distinct(col("label"))).head().getLong(0)
        val nNodesOut = lp.count()
        val secL = (System.nanoTime() - t0) / 1e9
        val comp = Dedup.componentsFromPairs(
            edges.select(col("a").as("id_a"), col("b").as("id_b")))
          .select(col("id").as("cid"), col("label").as("comp"))
        val crossing = lp.join(comp, lp("id") === comp("cid"))
          .groupBy(lp("label"))
          .agg(count_distinct(col("comp")).as("nc"))
          .filter(col("nc") > 1).count()
        assert(crossing == 0,
          s"a propagated label crossed a component boundary: $crossing")
        println(f"""{"metric":"labelprop_scale","edges":$n,"nodes":$nNodesOut,"iters":4,"sec":$secL%.2f,"labels":$nLabels}""")
        lp.unpersist(); edges.unpersist()
      }

      // Drift monitoring at scale: PSI over 50x the row count (one
      // map-side bin fold + one 10-row aggregate per side — the claim
      // is "a constant-cost tap", so the wall must track the scan),
      // and token drift on the n-doc corpus (two token aggregates + a
      // K-row broadcast). Both with planted drift so the scores are
      // nonzero, asserting the instrument actually fires at scale.
      if (on("drift")) {
        import graft.operators.Drift
        val big = n.toLong * 50
        val ref = spark.range(big)
          .select(pmod(xxhash64(col("id")), lit(100000)).cast("double").as("v"))
        val cur = spark.range(big)
          .select((pmod(xxhash64(col("id"), lit(3)), lit(100000)) * 1.15)
            .cast("double").as("v"))
        val t0 = System.nanoTime()
        val r = Drift.psi(ref, cur, col("v")).head()
        val secPsi = (System.nanoTime() - t0) / 1e9
        assert(r.getLong(1) == big && r.getLong(2) == big &&
          r.getDouble(3) > 0.01, r.toString)
        docs.cache().count()
        val drifted = docs.select(
          concat(col("text"), lit(" zdrift zdrift")).as("text"))
        val t1 = System.nanoTime()
        // the shared corpus has a ~21-type vocabulary; topK=15 keeps
        // real tail mass in the rest bucket alongside the drift token
        val rows = Drift.tokenDrift(docs, drifted, col("text"), topK = 15)
          .collect()
        val secTok = (System.nanoTime() - t1) / 1e9
        val restGap = rows.filter(_.getBoolean(1)).head.getDouble(6)
        assert(rows.length == 16 && restGap > 0.0, rows.length.toString)
        println(f"""{"metric":"drift_scale","psi_rows":$big,"psi_sec":$secPsi%.2f,"psi":${r.getDouble(3)}%.4f,"token_docs":$n,"token_sec":$secTok%.2f,"rest_gap":$restGap%.4f}""")
        docs.unpersist()
      }

      // BM25 at scale: n 30-token synthetic docs. Times the in-query
      // operator (tokenize + score per query), the one-time index build,
      // and the stored-index probe — the claimed cost split: the probe
      // must not pay tokenization, so probe ≪ in-query at any n.
      if (on("bm25")) {
        val docsB = spark.range(n.toLong)
          .select(col("id").as("doc_id"),
            concat_ws(" ", (1 to 30).map(i => element_at(vocabCol,
              (pmod(xxhash64(col("id"), lit(i)), lit(vocab.size)) + 1)
                .cast("int"))): _*).as("text"))
        docsB.cache().count()
        val terms = Seq("spark", "merge", "window")
        val tq = System.nanoTime()
        val inq = graft.operators.TextAnalysis.bm25Search(docsB,
          col("doc_id"), col("text"), terms, k = 20).collect()
        val secQ = (System.nanoTime() - tq) / 1e9
        graft.sources.TextIndexStore.drop(spark, "probe_bm25")
        val tb = System.nanoTime()
        graft.sources.TextIndexStore.build(spark, "probe_bm25", docsB,
          col("doc_id"), col("text"))
        val secB = (System.nanoTime() - tb) / 1e9
        val tp = System.nanoTime()
        val probed = graft.sources.TextIndexStore.search(spark, "probe_bm25",
          terms, k = 20).collect()
        val secP = (System.nanoTime() - tp) / 1e9
        assert(probed.toSeq == inq.toSeq,
          "stored-index probe must rank identically to the in-query form")
        println(f"""{"metric":"bm25_scale","docs":$n,"inquery_sec":$secQ%.2f,"build_sec":$secB%.2f,"probe_sec":$secP%.2f}""")
        graft.sources.TextIndexStore.drop(spark, "probe_bm25")
        docsB.unpersist()
      }

      // Gap-fill at scale: n events over n/1000 keys, each key's buckets
      // drawn from a 3650-bucket (10-year daily) span with ~2/3 of
      // buckets unobserved — the grid the operator generates is ~3.65M
      // rows per 1M keys regardless of event count, so the probe
      // verifies the claimed cost split: one partial-merged pass over
      // the events + a grid-sized tail. Exactness is asserted
      // structurally (grid row count == Σ per-key spans; every key's
      // first/last buckets observed; interp only on generated rows).
      if (on("gapfill")) {
        val nKeys = math.max(1, n / 1000)
        val ev = spark.range(n.toLong)
          .select((col("id") % nKeys).as("k"),
            pmod(xxhash64(col("id"), lit(1)), lit(3650)).as("b"),
            col("id").as("eid"),
            (pmod(xxhash64(col("id"), lit(2)), lit(1000)).cast("double")
              / 10.0).as("v"))
        ev.cache().count()
        // aggregate THROUGH the fill columns — a bare count() lets the
        // optimizer prune the fill windows entirely (they do not change
        // cardinality), and the probe would time only grid generation
        val tg = System.nanoTime()
        val gRow = graft.operators.TimeSeries.gapFillForwardFill(
            ev, col("k"), col("b"), col("v"),
            tieBreak = Seq(col("b"), col("eid")))
          .agg(count(lit(1)), sum(col("value_ffill"))).head()
        val gridRows = gRow.getLong(0)
        val secG = (System.nanoTime() - tg) / 1e9
        val ti = System.nanoTime()
        val iRow = graft.operators.TimeSeries.gapFillInterpolate(
            ev, col("k"), col("b"), col("v"),
            tieBreak = Seq(col("b"), col("eid")))
          .agg(count(lit(1)), sum(col("value_interp"))).head()
        val interpRows = iRow.getLong(0)
        val secI = (System.nanoTime() - ti) / 1e9
        val expect = ev.groupBy(col("k")).agg((max(col("b")) - min(col("b")) + 1).as("s"))
          .agg(sum(col("s"))).head().getLong(0)
        assert(gridRows == expect && interpRows == expect,
          s"grid must be exactly the sum of per-key spans: $gridRows/$interpRows vs $expect")
        println(f"""{"metric":"gapfill_scale","events":$n,"keys":$nKeys,"grid_rows":$gridRows,"ffill_sec":$secG%.2f,"interp_sec":$secI%.2f}""")
        ev.unpersist()
      }

      // KLL rollup at scale: per-day sketch table over n skewed values
      // (log-normal-ish via squared hash), then a 7-day-range p50/p99
      // answered from the STORED sketches vs the exact percentile over
      // the same range — the cost the sketch table amortizes away. The
      // probe asserts rank parity (exact rank of each estimate within
      // 2·eps), so the speedup is of a CORRECT answer.
      if (on("kllrollup")) {
        import graft.functions.SketchAggregators
        val ev = spark.range(n.toLong)
          .select(pmod(col("id"), lit(30)).as("day"),
            (pmod(xxhash64(col("id"), lit(3)), lit(10000)).cast("double")
              * pmod(xxhash64(col("id"), lit(4)), lit(100)).cast("double")).as("v"))
        ev.cache().count()
        val tB = System.nanoTime()
        val daily = ev.groupBy(col("day"))
          .agg(SketchAggregators.kllAgg(col("v"), 200).as("sk"))
          .localCheckpoint(true)
        val secB = (System.nanoTime() - tB) / 1e9
        val tQ = System.nanoTime()
        val qe = daily.filter(col("day").between(10, 16))
          .agg(SketchAggregators.kllUnionQuantiles(col("sk"),
            Seq(0.5, 0.99), 200).as("q"))
          .head().getSeq[Double](0)
        val secQ = (System.nanoTime() - tQ) / 1e9
        val tX = System.nanoTime()
        val range = ev.filter(col("day").between(10, 16))
        val exact = range.agg(
          expr("percentile(v, array(0.5, 0.99))")).head().getSeq[Double](0)
        val secX = (System.nanoTime() - tX) / 1e9
        val nR = range.count().toDouble
        val eps = qe.last
        Seq(0.5, 0.99).zipWithIndex.foreach { case (r, i) =>
          val rank = range.filter(col("v") <= qe(i)).count() / nR
          assert(math.abs(rank - r) <= 2 * eps,
            s"p$r estimate ${qe(i)} has exact rank $rank, off target")
        }
        println(f"""{"metric":"kll_rollup_scale","values":$n,"build_sec":$secB%.2f,"range_query_sec":$secQ%.2f,"exact_percentile_sec":$secX%.2f,"p50_est":${qe(0)}%.1f,"p50_exact":${exact(0)}%.1f}""")
        ev.unpersist()
      }

      // BPE merge training at corpus scale: the published word-frequency
      // trick means cost is ONE corpus scan + vocabulary-sized rounds —
      // the probe separates the two so the claim is measured, not asserted.
      if (on("bpe")) {
        docs.cache().count()
        val t0 = System.nanoTime()
        // the SAME derivation bpeTrain runs internally (shared helper),
        // so the timed scan cannot drift from the trainer's
        val wf = graft.operators.TextAnalysis.bpeWordCounts(docs, col("text"))
        val vocab = wf.count()
        val secScan = (System.nanoTime() - t0) / 1e9
        val t1 = System.nanoTime()
        val merges = graft.operators.TextAnalysis
          .bpeTrain(docs, col("text"), nMerges = 16)
        val nM = merges.count()
        val secTrain = (System.nanoTime() - t1) / 1e9
        println(f"""{"metric":"bpe_scale","docs":$n,"vocab":$vocab,"merges":$nM,"wordfreq_scan_sec":$secScan%.2f,"train_sec":$secTrain%.2f}""")
        docs.unpersist()
      }

      // N-gram LM at scale: train the stupid-backoff trigram tables on
      // the full n-doc corpus (one scan; minCount=2 prunes the singleton
      // tail), then score a FIXED 20k-doc slice against the checkpointed
      // model — that time should stay flat as the training corpus grows
      // (the "per-doc cost is model-size-independent" claim), while the
      // full self-score grows linearly with n.
      if (on("ngram")) {
        docs.cache().count()
        val t0 = System.nanoTime()
        val model = graft.operators.TextAnalysis
          .ngramTrain(docs, col("text"), minCount = 2)
        val mc = model.copy(
          uni = model.uni.localCheckpoint(true),
          bi = model.bi.localCheckpoint(true),
          tri = model.tri.localCheckpoint(true),
          total = model.total.localCheckpoint(true))
        val secTrain = (System.nanoTime() - t0) / 1e9
        val (cu, cb, ct) = (mc.uni.count(), mc.bi.count(), mc.tri.count())
        val fixed = docs.filter(col("doc_id") < 20000)
        val t1 = System.nanoTime()
        graft.operators.TextAnalysis.ngramScore(fixed,
          col("doc_id"), col("text"), mc)
          .agg(sum(col("avg_neg_logp"))).collect()
        val secFixed = (System.nanoTime() - t1) / 1e9
        val t2 = System.nanoTime()
        graft.operators.TextAnalysis.ngramScore(docs,
          col("doc_id"), col("text"), mc)
          .agg(sum(col("avg_neg_logp"))).collect()
        val secFull = (System.nanoTime() - t2) / 1e9
        println(f"""{"metric":"ngram_scale","docs":$n,"uni":$cu,"bi":$cb,"tri":$ct,"train_sec":$secTrain%.2f,"score20k_sec":$secFixed%.2f,"scorefull_sec":$secFull%.2f}""")
        docs.unpersist()
      }

      // Naive-Bayes quality classifier at scale: same fixed-slice claim
      // as the ngram probe — nbTrain is two corpus passes into a
      // checkpointed vocabulary-sized model, and scoring a FIXED 20k
      // slice must stay flat as the training corpus (and so the model's
      // counts) grows.
      if (on("nbq")) {
        import graft.operators.TextAnalysis
        // 50k hash-derived token types (not the 20-word shared vocab) so
        // the model is realistically vocabulary-sized, with a planted
        // class signal: even docs draw from a shifted token range
        val labeled = spark.range(n.toLong)
          .select(col("id").as("doc_id"),
            concat_ws(" ", transform(sequence(lit(0), lit(59)),
              i => concat(lit("tok"),
                pmod(xxhash64(col("id"), i), lit(45000)) +
                  pmod(col("id"), lit(2)) * 5000))).as("text"))
          .withColumn("y", pmod(col("doc_id"), lit(2)) === 0)
        labeled.cache().count()
        val t0 = System.nanoTime()
        val model = TextAnalysis.nbTrain(labeled, col("y"), col("text"))
        val secTrain = (System.nanoTime() - t0) / 1e9
        val vocab = model.tok.count()
        val fixed = labeled.filter(col("doc_id") < 20000)
        val t1 = System.nanoTime()
        TextAnalysis.nbScore(fixed, col("doc_id"), col("text"), model)
          .agg(sum(col("score"))).collect()
        val secFixed = (System.nanoTime() - t1) / 1e9
        val t2 = System.nanoTime()
        TextAnalysis.nbScore(labeled, col("doc_id"), col("text"), model)
          .agg(sum(col("score"))).collect()
        val secFull = (System.nanoTime() - t2) / 1e9
        println(f"""{"metric":"nbq_scale","docs":$n,"vocab":$vocab,"train_sec":$secTrain%.2f,"score20k_sec":$secFixed%.2f,"scorefull_sec":$secFull%.2f}""")
        labeled.unpersist()
      }

      // BPE merge APPLICATION at scale: encode the full corpus with the
      // trained 16-merge table, then with the same table padded by 5000
      // entries that can never fire (their 'z'-prefixed symbols cannot
      // form — the vocab has no 'z'). The min-rank kernel probes pairs
      // by hash, so per-doc cost must be INDEPENDENT of table size —
      // the property that makes a 50k-merge production tokenizer the
      // same scan as this 16-merge one. Token totals must match exactly
      // (padding that changed the output would mean the guard vocab
      // leaked into the corpus).
      if (on("bpe_encode")) {
        import graft.operators.TextAnalysis
        docs.cache().count()
        val merges = TextAnalysis.bpeMerges(
          TextAnalysis.bpeTrain(docs, col("text"), nMerges = 16))
        def letters(i: Int): String =
          i.toString.map(c => ('a' + (c - '0')).toChar)
        val padded = merges ++
          (0 until 5000).map(i => ("zzz" + letters(i), "zz"))
        def encodeAll(m: Seq[(String, String)]): (Long, Double) = {
          val t = System.nanoTime()
          val total = docs
            .select(sum(size(TextAnalysis.bpeEncode(col("text"), m)))
              .cast("long")).collect()(0).getLong(0)
          (total, (System.nanoTime() - t) / 1e9)
        }
        val (tok16, sec16) = encodeAll(merges)
        val (tokPad, secPad) = encodeAll(padded)
        println(f"""{"metric":"bpe_encode_scale","docs":$n,"merges":${merges.size},"merges_padded":${padded.size},"enc_sec":$sec16%.2f,"enc_padded_sec":$secPad%.2f,"tokens":$tok16,"tokens_padded":$tokPad}""")
        docs.unpersist()
      }

      // SFT chat pipeline at scale: derive conversations from the doc
      // corpus (the ChatQueries derivation), then price each stage —
      // structural validation, template render, token-space loss spans
      // under a trained tokenizer, and the packed loader map — plus the
      // end-to-end certification that every supervised token survives
      // packing exactly once. All stages are projections except the
      // packing window, so the wall should track the scan.
      if (on("chat")) {
        import graft.operators.{ChatPrep, Sampling, TextAnalysis}
        docs.cache().count()
        val merges = TextAnalysis.bpeMerges(
          TextAnalysis.bpeTrain(docs, col("text"), nMerges = 16))
        val count: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
          c => TextAnalysis.bpeEncodeCount(c, merges).cast("long")
        val convs = graft.queries.ChatQueries
          .convs(docs.select(col("doc_id"), col("text")),
            plantInvalid = true, plantDup = false)
        convs.cache().count()
        val tV = System.nanoTime()
        val nValid = convs
          .where(ChatPrep.reasonCol(col("turns")).isNull).count()
        val secValid = (System.nanoTime() - tV) / 1e9
        val tR = System.nanoTime()
        val totalChars = ChatPrep.render(convs, col("conv_id"), col("turns"))
          .agg(sum(col("n_chars"))).collect()(0).getLong(0)
        val secRender = (System.nanoTime() - tR) / 1e9
        // pin each stage's frame so stage timings measure THAT stage:
        // without the checkpoints the masks action re-runs the whole
        // tokenizer twice (spans + totals) inside "pack_sec"
        val tS = System.nanoTime()
        val spans = ChatPrep.assistantTokenSpans(convs, col("conv_id"),
          col("turns"), count).localCheckpoint()
        val spanTotal = spans
          .agg(sum(col("end_tok") - col("start_tok"))).collect()(0).getLong(0)
        val secSpans = (System.nanoTime() - tS) / 1e9
        val tT = System.nanoTime()
        val totals = convs.select(col("conv_id"),
          aggregate(col("turns"), lit(0L),
            (acc, t0) => acc + lit(2L) + count(t0.getField("content")))
            .as("__tot")).localCheckpoint()
        val secTotals = (System.nanoTime() - tT) / 1e9
        val tP = System.nanoTime()
        val packMap = Sampling.packSequencesPosBy(totals, col("conv_id"),
          col("__tot"), nShards = 32, seqLen = 512, salt = "probe")
          .localCheckpoint()
        val masks = ChatPrep.packedAssistantMasks(packMap, spans)
        val maskTotal = masks
          .agg(sum(col("mask_end") - col("mask_start"))).collect()(0)
          .getLong(0)
        val secPack = (System.nanoTime() - tP) / 1e9
        require(maskTotal == spanTotal,
          s"chat probe: packed masks cover $maskTotal supervised tokens " +
            s"but spans declare $spanTotal — packing dropped or doubled " +
            "mask coverage")
        println(f"""{"metric":"chat_scale","convs":$n,"valid":$nValid,"validate_sec":$secValid%.2f,"render_sec":$secRender%.2f,"render_chars":$totalChars,"spans_sec":$secSpans%.2f,"totals_sec":$secTotals%.2f,"pack_sec":$secPack%.2f,"masked_tokens":$maskTotal,"mask_mtok_per_sec":${maskTotal / (secSpans + secTotals + secPack) / 1e6}%.2f}""")
        convs.unpersist(); docs.unpersist()
      }

      // Unigram Viterbi segmentation at scale: train the piece table on
      // the corpus, then price the DP kernel per doc — O(len·maxLen)
      // hash probes per word, so throughput should be flat in
      // vocabulary size (checked by padding the table 10x with junk
      // pieces that can never match).
      if (on("unigram")) {
        import graft.operators.TextAnalysis
        docs.cache().count()
        val t0 = System.nanoTime()
        val pieces = TextAnalysis.unigramPieces(
          TextAnalysis.unigramTrain(docs, col("text")))
        val secTrain = (System.nanoTime() - t0) / 1e9
        def segAll(tab: Seq[(String, Long)]): (Long, Long, Double) = {
          val t = System.nanoTime()
          val row = docs.select(
            TextAnalysis.unigramSegment(col("text"), tab).as("s"))
            .agg(sum(col("s.n_pieces")).cast("long"),
              sum(col("s.logp_micro")).cast("long")).collect()(0)
          (row.getLong(0), row.getLong(1), (System.nanoTime() - t) / 1e9)
        }
        val (np, lp, sec) = segAll(pieces)
        val padded = pieces ++ (0 until pieces.size * 9).map(i =>
          (s"ZZ$i", -30000000L))
        val (np2, _, secPad) = segAll(padded)
        assert(np2 == np, s"junk padding changed the segmentation: $np2 != $np")
        println(f"""{"metric":"unigram_scale","docs":$n,"pieces":${pieces.size},"train_sec":$secTrain%.2f,"seg_sec":$sec%.2f,"seg_padded_sec":$secPad%.2f,"n_pieces":$np,"logp_micro":$lp,"mpiece_per_sec":${np / sec / 1e6}%.1f}""")
        // one hard-EM round: the E-step segments the VOCABULARY (not
        // the corpus), so the wall should be train-shaped, and chaining
        // a second round on the refined table must stay green
        val t1 = System.nanoTime()
        val em1 = TextAnalysis.unigramPieces(
          TextAnalysis.unigramEmStep(docs, col("text"), pieces))
        val secEm = (System.nanoTime() - t1) / 1e9
        val (np3, _, secSeg2) = segAll(em1)
        println(f"""{"metric":"unigram_em_scale","docs":$n,"pieces_in":${pieces.size},"pieces_out":${em1.size},"em_sec":$secEm%.2f,"seg_refined_sec":$secSeg2%.2f,"n_pieces_refined":$np3}""")
        // ids path: the loader hand-off — same DP plus the O(1) id map;
        // total id count must equal the scorer's piece count
        val model2 = TextAnalysis.unigramTrain(docs, col("text"))
        val vocab = TextAnalysis.unigramVocab(model2)
        val tI = System.nanoTime()
        val idAgg = docs.select(
          TextAnalysis.unigramSegmentIds(col("text"), pieces, vocab)
            .as("ids"))
          .agg(sum(size(col("ids"))).cast("long"),
            sum(size(filter(col("ids"), i => i === -1))).cast("long"))
          .collect()(0)
        val secIds = (System.nanoTime() - tI) / 1e9
        assert(idAgg.getLong(0) == np,
          s"ids path emitted ${idAgg.getLong(0)} ids but the scorer " +
            s"counted $np pieces")
        println(f"""{"metric":"unigram_ids_scale","docs":$n,"vocab":${vocab.size},"ids_sec":$secIds%.2f,"n_ids":${idAgg.getLong(0)},"n_oov":${idAgg.getLong(1)},"mid_per_sec":${idAgg.getLong(0) / secIds / 1e6}%.1f}""")
        docs.unpersist()
      }

      // Whole-document BEST-FIT-DECREASING packing at scale: 1M docs
      // with hash-varied token counts (20..512 on seqLen 512 — the
      // regime where bin packing actually has something to lose), 32
      // shards. The probe prices the sequential per-shard BFD pass and
      // compares the result against the absolute lower bound
      // (per-shard ceil(total/seqLen)): the padding the no-split
      // regime pays over the splitting packer, measured not guessed.
      if (on("bfd")) {
        import graft.operators.Sampling
        val seqLen = 512
        val totals = spark.range(n.toLong)
          .select(col("id").as("doc_id"),
            (pmod(xxhash64(col("id")), lit(493)) + 20).as("ntok"))
        totals.cache().count()
        val t0 = System.nanoTime()
        val map = Sampling.packSequencesWholeBy(totals, col("doc_id"),
          col("ntok"), nShards = 32, seqLen = seqLen, salt = "bfd")
        val rep = Sampling.packReport(map.drop("seq_pos"), seqLen)
          .collect()
        val sec = (System.nanoTime() - t0) / 1e9
        val nSeqs = rep.map(_.getAs[Long]("n_seqs")).sum
        val total = rep.map(_.getAs[Long]("total_tokens")).sum
        val lb = rep.map(r => (r.getAs[Long]("total_tokens") + seqLen - 1)
          / seqLen).sum
        val fill = total.toDouble / (nSeqs * seqLen)
        assert(rep.forall(_.getAs[Long]("n_split_docs") == 0L),
          "no-split regime emitted split docs")
        assert(fill > 0.95,
          f"BFD fill $fill%.4f — best-fit should be near the bound here")
        println(f"""{"metric":"pack_bestfit_scale","docs":$n,"n_seqs":$nSeqs,"lower_bound":$lb,"total_tokens":$total,"fill_frac":$fill%.4f,"overhead_vs_bound":${(nSeqs - lb).toDouble / lb}%.4f,"sec":$sec%.2f}""")
        totals.unpersist()
      }

      // DSIR PRODUCTION LOOP at scale: train the hashed-bucket
      // importance model once (two counting scans) on the shared corpus
      // with the domain marker planted on every 100th doc vs a
      // 2000-doc target, round-trip it through DsirStore, then GATE
      // the full corpus as a batch against the STORED model — pricing
      // train / store / per-batch scoring separately (the per-batch
      // cost is the number a pretraining team actually pays per crawl).
      // Greedy selection must recover the planted set exactly; the
      // Gumbel draw reports its (stochastic) planted share.
      if (on("dsir")) {
        import graft.operators.{Dsir, Sampling}
        import graft.sources.DsirStore
        require(n >= 800,
          s"dsir probe needs n >= 800 (one planted doc per 100, and " +
            s"enough corpus for a stable margin): got $n")
        val nPlanted = n / 100
        val planted = docs.withColumn("text",
          when(pmod(col("doc_id"), lit(100)) === 7,
            concat(col("text"), lit(" quantum flux capacitor quantum flux")))
            .otherwise(col("text")))
        val target = spark.range(2000)
          .select((col("id") + n).as("doc_id"),
            lit("quantum flux capacitor studies quantum flux").as("text"))
        planted.cache().count()
        val t0 = System.nanoTime()
        val m = Dsir.model(planted, target, col("doc_id"), col("text"),
          ngram = 2)
        val secTrain = (System.nanoTime() - t0) / 1e9
        DsirStore.drop(spark, "dsir_probe")
        val tS = System.nanoTime()
        DsirStore.buildFrom(spark, "dsir_probe", m)
        val loaded = DsirStore.load(spark, "dsir_probe")
        val secStore = (System.nanoTime() - tS) / 1e9
        val t1 = System.nanoTime()
        val scored = Dsir.scoreAgainst(planted, loaded, col("doc_id"),
          col("text")).localCheckpoint(true)
        val sep = scored.agg(
          min(when(pmod(col("doc_id"), lit(100)) === 7, col("logw")))
            .as("pmin"),
          max(when(pmod(col("doc_id"), lit(100)) =!= 7, col("logw")))
            .as("nmax")).head()
        val secGate = (System.nanoTime() - t1) / 1e9
        val (pmin, nmax) = (sep.getDouble(0), sep.getDouble(1))
        assert(pmin > nmax,
          f"no planted separation: planted min $pmin%.2f vs $nmax%.2f")
        val greedy = scored.orderBy(col("logw").desc, col("doc_id"))
          .limit(nPlanted).collect()
        assert(greedy.forall(_.getLong(0) % 100 == 7),
          "greedy selection admitted a non-planted doc inside the margin")
        val tG = System.nanoTime()
        val drawn = Sampling.gumbelTopK(scored, col("doc_id"),
          col("logw"), k = nPlanted).collect()
        val secSample = (System.nanoTime() - tG) / 1e9
        val share = drawn.count(_.getLong(0) % 100 == 7).toDouble / nPlanted
        assert(share >= 0.5,
          f"Gumbel draw planted share $share%.2f — weights not biting")
        DsirStore.drop(spark, "dsir_probe")
        println(f"""{"metric":"dsir_scale","docs":$n,"features":${m.nFeatures},"train_sec":$secTrain%.2f,"store_roundtrip_sec":$secStore%.2f,"gate_sec":$secGate%.2f,"sample_sec":$secSample%.2f,"margin_nats":${pmin - nmax}%.2f,"gumbel_planted_share":$share%.3f,"docs_per_sec_gate":${n / secGate}%.0f}""")
        planted.unpersist()
      }

      // MULTI-TARGET DSIR at scale: k domains against one crawl must
      // cost ~ONE feature-keyed exchange, not k corpus passes — the
      // spec pins the plan (one feature explode regardless of k); this
      // probe MEASURES it, scoring the same corpus against 1 vs 3
      // domains and reporting the wall ratio (expected ~1.x from the
      // k-fold of join-probe rows, never ~k). Per-domain planted
      // separation is asserted — every domain's own planted docs must
      // outrank everything else IN THAT DOMAIN, the cross-domain
      // comparability the shared-vocabulary smoothing buys.
      if (on("dsir_multi")) {
        import graft.operators.Dsir
        require(n >= 800,
          s"dsir_multi probe needs n >= 800: got $n")
        val markers = Seq(
          ("a", 7, "quantum flux capacitor"),
          ("b", 13, "neural lattice resonator"),
          ("c", 29, "crystal phase harmonics"))
        val planted = docs.withColumn("text",
          markers.foldLeft(col("text")) { case (c, (_, res, mk)) =>
            when(pmod(col("doc_id"), lit(100)) === res,
              concat(col("text"), lit(s" $mk $mk"))).otherwise(c)
          })
        planted.cache().count()
        def target(mk: String, off: Long) = spark.range(2000)
          .select((col("id") + n + off).as("doc_id"),
            lit(s"$mk studies $mk").as("text"))
        val doms = markers.zipWithIndex.map { case ((d, _, mk), i) =>
          d -> target(mk, i * 10000L)
        }
        def timeScore(mm: Dsir.MultiModel): Double = {
          val t0 = System.nanoTime()
          Dsir.weightsMultiWith(planted, mm, col("doc_id"), col("text"))
            .agg(count(lit(1)), sum(col("logw"))).head()
          (System.nanoTime() - t0) / 1e9
        }
        val m1 = Dsir.modelMulti(planted, doms.take(1), col("doc_id"),
          col("text"), ngram = 2)
        val sec1 = timeScore(m1)
        val m3 = Dsir.modelMulti(planted, doms, col("doc_id"),
          col("text"), ngram = 2)
        val sec3 = timeScore(m3)
        // per-domain planted separation under the SHARED vocabulary
        val w3 = Dsir.weightsMultiWith(planted, m3, col("doc_id"),
          col("text")).localCheckpoint(true)
        markers.foreach { case (d, res, _) =>
          val sep = w3.filter(col("domain") === d).agg(
            min(when(pmod(col("doc_id"), lit(100)) === res, col("logw")))
              .as("pmin"),
            max(when(pmod(col("doc_id"), lit(100)) =!= res, col("logw")))
              .as("nmax")).head()
          assert(sep.getDouble(0) > sep.getDouble(1),
            f"domain $d: planted min ${sep.getDouble(0)}%.2f did not " +
              f"clear others' max ${sep.getDouble(1)}%.2f")
        }
        println(f"""{"metric":"dsir_multi_scale","docs":$n,"features":${m3.nFeatures},"domains":3,"score_sec_k1":$sec1%.2f,"score_sec_k3":$sec3%.2f,"k3_over_k1":${sec3 / sec1}%.2f}""")
        planted.unpersist()
      }

      // BYTE-level unigram PRODUCTION training at scale: a 50k-type
      // multi-script vocabulary (base36 word stems, every 17th type
      // accented, every 29th carrying an astral emoji) — the 20-word
      // shared corpus can't exercise a production vocabulary. The fast
      // trainer runs at maxPieceLen = 16 with one hard-EM round; the
      // probe asserts a >= 8k-piece trained vocabulary, round-trips the
      // BIG model through TokenizerStore, and prices byte segmentation
      // under it.
      if (on("unigram_bytes")) {
        import graft.operators.TextAnalysis
        import graft.sources.TokenizerStore
        val docsB = spark.range(n.toLong)
          .select(col("id").as("doc_id"),
            concat_ws(" ", transform(sequence(lit(0), lit(29)), i => {
              val t = pmod(xxhash64(col("id"), i), lit(50000))
              val base = concat(lit("w"), conv(t.cast("string"), 10, 36))
              when(pmod(t, lit(17)) === 0, concat(base, lit("é")))
                .when(pmod(t, lit(29)) === 0,
                  concat(base, lit("🚀")))
                .otherwise(base)
            })).as("text"))
        docsB.cache().count()
        val t0 = System.nanoTime()
        val model = TextAnalysis.unigramTrainBytesFast(docsB, col("text"),
          maxPieceLen = 16, minCount = 2L, emRounds = 1)
          .localCheckpoint(true)
        val pieces = TextAnalysis.unigramPieces(model, maxPieces = 4 << 20)
        val secTrain = (System.nanoTime() - t0) / 1e9
        assert(pieces.size >= 8192,
          s"production probe trained only ${pieces.size} pieces — " +
            "the vocabulary is not production-shaped")
        // the BIG model survives the store round trip bit-for-bit
        TokenizerStore.dropUnigram(spark, "uni_bytes_probe")
        val tS = System.nanoTime()
        TokenizerStore.buildUnigramBytesFrom(spark, "uni_bytes_probe",
          model, maxPieceLen = 16, emRounds = 1)
        val (loaded, maxLenL) =
          TokenizerStore.loadUnigramBytes(spark, "uni_bytes_probe")
        val secStore = (System.nanoTime() - tS) / 1e9
        assert(maxLenL == 16)
        assert(loaded.toMap == pieces.toMap,
          "stored model diverged from the trained one")
        TokenizerStore.dropUnigram(spark, "uni_bytes_probe")
        // segmentation throughput under the big vocabulary, and the
        // byte-fallback property: every token segments, none at the
        // whole-token UNK
        val t1 = System.nanoTime()
        val row = docsB.select(
            TextAnalysis.unigramSegmentBytes(col("text"), loaded,
              maxLen = 16).as("s"))
          .agg(sum(col("s.n_pieces")).cast("long"),
            sum(col("s.logp_micro")).cast("long")).collect()(0)
        val secSeg = (System.nanoTime() - t1) / 1e9
        val (np, lp) = (row.getLong(0), row.getLong(1))
        assert(np > 0 && lp < 0)
        println(f"""{"metric":"unigram_bytes_train_scale","docs":$n,"pieces":${pieces.size},"train_sec":$secTrain%.2f,"store_roundtrip_sec":$secStore%.2f,"seg_sec":$secSeg%.2f,"n_pieces":$np,"logp_micro":$lp,"mpiece_per_sec":${np / secSeg / 1e6}%.1f}""")
        // vocabulary-size control at the same scale: seed -> prune to
        // 8192 -> one hard-EM refinement; every token must still
        // segment (singles survive pruning by contract)
        val t2 = System.nanoTime()
        val targeted = TextAnalysis.unigramTrainBytesFast(docsB,
          col("text"), maxPieceLen = 16, minCount = 2L, emRounds = 1,
          targetVocab = 8192).localCheckpoint(true)
        val nT = targeted.count()
        val secTarget = (System.nanoTime() - t2) / 1e9
        assert(nT <= 8192, s"targetVocab overshot: $nT")
        val piecesT = TextAnalysis.unigramPieces(targeted)
        val rowT = docsB.select(
            TextAnalysis.unigramSegmentBytes(col("text"), piecesT,
              maxLen = 16).as("s"))
          .agg(sum(col("s.n_pieces")).cast("long")).collect()(0)
        assert(rowT.getLong(0) >= np,
          "a smaller vocabulary cannot use fewer pieces than the full one")
        println(f"""{"metric":"unigram_bytes_vocab_scale","docs":$n,"target":8192,"pieces":$nT,"train_sec":$secTarget%.2f,"n_pieces":${rowT.getLong(0)}}""")
        docsB.unpersist()
      }

      // SOFT-vs-HARD EM bridge at production depth: from the same
      // frequency init over the 50k-type multi-script corpus, one
      // published soft E-step (forward-backward expected counts) vs
      // one hard (Viterbi-count) round, both pruned to the 8192
      // target — measuring the E-step's cost/quality trade instead of
      // asserting it: wall cost, vocabulary overlap at the target,
      // and corpus Viterbi likelihood under each pruned vocabulary.
      if (on("unigram_soft")) {
        import graft.operators.TextAnalysis
        val docsS = spark.range(n.toLong)
          .select(col("id").as("doc_id"),
            concat_ws(" ", transform(sequence(lit(0), lit(29)), i => {
              val t = pmod(xxhash64(col("id"), i), lit(50000))
              val base = concat(lit("w"), conv(t.cast("string"), 10, 36))
              when(pmod(t, lit(17)) === 0, concat(base, lit("é")))
                .when(pmod(t, lit(29)) === 0,
                  concat(base, lit("🚀")))
                .otherwise(base)
            })).as("text"))
        docsS.cache().count()
        val tH = System.nanoTime()
        val hard = TextAnalysis.unigramTrainBytesFast(docsS, col("text"),
          maxPieceLen = 16, minCount = 2L, emRounds = 1,
          targetVocab = 8192).localCheckpoint(true)
        val secHard = (System.nanoTime() - tH) / 1e9
        val tS = System.nanoTime()
        val soft = TextAnalysis.unigramTrainBytesSoft(docsS, col("text"),
          maxPieceLen = 16, minCount = 2L, emRounds = 1)
          .localCheckpoint(true)
        val softPruned = TextAnalysis.unigramPruneSoftToVocab(soft, 8192)
          .localCheckpoint(true)
        val secSoft = (System.nanoTime() - tS) / 1e9
        val hardV = hard.select(col("piece")).collect()
          .map(_.getString(0)).toSet
        val softV = softPruned.select(col("piece")).collect()
          .map(_.getString(0)).toSet
        assert(softV.size <= 8192 && hardV.size <= 8192)
        val overlap = (hardV & softV).size.toDouble / 8192
        // corpus Viterbi likelihood + piece count under each pruned
        // vocabulary — the quality axis of the trade
        def segTotals(pieces: Seq[(String, Long)]): (Long, Long) = {
          val r = docsS.select(TextAnalysis.unigramSegmentBytes(
              col("text"), pieces, maxLen = 16).as("s"))
            .agg(sum(col("s.logp_micro")).cast("long"),
              sum(col("s.n_pieces")).cast("long")).head()
          (r.getLong(0), r.getLong(1))
        }
        val (hardLp, hardNp) =
          segTotals(TextAnalysis.unigramPieces(hard))
        val (softLp, softNp) =
          segTotals(TextAnalysis.unigramPieces(softPruned))
        assert(hardNp > 0 && softNp > 0, "both vocabularies must segment")
        println(f"""{"metric":"unigram_soft_vs_hard","docs":$n,"target":8192,"hard_sec":$secHard%.2f,"soft_sec":$secSoft%.2f,"vocab_overlap":$overlap%.4f,"hard_logp_micro":$hardLp,"soft_logp_micro":$softLp,"hard_n_pieces":$hardNp,"soft_n_pieces":$softNp}""")
        docsS.unpersist()
      }

      // Byte-level BPE encode at scale: same min-rank kernel as the
      // char probe (table-size independence transfers), but every token
      // decomposes into UTF-8 bytes — ~4-5x the symbol count per doc —
      // so this prices the byte path's own throughput.
      if (on("bpe_bytes")) {
        import graft.operators.TextAnalysis
        docs.cache().count()
        val t0 = System.nanoTime()
        val merges = TextAnalysis.bpeMerges(
          TextAnalysis.bpeTrainBytes(docs, col("text"), nMerges = 16))
        val secTrain = (System.nanoTime() - t0) / 1e9
        val t1 = System.nanoTime()
        val total = docs
          .select(sum(size(TextAnalysis.bpeEncodeBytes(col("text"), merges)))
            .cast("long")).collect()(0).getLong(0)
        val secEnc = (System.nanoTime() - t1) / 1e9
        println(f"""{"metric":"bpe_bytes_scale","docs":$n,"merges":${merges.size},"train_sec":$secTrain%.2f,"enc_sec":$secEnc%.2f,"tokens":$total,"mtok_per_sec":${total / secEnc / 1e6}%.1f}""")
        docs.unpersist()
      }

      // PRODUCTION-DEPTH BPE TRAINING: the delta-updated trainer
      // (bpeTrainBytesFast — bit-identical to the classic loop, pinned
      // by BpeFastTrainSpec + the text_bpe_train_fast oracle) must reach
      // real vocabulary sizes at a wall SUB-LINEAR in merges. The classic
      // loop is one vocabulary-sized Spark job PER MERGE — linear by
      // construction, timed at 64 merges for the per-merge contrast. The
      // shared 20-word corpus can't support 1024 merges, so this probe
      // uses hash-derived words (~50k distinct types). The trained table
      // round-trips through TokenizerStore and encodes the corpus green
      // (table-size independence of encode is pinned by bpe_encode_scale).
      if (on("bpe_train")) {
        import graft.operators.TextAnalysis
        val rich = spark.range(n.toLong)
          .select(col("id").as("doc_id"),
            concat_ws(" ", transform(sequence(lit(0), lit(59)),
              i => concat(lit("w"),
                pmod(xxhash64(col("id"), i), lit(50000))))).as("text"))
        rich.cache().count()
        val t0 = System.nanoTime()
        val nClassic = TextAnalysis.bpeTrainBytes(rich, col("text"), 64).count()
        val secClassic = (System.nanoTime() - t0) / 1e9
        val t1 = System.nanoTime()
        val n256 = TextAnalysis.bpeTrainBytesFast(rich, col("text"), 256).count()
        val sec256 = (System.nanoTime() - t1) / 1e9
        val t2 = System.nanoTime()
        val big = TextAnalysis.bpeTrainBytesFast(rich, col("text"), 1024)
        val n1024 = big.count()
        val sec1024 = (System.nanoTime() - t2) / 1e9
        assert(nClassic == 64 && n256 == 256 && n1024 == 1024,
          s"corpus must support every depth: $nClassic/$n256/$n1024")
        // the 1024-merge table round-trips the store and encodes green
        graft.sources.TokenizerStore.buildFrom(spark, "bpe_train_probe",
          big, byteLevel = true)
        val loaded = graft.sources.TokenizerStore
          .loadBytes(spark, "bpe_train_probe")
        assert(loaded == TextAnalysis.bpeMerges(big),
          "store round trip must preserve the merge list exactly")
        val t3 = System.nanoTime()
        val tok = rich.select(
          sum(size(TextAnalysis.bpeEncodeBytes(col("text"), loaded)))
            .cast("long")).head().getLong(0)
        val secEnc = (System.nanoTime() - t3) / 1e9
        graft.sources.TokenizerStore.drop(spark, "bpe_train_probe")
        println(f"""{"metric":"bpe_train_scale","docs":$n,"classic64_sec":$secClassic%.2f,"fast256_sec":$sec256%.2f,"fast1024_sec":$sec1024%.2f,"classic_sec_per_merge":${secClassic / 64}%.4f,"fast_sec_per_merge":${sec1024 / 1024}%.4f,"store_roundtrip":true,"enc_sec":$secEnc%.2f,"tokens":$tok,"mtok_per_sec":${tok / secEnc / 1e6}%.1f}""")
        rich.unpersist()
      }

      // Motion-compensated codec throughput: the full certification
      // round trip (synth + I/P encode with ±4 full search + container +
      // chain decode + recon-equality) per document at a realistic frame
      // size — map-only and embarrassingly parallel, so the published
      // number is per-core pixel throughput, the figure that transfers
      // to any cluster size.
      if (on("mc")) {
        import graft.functions.MediaExpressions
        val (w, h, nf) = (64, 48, 8)
        val t0 = System.nanoTime()
        val ok = spark.range(n.toLong)
          .select(MediaExpressions.mcVideoRoundTrip(col("id"),
            lit(w), lit(h), lit(nf), fps = 12).as("st"))
          .agg(sum(when(col("st.recon_exact") && col("st.err_in_bound") &&
              col("st.mv_engaged") && col("st.inter_saves") &&
              col("st.trunc_rejected"), 1L).otherwise(0L)))
          .collect()(0).getLong(0)
        val sec = (System.nanoTime() - t0) / 1e9
        val mpix = n.toLong * w * h * nf / sec / 1e6
        println(f"""{"metric":"mc_video_scale","docs":$n,"w":$w,"h":$h,"frames":$nf,"all_green":$ok,"sec":$sec%.2f,"mpix_per_sec":$mpix%.1f}""")
      }

      // The VLC entropy layer's throughput cost at the same realistic
      // frame size: the full GMV1 certification round trip (which also
      // byte-serializes every plan for the vlc_smaller attestation and
      // VLC-codes an all-intra alternative per P frame — so this deck is
      // strictly MORE work per doc than the byte probe's), all six
      // attestations required green.
      if (on("mcvlc")) {
        import graft.functions.MediaExpressions
        val (w, h, nf) = (64, 48, 8)
        val t0 = System.nanoTime()
        val ok = spark.range(n.toLong)
          .select(MediaExpressions.mcVlcVideoRoundTrip(col("id"),
            lit(w), lit(h), lit(nf), fps = 12).as("st"))
          .agg(sum(when(col("st.recon_exact") && col("st.err_in_bound") &&
              col("st.mv_engaged") && col("st.inter_saves") &&
              col("st.trunc_rejected") && col("st.vlc_smaller"), 1L)
            .otherwise(0L)))
          .collect()(0).getLong(0)
        val sec = (System.nanoTime() - t0) / 1e9
        val mpix = n.toLong * w * h * nf / sec / 1e6
        println(f"""{"metric":"mc_vlc_scale","docs":$n,"w":$w,"h":$h,"frames":$nf,"all_green":$ok,"sec":$sec%.2f,"mpix_per_sec":$mpix%.1f}""")
      }

      // The CONFORMANT MPEG-1 layer at the same realistic frame size,
      // 4:2:0 (so 1.5 planes of pixels per luma pixel): full
      // elementary-stream encode + chain decode + certification per
      // clip — 16×16 macroblocks, CBP, differential motion, the
      // §2.4.4 arithmetic — all five deterministic attestations
      // required green on every clip. Map-only, per-core throughput.
      if (on("mpeg1")) {
        import graft.functions.MediaExpressions
        val (w, h, nf) = (64, 48, 8)
        val t0 = System.nanoTime()
        val ok = spark.range(n.toLong)
          .select(MediaExpressions.mpeg1VideoRoundTrip(col("id"),
            lit(w), lit(h), lit(nf), fps = 24).as("st"))
          .agg(sum(when(col("st.recon_exact") && col("st.err_in_bound") &&
              col("st.mv_engaged") && col("st.trunc_rejected") &&
              col("st.census_ok"), 1L).otherwise(0L)))
          .collect()(0).getLong(0)
        val sec = (System.nanoTime() - t0) / 1e9
        val mpix = n.toLong * w * h * nf * 3 / 2 / sec / 1e6
        println(f"""{"metric":"mpeg1_scale","docs":$n,"w":$w,"h":$h,"frames":$nf,"all_green":$ok,"sec":$sec%.2f,"mpix_per_sec":$mpix%.1f}""")
      }

      // Streaming PCA at scale: fold three n-vector micro-batches into
      // the fenced moment table — per batch the cost is ONE d²-state
      // aggregate of the batch (constant in the stored history), and
      // fitting a model from the stored state is a driver eigensolve
      // with zero scans. The per-batch fold times should be flat across
      // batches (no history rescan), and the final model must agree
      // with a single batch train over the union to 1e-9.
      if (on("spca")) {
        import graft.streaming.StreamingPca
        import graft.operators.Pca
        val dim = 64
        def wave(lo: Long, hi: Long) = spark.range(lo, hi)
          .select(transform(sequence(lit(0), lit(dim - 1)),
            j => pmod(xxhash64(col("id"), j), lit(1000)).cast("double") / 100.0
          ).as("vec"))
        StreamingPca.drop(spark, "spca_probe")
        StreamingPca.provision(spark, "spca_probe")
        val times = (0 until 3).map { b =>
          val t = System.nanoTime()
          StreamingPca.applyBatch(spark, "spca_probe",
            wave(b.toLong * n, (b + 1).toLong * n), b.toLong)
          (System.nanoTime() - t) / 1e9
        }
        val t3 = System.nanoTime()
        val streamed = StreamingPca.model(spark, "spca_probe", k = 8)
        val secFit = (System.nanoTime() - t3) / 1e9
        val batch = Pca.train(wave(0L, 3L * n), col("vec"), k = 8)
        val drift = streamed.eigenvalues.zip(batch.eigenvalues)
          .map { case (a, b2) => math.abs(a - b2) / math.max(1.0, math.abs(b2)) }
          .max
        StreamingPca.drop(spark, "spca_probe")
        println(f"""{"metric":"spca_scale","vecs_per_batch":$n,"batches":3,"dim":$dim,"fold_secs":[${times.map(t => f"$t%.2f").mkString(",")}],"fit_sec":$secFit%.2f,"eig_drift":$drift%.2e}""")
      }

      // The ngramScore JOIN-REGIME price (the "minCount is the lever"
      // claim, measured): on a wide-vocab corpus (the nbq derivation —
      // hash-random trigrams, so the singleton tail IS the table),
      // minCount=2 prunes bi/tri to near-empty broadcastable tables,
      // while minCount=1 keeps a corpus-sized trigram table that cannot
      // broadcast — the five model joins become shuffles of the gram
      // stream. Both score the same FIXED 20k slice, so the delta is
      // purely the join regime; bhj counts how many of the five joins
      // the planner still broadcast.
      if (on("ngramjoin")) {
        import graft.operators.TextAnalysis
        val wide = spark.range(n.toLong)
          .select(col("id").as("doc_id"),
            concat_ws(" ", transform(sequence(lit(0), lit(59)),
              i => concat(lit("tok"),
                pmod(xxhash64(col("id"), i), lit(50000))))).as("text"))
        wide.cache().count()
        val fixed = wide.filter(col("doc_id") < 20000)
        def regime(minCount: Int): (Long, Long, Double, Long) = {
          // minCount=1 trains the over-threshold model DELIBERATELY
          // (allowShuffle) — the regime this probe exists to price; the
          // guard path itself is spec-covered in TextAnalysisSpec
          val m0 = TextAnalysis.ngramTrain(wide, col("text"), minCount,
            allowShuffle = minCount == 1)
          val m = m0.copy(
            uni = m0.uni.localCheckpoint(true),
            bi = m0.bi.localCheckpoint(true),
            tri = m0.tri.localCheckpoint(true),
            total = m0.total.localCheckpoint(true))
          val (cb, ct) = (m.bi.count(), m.tri.count())
          val scored = TextAnalysis.ngramScore(fixed,
              col("doc_id"), col("text"), m)
            .agg(sum(col("avg_neg_logp")))
          val t = System.nanoTime()
          scored.collect()
          val sec = (System.nanoTime() - t) / 1e9
          // read the FINAL adaptive plan (post-execution), not the AQE
          // placeholder — that is where the join strategy is decided
          val bhj = "BroadcastHashJoin".r
            .findAllIn(scored.queryExecution.executedPlan.toString).size
          (cb, ct, sec, bhj.toLong)
        }
        val (b2, t2c, sec2c, bhj2) = regime(2)
        val (b1, t1c, sec1c, bhj1) = regime(1)
        println(f"""{"metric":"ngram_join_regime","docs":$n,"bi_pruned":$b2,"tri_pruned":$t2c,"score20k_pruned_sec":$sec2c%.2f,"bhj_pruned":$bhj2,"bi_full":$b1,"tri_full":$t1c,"score20k_full_sec":$sec1c%.2f,"bhj_full":$bhj1}""")
        wide.unpersist()
      }

      // Parquet bloom filters at volume: a time-sorted table whose
      // user_id min/max spans every row group (min/max pruning useless),
      // point-looked-up with and without per-column bloom filters —
      // measuring the row-group skipping the layout buys.
      if (on("bloom")) {
        val base = "/tmp/graft_bloom_probe"
        val tbl = spark.range(n.toLong)
          .select(col("id").as("ts"),
            pmod(xxhash64(col("id")), lit(n.toLong)).as("user_id"),
            (col("id") % 1000).cast("double").as("v"))
          .sortWithinPartitions("ts")
        tbl.write.mode("overwrite").parquet(s"$base/plain")
        graft.sources.Formats.writeParquetBloom(tbl, s"$base/bloom",
          Seq("user_id"), expectedNdv = math.max(100000L, n.toLong / 12))
        val target = spark.range(12345L, 12346L)
          .select(pmod(xxhash64(col("id")), lit(n.toLong))).head().getLong(0)
        def timeLookup(path: String): (Double, Long) = {
          val t0 = System.nanoTime()
          val c = spark.read.parquet(path)
            .filter(col("user_id") === target).count()
          ((System.nanoTime() - t0) / 1e9, c)
        }
        timeLookup(s"$base/plain"); timeLookup(s"$base/bloom") // warm
        val (secP, cP) = timeLookup(s"$base/plain")
        val (secB, cB) = timeLookup(s"$base/bloom")
        assert(cP == cB && cP >= 1, s"lookup results must agree: $cP vs $cB")
        println(f"""{"metric":"bloom_scale","rows":$n,"plain_lookup_sec":$secP%.2f,"bloom_lookup_sec":$secB%.2f,"hits":$cP}""")
      }

      // PCA at volume: the d²-state one-pass training claim measured —
      // train cost vs corpus size (the aggregate state is constant), and
      // map-side projection throughput. Vectors carry 8 planted strong
      // directions over hash noise so the spectrum is non-trivial.
      if (on("pca")) {
        import graft.operators.Pca
        val dim = 64
        val vecs = spark.range(n.toLong).select(col("id").as("vid"),
          transform(sequence(lit(0), lit(dim - 1)), j =>
            (pmod(xxhash64(col("id"), j), lit(2001)).cast("double") - 1000.0)
              / 1000.0 +
              when(j % 8 === pmod(col("id"), lit(8)).cast("int"), 5.0)
                .otherwise(0.0)).as("vec"))
        vecs.cache().count()
        val t0 = System.nanoTime()
        val m = Pca.train(vecs, col("vec"), 16)
        val secTrain = (System.nanoTime() - t0) / 1e9
        val t1 = System.nanoTime()
        Pca.project(vecs, col("vid"), col("vec"), m)
          .agg(sum(col("z0")), sum(col("z15"))).head()
        val secProj = (System.nanoTime() - t1) / 1e9
        assert(m.gramMaxDeviation <= 1e-9, "orthonormality at volume")
        val explained = m.eigenvalues.sum / m.totalVariance
        println(f"""{"metric":"pca_scale","vectors":$n,"dim":$dim,"train_sec":$secTrain%.2f,"project_sec":$secProj%.2f,"explained_at_16":$explained%.4f}""")
        vecs.unpersist()
      }

      // Data-quality report at volume: the one-pass claim measured —
      // the 5-constraint report vs the same 5 checks as separate scans.
      if (on("dq")) {
        import graft.operators.Quality
        val tbl = spark.range(n.toLong)
          .select(col("id").as("k"),
            when(pmod(col("id"), lit(1000)) === 0, lit(null).cast("string"))
              .otherwise(concat(lit("u"), pmod(col("id"), lit(100000))))
              .as("name"),
            (pmod(xxhash64(col("id")), lit(1000000)).cast("double") / 100.0)
              .as("v"))
        tbl.cache().count()
        val constraints = Seq(
          Quality.NotNull("name"), Quality.Unique(Seq("k")),
          Quality.InRange("v", 0.0, 20000.0),
          Quality.Matches("name", "^u[0-9]+$"),
          Quality.Unique(Seq("name", "v")))
        // one-pass FORCED (the cold-table shape, measured on cached
        // input to price the Expand cost) vs the adaptive default
        // (storageLevel is non-NONE here -> per-Unique scans)
        val t0 = System.nanoTime()
        val rep = Quality.report(tbl, constraints,
          splitUnique = Some(false)).collect()
        val secOne = (System.nanoTime() - t0) / 1e9
        val tA = System.nanoTime()
        val repA = Quality.report(tbl, constraints).collect()
        val secAdaptive = (System.nanoTime() - tA) / 1e9
        assert(rep.map(_.toString).sorted.sameElements(
          repA.map(_.toString).sorted), "adaptive report must match one-pass")
        val t1 = System.nanoTime()
        tbl.agg(sum(when(col("name").isNull, 1L).otherwise(0L))).head()
        tbl.agg(count(lit(1)) - count_distinct(struct(col("k")))).head()
        tbl.agg(sum(when(col("v").isNull || col("v") < 0.0
          || col("v") > 20000.0, 1L).otherwise(0L))).head()
        tbl.agg(sum(when(col("name").isNull
          || !col("name").rlike("^u[0-9]+$"), 1L).otherwise(0L))).head()
        tbl.agg(count(lit(1))
          - count_distinct(struct(col("name"), col("v")))).head()
        val secFive = (System.nanoTime() - t1) / 1e9
        val viol = rep.map(r => r.getString(0) -> r.getLong(2)).toMap
        println(f"""{"metric":"dq_scale","rows":$n,"one_pass_sec":$secOne%.2f,"adaptive_sec":$secAdaptive%.2f,"five_scans_sec":$secFive%.2f,"null_names":${viol("not_null(name)")}}""")
        tbl.unpersist()
      }

      if (on("ann") || on("ivf") || on("emb") || on("semdedup") ||
          on("semdedup_ivf") || on("semdedup_hier") || on("pq") ||
          on("ivfadc")) {
      // ANN probe on the same row counts: deterministic 64-dim vectors,
      // 10 queries. Times exact brute force vs quantized-candidates +
      // exact re-rank and reports overlap of the two top-5 sets. Both are
      // corpus-scan-bound; the quantized path's win at real scale is scan
      // and shuffle BYTES (int8 vs float64), which local[n] timing cannot
      // show — overlap proves the result holds.
      val vecsExpr = spark.range(n.toLong)
        .select(col("id").as("vec_id"),
          transform(sequence(lit(0), lit(63)),
            i => (pmod(xxhash64(col("id"), i), lit(1000)).cast("double") - 500.0)
              / 500.0).as("vec"))
        .withColumn("norm", sqrt(aggregate(transform(col("vec"), x => x * x),
          lit(0.0), (a, x) => a + x)))
      val vecs = vecsExpr
      if (on("ann") || on("ivf")) vecs.cache().count()
      val queries = vecs.filter(col("vec_id") < 10)
      val t3 = System.nanoTime()
      val exact = if (on("ann") || on("ivf"))
        Similarity.bruteForceTopK(vecs, queries, k = 5)
          .select(col("query_id"), col("cand_id")).collect().toSet
      else Set.empty[org.apache.spark.sql.Row]
      val sec3 = (System.nanoTime() - t3) / 1e9
      if (on("ann")) {
      val t4 = System.nanoTime()
      val quant = Similarity.quantizedTopK(vecs, queries, k = 5)
        .select(col("query_id"), col("cand_id")).collect().toSet
      val sec4 = (System.nanoTime() - t4) / 1e9
      val overlap = (exact intersect quant).size
      println(f"""{"metric":"ann_scale","vecs":$n,"sec_brute":$sec3%.2f,"sec_quant":$sec4%.2f,"top5_overlap":$overlap,"of":${exact.size}}""")
      }

      // IVF vs multi-probe LSH on the same vectors: build (2 Lloyd scans,
      // 16 lists) + probe-4 top-5, against nPlanes=4/maxProbe=1 LSH.
      // Recall is top-5 overlap with exact brute force. IVF's edge is
      // clustered corpora (these synthetic vectors are near-uniform, so
      // this is its worst case); the row published here is the honest
      // build+probe cost curve, not a cherry-picked win.
      if (on("ivf")) {
      val t5 = System.nanoTime()
      val (assigned, centroids) = graft.operators.IvfIndex.build(vecs, k = 16)
      val ivf = graft.operators.IvfIndex
        .probeTopK(assigned, centroids, queries, k = 5, nProbe = 4)
        .select(col("query_id"), col("cand_id")).collect().toSet
      val sec5 = (System.nanoTime() - t5) / 1e9
      val t6 = System.nanoTime()
      val lsh = Similarity.lshTopK(vecs, queries, k = 5, nPlanes = 4, maxProbe = 1)
        .select(col("query_id"), col("cand_id")).collect().toSet
      val sec6 = (System.nanoTime() - t6) / 1e9
      println(f"""{"metric":"ivf_scale","vecs":$n,"sec_ivf_build_probe":$sec5%.2f,"sec_lsh":$sec6%.2f,"top5_overlap_ivf":${(exact intersect ivf).size},"top5_overlap_lsh":${(exact intersect lsh).size},"of":${exact.size}}""")
      }

      // Product-quantization ANN at scale: parquet-backed corpus (the emb
      // probe's lesson — nothing heap-resident), codebooks trained on a
      // ≤100k SAMPLE (published practice; training cost must not grow
      // with the corpus), corpus encoded ONCE to 8-byte codes and the
      // codes table persisted. The timed comparison is the per-probe-batch
      // cost a deployment pays: exact brute force over the float vectors
      // vs ADC over the codes table + exact re-rank of 50 survivors.
      // Recall is top-5 overlap vs brute force; code_bytes/vec_bytes is
      // the parquet-measured compression the 100 TB scan win rides on.
      if (on("pq")) {
        val pqDir = sys.env.getOrElse("SPARK_GRAFT_PROBE_DIR",
          System.getProperty("java.io.tmpdir") + "/graft_probe") + s"/pq_$n"
        // SPARK_GRAFT_PQ_CLUSTERED=1 swaps the near-uniform corpus (PQ's
        // WORST case: tiny cosine gaps vs quantization noise) for a
        // clustered one — 4096 centers + 0.3-amplitude noise, the shape
        // real embedding corpora have and the case PQ is built for; the
        // generic top-5 recall difference between the two rows is the
        // honest statement of where PQ's candidate generation works.
        val clustered = sys.env.get("SPARK_GRAFT_PQ_CLUSTERED").contains("1")
        val vecGen =
          if (clustered)
            transform(sequence(lit(0), lit(63)), i =>
              (pmod(xxhash64(pmod(col("id"), lit(4096)), i), lit(1000)).cast("double") - 500.0)
                / 500.0 +
              ((pmod(xxhash64(col("id"), i, lit(7)), lit(1000)).cast("double") - 500.0)
                / 500.0) * 0.3)
          else
            transform(sequence(lit(0), lit(63)), i =>
              (pmod(xxhash64(col("id"), i), lit(1000)).cast("double") - 500.0) / 500.0)
        val sharded = spark.range(0L, n.toLong, 1L, math.max(32, n / 250000))
          .select(col("id").as("vec_id"), vecGen.as("vec"))
        sharded.write.mode("overwrite").parquet(s"$pqDir/vecs")
        val corpus = Similarity.prepared(
          spark.read.parquet(s"$pqDir/vecs"), col("vec_id"), col("vec"))
        // two query sets: generic top-5 over the near-uniform background
        // (PQ's WORST case - tiny cosine gaps vs quantization noise, the
        // honest recall figure) and planted copies (the registered-query
        // protocol: true neighbor at cosine 1.0, the contract a dedup /
        // nearest-duplicate deployment relies on)
        val queriesPq = corpus.filter(col("vec_id") < 10)
        val copies = queriesPq
          .select((col("vec_id") + n).as("vec_id"), col("vec"), col("norm"))
        val sampleStep = math.max(1L, n.toLong / 100000L)
        val sample = corpus.filter(pmod(col("vec_id"), lit(sampleStep)) === 0)
        val tT = System.nanoTime()
        val model = graft.operators.PqCodec.train(sample, m = 16, ks = 16)
        val secTrain = (System.nanoTime() - tT) / 1e9
        val tE = System.nanoTime()
        graft.operators.PqCodec.encode(corpus, model)
          .write.mode("overwrite").parquet(s"$pqDir/codes")
        val secEnc = (System.nanoTime() - tE) / 1e9
        def dirBytes(p: String): Long = {
          def walk(f: java.io.File): Long = {
            val cs = f.listFiles()
            if (cs == null) f.length() else cs.map(walk).sum
          }
          walk(new java.io.File(p))
        }
        val tB = System.nanoTime()
        val exactRows = Similarity.bruteForceTopK(corpus, queriesPq, k = 5)
          .select(col("query_id"), col("cand_id"), col("cosine")).collect()
        val exactPq = exactRows.map(r => (r.getLong(0), r.getLong(1))).toSet
        val secBrute = (System.nanoTime() - tB) / 1e9
        // the deployment-shaped probe: codes table from disk, model reused
        val codes = spark.read.parquet(s"$pqDir/codes")
        val tP = System.nanoTime()
        val pqRows = graft.operators.PqCodec
          .topKFromCodes(codes, corpus, queriesPq, k = 5, model, rerank = 10)
          .select(col("query_id"), col("cand_id"), col("cosine")).collect()
        val pqRes = pqRows.map(r => (r.getLong(0), r.getLong(1))).toSet
        val secPq = (System.nanoTime() - tP) / 1e9
        val overlap = (exactPq intersect pqRes).size
        // set overlap punishes near-ties (a clustered corpus has ~10^3
        // candidates within noise of each other); the ANN-literature
        // quality metric is retrieved-vs-optimal cosine mass
        val quality = pqRows.map(_.getDouble(2)).sum / exactRows.map(_.getDouble(2)).sum
        // the key-pushed re-rank fetch (candidate ids as a literal IN
        // filter -> row-group/page skipping on the id-sorted corpus)
        val tF = System.nanoTime()
        val pqFetch = graft.operators.PqCodec
          .topKFromCodesFetch(codes, corpus, queriesPq, k = 5, model, rerank = 10)
          .select(col("query_id"), col("cand_id")).collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        val secPqF = (System.nanoTime() - tF) / 1e9
        assert(pqFetch == pqRes, "fetch path must return identical results")
        // planted-copy top-1: the known answer is the original vector
        val t1 = graft.operators.PqCodec
          .topKFromCodes(codes, corpus, copies, k = 1, model, rerank = 32)
          .select(col("query_id"), col("cand_id")).collect()
        val top1Hits = t1.count(r => r.getLong(1) == r.getLong(0) - n)
        println(f"""{"metric":"pq_scale","vecs":$n,"sec_train":$secTrain%.2f,"sec_encode":$secEnc%.2f,"sec_brute":$secBrute%.2f,"sec_pq":$secPq%.2f,"sec_pq_fetch":$secPqF%.2f,"top5_overlap":$overlap,"of":${exactPq.size},"top5_quality":$quality%.4f,"top1_planted":$top1Hits,"of_planted":${t1.length},"vec_bytes":${dirBytes(s"$pqDir/vecs")},"code_bytes":${dirBytes(s"$pqDir/codes")}}""")
        deleteRecursively(new java.io.File(pqDir))
      }

      // Embedding near-dup PRODUCTION path (cosineNearDupPairsLsh) on a
      // gapped corpus: every 100th vector gets a planted twin
      // (v + 0.01·reverse(v), cosine ≈ 0.9999 vs a ~N(0, 1/8) random
      // background). Bucket granularity must scale with the corpus —
      // planes ≈ log2(n/32), ×4 OR-tables — so per-table buckets stay
      // selective and candidate volume stays near-linear; the registered
      // sf config (8×4) is this rule at n=500..5000. Full planted recall
      // is asserted at every size; the all-pairs baseline this replaces
      // is already infeasible at 200k (20B pairs).
      if (on("emb")) {
      // The gapped corpus is WRITTEN TO PARQUET SHARDS and streamed back,
      // not .cache()d: the in-JVM cache capped probes at 8M vectors
      // (16M rows of 64-dim doubles exceed the sbt-launched heap —
      // BENCH_NOTES round 5), a harness artifact the split-hash layout's
      // >8M regime couldn't be measured past. Sharded parquet is also the
      // honest shape — a real corpus streams from storage across
      // executors; nothing is driver- or heap-resident.
      val probeDir = sys.env.getOrElse("SPARK_GRAFT_PROBE_DIR",
        System.getProperty("java.io.tmpdir") + "/graft_probe")
      val path = s"$probeDir/emb_$n"
      val nShards = math.max(32, n / 250000)
      // Shard by generating the range PRE-partitioned — repartition()
      // would shuffle the full vector payload to disk just to split
      // files, and those shuffle files live until job end (at 32M that
      // transient alone approaches this container's free disk).
      val sharded = spark.range(0L, n.toLong, 1L, nShards)
        .select(col("id").as("vec_id"),
          transform(sequence(lit(0), lit(63)),
            i => (pmod(xxhash64(col("id"), i), lit(1000)).cast("double") - 500.0)
              / 500.0).as("vec"))
      val twins = sharded.filter(pmod(col("vec_id"), lit(100)) === 0)
        .select((col("vec_id") + n).as("vec_id"),
          zip_with(col("vec"), reverse(col("vec")),
            (x, y) => x + y * lit(0.01)).as("vec"))
      sharded.unionByName(twins)
        .write.mode("overwrite").parquet(path)
      val gapped = Similarity.prepared(
        spark.read.parquet(path), col("vec_id"), col("vec"))
      // Measured rule (round 5): planes ≈ log2(n)+1, i.e. ~2 buckets per
      // vector per table, so per-table candidate volume stays ≈ N/2.
      // The earlier log2(n/32) rule (~32 vectors/bucket ⇒ ~64N total
      // candidates) was what the 63-bit single-hash cap forced; with
      // split hash columns (LshLayout) granularity keeps pace with N:
      // 1M went 182 s (15 planes, capped) → 12 s (18 planes), and 2M
      // runs 16.6 s at 22 planes vs 110 s at 19.
      val planesNatural = math.max(8, Similarity.lshAutoPlanes(n.toLong))
      // SPARK_GRAFT_EMB_PLANES=a,b forces specific plane counts (e.g. to
      // chart the granularity curve, or avoid a config whose spill
      // exceeds local disk).
      val configs = sys.env.get("SPARK_GRAFT_EMB_PLANES")
        .map(_.split(",").map(_.trim.toInt).toSeq)
        .getOrElse(Seq(planesNatural))
      // SPARK_GRAFT_EMB_TABLES overrides the 4-table default — e.g. a 5th
      // OR-table (a third hash column at wide plane counts) to close the
      // last fraction of recall at very large N.
      val nTablesCfg = sys.env.get("SPARK_GRAFT_EMB_TABLES").map(_.toInt).getOrElse(4)
      configs.foreach { planes =>
        val t7 = System.nanoTime()
        val r = Similarity.cosineNearDupPairsLsh(gapped, 0.8, nPlanes = planes,
            nTables = nTablesCfg)
          .agg(count(lit(1)).as("total"),
            sum(when(col("id_b") === col("id_a") + n &&
              pmod(col("id_a"), lit(100)) === 0, 1L).otherwise(0L)).as("planted"))
          .head()
        val sec7 = (System.nanoTime() - t7) / 1e9
        val nHashes = Similarity.lshHashColumns(planes, nTablesCfg)
        println(f"""{"metric":"emb_lsh_scale","vecs":$n,"planes":$planes,"tables":$nTablesCfg,"hash_cols":$nHashes,"sec":$sec7%.2f,"planted_found":${r.getLong(1)},"planted_expected":${n / 100},"total_pairs":${r.getLong(0)}}""")
      }
      // bound probe disk: each size's shards are deleted before the next
      deleteRecursively(new java.io.File(path))
      }

      // Cluster-scoped semantic dedup at scale: same vector generator,
      // clusters assigned round-robin at a FIXED target cluster size so
      // the claimed cost model (sum of |c|^2 over clusters, linear in N
      // at fixed granularity) is directly observable — wall should grow
      // ~linearly with N, not quadratically. Twins share their
      // original's cluster id (id arithmetic), so planted recall is
      // exact and asserted. SPARK_GRAFT_SEMDEDUP_CSIZE overrides the
      // 250-vector target.
      if (on("semdedup")) {
        val cSize = sys.env.get("SPARK_GRAFT_SEMDEDUP_CSIZE")
          .map(_.toInt).getOrElse(250)
        val kClusters = math.max(1, n / cSize)
        // parquet-backed like the emb probe, NOT checkpointed in the
        // JVM: pinned checkpoint blocks accumulate across the size loop
        // and re-introduce the in-memory ceiling the emb probe removed
        // in round 5; the shard dir is deleted before the next size
        val sdDir = sys.env.getOrElse("SPARK_GRAFT_PROBE_DIR",
          System.getProperty("java.io.tmpdir") + "/graft_probe") + s"/semdedup_$n"
        synthTwinVectors(spark, n)
          .withColumn("cluster",
            pmod(when(col("vec_id") >= n, col("vec_id") - n)
              .otherwise(col("vec_id")), lit(kClusters)).cast("int"))
          .write.mode("overwrite").parquet(sdDir)
        val corpusV = spark.read.parquet(sdDir)
        val totalV = corpusV.count()
        // every planted twin must be pruned (its original shares the
        // cluster and has the lower id); background drops are possible
        // but the planted floor is exact
        val planted = (n + 99) / 100
        // The r11 IO-weather lesson, institutionalized: at working sets
        // that stress the page cache (>= 16M vectors here, ~16 GB of
        // doubles), a single wall number is ambiguous — it conflates the
        // operator with whatever cache state the machine happens to be
        // in. Paired back-to-back runs label it: run 1 = "cold" (the
        // corpus's cache state is whatever the write left), run 2 =
        // "warm" (as cached as this machine gets). Small sizes stay
        // single-run; the pair costs a full re-execution.
        val paired = n >= 16000000
        def timedRuns(body: => Long): (Long, Double, Double) = {
          val t0 = System.nanoTime(); val r1 = body
          val s1 = (System.nanoTime() - t0) / 1e9
          if (!paired) (r1, s1, -1.0)
          else {
            val t1 = System.nanoTime(); val r2 = body
            val s2 = (System.nanoTime() - t1) / 1e9
            assert(r1 == r2, s"paired runs disagree: $r1 vs $r2")
            (r1, s1, s2)
          }
        }
        val (keptN, sec8, sec8w) = timedRuns(
          Similarity.semDedupKeep(corpusV, col("vec_id"), col("vec"),
            col("cluster"), threshold = 0.8).count())
        println(f"""{"metric":"semdedup_scale","vecs":$totalV,"clusters":$kClusters,"cluster_size":$cSize,"sec":$sec8%.2f,"sec_warm":$sec8w%.2f,"kept":$keptN,"pruned":${totalV - keptN},"planted":$planted}""")
        assert(totalV - keptN >= planted,
          s"planted twins must all be pruned: pruned=${totalV - keptN} < $planted")

        // The PQ-coded path on the SAME corpus and clusters: train on a
        // systematic <=100k sample (sample-bound like the store build),
        // then semDedupPqKeep — the cluster shuffle carries 16-byte
        // codes instead of 520 B vectors. Keep count must MATCH the
        // float path exactly (the SemDedupPqSpec parity contract, here
        // asserted at probe scale), which also certifies margin
        // coverage on this synthetic distribution.
        val step = math.max(1L, totalV / 100000L)
        val sampleV = Similarity.prepared(
          corpusV.filter(pmod(col("vec_id"), lit(step)) === 0),
          col("vec_id"), col("vec"))
        val tTr = System.nanoTime()
        val model = graft.operators.PqCodec.train(sampleV, m = 16, ks = 16)
        val secTr = (System.nanoTime() - tTr) / 1e9
        val (keptPq, sec9, sec9w) = timedRuns(
          Similarity.semDedupPqKeep(corpusV, col("vec_id"), col("vec"),
            col("cluster"), threshold = 0.8, model).count())
        println(f"""{"metric":"semdedup_pq_scale","vecs":$totalV,"clusters":$kClusters,"cluster_size":$cSize,"train_sec":$secTr%.2f,"sec":$sec9%.2f,"sec_warm":$sec9w%.2f,"kept":$keptPq,"kept_float":$keptN,"pq_miss":${keptPq - keptN}}""")
        // The PQ path's recall is STATISTICAL (margin over SDC noise);
        // the tail it can miss is near-THRESHOLD pairs — at 32M the
        // extreme-value background crosses 0.8 and one such pair's SDC
        // fell past the margin (1 miss / 310k prunes, BENCH_NOTES r12).
        // The high-cosine duplicates the operator exists for sit far
        // above the margin; a materially growing miss count is a real
        // regression, a handful at the tail is the documented contract.
        assert(keptPq >= keptN && keptPq - keptN <= math.max(2L, planted / 10000),
          s"PQ path keep count $keptPq vs float $keptN — miss tail " +
            "exceeds the documented bound (margin no longer covers SDC noise)")
        deleteRecursively(new java.io.File(sdDir))
      }

      // The REGISTERED dedup_semdedup_ivf composition at scale: k-means
      // assignment (IvfIndex.build) supplies the clusters, then the
      // within-cell prune — so the wall includes CLUSTERING + PRUNING,
      // the number the registered query's user actually pays (the
      // semdedup probe above uses label-arithmetic clusters and prices
      // pruning alone). k scales with N to hold the ~cSize target cell
      // size the cost model is stated in. Planted floor asserts skip:
      // twins may straddle Voronoi boundaries (the registered query's
      // own colocation floor is 90%), so the assert is >= 85% of twins.
      if (on("semdedup_ivf")) {
        val cSize = sys.env.get("SPARK_GRAFT_SEMDEDUP_CSIZE")
          .map(_.toInt).getOrElse(250)
        val sdDir = sys.env.getOrElse("SPARK_GRAFT_PROBE_DIR",
          System.getProperty("java.io.tmpdir") + "/graft_probe") + s"/semdedup_ivf_$n"
        synthTwinVectors(spark, n).write.mode("overwrite").parquet(sdDir)
        val corpusV = Similarity.prepared(spark.read.parquet(sdDir),
          col("vec_id"), col("vec"))
        val totalV = corpusV.count()
        val kIvf = math.max(16, (n / cSize).toInt)
        val t0 = System.nanoTime()
        val (assignedRaw, _) = graft.operators.IvfIndex.build(corpusV, k = kIvf)
        val assigned = assignedRaw
        val keptN = Similarity.semDedupKeep(assigned, col("vec_id"), col("vec"),
          col("centroid_id"), threshold = 0.8).count()
        val sec = (System.nanoTime() - t0) / 1e9
        val planted = (n + 99) / 100
        val pruned = totalV - keptN
        println(f"""{"metric":"semdedup_ivf_scale","vecs":$totalV,"k":$kIvf,"sec":$sec%.2f,"kept":$keptN,"pruned":$pruned,"planted":$planted}""")
        assert(pruned >= (planted * 85L) / 100L,
          s"expected >=85%% of $planted twins pruned, got $pruned")
        deleteRecursively(new java.io.File(sdDir))
      }
      // The FULL production semantic-dedup pipeline at scale: raw
      // unlabeled vectors → hierarchical two-level k-means assignment
      // (k1×k2 ≈ N/250 effective cells at O((k1+k2)·dim)/row — the
      // assignment wall the flat semdedup_ivf probe measured is gone) →
      // within-cell prune, BOTH the float and the PQ-coded path. This is
      // the end-to-end number a 100 TB deployment budgets: clustering
      // included, nothing pre-labeled.
      if (on("semdedup_hier")) {
        val cSize = sys.env.get("SPARK_GRAFT_SEMDEDUP_CSIZE")
          .map(_.toInt).getOrElse(250)
        val sdDir = sys.env.getOrElse("SPARK_GRAFT_PROBE_DIR",
          System.getProperty("java.io.tmpdir") + "/graft_probe") + s"/semdedup_hier_$n"
        synthTwinVectors(spark, n).write.mode("overwrite").parquet(sdDir)
        val corpusV = Similarity.prepared(spark.read.parquet(sdDir),
          col("vec_id"), col("vec"))
        val totalV = corpusV.count()
        val kCells = math.max(16, (n / cSize).toInt)
        val k1 = math.max(2, math.sqrt(kCells.toDouble).round.toInt)
        val k2 = math.max(2, (kCells + k1 - 1) / k1)
        val planted = (n + 99) / 100
        val tC = System.nanoTime()
        val (assignedRaw, _) = graft.operators.IvfIndex
          .buildTwoLevel(corpusV, k1, k2)
        // pin the assignment: both prune paths and the colocation floor
        // consume it, and the production pattern persists it anyway
        val assignDir = sdDir + "_assigned"
        assignedRaw.write.mode("overwrite").parquet(assignDir)
        val assigned = spark.read.parquet(assignDir)
        val secCluster = (System.nanoTime() - tC) / 1e9
        val t1 = System.nanoTime()
        val keptF = Similarity.semDedupKeep(assigned, col("vec_id"), col("vec"),
          col("centroid_id"), threshold = 0.8).count()
        val secF = (System.nanoTime() - t1) / 1e9
        val step = math.max(1L, totalV / 100000L)
        val model = graft.operators.PqCodec.train(
          Similarity.prepared(
            corpusV.filter(pmod(col("vec_id"), lit(step)) === 0),
            col("vec_id"), col("vec")), m = 16, ks = 16)
        val t2 = System.nanoTime()
        val keptP = Similarity.semDedupPqKeep(assigned, col("vec_id"), col("vec"),
          col("centroid_id"), threshold = 0.8, model).count()
        val secP = (System.nanoTime() - t2) / 1e9
        val pruned = totalV - keptF
        println(f"""{"metric":"semdedup_hier_scale","vecs":$totalV,"k1":$k1,"k2":$k2,"cells":${k1 * k2},"cluster_sec":$secCluster%.2f,"prune_float_sec":$secF%.2f,"prune_pq_sec":$secP%.2f,"kept":$keptF,"kept_pq":$keptP,"pruned":$pruned,"planted":$planted,"pq_miss":${keptP - keptF}}""")
        // same statistical-recall contract as the semdedup probe: the PQ
        // path may miss near-threshold tail pairs, never the planted dups
        assert(keptP >= keptF && keptP - keptF <= math.max(2L, planted / 10000),
          s"PQ prune $keptP vs float $keptF over the hierarchical " +
            "assignment — miss tail exceeds the documented bound")
        assert(pruned >= (planted * 85L) / 100L,
          s"expected >=85%% of $planted twins pruned, got $pruned")
        deleteRecursively(new java.io.File(sdDir))
        deleteRecursively(new java.io.File(assignDir))
      }
      // True-IVFADC (residual) vs global-codebook ANN at scale: the
      // question the residual option exists to answer is whether finer
      // effective quantization shrinks the MISS TAIL — queries whose
      // planted twin the ADC ranking drops — in the >=16M regime where
      // the r12 global-codebook tail appeared. Protocol: one shared
      // coarse quantizer (identical list assignment, so Voronoi-boundary
      // effects cancel), both code paths trained on the same systematic
      // <=100k sample, ~2000 systematic original-vector queries whose
      // twin (id + n, cosine ~0.9999) must surface as top-1 at the most
      // UNFORGIVING config — nProbe=1, rerank=1, i.e. pure ADC ranking
      // with zero re-rank headroom. A miss is a query whose returned
      // top-1 is not its twin. Mean reconstruction cosine on the sample
      // is printed alongside as the deterministic quality scalar that
      // separates the codebooks even when both miss counts are 0.
      if (on("ivfadc")) {
        val dir = sys.env.getOrElse("SPARK_GRAFT_PROBE_DIR",
          System.getProperty("java.io.tmpdir") + "/graft_probe") + s"/ivfadc_$n"
        synthTwinVectors(spark, n).write.mode("overwrite").parquet(dir)
        val corpusV = Similarity.prepared(spark.read.parquet(dir),
          col("vec_id"), col("vec"))
        val kLists = math.min(256, math.max(16, n / 65536))
        val (assigned, centroids) = graft.operators.IvfIndex
          .build(corpusV, k = kLists)
        // pin assignment + both code tables: each is consumed twice
        // (train sample / encode, then probe), and persisting codes IS
        // the deployment shape being priced
        val aDir = dir + "_assigned"
        assigned.write.mode("overwrite").parquet(aDir)
        val assignedP = spark.read.parquet(aDir)
        val step = math.max(1L, n / 100000L)
        val sampleA = assignedP.filter(pmod(col("vec_id"), lit(step)) === 0)
        import graft.operators.PqCodec
        val tG = System.nanoTime()
        val gModel = PqCodec.train(
          sampleA.select(col("vec_id"), col("vec")), m = 16, ks = 16)
        val gDir = dir + "_gcodes"
        assignedP.select(col("vec_id"), col("centroid_id"),
            graft.functions.VectorExpressions
              .pqEncode(col("vec"), gModel.codebooks).as("code"))
          .write.mode("overwrite").parquet(gDir)
        val secGBuild = (System.nanoTime() - tG) / 1e9
        val tR = System.nanoTime()
        val rModel = PqCodec.trainResidual(sampleA, centroids, m = 16, ks = 16)
        val rDir = dir + "_rcodes"
        PqCodec.encodeResidual(assignedP, centroids, rModel)
          .write.mode("overwrite").parquet(rDir)
        val secRBuild = (System.nanoTime() - tR) / 1e9
        val qStep = math.max(1L, (n / 100L) / 2000L) * 100L
        val queries = corpusV
          .filter(pmod(col("vec_id"), lit(qStep)) === 0 && col("vec_id") < n)
        val nQ = queries.count()
        def missCount(top1: org.apache.spark.sql.DataFrame): Long =
          nQ - top1.filter(col("cand_id") === col("query_id") + n).count()
        val tGp = System.nanoTime()
        val gMiss = missCount(PqCodec.ivfTopKFromCodesFetch(
          spark.read.parquet(gDir), corpusV, queries, centroids,
          k = 1, gModel, nProbe = 1, rerank = 1))
        val secGp = (System.nanoTime() - tGp) / 1e9
        val tRp = System.nanoTime()
        val rMiss = missCount(PqCodec.ivfResidualTopKFromCodes(
          spark.read.parquet(rDir), corpusV, queries, centroids,
          k = 1, rModel, nProbe = 1, rerank = 1))
        val secRp = (System.nanoTime() - tRp) / 1e9
        // deterministic codebook-quality scalar on the train sample:
        // mean cos(x, reconstruction)
        val gRecon = sampleA
          .withColumn("code", graft.functions.VectorExpressions
            .pqEncode(col("vec"), gModel.codebooks))
          .withColumn("rcos", graft.functions.VectorExpressions.pqAdcDot(
            graft.functions.VectorExpressions.pqLut(col("vec"), gModel.codebooks),
            col("code"))
            / (col("norm") * sqrt(graft.functions.VectorExpressions
              .pqReconNorm2(col("code"), gModel.cn2))))
          .agg(avg("rcos")).head().getDouble(0)
        val rRecon = PqCodec.encodeResidual(sampleA, centroids, rModel)
          .select(col("vec_id"), col("code"), col("crn"))
          .join(sampleA, "vec_id")
          .join(broadcast(centroids), "centroid_id")
          .withColumn("rcos",
            (graft.functions.VectorFunctions.dot(col("vec"), col("cvec"))
              + graft.functions.VectorExpressions.pqAdcDot(
                graft.functions.VectorExpressions.pqLut(col("vec"), rModel.codebooks),
                col("code")))
              / (col("norm") * col("crn")))
          .agg(avg("rcos")).head().getDouble(0)
        println(f"""{"metric":"ivfadc_scale","vecs":${n + n / 100},"queries":$nQ,"k_lists":$kLists,"global_build_sec":$secGBuild%.2f,"residual_build_sec":$secRBuild%.2f,"global_probe_sec":$secGp%.2f,"residual_probe_sec":$secRp%.2f,"global_miss":$gMiss,"residual_miss":$rMiss,"global_recon_cos":$gRecon%.4f,"residual_recon_cos":$rRecon%.4f}""")
        // bounded, not strict: the two ADC rankings differ pointwise, so
        // residual can legitimately drop a twin the global codebook keeps
        // even while winning on average (measured: exact ties at 200k,
        // 16M, and 32M) — the probe exists to REPORT the tails, and must
        // not discard its own measurement over a one-query wobble; a
        // materially wider residual tail is still a real regression
        assert(rMiss <= gMiss + math.max(2L, nQ / 1000),
          s"residual codes widened the miss tail materially: " +
            s"residual $rMiss vs global $gMiss over $nQ queries")
        deleteRecursively(new java.io.File(dir))
        deleteRecursively(new java.io.File(aDir))
        deleteRecursively(new java.io.File(gDir))
        deleteRecursively(new java.io.File(rDir))
      }
      if (on("ann") || on("ivf")) vecs.unpersist()
      }
    }
    spark.stop()
  }
}
