package graft

import graft.functions.VectorFunctions
import graft.operators.Similarity
import org.apache.spark.sql.functions._

/** ANN vs exact top-k over the sf0.001 embeddings. */
class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private lazy val all =
    Similarity.prepared(Tables(spark, sfDir).embeddings, col("vec_id"), col("embedding"))
  private lazy val queries = all.filter(col("vec_id") < 20)

  test("semDedupKeep: within-cluster twin dropped, cross-cluster twin kept, matches scoped brute force") {
    val emb = Tables(spark, sfDir).embeddings
      .select(col("vec_id"), col("embedding"), col("label"))
      .filter(col("vec_id") < 100)
    // two planted twins of vector 7 (cosine ≈ 0.9999): one in 7's own
    // cluster (must be dropped — higher id), one in a different cluster
    // (must SURVIVE — SemDeDup never compares across clusters)
    val lbl7 = emb.filter(col("vec_id") === 7L).select("label").as[Int].head()
    def twin(newId: Long, newLabel: Int) = emb.filter(col("vec_id") === 7L)
      .select(lit(newId).as("vec_id"),
        zip_with(col("embedding"), reverse(col("embedding")),
          (x, y) => x + y * lit(0.01f)).as("embedding"),
        lit(newLabel).as("label"))
    val corpus = emb.unionByName(twin(9000L, lbl7))
      .unionByName(twin(9001L, (lbl7 + 1) % 10))
    val kept = Similarity.semDedupKeep(corpus, col("vec_id"), col("embedding"),
      col("label"), threshold = 0.9)
      .select("vec_id").as[Long].collect().toSet
    assert(!kept.contains(9000L), "within-cluster twin must be pruned")
    assert(kept.contains(9001L), "cross-cluster twin must survive")
    assert(kept.contains(7L), "the lower-id original always survives")

    // full agreement with brute-force pairs restricted to cluster scope
    val p = Similarity.prepared(corpus, col("vec_id"), col("embedding"))
      .join(corpus.select(col("vec_id"), col("label")), "vec_id")
    val lbls = corpus.select(col("vec_id").as("id"), col("label")).as[(Long, Int)]
      .collect().toMap
    val dropped = Similarity.cosineNearDupPairs(p, threshold = 0.9)
      .select("id_a", "id_b").as[(Long, Long)].collect()
      .filter { case (a, bb) => lbls(a) == lbls(bb) }.map(_._2).toSet
    assert(kept == lbls.keySet -- dropped,
      "semDedupKeep must equal global pairs filtered to same-cluster scope")
  }

  test("semDedupKeep composes with IVF assignment (the production cluster source)") {
    import graft.operators.IvfIndex
    // a twin of vector 7 rides along so at least one near-dup pair exists
    val base = all.filter(col("vec_id") < 150)
    val twin = base.filter(col("vec_id") === 7L)
      .select(lit(9100L).as("vec_id"),
        zip_with(col("vec"), reverse(col("vec")),
          (x, y) => x + y * lit(0.01)).as("vec"))
      .withColumn("norm", VectorFunctions.l2Norm(col("vec")))
    val corpus = base.unionByName(twin)
    val (assigned, _) = IvfIndex.build(corpus, k = 8)
    val kept = Similarity.semDedupKeep(assigned, col("vec_id"), col("vec"),
        col("centroid_id"), threshold = 0.9)
      .select("vec_id").as[Long].collect().toSet

    // ground truth from the ACTUAL assignment: drop the higher id of
    // every same-cell pair at cosine >= 0.9
    val cell = assigned.select(col("vec_id"), col("centroid_id"))
      .as[(Long, Int)].collect().toMap
    val dropped = Similarity.cosineNearDupPairs(
        assigned.select(col("vec_id"), col("vec"), col("norm")), threshold = 0.9)
      .select("id_a", "id_b").as[(Long, Long)].collect()
      .filter { case (a, b) => cell(a) == cell(b) }.map(_._2).toSet
    assert(kept == cell.keySet -- dropped,
      "IVF-scoped semdedup must equal pairs filtered to same-cell scope")
    // the cosine-0.9999 twin shares 7's direction, so k-means argmin
    // puts it in 7's cell and the pruning step must catch it
    assert(cell(9100L) == cell(7L) && !kept.contains(9100L),
      s"twin cell ${cell(9100L)} vs ${cell(7L)}; kept=${kept.contains(9100L)}")
  }

  test("cosine function matches a driver-side computation") {
    val rows = Tables(spark, sfDir).embeddings.filter(col("vec_id") < 2)
      .orderBy("vec_id").select("embedding").as[Seq[Float]].collect()
    val (a, b) = (rows(0).map(_.toDouble), rows(1).map(_.toDouble))
    val expect = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    val got = spark.range(1).select(
      VectorFunctions.cosine(
        typedLit(a), typedLit(b))).head().getDouble(0)
    assert(math.abs(got - expect) < 1e-9)
  }

  test("brute-force top-k is correctly ranked and complete") {
    val got = Similarity.bruteForceTopK(all, queries, k = 5).collect()
    val byQuery = got.groupBy(_.getLong(0))
    assert(byQuery.size == queries.count())
    byQuery.values.foreach { rows =>
      val cosines = rows.sortBy(_.getInt(1)).map(_.getDouble(3))
      assert(cosines.zip(cosines.tail).forall { case (x, y) => x >= y },
        "top-k not ranked descending")
      assert(rows.length == 5)
    }
  }

  test("IVF: every vector lands in exactly one list; probe recall beats list share") {
    val (assigned, centroids) = graft.operators.IvfIndex.build(all, k = 16)
    assert(assigned.count() == all.count())
    assert(assigned.groupBy("vec_id").count().agg(max("count")).head().getLong(0) == 1)
    assert(centroids.count() <= 16)
    val exact = Similarity.bruteForceTopK(all, queries, k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val ivf = graft.operators.IvfIndex
      .probeTopK(assigned, centroids, queries, k = 5, nProbe = 4).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (ivf & exact).size.toDouble / exact.size
    // scanning 4 of 16 lists must beat the 25% random-share baseline
    assert(recall >= 0.3, s"IVF recall $recall")
    // and each returned cosine is the true cosine for that pair
    val ivfRows = graft.operators.IvfIndex
      .probeTopK(assigned, centroids, queries, k = 5, nProbe = 4).collect()
    val exactCos = Similarity.bruteForceTopK(all, queries, k = all.count().toInt)
      .collect().map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    ivfRows.foreach { r =>
      val key = (r.getLong(0), r.getLong(2))
      assert(math.abs(exactCos(key) - r.getDouble(3)) < 1e-9)
    }
  }

  test("IVF twin queries at nProbe=1 return the exact nearest neighbor") {
    // Mirror of the registered sim_ivf_top1 query: queries are identical
    // copies of corpus vectors, so each query's nearest centroid is its
    // twin's assignment list and the twin (cosine 1.0) is guaranteed
    // probed and ranked first — top-1 equals brute force exactly even at
    // the most selective probe setting. Pre-driver oracle tripwire.
    val twins = all.filter(col("vec_id") < 10)
      .select((col("vec_id") + 100000).as("vec_id"), col("vec"), col("norm"))
    val (assigned, centroids) = graft.operators.IvfIndex.build(all, k = 16)
    val got = graft.operators.IvfIndex
      .probeTopK(assigned, centroids, twins, k = 1, nProbe = 1).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getDouble(3))).toMap
    assert(got.size == 10)
    got.foreach { case (qid, (cand, cos)) =>
      assert(cand == qid - 100000, s"query $qid: top-1 is $cand, not its twin")
      assert(math.abs(cos - 1.0) < 1e-9, s"twin cosine $cos != 1.0")
    }
  }

  test("persisted IVF index: probes dynamically prune to the probed lists") {
    // writeIndex lays the corpus out one directory per list; probing a
    // loaded index must (a) return exactly the in-memory index's answer
    // and (b) carry a dynamic-pruning partition filter on the index scan,
    // so only the probed centroid_id directories are read — the nProbe/k
    // byte-reduction is physical, not a post-scan filter.
    val (assigned, centroids) = graft.operators.IvfIndex.build(all, k = 8)
    graft.operators.IvfIndex.writeIndex(assigned, centroids, "ivf_idx_part")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    // AQE's wrapper hides the scan from plan collects (see the banded
    // LSH guard); DPP inserts either way, but assert on the plain plan.
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val (la, lc) = graft.operators.IvfIndex.loadIndex(spark, "ivf_idx_part")
      val out = graft.operators.IvfIndex.probeTopK(la, lc, queries, k = 3, nProbe = 2)
      val scans = out.queryExecution.executedPlan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec
          if f.output.exists(_.name == "centroid_id") => f
      }
      assert(scans.nonEmpty, "expected a partitioned index scan")
      assert(scans.exists(_.partitionFilters.exists(
          _.exists(_.isInstanceOf[org.apache.spark.sql.catalyst.expressions.DynamicPruning]))),
        s"index scan must carry a dynamic partition-pruning filter:\n${scans.head}")
      val mem = graft.operators.IvfIndex
        .probeTopK(assigned, centroids, queries, k = 3, nProbe = 2)
      assert(out.exceptAll(mem).isEmpty && mem.exceptAll(out).isEmpty)
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.sql("DROP TABLE IF EXISTS ivf_idx_part")
      spark.sql("DROP TABLE IF EXISTS ivf_idx_part_centroids")
    }
  }

  test("plan guard: nearest_centroid evaluates once per corpus row") {
    // The assignment sits behind a Generate; a plain Project would let the
    // probe join's inferred isnotnull(centroid_id) push a second k x dim
    // kernel evaluation into the scan filter.
    val (assigned, centroids) = graft.operators.IvfIndex.build(all, k = 8)
    val plan = graft.operators.IvfIndex
      .probeTopK(assigned, centroids, queries, k = 3, nProbe = 2)
      .queryExecution.executedPlan.toString
    val n = "nearest_centroid\\(".r.findAllIn(plan).size
    assert(n == 1, s"expected exactly 1 nearest_centroid in the plan, got $n")
  }

  test("int8 quantization: reconstruction within scale/2, cosine preserved") {
    val q = Similarity.quantizeInt8(all)
      .join(all.select(col("vec_id"), col("vec")), "vec_id")
    val rows = q.select(col("vec_id"), col("scale"), col("codes"), col("vec"))
      .as[(Long, Double, Seq[Byte], Seq[Double])].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (id, scale, codes, vec) =>
      assert(codes.length == vec.length)
      // element-wise reconstruction error bounded by half a quantization step
      vec.zip(codes).foreach { case (x, c) =>
        assert(math.abs(x - c * scale) <= scale / 2 + 1e-12,
          s"vec $id: |$x - $c*$scale| exceeds scale/2")
      }
      // dequantized vector still points the same way
      val dq = codes.map(_ * scale)
      val dot = vec.zip(dq).map { case (a, b) => a * b }.sum
      val n = math.sqrt(vec.map(x => x * x).sum) * math.sqrt(dq.map(x => x * x).sum)
      if (n > 0) assert(dot / n > 0.995, s"vec $id: quantized cosine ${dot / n}")
    }
  }

  test("quantized top-k with re-ranking recovers the exact top-k") {
    val exact = Similarity.bruteForceTopK(all, queries, k = 5).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    val got = Similarity.quantizedTopK(all, queries, k = 5, rerank = 4).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> (r.getLong(2), r.getDouble(3)))
    assert(got.size == exact.size)
    // recall over the top-5 sets per query (ties aside, should be ~all)
    val byQ = exact.keys.map(_._1).toSet
    val hits = byQ.toSeq.map { q =>
      val e = (1 to 5).map(i => exact((q, i))).toSet
      val g = got.filter(_._1._1 == q).map(_._2._1).toSet
      (e intersect g).size
    }.sum
    assert(hits >= byQ.size * 5 * 0.9, s"recall too low: $hits / ${byQ.size * 5}")
    // re-scored cosines are exact (match brute-force values where ids agree)
    val exactCos = Similarity.bruteForceTopK(all, queries, k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    got.foreach { case ((q, _), (cand, cos)) =>
      exactCos.get((q, cand)).foreach(e => assert(math.abs(e - cos) < 1e-12))
    }
  }

  test("LSH near-dup pairs are a subset of brute force with exact cosines") {
    val exact = Similarity.cosineNearDupPairs(all, threshold = 0.3).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val lsh = Similarity.cosineNearDupPairsLsh(all, threshold = 0.3, nPlanes = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(exact.nonEmpty)
    lsh.foreach { case (pair, cos) =>
      assert(exact.contains(pair), s"LSH produced non-brute-force pair $pair")
      assert(math.abs(exact(pair) - cos) < 1e-12)
    }
    val recall = lsh.size.toDouble / exact.size
    // single-probe 4-plane buckets on random data: nontrivial but partial
    assert(recall >= 0.1, s"LSH near-dup recall $recall")
  }

  test("multi-table LSH at full-recall params equals brute force on a gapless corpus") {
    // The knob's brute end: on a corpus with NO similarity gap (raw
    // near-uniform vectors, threshold pairs at the distribution tail),
    // full recall needs coarse 2-bit buckets OR-amplified across 16
    // tables — quadratic candidates, kept as a spec-level tripwire only.
    // The REGISTERED dedup_embedding_lsh config runs selective params on
    // a gapped corpus (next test).
    val exact = Similarity.cosineNearDupPairs(all, threshold = 0.4).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // quadratic-candidate config: the volume guard exists to catch exactly
    // this shape, so the tripwire opts out explicitly
    val lsh = Similarity.cosineNearDupPairsLsh(all, threshold = 0.4,
        nPlanes = 2, nTables = 16,
        maxCandidateFactor = Double.PositiveInfinity).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2))
    assert(exact.nonEmpty)
    // first-agreeing-band dedup: each pair exactly once
    assert(lsh.map(_._1).distinct.length == lsh.length, "duplicate pairs emitted")
    assert(lsh.toMap.keySet == exact.keySet,
      s"LSH != brute force: missing ${exact.keySet -- lsh.map(_._1).toSet}, " +
        s"spurious ${lsh.map(_._1).toSet -- exact.keySet}")
    lsh.foreach { case (pair, cos) => assert(math.abs(exact(pair) - cos) < 1e-12) }
  }

  test("selective LSH on a planted gapped corpus equals brute force (registered params)") {
    // Mirror of the registered dedup_embedding_lsh query: every 10th
    // vector gets a planted near-dup (v + 0.01·reverse(v), cosine
    // ≈ 0.9999); dups sit far above the 0.8 threshold, background far
    // below, so 8-bit × 4-table buckets carry recall 1.0 at near-linear
    // candidate volume. Pre-driver tripwire for the DuckDB oracle.
    val base = Tables(spark, sfDir).embeddings
      .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
    val planted = base.unionByName(base.filter(pmod(col("vec_id"), lit(10)) === 0)
      .select((col("vec_id") + 100000).as("vec_id"),
        zip_with(col("embedding"), reverse(col("embedding")),
          (x, y) => x + y * lit(0.01)).as("embedding")))
    val emb = Similarity.prepared(planted, col("vec_id"), col("embedding"))
    val exact = Similarity.cosineNearDupPairs(emb, threshold = 0.8).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Similarity.cosineNearDupPairsLsh(emb, threshold = 0.8,
        nPlanes = 8, nTables = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // every planted pair is found, and nothing else exists on this corpus
    val nPlanted = base.filter(pmod(col("vec_id"), lit(10)) === 0).count()
    assert(exact.size == nPlanted,
      s"gap violated: expected $nPlanted planted pairs, brute force found ${exact.size}")
    assert(lsh == exact, s"selective LSH != brute force: " +
      s"missing ${exact -- lsh}, spurious ${lsh -- exact}")
  }

  test("plane-offset hash: offset planes are a bit-slice of the wider hash") {
    // hyperplaneBucket(v, n, offset) projects onto planes
    // offset..offset+n-1, so its value must equal the LOW n bits of the
    // 0-offset (offset+n)-plane hash — the property that makes split hash
    // columns jointly equivalent to one wide sign pattern.
    val vec = all.orderBy("vec_id").select("vec").as[Seq[Double]].head()
    val wide = spark.range(1).select(
      VectorFunctions.hyperplaneLshBucket(typedLit(vec), 20)).head().getLong(0)
    val sliced = spark.range(1).select(
      VectorFunctions.hyperplaneLshBucket(typedLit(vec), 8, planeOffset = 12))
      .head().getLong(0)
    assert(sliced == (wide & ((1L << 8) - 1)))
  }

  test("wide LSH config (>63 bits, split hash columns) equals brute force") {
    // 16 planes × 4 tables = 64 bits: tablesPerHash = 63/16 = 3, so the
    // config splits into two independent hash columns (3 + 1 tables).
    // Same planted gapped corpus as the registered query; the 16-bit
    // buckets are MORE selective than the registered 8-bit ones — this is
    // the shape the operator takes past ~1M vectors where 2^nPlanes must
    // keep pace with the corpus and one 63-bit hash runs out of planes.
    val base = Tables(spark, sfDir).embeddings
      .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
    val planted = base.unionByName(base.filter(pmod(col("vec_id"), lit(10)) === 0)
      .select((col("vec_id") + 100000).as("vec_id"),
        zip_with(col("embedding"), reverse(col("embedding")),
          (x, y) => x + y * lit(0.01)).as("embedding")))
    val emb = Similarity.prepared(planted, col("vec_id"), col("embedding"))
    val exact = Similarity.cosineNearDupPairs(emb, threshold = 0.8).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val wide = Similarity.cosineNearDupPairsLsh(emb, threshold = 0.8,
        nPlanes = 16, nTables = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(wide.distinct.length == wide.length,
      "duplicate pairs emitted across split hash columns")
    assert(wide.toSet == exact, s"wide LSH != brute force: " +
      s"missing ${exact -- wide.toSet}, spurious ${wide.toSet -- exact}")
  }

  test("LSH layout boundaries: invalid configs fail fast, extremes still work") {
    val tiny = all.limit(30)
    // invalid: zero/negative, > 63 planes, > 62 tables
    intercept[IllegalArgumentException] {
      Similarity.cosineNearDupPairsLsh(tiny, 0.5, nPlanes = 0, nTables = 1)
    }
    intercept[IllegalArgumentException] {
      Similarity.cosineNearDupPairsLsh(tiny, 0.5, nPlanes = 64, nTables = 1)
    }
    intercept[IllegalArgumentException] {
      Similarity.lshTopK(all, queries, 5, nPlanes = 4, maxProbe = 1, nTables = 63)
    }
    // extremes run: 63-plane buckets (one table per hash column) and a
    // 62-table OR-amplification (62 hash columns at 63 planes would be
    // absurd — use 2 planes, 4 columns)
    Similarity.cosineNearDupPairsLsh(tiny, 0.99, nPlanes = 63, nTables = 2).count()
    // 2-bit buckets on 62 tables are deliberately saturated (layout test,
    // not a provisioning demo) — opt out of the volume guard
    val wide = Similarity.cosineNearDupPairsLsh(tiny, 0.99, nPlanes = 2, nTables = 62,
      maxCandidateFactor = Double.PositiveInfinity)
    assert(Similarity.lshHashColumns(2, 62) == 2)
    wide.count()
    assert(Similarity.lshHashColumns(63, 2) == 2)
    assert(Similarity.lshHashColumns(8, 4) == 1)   // registered config: unchanged layout
  }

  test("incremental embedding pairs equal brute-force old x new on the planted corpus") {
    // Corpus = raw embeddings (indexed once); batch = the planted twins.
    // On the gapped corpus the registered 8x4 config has recall 1, so
    // the incremental output must equal exact brute force old x new.
    val base = Tables(spark, sfDir).embeddings
      .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
    val corpus = Similarity.prepared(base, col("vec_id"), col("embedding"))
    val batch = Similarity.prepared(
      base.filter(pmod(col("vec_id"), lit(10)) === 0)
        .select((col("vec_id") + 100000).as("vec_id"),
          zip_with(col("embedding"), reverse(col("embedding")),
            (x, y) => x + y * lit(0.01)).as("embedding")),
      col("vec_id"), col("embedding"))
    val exact = corpus.select(col("vec_id").as("old_id"), col("vec").as("va"),
        col("norm").as("na"))
      .crossJoin(batch.select(col("vec_id").as("new_id"), col("vec").as("vb"),
        col("norm").as("nb")))
      .withColumn("cosine", VectorFunctions.dot(col("va"), col("vb"))
        / (col("na") * col("nb")))
      .filter(col("cosine") >= 0.8)
      .select("old_id", "new_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val index = Similarity.lshIndex(corpus, nPlanes = 8, nTables = 4)
    val got = Similarity.cosineIncrementalPairs(index, corpus, batch, 0.8,
        nPlanes = 8, nTables = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "planted batch must match its originals")
    assert(got == exact, s"incremental != brute force: " +
      s"missing ${exact -- got}, spurious ${got -- exact}")
    // every twin found its original and nothing else (gapped corpus)
    assert(got.forall { case (o, n) => n == o + 100000 })
    // over-cap fallback (shuffle-join verification) returns the same set
    val fallback = Similarity.cosineIncrementalPairs(index, corpus, batch, 0.8,
        nPlanes = 8, nTables = 4, maxBroadcastCandidates = 0).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(fallback == exact)
  }

  test("plan guard: bucketed LSH index join is exchange-free on the index side") {
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    val base = Tables(spark, sfDir).embeddings
      .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
    val corpus = Similarity.prepared(base, col("vec_id"), col("embedding"))
    val batch = Similarity.prepared(
      base.filter(pmod(col("vec_id"), lit(10)) === 0)
        .select((col("vec_id") + 100000).as("vec_id"), col("embedding")),
      col("vec_id"), col("embedding"))
    graft.sources.Bucketing.writeBucketed(
      Similarity.lshIndex(corpus, nPlanes = 8, nTables = 4),
      "lsh_idx_bucketed", Seq("band", "bucket"), buckets = 4)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    // exchange assertions need AQE off (see DedupSpec's bucketed guard)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val out = Similarity.cosineIncrementalPairs(spark.table("lsh_idx_bucketed"),
        corpus, batch, 0.8, nPlanes = 8, nTables = 4)
      val root = out.queryExecution.executedPlan
      def bucketedScans(p: SparkPlan) =
        p.collect { case f: FileSourceScanExec if f.bucketedScan => f }
      assert(bucketedScans(root).nonEmpty,
        s"index scan should read bucketed:\n$root")
      // non-vacuous: the batch side DOES shuffle its banded rows to meet
      // the bucketed index
      val allShuffles = root.collect { case e: ShuffleExchangeLike => e }
      assert(allShuffles.nonEmpty,
        s"expected the batch side to shuffle its banded rows:\n$root")
      // STRONGER than the minhash form: the first-agreeing-band rule
      // replaces the candidate distinct, so NO exchange of any kind sits
      // above the bucketed index scan (the verification joins broadcast).
      val shufflesAboveIndex = root.collect {
        case e: ShuffleExchangeLike
          if bucketedScans(e.asInstanceOf[SparkPlan]).nonEmpty => e
      }
      assert(shufflesAboveIndex.isEmpty,
        s"exchange above the bucketed index scan:\n$root")
      // and the bucketed path equals the unbucketed one
      val plain = Similarity.cosineIncrementalPairs(
        Similarity.lshIndex(corpus, nPlanes = 8, nTables = 4), corpus, batch,
        0.8, nPlanes = 8, nTables = 4)
      assert(out.exceptAll(plain).isEmpty && plain.exceptAll(out).isEmpty)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.sql("DROP TABLE IF EXISTS lsh_idx_bucketed")
    }
  }

  test("mismatched index config aborts fast instead of silently missing pairs") {
    // An index probed under a different layout would not be wrong, it
    // would quietly lose recall — the guard recomputes sampled buckets
    // from the index's own hashes under the probe layout and aborts on
    // disagreement (plane mismatch) or out-of-range bands (more index
    // tables than the probe claims).
    val base = Tables(spark, sfDir).embeddings
      .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
    val corpus = Similarity.prepared(base, col("vec_id"), col("embedding"))
    val index = Similarity.lshIndex(corpus, nPlanes = 8, nTables = 4)
    val batch = corpus.limit(10)
    val planeMismatch = intercept[IllegalArgumentException] {
      Similarity.cosineIncrementalPairs(index, corpus, batch, 0.8,
        nPlanes = 10, nTables = 4)
    }
    assert(planeMismatch.getMessage.contains("does not match the probe config"))
    val tableMismatch = intercept[IllegalArgumentException] {
      Similarity.cosineIncrementalPairs(index, corpus, batch, 0.8,
        nPlanes = 8, nTables = 2)
    }
    assert(tableMismatch.getMessage.contains("does not match the probe config"))
  }

  test("firstAgreeingBand JVM mirror agrees with the Catalyst banded layout on every pair") {
    // The streaming path's exactly-once rule re-derives band agreement
    // from the carried hash arrays on the JVM; if it ever diverged from
    // the Catalyst layout (bandedWithHashes' bucketOf slicing), streaming
    // and batch would silently disagree on which band emits a pair. Check
    // all pairs of a seeded corpus across single-hash (4x2, 8x4) and
    // split-hash (22x4 -> 2 columns, 25x5 -> 3 columns) configs: the
    // mirror must return exactly min(agreeing bands) or -1.
    val rnd = new scala.util.Random(42)
    val randoms = Seq.tabulate(12)(i =>
      (i.toLong, Seq.fill(16)(rnd.nextDouble() * 2 - 1)))
    // a planted exact copy guarantees the agree path is exercised even at
    // split-hash configs, where random 16-dim pairs almost never collide
    val vecs = (randoms :+ (12L, randoms.head._2)).toDF("vec_id", "vec")
    for ((planes, tables) <- Seq((4, 2), (8, 4), (22, 4), (25, 5))) {
      val rows = Similarity.bandedWithHashes(vecs, planes, tables)
        .select("vec_id", "hashes", "band", "bucket").collect()
      val hashesById = rows.map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      val buckets = rows.map(r =>
        (r.getLong(0), r.getInt(2)) -> r.getLong(3)).toMap
      assert(Similarity.firstAgreeingBand(planes, tables,
        hashesById(0L), hashesById(12L)) == 0, "exact copy must agree at band 0")
      for (a <- 0L until 13L; b <- 0L until 13L if a != b) {
        val agreeing = (0 until tables).filter(t =>
          buckets((a, t)) == buckets((b, t)))
        val expect = if (agreeing.isEmpty) -1 else agreeing.min
        val got = Similarity.firstAgreeingBand(planes, tables,
          hashesById(a), hashesById(b))
        assert(got == expect,
          s"config ${planes}x$tables pair ($a,$b): mirror=$got layout=$expect")
      }
    }
  }

  test("streaming ingestion: embedding dedup against the bucketed index, batch by batch") {
    // The embedding member of the streaming-ingest family (DedupSpec has
    // the minhash and span forms): the corpus LSH index is built and
    // bucketed ONCE; each arriving micro-batch of vectors joins against
    // it through foreachBatch + cosineIncrementalPairs (no corpus
    // re-hash); across micro-batches the emitted pairs equal the
    // brute-force old-cross-new answer on the planted corpus.
    import org.apache.spark.sql.DataFrame
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val base = Tables(spark, sfDir).embeddings
      .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
    val corpus = Similarity.prepared(base, col("vec_id"), col("embedding"))
    val twins = base.filter(pmod(col("vec_id"), lit(10)) === 0)
      .select((col("vec_id") + 100000).as("vec_id"),
        zip_with(col("embedding"), reverse(col("embedding")),
          (x, y) => x + y * lit(0.01)).as("embedding"))
    val exact = corpus.select(col("vec_id").as("old_id"), col("vec").as("va"),
        col("norm").as("na"))
      .crossJoin(Similarity.prepared(twins, col("vec_id"), col("embedding"))
        .select(col("vec_id").as("new_id"), col("vec").as("vb"), col("norm").as("nb")))
      .withColumn("cosine", VectorFunctions.dot(col("va"), col("vb"))
        / (col("na") * col("nb")))
      .filter(col("cosine") >= 0.8)
      .select("old_id", "new_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    graft.sources.Bucketing.writeBucketed(
      Similarity.lshIndex(corpus, nPlanes = 8, nTables = 4),
      "emb_idx_stream", Seq("band", "bucket"), buckets = 4)
    val found = scala.collection.mutable.Set[(Long, Long)]()
    try {
      val input = MemoryStream[(Long, Seq[Double])]
      val q = input.toDF().toDF("vec_id", "embedding").writeStream
        .foreachBatch { (batch: DataFrame, _: Long) =>
          val pairs = Similarity.cosineIncrementalPairs(
              spark.table("emb_idx_stream"), corpus,
              Similarity.prepared(batch, col("vec_id"), col("embedding")),
              0.8, nPlanes = 8, nTables = 4)
            .select("old_id", "new_id").collect()
            .map(r => (r.getLong(0), r.getLong(1)))
          found.synchronized { found ++= pairs }
          ()
        }
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory("ckpt-emb").toString)
        .start()
      val newVecs = twins.as[(Long, Seq[Double])].collect()
      val (b1, b2) = newVecs.splitAt(newVecs.length / 2)
      input.addData(b1.toIndexedSeq: _*)
      q.processAllAvailable()
      input.addData(b2.toIndexedSeq: _*)
      q.processAllAvailable()
      q.stop()
      assert(exact.nonEmpty, "planted twins must match their originals")
      assert(found.toSet == exact, s"streamed != brute force: " +
        s"missing ${exact -- found}, spurious ${found.toSet -- exact}")
    } finally spark.sql("DROP TABLE IF EXISTS emb_idx_stream")
  }

  test("under-provisioned LSH config aborts fast with the corrected config in the message") {
    // The failure mode this guards: candidate volume quadratic in N —
    // the job would not be wrong, it would shuffle and spill until the
    // cluster gave out (the 2M-vector/19-plane probe spilled past 80 GB
    // of local disk — BENCH_NOTES). 2-bit buckets on this corpus put
    // most of N² in candidates, far beyond the default 64×N budget.
    val ex = intercept[IllegalArgumentException] {
      Similarity.cosineNearDupPairsLsh(all, threshold = 0.8,
        nPlanes = 2, nTables = 4).count()
    }
    val n = all.count()
    assert(ex.getMessage.contains("under-provisioned"), ex.getMessage)
    assert(ex.getMessage.contains(s"lshAutoPlanes(n) = ${Similarity.lshAutoPlanes(n)}"),
      s"message must name the corrected config:\n${ex.getMessage}")
    assert(ex.getMessage.contains("maxCandidateFactor"), ex.getMessage)
    // the guard composes through the cluster/canonical wrappers too
    intercept[IllegalArgumentException] {
      Similarity.cosineClusters(all, 0.8, nPlanes = 2, nTables = 4).count()
    }
    // raising the factor (or passing infinity) is the documented escape
    // hatch for corpora whose quadratic output is genuine
    Similarity.cosineNearDupPairsLsh(all, threshold = 0.8,
      nPlanes = 2, nTables = 4,
      maxCandidateFactor = Double.PositiveInfinity).count()
  }

  test("lshAutoPlanes encodes the measured planes = log2(N)+1 rule") {
    assert(Similarity.lshAutoPlanes(1000000) == 21)   // measured: 6.1 s vs 182 at 15
    assert(Similarity.lshAutoPlanes(2000000) == 22)   // measured: 16.6 s vs 110 at 19
    assert(Similarity.lshAutoPlanes(8000000) == 24)
    assert(Similarity.lshAutoPlanes(1) == 4)          // clamped floor
    assert(Similarity.lshAutoPlanes(Long.MaxValue) == 63) // clamped ceiling
    intercept[IllegalArgumentException](Similarity.lshAutoPlanes(0))
    // the registered sf configs sit inside their own guard budget: the
    // auto rule at the gate corpus size stays a valid (guard-passing)
    // config as well
    val emb = all
    val auto = Similarity.lshAutoPlanes(emb.count())
    Similarity.cosineNearDupPairsLsh(emb, threshold = 0.8,
      nPlanes = auto, nTables = 4).count()
  }

  test("wide ANN top-k (>63 bits) stays a subset of correct cosines") {
    // 8 planes × 10 tables = 80 bits → two hash columns (7 + 3 tables).
    val got = Similarity.lshTopK(all, queries, k = 5,
      nPlanes = 8, maxProbe = 1, nTables = 10).collect()
    assert(got.nonEmpty)
    // pairs unique per (query, cand) — the first-probed-band rule holds
    // across hash columns
    val keys = got.map(r => (r.getLong(0), r.getLong(2)))
    assert(keys.distinct.length == keys.length, "pair scored twice")
    val exactCos = Similarity.bruteForceTopK(all, queries, k = all.count().toInt)
      .collect().map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    got.foreach { r =>
      assert(math.abs(exactCos((r.getLong(0), r.getLong(2))) - r.getDouble(3)) < 1e-12)
    }
    // OR-amplification across 10 tables on 8-bit buckets: decent recall
    val exactTop = Similarity.bruteForceTopK(all, queries, k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (keys.toSet & exactTop).size.toDouble / exactTop.size
    assert(recall >= 0.5, s"wide ANN recall $recall")
  }

  test("embedding clusters and canonical: twins cluster together, larger norm survives") {
    val base = Tables(spark, sfDir).embeddings
      .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
    val planted = base.unionByName(base.filter(pmod(col("vec_id"), lit(10)) === 0)
      .select((col("vec_id") + 100000).as("vec_id"),
        zip_with(col("embedding"), reverse(col("embedding")),
          (x, y) => x + y * lit(0.01)).as("embedding")))
    val emb = Similarity.prepared(planted, col("vec_id"), col("embedding"))
    val clusters = Similarity.cosineClusters(emb, 0.8, nPlanes = 8, nTables = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(clusters.size == emb.count())
    val twinIds = base.filter(pmod(col("vec_id"), lit(10)) === 0)
      .select("vec_id").collect().map(_.getLong(0))
    twinIds.foreach { v =>
      assert(clusters(v) == v && clusters(v + 100000) == v,
        s"twin pair $v not clustered to min id")
    }
    // everything else is a singleton labeled by itself
    clusters.foreach { case (id, c) =>
      if (!twinIds.contains(id) && !twinIds.contains(id - 100000))
        assert(c == id, s"unexpected cluster for $id")
    }
    val canon = Similarity.cosineCanonical(emb, 0.8, nPlanes = 8, nTables = 4)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val norms = emb.select(col("vec_id"), col("norm")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    twinIds.foreach { v =>
      val (keep, n) = canon(v)
      assert(n == 2)
      val expect = if (norms(v + 100000) > norms(v)) v + 100000 else v
      assert(keep == expect, s"cluster $v kept $keep, expected $expect")
    }
  }

  test("plan guard: banded LSH self-join exchanges carry no vectors") {
    // The fixed-width contract: the nTables-amplified (band, bucket)
    // exchange moves (id, hash, band, bucket) rows only; vectors cross
    // the wire at most once per side, in the candidate-sized fetch joins.
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    // AQE's pre-execution plan carries no exchanges yet (EnsureRequirements
    // runs at stage-preparation time); disable it so executedPlan shows them.
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val root = Similarity.cosineNearDupPairsLsh(all, 0.4, nPlanes = 8, nTables = 4)
        .queryExecution.executedPlan
      val banded = root.collect {
        case e: ShuffleExchangeLike
          if e.asInstanceOf[org.apache.spark.sql.execution.SparkPlan]
            .output.exists(_.name == "bucket") => e
      }
      assert(banded.nonEmpty, s"expected banded exchanges in:\n$root")
      banded.foreach { e =>
        val wide = e.asInstanceOf[org.apache.spark.sql.execution.SparkPlan]
          .output.filter(a => a.name.startsWith("v") && a.name != "vec_id")
        assert(wide.isEmpty, s"banded exchange carries vectors: $wide")
      }
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
    }
  }

  test("multi-table ANN top-k at the registered oracle params equals brute force") {
    val q10 = all.filter(col("vec_id") < 10)
    val exact = Similarity.bruteForceTopK(all, q10, k = 5).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val ann = Similarity.lshTopK(all, q10, k = 5,
        nPlanes = 4, maxProbe = 1, nTables = 8).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(ann == exact, s"ANN top-k != exact: ${ann.diff(exact)} / ${exact.diff(ann)}")
  }

  test("plan guard: LSH hashes each vector once per side (Generate-materialized)") {
    val pairsPlan = Similarity.cosineNearDupPairsLsh(all, 0.4, nPlanes = 2, nTables = 16,
        maxCandidateFactor = Double.PositiveInfinity)
      .queryExecution.executedPlan.toString
    val n = "hyperplane_lsh_bucket\\(".r.findAllIn(pairsPlan).size
    assert(n == 2, s"expected 2 hyperplane_lsh_bucket occurrences (one per side), got $n")
    val topkPlan = Similarity.lshTopK(all, all.filter(col("vec_id") < 10), 5,
        nPlanes = 4, maxProbe = 1, nTables = 8)
      .queryExecution.executedPlan.toString
    val m = "hyperplane_lsh_bucket\\(".r.findAllIn(topkPlan).size
    assert(m == 2, s"expected 2 hyperplane_lsh_bucket occurrences (corpus + query), got $m")
  }

  test("zero vectors never rank in top-k nor appear as near-duplicates") {
    val zero = Seq((9999L, Seq.fill(64)(0f))).toDF("vec_id", "embedding")
    val emb = Similarity.prepared(
      Tables(spark, sfDir).embeddings.select("vec_id", "embedding")
        .union(zero), col("vec_id"), col("embedding"))
    val topk = Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < 3), k = 5)
    assert(topk.filter(col("cand_id") === 9999L).count() == 0,
      "zero vector must not outrank real candidates (NaN ordering bug)")
    val pairs = Similarity.cosineNearDupPairs(emb, threshold = 0.0)
    assert(pairs.filter(col("id_a") === 9999L || col("id_b") === 9999L).count() == 0)
  }

  test("LSH ANN hits are a subset of correct cosines with decent recall") {
    val exact = Similarity.bruteForceTopK(all, queries, k = 5).collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    val ann = Similarity.lshTopK(all, queries, k = 5, nPlanes = 4, maxProbe = 1)
      .collect()
    // every ANN pair's cosine equals the exact cosine for that pair
    val allPairs = all.as("c").crossJoin(queries.select(
        col("vec_id").as("qid"), col("vec").as("qv"), col("norm").as("qn")))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"),
        (VectorFunctions.dot(col("vec"), col("qv")) / (col("norm") * col("qn"))).as("cos"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    ann.foreach { r =>
      val key = (r.getLong(0), r.getLong(2))
      assert(math.abs(allPairs(key) - r.getDouble(3)) < 1e-9)
    }
    // single-probe LSH: recall of exact top-5 should be nontrivial
    val hit = ann.map(r => (r.getLong(0), r.getLong(2))).count(exact.contains)
    val recall = hit.toDouble / exact.size
    assert(recall >= 0.2, s"ANN recall $recall suspiciously low")
  }
}
