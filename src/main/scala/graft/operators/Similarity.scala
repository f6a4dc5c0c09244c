package graft.operators

import graft.functions.VectorFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor / similarity search over an embedding
  * column (`array<float>` cast to `array<double>` for deterministic math).
  *
  * Two paths:
  *  - [[bruteForceTopK]] — exact cosine top-k: broadcast the (small) query
  *    set against the corpus, one scan, no corpus shuffle. This is the
  *    correctness baseline and is already the right 100 TB plan when the
  *    query set is small: corpus-side work is embarrassingly parallel.
  *  - [[lshTopK]] — random-hyperplane LSH: corpus and queries are bucketed
  *    by sign-pattern; candidates are same-bucket (or neighboring-probe)
  *    pairs only. Turns the per-query cost from O(N) to O(bucket), the
  *    scale path when queries are many.
  */
object Similarity {

  /** Guarded cosine from precomputed norms: null (not NaN) when either
    * norm is zero, so zero vectors can never rank first or pass
    * threshold filters (Spark sorts NaN above every double). */
  private def cosineFromNorms(dotCol: Column, na: Column, nb: Column): Column =
    when(na * nb === 0.0, lit(null).cast("double")).otherwise(dotCol / (na * nb))

  /** Normalize an embeddings table to (id, vec: array<double>, norm). */
  def prepared(emb: DataFrame, id: Column, vec: Column): DataFrame =
    emb.select(id.as("vec_id"), vec.cast("array<double>").as("vec"))
      .withColumn("norm", l2Norm(col("vec")))

  /** Exact top-k by cosine for each query vector. Query set is broadcast;
    * ranking window partitions by query id so the only shuffle is on the
    * (small) candidate set. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val c = corpus.select(col("vec_id").as("cand_id"), col("vec").as("cand_vec"),
      col("norm").as("cand_norm"))
    val q = queries.select(col("vec_id").as("query_id"), col("vec").as("query_vec"),
      col("norm").as("query_norm"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("cand_id") =!= col("query_id"))
      .withColumn("cosine", cosineFromNorms(
        dot(col("cand_vec"), col("query_vec")), col("cand_norm"), col("query_norm")))
    Ranking.topKPerQuery(scored, k)
  }

  /** Embedding-cosine near-duplicate pairs: all (id_a < id_b) pairs with
    * cosine ≥ `threshold`. This is the exact all-pairs baseline — one
    * cross join pruned by a cheap norm precomputation — correct at any
    * threshold and the oracle for the LSH-bucketed path, which is the
    * 100 TB plan (bucket join instead of cross join; recall < 1). */
  def cosineNearDupPairs(emb: DataFrame, threshold: Double): DataFrame = {
    val a = emb.select(col("vec_id").as("id_a"), col("vec").as("va"),
      col("norm").as("na"))
    val b = emb.select(col("vec_id").as("id_b"), col("vec").as("vb"),
      col("norm").as("nb"))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("cosine", cosineFromNorms(dot(col("va"), col("vb")), col("na"), col("nb")))
      .filter(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"), col("cosine"))
  }

  /** SemDeDup-style cluster-scoped near-dup pruning: duplicates are
    * searched only WITHIN a cluster (the `cluster` column — a semantic
    * partition such as a k-means/IVF assignment or a topic label), and a
    * row survives iff no lower-id cluster-mate sits at cosine ≥
    * `threshold`. This is the third point on the embedding-dedup
    * cost/recall curve alongside [[cosineNearDupPairs]] (exact, global,
    * quadratic) and [[cosineNearDupPairsLsh]] (global, sub-quadratic,
    * recall < 1): pruning is EXACT within clusters and zero across them
    * — the published semantic-dedup trade, where cross-cluster pairs are
    * by construction not near-duplicates.
    *
    * Scale shape: one hash partition of fixed-width (vec, norm) rows per
    * side on `cluster` — the only exchanges in the plan — then the
    * within-cluster pair generation is quadratic per CLUSTER, never per
    * corpus: cost is Σ|c|², bounded by (max cluster size)·N. The knob at
    * 100 TB is cluster granularity (more centroids → smaller clusters →
    * cheaper pairs, at more cross-cluster recall loss), exactly the
    * published trade; a skewed giant cluster should be split at
    * assignment time (increase k), not salted here, because salting
    * changes which pairs are compared at all. */
  def semDedupKeep(emb: DataFrame, id: Column, vec: Column, cluster: Column,
                   threshold: Double): DataFrame = {
    val prep = emb.select(id.as("vec_id"), vec.cast("array<double>").as("vec"),
        cluster.as("cluster"))
      .withColumn("norm", l2Norm(col("vec")))
    val a = prep.select(col("cluster"), col("vec_id").as("id_a"),
      col("vec").as("va"), col("norm").as("na"))
    val b = prep.select(col("cluster"), col("vec_id").as("id_b"),
      col("vec").as("vb"), col("norm").as("nb"))
    val dropped = a.join(b, Seq("cluster"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cosine",
        cosineFromNorms(dot(col("va"), col("vb")), col("na"), col("nb")))
      .filter(col("cosine") >= threshold)
      .select(col("id_b").as("vec_id")).distinct()
    prep.join(dropped, Seq("vec_id"), "left_anti")
      .select(col("vec_id"), col("cluster"))
  }

  /** [[semDedupKeep]] with PQ-CODED candidate scoring — the bandwidth fix
    * for its one scale-relevant cost. The float path carries the full
    * vector (+norm, ~520 B at dim 64) through BOTH sides of the
    * cluster-key shuffle; the r11 32M probe measured that shuffle as the
    * IO-bound stage. Here each side of the cluster join carries
    * (cluster, id, 16-byte code, 8-byte recon norm) — ~30× fewer bytes —
    * candidate pairs score on codes alone via the symmetric-distance
    * table ([[graft.functions.VectorExpressions.pqSdcDot]]: dot of the
    * two RECONSTRUCTIONS, exact from the m×ks×ks table), and only pairs
    * whose approximate cosine clears `threshold - margin` fetch float
    * vectors — by key, joined against the corpus, a volume proportional
    * to the near-dup density rather than the corpus — for the EXACT
    * cosine test that decides the prune. False candidates cost a fetch
    * and are then rejected by the exact test, so PRECISION is identical
    * to [[semDedupKeep]] by construction.
    *
    * The contract that differs: RECALL of the candidate stage is
    * STATISTICAL — `margin` covers the SDC approximation error on true
    * near-dup pairs up to a measured tail, not provably (a provable
    * per-pair bound exists via per-row residual norms, but at the
    * 1-bit/dim registered rate the residuals are ~0.6·‖v‖, so the bound
    * admits nearly every pair and prunes nothing — coarse-code pruning
    * is inherently statistical, as published). Measured: HIGH-cosine
    * pairs — the duplicates the operator exists for — sit far inside
    * the margin (twin pairs' SDC stays ≥ 0.93 for exact 0.9999; zero
    * misses through 16M); the tail it can miss is pairs NEAR the
    * threshold itself, where quantization noise is largest relative to
    * the gap — at 32M the extreme-value background crosses 0.8 and one
    * such pair in 310k prunes slipped the 0.3 margin (BENCH_NOTES r12).
    * `margin` is the knob: wider buys tail recall with more exact-check
    * fetch volume. A pair whose codes fail to score (geometry mismatch,
    * zero recon norm) is NOT a candidate and survives — same
    * keep-on-null direction as the float path's zero-norm guard.
    *
    * CORRUPT VECTORS (NaN/Inf components) keep parity by construction:
    * a row whose l2 norm is non-finite carries a 1-byte flag through
    * the cluster shuffle, and any pair touching a flagged row BYPASSES
    * the SDC filter straight to the exact re-check — so whatever the
    * float path's NaN-comparison semantics decide, this path decides
    * identically (the codes of a NaN vector would otherwise score a
    * finite SDC cosine and could silently drop the pair from
    * candidacy). Finite-vector overflow of the dot itself (norms near
    * 1e154) remains outside the contract, as it is for every cosine
    * operator in this repo.
    *
    * Scale shape: the cluster exchanges move codes, never vectors
    * (spec-guarded); the exact-check joins shuffle only candidate ids +
    * the fetched vectors for survivors. Σ|c|² pair cost is unchanged but
    * each pair costs an O(m) gather instead of an O(dim) dot. */
  def semDedupPqKeep(emb: DataFrame, id: Column, vec: Column, cluster: Column,
                     threshold: Double, model: PqCodec.PqModel,
                     margin: Double = 0.3): DataFrame = {
    import graft.functions.VectorExpressions
    val prep = emb.select(id.as("vec_id"), vec.cast("array<double>").as("vec"),
      cluster.as("cluster"))
    // `bad` flags non-finite vectors (NaN/Inf components ⇒ non-finite l2
    // norm; x − x is NaN exactly for non-finite x) — one byte through the
    // shuffle, so corrupt rows reach the exact re-check unconditionally
    val nrm = l2Norm(col("vec"))
    val coded = prep
      .withColumn("code", VectorExpressions.pqEncode(col("vec"), model.codebooks))
      .select(col("vec_id"), col("cluster"), col("code"),
        sqrt(VectorExpressions.pqReconNorm2(col("code"), model.cn2)).as("crn"),
        isnan(nrm - nrm).as("bad"))
    val a = coded.select(col("cluster"), col("vec_id").as("id_a"),
      col("code").as("ca"), col("crn").as("crna"), col("bad").as("bada"))
    val b = coded.select(col("cluster"), col("vec_id").as("id_b"),
      col("code").as("cb"), col("crn").as("crnb"), col("bad").as("badb"))
    val candidates = a.join(b, Seq("cluster"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("acos", cosineFromNorms(
        VectorExpressions.pqSdcDot(col("ca"), col("cb"), model.sdc),
        col("crna"), col("crnb")))
      .filter(col("bada") || col("badb") ||
        col("acos") >= threshold - margin)
      .select(col("id_a"), col("id_b"))
    val va = prep.select(col("vec_id").as("id_a"), col("vec").as("va"))
      .withColumn("na", l2Norm(col("va")))
    val vb = prep.select(col("vec_id").as("id_b"), col("vec").as("vb"))
      .withColumn("nb", l2Norm(col("vb")))
    val dropped = candidates
      .join(va, Seq("id_a"))
      .join(vb, Seq("id_b"))
      .withColumn("cosine",
        cosineFromNorms(dot(col("va"), col("vb")), col("na"), col("nb")))
      .filter(col("cosine") >= threshold)
      .select(col("id_b").as("vec_id")).distinct()
    prep.join(dropped, Seq("vec_id"), "left_anti")
      .select(col("vec_id"), col("cluster"))
  }

  /** Layout of an `nPlanes × nTables` LSH config over however many 64-bit
    * hash columns it needs: `tablesPerHash = 63 / nPlanes` bands fit one
    * hash, so configs up to 63 total bits keep a single hash column
    * (bit-identical to the historical layout) and wider ones — the
    * >1M-vector regime where bucket granularity must keep growing — split
    * across `ceil(nTables / tablesPerHash)` columns whose kernels project
    * onto DISJOINT plane indices (`planeOffset`), i.e. independent tables.
    * For global table `t`: hash column `t / tablesPerHash`, band
    * `t % tablesPerHash` within it. */
  private final case class LshLayout(nPlanes: Int, nTables: Int) {
    require(nPlanes >= 1 && nPlanes <= 63 && nTables >= 1 && nTables <= 62,
      s"need 1 <= nPlanes <= 63 and 1 <= nTables <= 62, got $nPlanes x $nTables")
    val mask: Long = (1L << nPlanes) - 1
    val tablesPerHash: Int = 63 / nPlanes
    val nHashes: Int = (nTables + tablesPerHash - 1) / tablesPerHash
    def tablesIn(h: Int): Int =
      math.min(tablesPerHash, nTables - h * tablesPerHash)
    /** One kernel eval per hash column, as fields of a single struct —
      * materialized behind a Generate by the caller so each kernel runs
      * exactly once per row. */
    def hashStruct(vec: Column): Column =
      struct((0 until nHashes).map(h =>
        hyperplaneLshBucket(vec, nPlanes * tablesIn(h),
          planeOffset = h * tablesPerHash * nPlanes).as(s"h$h")): _*)
    def hashCols(prefix: String): Seq[Column] =
      (0 until nHashes).map(h => col(s"${prefix}h$h"))
    /** Bucket of global table `t` from the materialized hash struct. */
    def bucketOf(hs: String => Column, t: Int): Column =
      call_function("shiftright", hs(s"h${t / tablesPerHash}"),
        lit((t % tablesPerHash) * nPlanes)).bitwiseAND(lit(mask))
    /** Bitmap with bit `t` set iff table `t`'s band xor is within
      * `maxProbe` bits (0 = buckets agree exactly) — compile-time unrolled
      * over tables, plain bit arithmetic on the carried hashes at
      * runtime. */
    def matchMap(ha: String => Column, hb: String => Column,
                 maxProbe: Int = 0): Column =
      (0 until nTables).foldLeft(lit(0L)) { (acc, t) =>
        val xorH = ha(s"h${t / tablesPerHash}").bitwiseXOR(hb(s"h${t / tablesPerHash}"))
        val bandXor = call_function("shiftright", xorH,
          lit((t % tablesPerHash) * nPlanes)).bitwiseAND(lit(mask))
        val matches =
          if (maxProbe == 0) bandXor === 0 else bit_count(bandXor) <= maxProbe
        acc.bitwiseOR(when(matches, lit(1L << t)).otherwise(lit(0L)))
      }
    /** True iff no table before `band` has its bit set in `map` — the
      * emit-once-per-pair rule: only the first agreeing/probed band emits. */
    def firstBand(map: Column, band: Column): Column =
      map.bitwiseAND(
        call_function("shiftleft", lit(1L), band) - lit(1L)) === 0
  }

  /** Number of 64-bit hash columns an (nPlanes, nTables) LSH config
    * occupies — [[LshLayout]]'s derivation, exposed so tooling reports
    * the same layout the operators use (and fails with the layout's own
    * require on an invalid config instead of dividing by zero). */
  def lshHashColumns(nPlanes: Int, nTables: Int): Int =
    LshLayout(nPlanes, nTables).nHashes

  /** The measured provisioning rule for [[cosineNearDupPairsLsh]]:
    * `planes ≈ log2(N)+1`, i.e. ~2 buckets per vector per table, so
    * per-table candidate volume stays ≈ N/2 and the self-join is linear
    * in the corpus. Measured to 8M vectors (BENCH_NOTES round 5): recall
    * tracks the closed-form miss rate at every size, while configs a few
    * planes short of this go quadratic (2M vectors at 19 planes spilled
    * 60M candidates per table; at 22 it runs in 16.6 s). Clamped to
    * [4, 63]; pair with 4–5 OR-tables for recall. */
  def lshAutoPlanes(n: Long): Int = {
    require(n >= 1, s"corpus size must be positive, got $n")
    math.min(63, math.max(4,
      (math.log(n.toDouble) / math.log(2.0)).ceil.toInt + 1))
  }

  /** Banded LSH index rows of a prepared embeddings frame: one
    * (vec_id, h0..h{nHashes-1}, band, bucket) row per table per vector —
    * fixed-width, NO vector payload, kernels evaluated once per row
    * behind a Generate. Shared by the self-join and incremental paths. */
  private def bandedIndex(emb: DataFrame, lay: LshLayout): DataFrame = {
    val hashed = emb.select(col("vec_id"),
        posexplode_outer(array(lay.hashStruct(col("vec")))).as(Seq("__p", "hs")))
      .select(col("vec_id") +: (0 until lay.nHashes)
        .map(h => col("hs")(s"h$h").as(s"h$h")): _*)
    hashed.select(col("vec_id") +: lay.hashCols("") :+
      posexplode_outer(array((0 until lay.nTables)
        .map(t => lay.bucketOf(f => col(f), t)): _*)).as(Seq("band", "bucket")): _*)
  }

  /** Persistable banded LSH index of a [[prepared]] embeddings corpus:
    * `nTables` fixed-width (vec_id, hash column(s), band, bucket) rows
    * per vector, the corpus half of [[cosineIncrementalPairs]]. Write it
    * bucketed on (band, bucket)
    * ([[graft.sources.Bucketing.writeBucketed]]) so ingest-time joins
    * are exchange-free on the corpus side (plan-guard spec'd). Rebuild
    * (or append) with the SAME (nPlanes, nTables) the probe side will
    * use — bucket bits are config-specific. */
  def lshIndex(emb: DataFrame, nPlanes: Int = 4, nTables: Int = 1): DataFrame =
    bandedIndex(emb, LshLayout(nPlanes, nTables))

  /** Streaming-shape banded rows: every input column kept, plus the
    * materialized `hashes` array (one element per 64-bit hash column) and
    * one (band, bucket) row per table — the keying step of the
    * within-stream near-dup path ([[graft.streaming.StreamingNearDup]]).
    * Map-only (kernels once per row behind a Generate), so legal on a
    * streaming DataFrame. */
  private[graft] def bandedWithHashes(emb: DataFrame, nPlanes: Int,
                                      nTables: Int): DataFrame = {
    val lay = LshLayout(nPlanes, nTables)
    def h(f: String): Column = element_at(col("hashes"), lit(f.drop(1).toInt + 1))
    emb
      .select(col("*"),
        posexplode_outer(array(lay.hashStruct(col("vec")))).as(Seq("__p", "__hs")))
      .withColumn("hashes",
        array((0 until lay.nHashes).map(i => col("__hs")(s"h$i")): _*))
      .drop("__p", "__hs")
      .select(col("*"), posexplode_outer(array((0 until nTables)
        .map(t => lay.bucketOf(h, t)): _*)).as(Seq("band", "bucket")))
  }

  /** JVM mirror of [[LshLayout.matchMap]] + [[LshLayout.firstBand]] for
    * executor-side state code: index of the first table whose band agrees
    * between two hash arrays (as produced by [[bandedWithHashes]]), or -1
    * if none agree. Emitting a pair only from its first agreeing band is
    * what makes multi-table detection exactly-once without a distinct. */
  private[graft] def firstAgreeingBand(nPlanes: Int, nTables: Int,
                                       ha: Seq[Long], hb: Seq[Long]): Int = {
    val lay = LshLayout(nPlanes, nTables)
    var t = 0
    while (t < nTables) {
      val x = ha(t / lay.tablesPerHash) ^ hb(t / lay.tablesPerHash)
      if (((x >> ((t % lay.tablesPerHash) * nPlanes)) & lay.mask) == 0L) return t
      t += 1
    }
    -1
  }

  /** LSH-bucketed variant of [[cosineNearDupPairs]]: candidates share a
    * bucket in at least one of `nTables` hash tables, then exact-cosine
    * verified (precision 1 by construction). Linear shuffle volume.
    *
    * OR-amplification: `nPlanes × nTables` hyperplane bits are computed
    * per vector in one kernel pass per 64-bit hash column (materialized
    * behind a Generate so each kernel runs once — see
    * [[graft.operators.Dedup.simhashPairs]] for why), and each table's
    * bucket is one `nPlanes`-bit band. A pair at cosine θ agrees on a
    * band with probability p^nPlanes (p = 1 − arccos(θ)/π) and is missed
    * only if ALL `nTables` bands disagree — miss = (1 − p^nPlanes)^nTables,
    * driven arbitrarily low by tables while each table's bucket stays
    * selective. Configs wider than 63 total bits split across multiple
    * independent hash columns (see [[LshLayout]]) — the regime past ~1M
    * vectors where `2^nPlanes` buckets must keep pace with N²-growing
    * candidate volume. Recall/cost is measured in the spec suite; with
    * enough tables the verified output equals [[cosineNearDupPairs]]
    * exactly, which is how the driver oracle checks it.
    *
    * Under-provisioning guard: an `nPlanes` far below [[lshAutoPlanes]]
    * makes candidate volume quadratic — every candidate is
    * exact-verified, so the job doesn't return wrong answers, it
    * shuffles and spills until the cluster gives out (a 2M-vector probe
    * at 19 planes generated ~60M candidates per table and spilled past
    * 80 GB of local disk — BENCH_NOTES). Before the self-join, ACTUAL
    * bucket occupancy is aggregated (fixed-width rows, one cheap extra
    * pass — the same measured-count shape as
    * [[Dedup.minhashIncrementalPairs]]'s broadcast guard) and the run
    * aborts, naming the correctly-provisioned config, when
    * Σ C(occupancy, 2) exceeds `maxCandidateFactor × N`. Corpora with
    * genuinely huge near-dup clusters (where quadratic OUTPUT is the
    * right answer) can raise the factor; `Double.PositiveInfinity`
    * skips the guard pass entirely. */
  def cosineNearDupPairsLsh(emb: DataFrame, threshold: Double,
                            nPlanes: Int = 4, nTables: Int = 1,
                            maxCandidateFactor: Double = 64.0): DataFrame = {
    val lay = LshLayout(nPlanes, nTables)
    // kernels once per row, attribute-materialized behind the Generate.
    // The banded index rows are FIXED-WIDTH (id, hash column(s), band,
    // bucket) — vectors are deliberately NOT carried: the nTables-way
    // self-join exchange would otherwise move every vector nTables times
    // per side. Vectors are fetched afterwards for surviving candidate
    // pairs only, so each one crosses the wire at most once per side
    // however many tables amplify recall.
    val banded = bandedIndex(emb, lay)
    // Candidate-volume guard (see scaladoc). Deliberately a count, not a
    // persist: caching `banded` would hide the scan from the final plan
    // and with it the evidence the plan-guard specs audit. Column pruning
    // keeps the extra pass fixed-width — (band, bucket) only.
    if (!maxCandidateFactor.isPosInfinity) {
      val g = banded.groupBy(col("band"), col("bucket"))
        .agg(count(lit(1)).as("occ"))
        // occ*(occ-1) stays integral (Column./ would go through DOUBLE
        // and lose exactness past 2^53); halved on the driver.
        .agg(sum(col("occ")).as("n_rows"),
          sum(col("occ") * (col("occ") - lit(1L))).as("cands2"))
        .head()
      if (!g.isNullAt(0)) {
        val nVecs = g.getLong(0) / nTables
        val cands = g.getLong(1) / 2
        if (nVecs > 0 && cands > maxCandidateFactor * nVecs)
          throw new IllegalArgumentException(
            f"cosineNearDupPairsLsh: config ($nPlanes planes x $nTables " +
              f"tables) is under-provisioned for this corpus: bucket " +
              f"occupancy implies $cands%,d candidate pairs over $nVecs%,d " +
              f"vectors (> maxCandidateFactor=$maxCandidateFactor x N). " +
              f"Every candidate is exact-verified, so this would shuffle/" +
              f"spill quadratically rather than fail. Use nPlanes = " +
              f"lshAutoPlanes(n) = ${lshAutoPlanes(nVecs)} (planes = " +
              f"log2(N)+1 keeps per-table candidates near N/2), or raise " +
              f"maxCandidateFactor if the corpus genuinely contains " +
              f"near-dup clusters this large.")
      }
    }
    val a = banded.select(col("vec_id").as("id_a") +:
      (0 until lay.nHashes).map(h => col(s"h$h").as(s"ha$h")) :+
      col("band") :+ col("bucket"): _*)
    val b = banded.select(col("vec_id").as("id_b") +:
      (0 until lay.nHashes).map(h => col(s"h$h").as(s"hb$h")) :+
      col("band") :+ col("bucket"): _*)
    // Each colliding pair is emitted from its FIRST agreeing band only,
    // so scoring runs once per candidate pair and no dedup exchange
    // exists at all (the join's shuffle moves only the banded index rows —
    // the wide joined stream never materializes). The test is pure bit
    // arithmetic on the carried hashes — no per-row array allocation.
    val firstAgreeingBand = lay.firstBand(
      lay.matchMap(f => col("ha" + f.drop(1)), f => col("hb" + f.drop(1))),
      col("band"))
    val cand = a.join(b, Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b") && firstAgreeingBand)
      .select(col("id_a"), col("id_b"))
    // Exact verification on survivors: two id-keyed joins, candidate-sized;
    // the only exchanges that ever carry a vector.
    val va = emb.select(col("vec_id").as("id_a"), col("vec").as("va"),
      col("norm").as("na"))
    val vb = emb.select(col("vec_id").as("id_b"), col("vec").as("vb"),
      col("norm").as("nb"))
    cand.join(va, "id_a").join(vb, "id_b")
      .withColumn("cosine", cosineFromNorms(dot(col("va"), col("vb")), col("na"), col("nb")))
      .filter(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"), col("cosine"))
  }

  /** Incremental embedding near-dup: verified cosine-≥-threshold pairs
    * between a NEW batch of vectors and an EXISTING corpus, given the
    * corpus's prebuilt [[lshIndex]] — the embedding member of the
    * ingest-time family ([[Dedup.minhashIncrementalPairs]] for text,
    * [[Dedup.spanIncrementalStats]] for spans): yesterday's 100 TB of
    * indexed vectors must not be re-hashed to admit today's batch.
    * Returns (old_id, new_id, cosine). Old×new only — within-batch
    * duplicates are [[cosineNearDupPairsLsh]]'s job — and corpus/batch
    * id spaces are assumed disjoint. `nPlanes`/`nTables` MUST match the
    * index build (bucket bits are config-specific).
    *
    * Scale: the batch is hashed once (map-only, `nTables` fixed-width
    * rows per vector) and joined against the index on (band, bucket);
    * with the index written bucketed on that key the join is
    * exchange-free on the corpus side and only the batch's banded rows
    * shuffle (plan-guard spec'd). Both sides carry their hash columns,
    * so the first-agreeing-band rule dedups candidates with plain bit
    * arithmetic — NO distinct exchange exists at all (a step beyond the
    * minhash form, whose band signatures cannot express it). Vectors
    * enter only in verification: the candidate set is counted first
    * (the shared guard shape) and broadcast-hinted below
    * `maxBroadcastCandidates`, so the corpus vector column is scanned
    * once and never shuffled; above the cap the hints drop and the
    * planner's join runs instead. */
  /** Fail fast on an index built under a different layout: bucket bits
    * are config-specific, and a mismatched probe would not be WRONG, it
    * would silently miss pairs (exact verification keeps precision 1
    * regardless). A small sample's buckets are recomputed from the
    * carried hashes under the probe layout — any disagreement, or a band
    * outside the probe's table range, proves the configs differ. Catches
    * plane-count/layout mismatches and an index with MORE tables than
    * the probe claims; a probe claiming more tables than the index has
    * is undetectable from a sample and simply leaves the extra bands
    * candidate-less (recall loss — keep configs identical). */
  private def requireIndexLayout(index: DataFrame, lay: LshLayout,
                                 nPlanes: Int, nTables: Int): Unit = {
    val cols = col("band") +: col("bucket") +: lay.hashCols("")
    index.select(cols: _*).limit(64).collect().foreach { r =>
      val band = r.getInt(0)
      val ok = band >= 0 && band < nTables && {
        val h = r.getLong(2 + band / lay.tablesPerHash)
        ((h >> ((band % lay.tablesPerHash) * nPlanes)) & lay.mask) == r.getLong(1)
      }
      if (!ok) throw new IllegalArgumentException(
        s"cosineIncrementalPairs: the index does not match the probe " +
          s"config ($nPlanes planes x $nTables tables) — its (band, bucket) " +
          "rows disagree with buckets recomputed from its own hash columns " +
          "under that layout. Rebuild the index with lshIndex at the SAME " +
          "(nPlanes, nTables) the probe side uses; bucket bits are " +
          "config-specific.")
    }
  }

  def cosineIncrementalPairs(index: DataFrame, corpus: DataFrame,
                             batch: DataFrame, threshold: Double,
                             nPlanes: Int = 4, nTables: Int = 1,
                             maxBroadcastCandidates: Long = 1000 * 1000): DataFrame = {
    val lay = LshLayout(nPlanes, nTables)
    requireIndexLayout(index, lay, nPlanes, nTables)
    val old = index.select(col("vec_id").as("old_id") +:
      (0 until lay.nHashes).map(h => col(s"h$h").as(s"ha$h")) :+
      col("band") :+ col("bucket"): _*)
    val fresh = bandedIndex(batch, lay).select(col("vec_id").as("new_id") +:
      (0 until lay.nHashes).map(h => col(s"h$h").as(s"hb$h")) :+
      col("band") :+ col("bucket"): _*)
    val firstAgreeingBand = lay.firstBand(
      lay.matchMap(f => col("ha" + f.drop(1)), f => col("hb" + f.drop(1))),
      col("band"))
    val cand = old.join(fresh, Seq("band", "bucket"))
      .filter(firstAgreeingBand)
      .select(col("old_id"), col("new_id"))
    // Count, deliberately not persist — same rationale as
    // minhashIncrementalPairs: an InMemoryRelation would hide the
    // bucketed index scan from the executed plan and blind the plan
    // guards. The counted rows are fixed-width ids.
    val broadcastSafe = cand.count() <= maxBroadcastCandidates
    def hinted(df: DataFrame): DataFrame = if (broadcastSafe) broadcast(df) else df
    if (!broadcastSafe)
      System.err.println(
        s"[graft] cosineIncrementalPairs: candidate set exceeds " +
          s"$maxBroadcastCandidates rows — falling back to a shuffle join; " +
          "check the index config against lshAutoPlanes(corpusSize)")
    val withOld = corpus
      .select(col("vec_id").as("old_id"), col("vec").as("va"), col("norm").as("na"))
      .join(hinted(cand), "old_id")
    batch.select(col("vec_id").as("new_id"), col("vec").as("vb"), col("norm").as("nb"))
      .join(hinted(withOld), "new_id")
      .withColumn("cosine", cosineFromNorms(dot(col("va"), col("vb")), col("na"), col("nb")))
      .filter(col("cosine") >= threshold)
      .select(col("old_id"), col("new_id"), col("cosine"))
  }

  /** Transitive embedding near-dup clusters: connected components over
    * the [[cosineNearDupPairsLsh]] pair graph (hybrid driver/distributed —
    * [[Dedup.componentsFromPairs]]); every vector gets `cluster_id` = the
    * smallest reachable vec_id, singletons themselves. The embedding
    * mirror of [[Dedup.minhashClusters]], at the same cost shape: the
    * component graph is pair-sized, and the corpus is touched only by
    * the final label join (labels broadcast below `driverMaxEdges`). */
  def cosineClusters(emb: DataFrame, threshold: Double,
                     nPlanes: Int = 4, nTables: Int = 1,
                     maxIters: Int = 20,
                     driverMaxEdges: Long = 1000 * 1000,
                     maxCandidateFactor: Double = 64.0): DataFrame = {
    val pairs = cosineNearDupPairsLsh(emb, threshold, nPlanes, nTables,
        maxCandidateFactor)
      .select(col("id_a"), col("id_b"))
    val labels = Dedup.componentsFromPairs(pairs, driverMaxEdges, maxIters)
      .withColumnRenamed("id", "vec_id")
    emb.select(col("vec_id"))
      .join(labels, Seq("vec_id"), "left")
      .select(col("vec_id"), coalesce(col("label"), col("vec_id")).as("cluster_id"))
  }

  /** Canonical-vector selection per near-dup cluster: the member with
    * the largest L2 norm survives (ties to the smallest vec_id) — one
    * `max_by` aggregation over (cluster_id, vec_id, norm) rows on top of
    * [[cosineClusters]], no window sort, vectors untouched. */
  def cosineCanonical(emb: DataFrame, threshold: Double,
                      nPlanes: Int = 4, nTables: Int = 1,
                      maxCandidateFactor: Double = 64.0): DataFrame = {
    val clustered = cosineClusters(emb, threshold, nPlanes, nTables,
        maxCandidateFactor = maxCandidateFactor)
      .join(emb.select(col("vec_id"), col("norm")), "vec_id")
    clustered.groupBy(col("cluster_id"))
      .agg(max_by(col("vec_id"), struct(col("norm"), -col("vec_id"))).as("keep_id"),
        count(lit(1)).as("n_members"),
        max(col("norm")).as("keep_norm"))
  }

  /** Symmetric per-vector int8 quantization: `scale = maxabs/127`,
    * `codes[i] = round(vec[i]·127/maxabs)`. 4× smaller than float32 (8× vs
    * the double vectors used for exact math) — at corpus scale the win is
    * scan/shuffle bandwidth: ANN candidate generation (LSH/IVF buckets) can
    * run entirely over codes, with exact re-scoring only on survivors.
    * Pure codegen-able expressions, no shuffle. Zero vectors quantize to
    * all-zero codes with scale 0 (dequantization is exact for them). */
  def quantizeInt8(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"), col("vec"))
      .withColumn("maxabs", array_max(transform(col("vec"), x => abs(x))))
      .select(col("vec_id"),
        when(col("maxabs") === 0.0, lit(0.0))
          .otherwise(col("maxabs") / 127.0).as("scale"),
        when(col("maxabs") === 0.0,
            transform(col("vec"), _ => lit(0).cast("tinyint")))
          .otherwise(transform(col("vec"),
            x => round(x * 127.0 / col("maxabs"), 0).cast("tinyint")))
          .as("codes"))

  /** Top-k via a PCA-REDUCED candidate scan with exact re-ranking — the
    * dimension-axis sibling of [[quantizedTopK]]'s precision axis: the
    * model trains on the L2-NORMALIZED corpus (one [[Pca]] moments pass),
    * candidates are ranked by reduced-space L2 (for unit vectors L2
    * order IS cosine order, and the top-variance subspace preserves L2
    * up to the discarded variance), the best `rerank × k` per query
    * survive, and only those re-score against the exact vectors. The
    * reduced score drops the per-query-constant ‖z_q‖²: rank by
    * 2·z_q·z_c − ‖z_c‖².
    *
    * WHEN THIS PAYS — measured honestly: the win is proportional to how
    * fast the spectrum decays. On a corpus with planted structure
    * (`pca_scale` probe: explained@16 of 64 dims = 0.92) 16 dims carry
    * nearly everything; on the ISOTROPIC synthetic test embeddings
    * (explained@16 ≈ 0.25 — hash noise has a flat spectrum) recall@5
    * at kDims=16/rerank=4 is only 0.40, and exact-parity needs
    * kDims=32/rerank=16 (spec-pinned). Real embedding models produce
    * decaying spectra; verify YOUR corpus's explained fraction (the
    * `embed_pca` certify output) before choosing kDims — which is why
    * this ships as an operator with a measured-recall spec rather than
    * a hash-gated registered query on data PCA cannot compress. */
  def pcaTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              rerank: Int = 4, kDims: Int = 16): DataFrame = {
    import graft.operators.Pca
    import graft.functions.VectorExpressions.dotProduct
    require(rerank >= 1, s"need rerank >= 1, got $rerank")
    val unitV = transform(col("vec"), x => x / col("norm"))
    // zero-norm corpus vectors would train NaN/Inf unit components and
    // poison the ENTIRE moments aggregate (every trained component NaN,
    // all reduced-space rankings garbage) — exclude them from training;
    // they still appear as candidates, where cosineFromNorms handles them
    val model = Pca.train(
      corpus.filter(col("norm") > lit(0.0)).select(unitV.as("uv")),
      col("uv"), kDims)
    def zArray: Column = array(model.components.map { comp =>
      dotProduct(col("vec"), typedLit(comp.toSeq)) / col("norm") -
        lit(comp.zip(model.mean).map { case (a, b) => a * b }.sum)
    }: _*)
    val cz = corpus.select(col("vec_id").as("cand_id"), zArray.as("cz"))
      .withColumn("cn2", dotProduct(col("cz"), col("cz")))
    val qz = queries.select(col("vec_id").as("query_id"), zArray.as("qz"))
    val approx = cz.crossJoin(broadcast(qz))
      .filter(col("cand_id") =!= col("query_id"))
      .withColumn("rs",
        lit(2.0) * dotProduct(col("cz"), col("qz")) - col("cn2"))
    val candidates = Ranking.topKPerQuery(approx, k * rerank, "rs")
      .select(col("query_id"), col("cand_id"))
    val c = corpus.select(col("vec_id").as("cand_id"),
      col("vec").as("cand_vec"), col("norm").as("cand_norm"))
    val q = queries.select(col("vec_id").as("query_id"),
      col("vec").as("query_vec"), col("norm").as("query_norm"))
    val rescored = candidates
      .join(c, "cand_id")
      .join(broadcast(q), "query_id")
      .withColumn("cosine", cosineFromNorms(
        dot(col("cand_vec"), col("query_vec")),
        col("cand_norm"), col("query_norm")))
    Ranking.topKPerQuery(rescored, k)
  }

  /** Top-k via the quantized corpus with exact re-ranking: candidates are
    * scored on int8 codes (8× less scan/shuffle bandwidth than the double
    * vectors — at 100 TB the scan IS the cost), the best `rerank × k` per
    * query survive, and only those re-score against the exact vectors.
    * Quantized cosine ≈ true cosine to ~1/254 per component, so with a
    * modest rerank multiple the final top-k matches exact brute force
    * (recall measured in the spec suite). The exact-vector join touches
    * candidates only — `rerank × k × |queries|` rows. */
  def quantizedTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                    rerank: Int = 4): DataFrame = {
    val cq = quantizeInt8(corpus)
      .select(col("vec_id").as("cand_id"), col("scale").as("cand_scale"),
        col("codes").cast("array<double>").as("cand_codes"))
    val qq = quantizeInt8(queries)
      .select(col("vec_id").as("query_id"), col("scale").as("query_scale"),
        col("codes").cast("array<double>").as("query_codes"))
    // cosine of the dequantized vectors: scales cancel in the norms, so
    // only the code arrays matter — scale columns are needed for nothing
    // but sign (always >= 0) and are dropped.
    val approx = cq.crossJoin(broadcast(qq))
      .filter(col("cand_id") =!= col("query_id"))
      .withColumn("acos", cosineFromNorms(
        dot(col("cand_codes"), col("query_codes")),
        sqrt(dot(col("cand_codes"), col("cand_codes"))),
        sqrt(dot(col("query_codes"), col("query_codes")))))
    val candidates = Ranking.topKPerQuery(approx, k * rerank, "acos")
      .select(col("query_id"), col("cand_id"))
    // exact re-score on survivors only
    val c = corpus.select(col("vec_id").as("cand_id"), col("vec").as("cand_vec"),
      col("norm").as("cand_norm"))
    val q = queries.select(col("vec_id").as("query_id"), col("vec").as("query_vec"),
      col("norm").as("query_norm"))
    val rescored = candidates
      .join(c, "cand_id")
      .join(broadcast(q), "query_id")
      .withColumn("cosine", cosineFromNorms(
        dot(col("cand_vec"), col("query_vec")), col("cand_norm"), col("query_norm")))
    Ranking.topKPerQuery(rescored, k)
  }

  /** Multi-probe, multi-table LSH-bucketed ANN. The corpus is hashed ONCE
    * into an `nPlanes × nTables`-bit sign pattern and emits one
    * (band, bucket) row per table; each query probes, per table, its own
    * bucket plus all buckets within Hamming distance `maxProbe` (fan-out
    * is query-side only — `nTables × Σ C(nPlanes,i)` keys per query — so
    * the corpus is never duplicated beyond its `nTables` fixed-width
    * index rows, which is what makes this the 100 TB path). Recall/cost
    * is tuned by `nPlanes` (bucket granularity), `maxProbe` (within-table
    * coverage) and `nTables` (OR-amplification across independent
    * tables); the spec suite measures recall against brute force, and
    * with enough tables the top-k equals brute force exactly (the driver
    * oracle checks that).
    *
    * No candidate-volume guard here, deliberately — the asymmetry with
    * [[cosineNearDupPairsLsh]] matters: that operator SELF-joins the
    * corpus, so under-provisioning is quadratic in N (cluster-killing,
    * hence the abort). Here the corpus only ever joins the (small,
    * broadcast) query probe set, so the worst case of an
    * under-provisioned config is per-query cost degrading toward
    * [[bruteForceTopK]]'s O(N) — slow, bounded, and correct, never a
    * spill explosion. Provision with [[lshAutoPlanes]] all the same. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              nPlanes: Int = 8, maxProbe: Int = 1, nTables: Int = 1): DataFrame = {
    val lay = LshLayout(nPlanes, nTables)
    // corpus: one kernel per hash column per row behind a Generate, then
    // nTables index rows
    val c = corpus.select(col("vec_id").as("cand_id"), col("vec").as("cand_vec"),
        col("norm").as("cand_norm"),
        posexplode_outer(array(lay.hashStruct(col("vec")))).as(Seq("__p", "chs")))
      .select(Seq(col("cand_id"), col("cand_vec"), col("cand_norm")) ++
        (0 until lay.nHashes).map(h => col("chs")(s"h$h").as(s"ch$h")): _*)
      .select(col("*"),
        posexplode_outer(array((0 until nTables)
          .map(t => lay.bucketOf(f => col("c" + f), t)): _*))
          .as(Seq("band", "bucket")))
    // all bit-masks with popcount ≤ maxProbe, XORed onto the query bucket —
    // enumerated as bit-position combinations, O(output) regardless of
    // nPlanes (a 0 until 2^n scan breaks down for large n)
    val masks: Seq[Long] = (0 to maxProbe).flatMap(p =>
      (0 until nPlanes).combinations(p).map(_.foldLeft(0L)((m, b) => m | (1L << b))))
    val q = queries.select(col("vec_id").as("query_id"), col("vec").as("query_vec"),
        col("norm").as("query_norm"),
        posexplode_outer(array(lay.hashStruct(col("vec")))).as(Seq("__p", "qhs")))
      .select(Seq(col("query_id"), col("query_vec"), col("query_norm")) ++
        (0 until lay.nHashes).map(h => col("qhs")(s"h$h").as(s"qh$h")): _*)
      .select(col("*"),
        posexplode_outer(array((0 until nTables)
          .map(t => lay.bucketOf(f => col("q" + f), t)): _*))
          .as(Seq("band", "qbucket")))
      .withColumn("bucket",
        explode(transform(typedLit(masks), m => col("qbucket").bitwiseXOR(m))))
      .drop("qbucket")
    // Within a band a (query, cand) pair joins at most once (exactly one
    // probe mask equals the band xor); across bands, emit only from the
    // FIRST band whose xor is within the probe budget — a few bit ops on
    // the carried hashes, so scoring runs once per pair and no dedup
    // exchange exists.
    val firstProbedBand = lay.firstBand(
      lay.matchMap(f => col("q" + f), f => col("c" + f), maxProbe), col("band"))
    val scored = c.join(broadcast(q), Seq("band", "bucket"))
      .filter(col("cand_id") =!= col("query_id") && firstProbedBand)
      .withColumn("cosine", cosineFromNorms(
        dot(col("cand_vec"), col("query_vec")), col("cand_norm"), col("query_norm")))
    Ranking.topKPerQuery(scored, k)
  }
}
