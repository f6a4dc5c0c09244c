package graft.operators

import graft.functions.VectorExpressions
import graft.functions.VectorFunctions.dot
import graft.functions.VectorMeanAggregator
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product quantization (Jégou/Douze/Schmid, TPAMI 2011) — the canonical
  * billion-scale ANN compression: split each vector into `m` contiguous
  * subvectors, k-means each subspace independently into `ks` centroids,
  * and store one code byte per subspace. A 64-dim double vector (512 B)
  * becomes `m` bytes — 32× at the registered m=16, the 1-bit/dim rate
  * where recall holds on this corpus — and query scoring becomes an O(m)
  * table gather per candidate (ADC: asymmetric distance computation)
  * instead of an O(dim) dot product.
  *
  * Why this matters at 100 TB: the candidate-generation scan is the cost
  * of ANN at corpus scale, and it is BANDWIDTH-bound ([[Similarity
  * .quantizedTopK]]'s int8 path already halves it 8×; PQ goes 64× on the
  * same corpus). The codes table replaces the vector table in every probe;
  * full-precision vectors are touched only by the exact re-rank join,
  * which reads `rerank × k × |queries|` rows regardless of corpus size.
  *
  * Spark-first shapes, mirroring [[IvfIndex]]:
  *  - TRAINING is per-subspace Lloyd where each iteration is ONE scan of
  *    the (sampled) training frame: a per-row [[graft.functions
  *    .VectorExpressions.PqAssign]] projection, a posexplode to
  *    (subspace, code, subvector) rows, and a partial-merged
  *    [[VectorMeanAggregator]] groupBy whose m×ks result rows (a few KB)
  *    are collected and re-embedded in the next plan as literals. Like
  *    published practice, codebooks train on a SAMPLE — pass one; the
  *    codebook does not need to see the corpus.
  *  - ENCODING is a pure projection (no join, no shuffle): scan +
  *    [[graft.functions.VectorExpressions.PqEncode]].
  *  - SCORING broadcasts the (small) query side carrying a per-query LUT
  *    ([[graft.functions.VectorExpressions.PqLut]]); the corpus-side work
  *    is one codegen'd gather per row. Cosine needs ‖reconstruction‖,
  *    which is EXACT from the code alone (subspaces partition the
  *    coordinates, so centroid norms² add — [[graft.functions
  *    .VectorExpressions.PqReconNorm2]]); no per-vector float metadata is
  *    stored at all.
  */
object PqCodec {

  /** Trained model: `codebooks(j)` = subspace j's `ks` centroids of
    * `dsub` components each, flattened row-major; `cn2` = the matching
    * m×ks per-centroid squared norms (the [[graft.functions
    * .VectorKernels.pqReconNorm2]] table). */
  final case class PqModel(m: Int, ks: Int, dsub: Int,
                           codebooks: Seq[Seq[Double]]) {
    lazy val cn2: Seq[Double] = codebooks.flatMap { cb =>
      cb.grouped(dsub).map { c =>
        var s = 0.0; var i = 0
        while (i < c.length) { s += c(i) * c(i); i += 1 }
        s
      }
    }

    /** Symmetric-distance table for CODE-PAIR scoring
      * ([[graft.functions.VectorKernels.pqSdcDot]]): `m × ks × ks`
      * entries flattened, `[j][a][b]` = dot(centroid a, centroid b) of
      * subspace j. A few KB at the registered geometry — built once on
      * the driver, embedded in the plan as a reference object. */
    lazy val sdc: Seq[Double] = {
      val out = new Array[Double](m * ks * ks)
      var j = 0
      while (j < m) {
        val cb = codebooks(j)
        var a = 0
        while (a < ks) {
          var b = 0
          while (b < ks) {
            var s = 0.0; var i = 0
            while (i < dsub) { s += cb(a * dsub + i) * cb(b * dsub + i); i += 1 }
            out(j * ks * ks + a * ks + b) = s
            b += 1
          }
          a += 1
        }
        j += 1
      }
      out.toSeq
    }
    def codeBytes: Int = m
  }

  /** Train per-subspace codebooks on `sample` (a frame with `vec_id` and
    * `vec: array<double>`, e.g. [[Similarity.prepared]] output or a
    * `.sample` of it). Deterministic given a deterministic sample: init
    * assigns subvector j of vector v to code `xxhash64(vec_id, j) % ks`,
    * argmin ties break to the lowest code, and each Lloyd iteration is
    * exactly one scan. Cells that lose all members keep their previous
    * centroid (zeros before the first iteration), so the codebook shape
    * is always m×ks. */
  def train(sample: DataFrame, m: Int, ks: Int, iters: Int = 2): PqModel = {
    require(m >= 1 && ks >= 2 && ks <= 256,
      s"need 1 <= m and 2 <= ks <= 256 (one code byte), got m=$m ks=$ks")
    val dim = sample.select(size(col("vec")).as("d")).head().getInt(0)
    require(dim % m == 0, s"dim $dim not divisible by m=$m")
    val dsub = dim / m
    val vmean = udaf(VectorMeanAggregator)

    // one Lloyd scan: regroup (subspace, code, subvector) rows under the
    // given assignment and collect the m×ks means (≤ a few KB)
    def regroup(codes: Column): Array[Array[Double]] = {
      val rows = sample
        .select(posexplode(transform(sequence(lit(0), lit(m - 1)), j =>
          struct(j.cast("int").as("sub"),
            element_at(codes, j.cast("int") + 1).as("code"),
            slice(col("vec"), j * lit(dsub) + 1, lit(dsub)).as("sv"))))
          .as(Seq("__p", "s")))
        .groupBy(col("s.sub").as("sub"), col("s.code").as("code"))
        .agg(vmean(col("s.sv")).as("c"))
        .collect()
      val out = Array.fill(m, ks * dsub)(0.0)
      rows.foreach { r =>
        val sub = r.getInt(0); val code = r.getInt(1)
        val c = r.getSeq[Double](2)
        if (sub >= 0 && sub < m && code >= 0 && code < ks && c.length == dsub) {
          var i = 0
          while (i < dsub) { out(sub)(code * dsub + i) = c(i); i += 1 }
        }
      }
      out
    }

    var cbs: Array[Array[Double]] = null
    var assign: Column = transform(sequence(lit(0), lit(m - 1)),
      j => pmod(xxhash64(col("vec_id"), j), lit(ks)).cast("int"))
    (0 until math.max(1, iters)).foreach { _ =>
      val next = regroup(assign)
      // empty cells keep the previous centroid so codes stay stable
      if (cbs != null) {
        var j = 0
        while (j < m) {
          var c = 0
          while (c < ks) {
            val base = c * dsub
            var allZero = true
            var i = 0
            while (i < dsub && allZero) {
              if (next(j)(base + i) != 0.0) allZero = false; i += 1
            }
            if (allZero) System.arraycopy(cbs(j), base, next(j), base, dsub)
            c += 1
          }
          j += 1
        }
      }
      cbs = next
      assign = VectorExpressions.pqAssign(col("vec"),
        cbs.map(_.toSeq).toSeq)
    }
    PqModel(m, ks, dsub, cbs.map(_.toSeq).toSeq)
  }

  /** Encode a prepared corpus to its codes table: `(vec_id, code)` with
    * `code` = m bytes. A pure projection — this is the frame a deployment
    * PERSISTS; at 100 TB it is 1/64th the vector table's bytes and serves
    * every subsequent probe batch. */
  def encode(corpus: DataFrame, model: PqModel): DataFrame =
    corpus.select(col("vec_id"),
      VectorExpressions.pqEncode(col("vec"), model.codebooks).as("code"))

  /** Top-k by cosine via PQ-ADC candidate generation + exact re-rank.
    * Candidates are scored on code bytes only (approx cosine =
    * ADC dot / (‖recon‖ · ‖query‖), both factors derived from the code /
    * LUT — the corpus's float vectors are NOT read); the best
    * `rerank × k` per query re-score against the exact vectors, touching
    * `rerank × k × |queries|` rows. With re-rank headroom the output
    * equals exact brute force (the oracle holds it to that); the
    * recall/cost knob at scale is `rerank`, exactly as published. */
  def topK(corpus: DataFrame, queries: DataFrame, k: Int,
           model: PqModel, rerank: Int = 10): DataFrame =
    topKFromCodes(encode(corpus, model), corpus, queries, k, model, rerank)

  /** [[topK]] against an already-encoded codes table `(vec_id, code)` —
    * the deployment shape: the persisted codes table (1/64th the vector
    * bytes) drives candidate generation; `corpus` is touched only by the
    * exact re-rank join on the `rerank × k × |queries|` survivors. */
  def topKFromCodes(codesTable: DataFrame, corpus: DataFrame,
                    queries: DataFrame, k: Int, model: PqModel,
                    rerank: Int = 10): DataFrame = {
    val approx = withAcos(withCrn(codesTable, model)
      .crossJoin(broadcast(lutQueries(queries, model))))
    rerankExact(corpus, queries, candidatesOf(approx, k * rerank), k)
  }

  /** [[topKFromCodes]] with a KEY-PUSHED re-rank fetch: the candidate set
    * is materialized (it is DRIVER-BOUNDED by construction —
    * `rerank × k × |queries|` rows, the same class of guarded collect as
    * the repo's measured broadcast guards), its ids are pushed into the
    * corpus scan as a literal `IN` filter, and only then does the re-rank
    * join run. On a corpus SORTED/clustered by `vec_id` (the natural
    * layout of an appended vector store) the pushed filter turns the
    * re-rank from a full vector-table scan into parquet row-group/page
    * skipping — the difference between "re-scan 100 TB to fetch 500
    * rows" and "read ~500 pages". The probe measures both shapes; the
    * lazy [[topKFromCodes]] stays the default for composability. */
  def topKFromCodesFetch(codesTable: DataFrame, corpus: DataFrame,
                         queries: DataFrame, k: Int, model: PqModel,
                         rerank: Int = 10): DataFrame = {
    val approx = withAcos(withCrn(codesTable, model)
      .crossJoin(broadcast(lutQueries(queries, model))))
    rerankFetch(corpus, queries, candidatesOf(approx, k * rerank), k)
  }

  /** IVF-PQ: the [[IvfIndex]] coarse quantizer prunes the scan to the
    * `nProbe` nearest lists and PQ codes make the surviving scan 64×
    * smaller — the composition behind every billion-vector ANN service.
    * The encoded index `(cand_id, centroid_id, code)` is again a pure
    * projection over the IVF assignment; probes broadcast
    * (query, list, LUT) rows, so corpus-side work is a list-pruned
    * codegen'd gather.
    *
    * One deliberate divergence from the IVFADC paper: codes quantize the
    * RAW vectors with one global codebook, not per-list residuals.
    * Residuals buy finer cells at equal ks, but cost a per-(query, list)
    * LUT rebuild and make the codes table useless without its list
    * assignment; a global codebook lets ONE persisted codes table serve
    * both this and the flat [[topK]] path, and the exact re-rank absorbs
    * the coarser quantization. */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              model: PqModel, kLists: Int, nProbe: Int,
              rerank: Int = 10): DataFrame = {
    val (assigned, centroids) = IvfIndex.build(corpus, kLists)
    val enc = withCrn(
      assigned.select(col("vec_id"), col("centroid_id"),
        VectorExpressions.pqEncode(col("vec"), model.codebooks).as("code")),
      model, extra = Seq("centroid_id"))
    val probes = probesOf(queries, centroids, nProbe, model)
    val approx = withAcos(enc.join(broadcast(probes), "centroid_id"))
    rerankExact(corpus, queries, candidatesOf(approx, k * rerank), k)
  }

  /** [[ivfTopK]] against PERSISTED pieces — the deployment shape of
    * IVF-PQ: `codes` is a stored `(vec_id, centroid_id, code)` table
    * (bucketed on `centroid_id`, so the probed-list filter below prunes
    * BUCKETS, not just rows), `centroids` the stored coarse quantizer,
    * `corpus` the full-precision vectors touched only by the re-rank.
    * Each query ranks the centroid table (|queries|×k rows, broadcast,
    * driver-bounded), its `nProbe` nearest lists are COLLECTED into a
    * literal IN filter — static bucket/row-group pruning on the codes
    * scan, the "read nProbe/k of the index bytes" property — ADC scores
    * the surviving codes behind a broadcast probe join, and the exact
    * re-rank is the [[topKFromCodesFetch]] key-pushed point fetch. */
  def ivfTopKFromCodesFetch(codes: DataFrame, corpus: DataFrame,
                            queries: DataFrame, centroids: DataFrame,
                            k: Int, model: PqModel, nProbe: Int,
                            rerank: Int = 10): DataFrame = {
    val probes = probesOf(queries, centroids, nProbe, model)
      .localCheckpoint(true) // |queries| × nProbe rows — driver-bounded
    val lists = probes.select(col("centroid_id")).distinct()
      .collect().map(_.getInt(0)).toSeq
    val enc = withCrn(codes.filter(col("centroid_id").isInCollection(lists)),
      model, extra = Seq("centroid_id"))
    val approx = withAcos(enc.join(broadcast(probes), "centroid_id"))
    rerankFetch(corpus, queries, candidatesOf(approx, k * rerank), k)
  }

  // ───────────────────────── true IVFADC (residual codes) ─────────────

  /** Train PQ codebooks on per-list RESIDUALS — true IVFADC (Jégou/
    * Douze/Schmid TPAMI 2011 §IV-A), versus [[ivfTopK]]'s deliberate
    * global-codebook divergence. Residuals `x − c(x)` concentrate near
    * the origin once the coarse quantizer has soaked up the between-list
    * variance, so the same `m × ks` budget spends its centroids on a
    * tighter distribution — finer effective cells at equal code size,
    * which is exactly the regime where the measured 32M-scale miss tail
    * lives (near-threshold pairs whose ADC margin the global codebook
    * cannot resolve).
    *
    * `assigned` is [[IvfIndex.build]]'s first output (corpus +
    * `centroid_id`), `centroids` its second; the residual projection is
    * one broadcast join against the ≤ kLists-row centroid table, then
    * the standard one-scan-per-iteration Lloyd of [[train]]. */
  def trainResidual(assigned: DataFrame, centroids: DataFrame,
                    m: Int, ks: Int, iters: Int = 2): PqModel =
    train(withResidual(assigned, centroids)
      .select(col("vec_id"), col("rvec").as("vec")), m, ks, iters)

  /** Encode per-list residuals to the IVFADC codes table
    * `(vec_id, centroid_id, code, crn)`. Still projection-shaped: one
    * broadcast join against the centroid table (which also carries each
    * centroid's precomputed LUT against the residual codebooks — kLists
    * rows of m×ks doubles, built once on the small side), no shuffle of
    * the corpus.
    *
    * `crn` = ‖c + r̂‖, the reconstruction norm, is QUERY-INDEPENDENT —
    * unlike L2-IVFADC there is no per-(query, list) table rebuild for
    * cosine, and the norm is paid once at encode time:
    * ‖c + r̂‖² = ‖c‖² + 2·dot(c, r̂) + ‖r̂‖², the middle term an O(m)
    * ADC gather against the centroid's own LUT. Storing it costs 8
    * bytes/row next to the m code bytes; in exchange every probe scan
    * skips the per-row norm derivation the global path does. The codes
    * are meaningful only WITH their list assignment (the documented
    * price of residuals — this table cannot serve the flat [[topK]]
    * path; the global-codebook [[ivfTopK]] remains the
    * one-table-serves-both option). */
  def encodeResidual(assigned: DataFrame, centroids: DataFrame,
                     model: PqModel): DataFrame = {
    val cents = centroids.select(col("centroid_id"), col("cvec"), col("cnorm"),
      VectorExpressions.pqLut(col("cvec"), model.codebooks).as("clut"))
    // the code feeds both the output column and the crn derivation —
    // materialize it behind a Generate so projection collapse cannot
    // duplicate the encode kernel (the repo's standard double-eval guard)
    assigned.join(broadcast(cents), "centroid_id")
      .select(col("vec_id"), col("centroid_id"), col("cnorm"), col("clut"),
        posexplode_outer(array(VectorExpressions.pqEncode(
          zip_with(col("vec"), col("cvec"), (a, b) => a - b),
          model.codebooks))).as(Seq("__p", "code")))
      .withColumn("crn", sqrt(greatest(lit(0.0),
        col("cnorm") * col("cnorm")
          + lit(2.0) * VectorExpressions.pqAdcDot(col("clut"), col("code"))
          + VectorExpressions.pqReconNorm2(col("code"), model.cn2))))
      .select("vec_id", "centroid_id", "code", "crn")
  }

  /** IVFADC end-to-end: coarse-quantize, train residual codebooks,
    * encode residuals, probe. Same contract as [[ivfTopK]] — top-k by
    * cosine with exact re-rank of the top `rerank × k` — at the same
    * code size, trading the global path's one-table-serves-both
    * property for finer quantization. */
  def ivfResidualTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                      m: Int, ks: Int, kLists: Int, nProbe: Int,
                      rerank: Int = 10, iters: Int = 2): DataFrame = {
    val (assigned, centroids) = IvfIndex.build(corpus, kLists)
    val model = trainResidual(assigned, centroids, m, ks, iters)
    ivfResidualTopKFromCodes(encodeResidual(assigned, centroids, model),
      corpus, queries, centroids, k, model, nProbe, rerank)
  }

  /** [[ivfResidualTopK]] against a persisted IVFADC codes table — the
    * deployment shape. Cosine decomposes over the residual split:
    * dot(q, c + r̂) = dot(q, c) + dot(q, r̂), so ONE residual LUT per
    * query serves EVERY probed list and the per-list correction is the
    * scalar dot(q, c) — already computed while ranking the centroids.
    * (This is the cosine/IP analogue of the L2-IVFADC LUT-per-list
    * rebuild, and strictly cheaper.) The probed lists become a literal
    * IN on the list-keyed codes table — on a `centroid_id`-bucketed
    * layout that is bucket/row-group pruning, reading ~nProbe/kLists of
    * the code bytes — then the key-pushed exact re-rank point-fetches
    * the driver-bounded survivors. */
  def ivfResidualTopKFromCodes(codes: DataFrame, corpus: DataFrame,
                               queries: DataFrame, centroids: DataFrame,
                               k: Int, model: PqModel, nProbe: Int,
                               rerank: Int = 10): DataFrame = {
    val probes = probesOfResidual(queries, centroids, nProbe, model)
      .localCheckpoint(true) // |queries| × nProbe rows — driver-bounded
    val lists = probes.select(col("centroid_id")).distinct()
      .collect().map(_.getInt(0)).toSeq
    val scan = codes.filter(col("centroid_id").isInCollection(lists))
      .select(col("vec_id").as("cand_id"), col("centroid_id"),
        col("code"), col("crn"))
    val approx = scan.join(broadcast(probes), "centroid_id")
      .filter(col("cand_id") =!= col("query_id"))
      .withColumn("acos",
        when(col("crn") * col("query_norm") === 0.0, lit(null).cast("double"))
          .otherwise((col("qc")
            + VectorExpressions.pqAdcDot(col("lut"), col("code")))
            / (col("crn") * col("query_norm"))))
    rerankFetch(corpus, queries, candidatesOf(approx, k * rerank), k)
  }

  /** `rvec = vec − centroid(list)` per assigned row: the residual
    * projection both training and encoding share. */
  private def withResidual(assigned: DataFrame,
                           centroids: DataFrame): DataFrame =
    assigned.join(broadcast(centroids), "centroid_id")
      .withColumn("rvec", zip_with(col("vec"), col("cvec"), (a, b) => a - b))

  /** [[probesRanked]] plus the residual decomposition's per-list scalar
    * `qc = dot(query, centroid)`; the LUT is the RAW query against the
    * residual codebooks (dot(q, r̂) needs q itself, not q − c).
    * `private[graft]`: residual-family ingest admission shares it, the
    * same one-ranking argument as [[probesRanked]]. */
  private[graft] def probesRankedResidual(queries: DataFrame,
                                          centroids: DataFrame, nProbe: Int,
                                          model: PqModel): DataFrame = {
    val wq = Window.partitionBy(col("query_id"))
      .orderBy(col("qd2"), col("centroid_id"))
    queries
      .select(col("vec_id").as("query_id"), col("vec").as("query_vec"),
        col("norm").as("query_norm"))
      .crossJoin(broadcast(centroids))
      .withColumn("qc", dot(col("query_vec"), col("cvec")))
      .withColumn("qd2",
        col("query_norm") * col("query_norm") + col("cnorm") * col("cnorm")
          - lit(2.0) * col("qc"))
      .withColumn("rn", row_number().over(wq))
      .filter(col("rn") <= nProbe)
      .select(col("query_id"), col("query_norm"), col("centroid_id"),
        col("rn"), col("qc"),
        VectorExpressions.pqLut(col("query_vec"), model.codebooks).as("lut"))
  }

  private def probesOfResidual(queries: DataFrame, centroids: DataFrame,
                               nProbe: Int, model: PqModel): DataFrame =
    probesRankedResidual(queries, centroids, nProbe, model).drop("rn")

  /** `(cand_id, [centroid_id,] code, crn)` from a codes frame — the
    * shared ADC scan side. `private[graft]`: ingest admission
    * ([[graft.IngestApp.admitVecsPq]]) scores the same codes tables and
    * must derive crn identically, not fork a drifting copy. */
  private[graft] def withCrn(codes: DataFrame, model: PqModel,
                             extra: Seq[String] = Nil): DataFrame =
    codes.select((Seq(col("vec_id").as("cand_id")) ++
        extra.map(col) :+ col("code")): _*)
      .withColumn("crn",
        sqrt(VectorExpressions.pqReconNorm2(col("code"), model.cn2)))

  /** Per-query LUT side of a flat ADC scan. */
  private def lutQueries(queries: DataFrame, model: PqModel): DataFrame =
    queries.select(col("vec_id").as("query_id"),
      col("norm").as("query_norm"),
      VectorExpressions.pqLut(col("vec"), model.codebooks).as("lut"))

  /** The `nProbe` nearest lists per query with rank and LUT —
    * `(query_id, query_norm, centroid_id, rn, lut)`. `private[graft]`:
    * the shared probe-ranking of every IVF path, also consumed by
    * ingest admission ([[graft.IngestApp.admitVecsPq]]), which needs
    * `rn` for its top-1 cell blocking — one ranking definition, so the
    * probe side can never drift from the assignment argmin it must
    * replay. */
  private[graft] def probesRanked(queries: DataFrame, centroids: DataFrame,
                                  nProbe: Int, model: PqModel): DataFrame = {
    val wq = Window.partitionBy(col("query_id"))
      .orderBy(col("qd2"), col("centroid_id"))
    queries
      .select(col("vec_id").as("query_id"), col("vec").as("query_vec"),
        col("norm").as("query_norm"))
      .crossJoin(broadcast(centroids))
      .withColumn("qd2",
        col("query_norm") * col("query_norm") + col("cnorm") * col("cnorm")
          - lit(2.0) * dot(col("query_vec"), col("cvec")))
      .withColumn("rn", row_number().over(wq))
      .filter(col("rn") <= nProbe)
      .select(col("query_id"), col("query_norm"), col("centroid_id"),
        col("rn"),
        VectorExpressions.pqLut(col("query_vec"), model.codebooks).as("lut"))
  }

  /** The `nProbe` nearest lists per query with the query's LUT — the
    * shared probe side of both IVF paths. |queries| × nProbe rows. */
  private def probesOf(queries: DataFrame, centroids: DataFrame,
                       nProbe: Int, model: PqModel): DataFrame =
    probesRanked(queries, centroids, nProbe, model).drop("rn")

  /** The ONE approximate-cosine definition every path scores with:
    * ADC dot / (‖recon‖·‖query‖), null-guarded on zero norms. Applied
    * after the (cand, query) sides are joined. */
  private def withAcos(joined: DataFrame): DataFrame =
    joined.filter(col("cand_id") =!= col("query_id"))
      .withColumn("acos",
        when(col("crn") * col("query_norm") === 0.0, lit(null).cast("double"))
          .otherwise(VectorExpressions.pqAdcDot(col("lut"), col("code"))
            / (col("crn") * col("query_norm"))))

  /** Key-pushed exact re-rank: candidates pinned (driver-bounded by
    * construction), their ids pushed into the corpus scan as a literal
    * IN — a point fetch, not a re-scan. */
  private def rerankFetch(corpus: DataFrame, queries: DataFrame,
                          candidatesLazy: DataFrame, k: Int): DataFrame = {
    val candidates = candidatesLazy.localCheckpoint(true)
    val ids = candidates.select(col("cand_id")).distinct()
      .collect().map(_.getLong(0))
    rerankExact(corpus.filter(col("vec_id").isInCollection(ids)),
      queries, candidates, k)
  }

  private def candidatesOf(approx: DataFrame, keep: Int): DataFrame =
    Ranking.topKPerQuery(approx, keep, "acos")
      .select(col("query_id"), col("cand_id"))

  /** Exact cosine re-rank of (query_id, cand_id) survivors — identical
    * contract to [[Similarity.quantizedTopK]]'s second stage. */
  private def rerankExact(corpus: DataFrame, queries: DataFrame,
                          candidates: DataFrame, k: Int): DataFrame = {
    val c = corpus.select(col("vec_id").as("cand_id"), col("vec").as("cand_vec"),
      col("norm").as("cand_norm"))
    val q = queries.select(col("vec_id").as("query_id"), col("vec").as("query_vec"),
      col("norm").as("query_norm"))
    val rescored = candidates
      .join(c, "cand_id")
      .join(broadcast(q), "query_id")
      .withColumn("cosine",
        when(col("cand_norm") * col("query_norm") === 0.0, lit(null).cast("double"))
          .otherwise(dot(col("cand_vec"), col("query_vec"))
            / (col("cand_norm") * col("query_norm"))))
    Ranking.topKPerQuery(rescored, k)
  }
}
