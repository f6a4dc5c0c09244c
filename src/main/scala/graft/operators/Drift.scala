package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Distribution-DRIFT monitoring — the check a production ingest runs
  * before letting a new batch near the training mix: has the data's
  * distribution moved against a trusted reference? Two standard
  * instruments, both engine-exact and both map-side + tiny aggregates
  * (no shuffle beyond the counting aggregations, nothing
  * corpus-×-corpus):
  *
  *  - [[psi]]: Population Stability Index of a numeric column over
  *    reference-quantile bins — the classic model-monitoring score
  *    (rule of thumb: < 0.1 stable, 0.1–0.25 drifting, > 0.25 shifted).
  *  - [[tokenDrift]]: per-token probability gap over the reference's
  *    top-K tokens plus a rest bucket — total variation distance
  *    decomposed to the tokens that caused it (vocabulary drift is the
  *    earliest visible symptom of a source change upstream of a
  *    tokenizer).
  *
  * Engine-exactness: every probability is a LAPLACE-smoothed or plain
  * integer ratio quantized with the [[TextAnalysis.quant6]] pattern
  * (integer-ratio quotients terminate at halfway decimals — the
  * knife-edge class round() gets wrong across engines), and PSI's
  * transcendental per-bin terms are rounded to 6 dp then summed as
  * DECIMAL in fixed order, the same contract as the n-gram LM. */
object Drift {

  private val dec = DecimalType(18, 6)

  /** Per-bin PSI frame: `nBins` bins whose boundaries are the
    * REFERENCE's exact percentiles (k/nBins, linear interpolation —
    * the same exact-percentile aggregate the curriculum binner uses),
    * each row carrying both counts, both Laplace-smoothed
    * probabilities (`(n_i + 1) / (N + nBins)` — no bin is ever empty,
    * so no log(0) epsilon fudge), and the rounded PSI term
    * `(cur_p − ref_p) · ln(cur_p / ref_p)` (each term ≥ 0). One
    * boundary aggregate on the reference + one counting aggregate per
    * frame; boundaries broadcast; nothing is ever all-pairs.
    * Null values carry no evidence and are out of scope. */
  def psiBins(reference: DataFrame, current: DataFrame, value: Column,
              nBins: Int = 10): DataFrame = {
    val bs = refBoundaries(reference, value, nBins)
    psiBinsWith(binCounts(reference, value, bs, "ref_n"),
      binCounts(current, value, bs, "cur_n"), nBins,
      reference.sparkSession)
  }

  /** The reference's exact interior percentiles (k/nBins, linear
    * interpolation) — nBins−1 doubles, driver-sized by construction.
    * These ARE the monitor's model: [[graft.streaming.StreamingDrift]]
    * persists them and re-bins every future batch against the SAME
    * boundaries. */
  private[graft] def refBoundaries(reference: DataFrame, value: Column,
                                   nBins: Int): Seq[Double] = {
    require(nBins >= 2 && nBins <= 1000, s"need 2 <= nBins <= 1000: $nBins")
    val fracs = (1 until nBins).map(k => k.toDouble / nBins)
    val row = reference.select(value.cast("double").as("v"))
      .filter(col("v").isNotNull)
      .agg(expr(s"percentile(v, array(${fracs.mkString(", ")}))").as("bs"))
      .head()
    require(!row.isNullAt(0),
      "Drift: the reference has no non-null values to derive bins from")
    row.getSeq[Double](0)
  }

  /** APPROXIMATE reference boundaries — the 100×-scale path:
    * `approx_percentile` (one mergeable-sketch aggregate, no global
    * sort) instead of the exact percentile, SELF-CERTIFIED before use:
    * the measured rank of every returned boundary (the fraction of
    * reference values at or below it — one counting aggregate) must sit
    * within `rankTol` of its target k/nBins, or the call fails BY NAME
    * with the worst offender. The returned boundaries then feed the
    * same [[binCounts]]/[[psiBinsWith]] machinery — the monitor's
    * arithmetic downstream of the boundaries is unchanged. */
  private[graft] def refBoundariesApprox(reference: DataFrame, value: Column,
                                         nBins: Int, accuracy: Int = 10000,
                                         rankTol: Double = 0.02): Seq[Double] = {
    require(nBins >= 2 && nBins <= 1000, s"need 2 <= nBins <= 1000: $nBins")
    require(accuracy >= nBins * 10,
      s"Drift: approx accuracy $accuracy is below 10·nBins — the sketch " +
        "cannot resolve the requested bins")
    val fracs = (1 until nBins).map(k => k.toDouble / nBins)
    val v = reference.select(value.cast("double").as("v"))
      .filter(col("v").isNotNull).localCheckpoint()
    val row = v.agg(expr(
      s"approx_percentile(v, array(${fracs.mkString(", ")}), $accuracy)")
      .as("bs")).head()
    require(!row.isNullAt(0),
      "Drift: the reference has no non-null values to derive bins from")
    val bs = row.getSeq[Double](0)
    // rank attestation: ONE aggregate measures every boundary's true rank
    val leCols = bs.zipWithIndex.map { case (b, i) =>
      sum(when(col("v") <= b, 1L).otherwise(0L)).as(s"le$i")
    }
    val ranks = v.agg(count(lit(1)).as("n"), leCols: _*).head()
    val n = ranks.getLong(0)
    fracs.zipWithIndex.foreach { case (target, i) =>
      val measured = ranks.getLong(i + 1).toDouble / n
      require(math.abs(measured - target) <= rankTol,
        f"Drift.refBoundariesApprox: boundary for rank $target%.3f " +
          f"measured at $measured%.4f — off by more than $rankTol; " +
          "raise accuracy or fall back to exact boundaries")
    }
    bs
  }

  /** [[psi]] on approximate, rank-certified boundaries — identical
    * downstream arithmetic, no exact-percentile sort on the reference.
    * The exact default remains [[psi]]; this is the opt-in for
    * references too large to sort. */
  def psiApprox(reference: DataFrame, current: DataFrame, value: Column,
                nBins: Int = 10, accuracy: Int = 10000): DataFrame = {
    val bs = refBoundariesApprox(reference, value, nBins, accuracy)
    psiSummary(psiBinsWith(binCounts(reference, value, bs, "ref_n"),
      binCounts(current, value, bs, "cur_n"), nBins,
      reference.sparkSession))
  }

  /** Per-bin counts of `df` under fixed boundaries: bin = 1 + number
    * of boundaries strictly below the value (a fold over the literal
    * boundary array — map-only, then one nBins-sized aggregate). */
  private[graft] def binCounts(df: DataFrame, value: Column,
                               boundaries: Seq[Double],
                               alias: String): DataFrame = {
    val bs = typedLit(boundaries)
    df.select(value.cast("double").as("v"))
      .filter(col("v").isNotNull)
      .select(aggregate(bs, lit(1),
        (acc, b) => acc + when(col("v") > b, 1).otherwise(0)).as("bin"))
      .groupBy(col("bin")).agg(count(lit(1)).as(alias))
  }

  /** The PSI bin frame from two (bin, count) frames — shared by the
    * batch operator and the streaming monitor (which feeds STORED
    * reference counts). */
  private[graft] def psiBinsWith(ref: DataFrame, cur: DataFrame,
                                 nBins: Int,
                                 spark: org.apache.spark.sql.SparkSession): DataFrame = {
    val allBins = spark.range(1, nBins + 1)
      .select(col("id").cast("int").as("bin"))
    val refTotal = broadcast(ref.agg(coalesce(sum(col("ref_n")), lit(0L))
      .as("ref_total")))
    val curTotal = broadcast(cur.agg(coalesce(sum(col("cur_n")), lit(0L))
      .as("cur_total")))
    val refP = (col("ref_n") + 1).cast("double") /
      (col("ref_total") + nBins).cast("double")
    val curP = (col("cur_n") + 1).cast("double") /
      (col("cur_total") + nBins).cast("double")
    allBins
      .join(broadcast(ref), Seq("bin"), "left")
      .join(broadcast(cur), Seq("bin"), "left")
      .na.fill(0L, Seq("ref_n", "cur_n"))
      .crossJoin(refTotal).crossJoin(curTotal)
      .select(col("bin"), col("ref_n"), col("cur_n"),
        TextAnalysis.quant6(refP).as("ref_p"),
        TextAnalysis.quant6(curP).as("cur_p"),
        round((curP - refP) * log(curP / refP), 6).as("psi_term"))
  }

  /** Fold a [[psiBins]]-shaped frame to the 1-row summary. */
  private[graft] def psiSummary(bins: DataFrame): DataFrame =
    bins.agg(count(lit(1)).as("n_bins"),
      sum(col("ref_n")).as("ref_n"), sum(col("cur_n")).as("cur_n"),
      sum(col("psi_term").cast(dec)).cast("double").as("psi"))

  /** One-row PSI summary: bin frame folded to
    * `(n_bins, ref_n, cur_n, psi)` — the rounded per-bin terms summed
    * as DECIMAL (fixed order, engine-exact). */
  def psi(reference: DataFrame, current: DataFrame, value: Column,
          nBins: Int = 10): DataFrame =
    psiSummary(psiBins(reference, current, value, nBins))

  /** EMBEDDING drift — the VECTOR-column member of the monitor family
    * (numeric: [[psi]]; tokens: [[tokenDrift]]; vectors: this), one
    * summary row from two instruments:
    *
    *  1. MEAN-VECTOR SHIFT: per-dimension means of both frames through
    *     exact per-element DECIMAL(38,9) sums (order-independent, the
    *     repo's float-summation contract), then the L2 norm of the
    *     difference folded in dimension order and quantized —
    *     engine-exact, replayed verbatim by the DuckDB oracle.
    *  2. PSI OVER PCA-PROJECTED COORDINATES: the reference's own top-k
    *     principal axes ([[Pca.train]] on the reference — the monitoring
    *     basis a production monitor persists), both frames projected,
    *     each component PSI-scored against the reference's own decile
    *     boundaries. The projection basis is not SQL-replayable, so
    *     these columns are SELF-CERTIFYING attestations (the
    *     `embed_pca` pattern): orthonormality of the basis,
    *     psi(ref, ref) = 0 exactly per component, every component PSI
    *     ≥ 0, and whether any component crossed `alertAt`.
    *
    * Execution: one moments pass on the reference (d² aggregate), one
    * k-percentile aggregate + one bin count per frame per component
    * (projections are map-side dot products), one posexplode-sum for
    * the means — nothing corpus-×-corpus, boundaries broadcast. */
  def embeddingDrift(reference: DataFrame, current: DataFrame, vec: Column,
                     k: Int = 4, nBins: Int = 10,
                     alertAt: Double = 0.1): DataFrame = {
    val spark = reference.sparkSession
    val model = Pca.train(reference, vec, k)

    def dimSums(df: DataFrame): (Long, Array[java.math.BigDecimal]) = {
      // null ELEMENTS would silently bias the mean (sum skips nulls,
      // count doesn't) — poison by name like Pca.train's guard; the
      // reference side already went through Pca.train, but the CURRENT
      // frame only passes through here
      val v0 = vec.cast("array<double>")
      val guarded = when(v0.isNotNull && exists(v0, x => x.isNull),
        raise_error(lit("Drift.embeddingDrift: a vector contains null " +
          "elements — clean or filter the embedding column first"))
          .cast("array<double>"))
        .otherwise(v0)
      val rows = df.select(posexplode(guarded).as(Seq("pos", "e")))
        .groupBy(col("pos"))
        .agg(sum(col("e").cast("decimal(38,9)")).as("s"),
          count(lit(1)).as("n"))
        .orderBy(col("pos")).collect()
      require(rows.nonEmpty,
        "Drift.embeddingDrift: a frame has no vectors — nothing to " +
          "profile")
      require(rows.length == model.dim,
        s"Drift.embeddingDrift: ragged vectors — ${rows.length} " +
          s"dimensions counted, model dim ${model.dim}")
      val n = rows.head.getLong(2)
      require(rows.forall(_.getLong(2) == n),
        "Drift.embeddingDrift: ragged vectors — dimension counts differ")
      (n, rows.map(_.getDecimal(1)))
    }
    val (nRef, refSums) = dimSums(reference)
    val (nCur, curSums) = dimSums(current)
    // fixed dimension-order fold, quant6 — both engines identical
    var acc = 0.0
    var i = 0
    while (i < model.dim) {
      val d = curSums(i).doubleValue / nCur - refSums(i).doubleValue / nRef
      acc += d * d
      i += 1
    }
    val meanShift =
      math.floor(math.sqrt(acc) * 1000000.0 + 0.5) / 1000000.0

    def projected(df: DataFrame): DataFrame =
      Pca.project(df.select(lit(0L).as("__id"), vec.as("__v")),
        col("__id"), col("__v"), model)
    val refProj = projected(reference).localCheckpoint()
    val curProj = projected(current).localCheckpoint()
    // ALL k components batched per pass instead of a driver loop of
    // per-component jobs (the loop ran ~8 tiny driver-synchronized
    // jobs PER component — boundaries, two bin counts, two broadcast
    // totals, two summaries — over node-sized cached frames, so the
    // operator's wall time was pure job-launch latency). Arithmetic
    // is the per-component [[refBoundaries]]/[[binCounts]]/
    // [[psiBinsWith]]/[[psiSummary]] chain verbatim — same percentile
    // call, same Laplace bin probabilities, same round/quant6/DECIMAL
    // fold — batched under a `comp` key, so every psi value is
    // bit-identical to the loop's.
    val fracs = (1 until nBins).map(b => b.toDouble / nBins)
    val bRow = refProj.agg(
      expr(s"percentile(z0, array(${fracs.mkString(", ")}))").as("b0"),
      (1 until k).map(j =>
        expr(s"percentile(z$j, array(${fracs.mkString(", ")}))")
          .as(s"b$j")): _*).head()
    val bounds: Seq[Seq[Double]] = (0 until k).map { j =>
      require(!bRow.isNullAt(j),
        "Drift: the reference has no non-null values to derive bins from")
      bRow.getSeq[Double](j)
    }
    // one pass per frame: every component's bin in one exploded select
    def binCountsAll(df: DataFrame, alias: String): DataFrame =
      // a null vector projects to all-null z columns (the per-component
      // [[binCounts]] dropped those rows component-wise; one z0 filter
      // is the same predicate for every component)
      df.filter(col("z0").isNotNull)
        .select(explode(array((0 until k).map(j =>
          struct(lit(j).as("comp"),
            aggregate(typedLit(bounds(j)), lit(1),
              (acc, b) => acc + when(col(s"z$j") > b, 1).otherwise(0))
              .as("bin"))): _*)).as("cb"))
        .select(col("cb.comp").as("comp"), col("cb.bin").as("bin"))
        .groupBy(col("comp"), col("bin")).agg(count(lit(1)).as(alias))
    val refCounts = binCountsAll(refProj, "ref_n").localCheckpoint(true)
    // one psi per component, all components in one collect: the
    // psiBinsWith arithmetic with the single-row totals keyed by comp
    def psiAll(cur: DataFrame): Map[Int, Double] = {
      val grid = spark.range(1, nBins + 1)
        .select(col("id").cast("int").as("bin"))
        .crossJoin(spark.range(0, k).select(col("id").cast("int").as("comp")))
      val refT = refCounts.groupBy(col("comp"))
        .agg(coalesce(sum(col("ref_n")), lit(0L)).as("ref_total"))
      val curT = cur.groupBy(col("comp"))
        .agg(coalesce(sum(col("cur_n")), lit(0L)).as("cur_total"))
      val refP = (col("ref_n") + 1).cast("double") /
        (col("ref_total") + nBins).cast("double")
      val curP = (col("cur_n") + 1).cast("double") /
        (col("cur_total") + nBins).cast("double")
      grid
        .join(refCounts, Seq("comp", "bin"), "left")
        .join(cur, Seq("comp", "bin"), "left")
        .na.fill(0L, Seq("ref_n", "cur_n"))
        // LEFT join + fill-0 totals: a component with zero bin rows
        // (frame empty after the z0-null filter) must yield the smoothed
        // PSI of an all-empty histogram — the psiBinsWith/crossJoin
        // semantics — not silently vanish from the map and surface later
        // as a bare NoSuchElementException at curPsi(j)/selfPsi(j)
        .join(refT, Seq("comp"), "left").join(curT, Seq("comp"), "left")
        .na.fill(0L, Seq("ref_total", "cur_total"))
        .select(col("comp"),
          round((curP - refP) * log(curP / refP), 6).as("psi_term"))
        .groupBy(col("comp"))
        .agg(sum(col("psi_term").cast(dec)).cast("double").as("psi"))
        .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    }
    val curPsi = psiAll(binCountsAll(curProj, "cur_n"))
    val selfPsi = psiAll(refCounts
      .select(col("comp"), col("bin"), col("ref_n").as("cur_n")))
    val psis = (0 until k).map(j => (curPsi(j), selfPsi(j)))
    spark.range(1).select(
      lit(nRef).as("n_ref"), lit(nCur).as("n_cur"),
      lit(model.dim).as("dim"), lit(k).as("k"),
      lit(meanShift).as("mean_shift_l2"),
      lit(model.gramMaxDeviation < 1e-9).as("basis_orthonormal"),
      lit(psis.forall(_._2 == 0.0)).as("psi_self_zero"),
      lit(psis.forall(_._1 >= 0.0)).as("psi_all_nonneg"),
      lit(psis.exists(_._1 > alertAt)).as("psi_alert"))
  }

  /** Token-distribution drift over the reference's top-K tokens
    * (count DESC, token ASC — deterministic) plus ONE rest bucket
    * (`is_rest = true`; the bucket column is empty there, so a real
    * token can never collide with it): both frames' token counts, the
    * plain-ratio probabilities (quant6 — integer ratios), and the
    * absolute per-bucket gap. Total variation distance = half the gap
    * column's sum, and because the buckets PARTITION both token
    * streams, the decomposition is complete — a drifted source shows
    * up either in a named token's row or in the rest bucket. The top-K
    * list is a K-row broadcast; each frame is scanned once. */
  def tokenDrift(reference: DataFrame, current: DataFrame, text: Column,
                 topK: Int = 50): DataFrame = {
    require(topK >= 1 && topK <= 100000, s"need 1 <= topK <= 100000: $topK")
    val refTok = reference
      .select(explode(TextAnalysis.tokens(text)).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("ref_n"))
    val curTok = current
      .select(explode(TextAnalysis.tokens(text)).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("cur_n"))
    val top = refTok.orderBy(col("ref_n").desc, col("token")).limit(topK)
      .localCheckpoint(true) // K rows; pinned so the join and the rest
                             // row cannot re-derive it differently
    val named = broadcast(top)
      .join(curTok, Seq("token"), "left")
      .na.fill(0L, Seq("cur_n"))
      .select(col("token").as("bucket"), lit(false).as("is_rest"),
        col("ref_n"), col("cur_n"))
    val refTotal = broadcast(refTok.agg(
      coalesce(sum(col("ref_n")), lit(0L)).as("ref_total")))
    val curTotal = broadcast(curTok.agg(
      coalesce(sum(col("cur_n")), lit(0L)).as("cur_total")))
    val namedSums = broadcast(named.agg(
      coalesce(sum(col("ref_n")), lit(0L)).as("nref"),
      coalesce(sum(col("cur_n")), lit(0L)).as("ncur")))
    val rest = namedSums.crossJoin(refTotal).crossJoin(curTotal)
      .select(lit("").as("bucket"), lit(true).as("is_rest"),
        (col("ref_total") - col("nref")).as("ref_n"),
        (col("cur_total") - col("ncur")).as("cur_n"))
    val refP = col("ref_n").cast("double") / col("ref_total")
    val curP = col("cur_n").cast("double") / col("cur_total")
    named.unionByName(rest)
      .crossJoin(refTotal).crossJoin(curTotal)
      .select(col("bucket"), col("is_rest"), col("ref_n"), col("cur_n"),
        TextAnalysis.quant6(refP).as("ref_p"),
        TextAnalysis.quant6(curP).as("cur_p"),
        TextAnalysis.quant6(abs(curP - refP)).as("gap"))
      .orderBy(col("is_rest"), col("bucket"))
  }
}
