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
