package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series regularization: put an irregular event stream onto a
  * fixed per-key bucket grid — the `SAMPLE BY`/`fill()` capability of
  * time-series engines (QuestDB, InfluxDB, kdb), re-expressed as three
  * declarative stages Catalyst can optimize. Downstream consumers
  * (rolling features, training-window extraction, charting) need a
  * dense grid; raw event streams have gaps wherever nothing happened.
  *
  * The caller supplies the bucket as an INTEGER column (e.g. days since
  * epoch via `datediff` for a daily grid, `unix_timestamp / 900` for 15
  * minutes) — integer buckets keep the grid arithmetic exact, engine-
  * and timezone-independent, which is what lets the DuckDB oracle hold
  * the whole operator to hash equality. */
object TimeSeries {

  /** Dense per-key grid with zero-filled counts and FORWARD-FILLED
    * values. Output: `(key, bucket, n_events, observed, value_ffill)`
    * where `bucket` ranges over the key's [min, max] observed buckets in
    * `step` increments, `n_events` is 0 on generated buckets,
    * `observed` flags real ones, and `value_ffill` carries the LAST
    * observed value forward across gaps (within a bucket, "last" means
    * the row with the greatest `tieBreak` tuple — pass e.g.
    * `Seq(ts, event_id)` for deterministic latest-event semantics; a
    * key's first bucket is observed by construction, so the fill never
    * reads an empty history).
    *
    * Plan shape and scale: one partial-merged aggregate to (key,
    * bucket) rows (fixed-width — the raw events collapse here, and this
    * is the ONLY pass over the input), a key-sized ranges aggregate, a
    * map-side `sequence`+`explode` skeleton, one equi-join of skeleton
    * and observed on (key, bucket), and the forward-fill window per
    * key. Nothing is quadratic; every exchanged row is fixed-width.
    * The skeleton is the one thing that can outgrow the input — a
    * single key spanning years at a seconds grid materializes
    * span/step rows — so the per-key bucket count is MEASURED on the
    * key-sized ranges frame and the operator fails by name above
    * `maxBucketsPerKey` instead of silently exploding the join. */
  def gapFillForwardFill(df: DataFrame, key: Column, bucket: Column,
                         value: Column, tieBreak: Seq[Column],
                         step: Long = 1L,
                         maxBucketsPerKey: Long = 1000000L): DataFrame = {
    require(step >= 1L, s"need step >= 1, got $step")
    val observed = df
      .select(key.as("key"), (bucket - pmod(bucket, lit(step))).as("bucket"),
        struct(tieBreak :+ value.as("__v"): _*).as("__pick"))
      .groupBy(col("key"), col("bucket"))
      .agg(count(lit(1)).as("n_events"),
        max(col("__pick")).getField("__v").as("__vlast"))
    val ranges = observed.groupBy(col("key"))
      .agg(min(col("bucket")).as("b0"), max(col("bucket")).as("b1"))
      .localCheckpoint(true) // one row per key; reused by guard + skeleton
    // max over an EMPTY frame is null — an empty input yields an empty
    // grid, it is not a guard violation (getLong would NPE), same as
    // the ewma/holt guards below
    val worst = Option(ranges
      .agg(max(floor((col("b1") - col("b0")) / lit(step)) + 1).as("m"))
      .head().getAs[java.lang.Long](0)).map(_.longValue).getOrElse(0L)
    require(worst <= maxBucketsPerKey,
      s"gapFillForwardFill: a key spans $worst buckets at step=$step, " +
        s"over the $maxBucketsPerKey cap — the generated grid would " +
        "dominate the job; coarsen the bucket, raise the cap, or split " +
        "the key range")
    val skeleton = ranges.select(col("key"),
      explode(sequence(col("b0"), col("b1"), lit(step))).as("bucket"))
    val wFill = Window.partitionBy(col("key")).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    skeleton.join(observed, Seq("key", "bucket"), "left")
      .select(col("key"), col("bucket"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        col("n_events").isNotNull.as("observed"),
        last(col("__vlast"), ignoreNulls = true).over(wFill).as("value_ffill"))
  }

  /** Rolling z-score anomaly detection: each `(key, bucket)` point is
    * scored against the mean/stddev of its OWN key's previous `win`
    * points (the trailing window EXCLUDES the current point, so an
    * outlier never masks itself). Input must already be one row per
    * (key, bucket) — compose with a bucket aggregation or [[
    * gapFillForwardFill]] upstream. Output adds `n_prior`, `z` (null
    * until 2 prior points exist or when the prior window is constant —
    * a 0/0 z-score is undefined, not infinite), and `is_anomaly`
    * (|z| > `threshold`; null z → false).
    *
    * Engine-exact by construction, not by tolerance: the value is
    * 6-dp-quantized per row and the rolling Σv and Σv² accumulate as
    * DECIMAL — exact, associativity-free — so mean and variance come
    * out of the SAME exact sums on any engine (DuckDB's segment-tree
    * window sums vs Spark's running sums never shows), and the
    * remaining ops (÷, √, −) are each IEEE correctly rounded. Variance
    * is clamped at 0 against last-ulp cancellation.
    *
    * Scale: ONE key-partitioned window pass with a fixed ROWS frame —
    * fixed-width state, no skeleton, no self-join; a key's history
    * streams through its sort once. */
  def anomalyZScore(df: DataFrame, key: Column, bucket: Column,
                    value: Column, win: Int,
                    threshold: Double = 3.0): DataFrame = {
    require(win >= 2, s"need win >= 2 prior points, got $win")
    // 38,6 — not 18,6: v² needs twice the integer digits of v, and a
    // 6-dp value of 1e6 (12 integer digits squared) would overflow the
    // narrower type (ANSI: the query throws; legacy: z silently nulls)
    val dec = org.apache.spark.sql.types.DecimalType(38, 6)
    val w = Window.partitionBy(col("key")).orderBy(col("bucket"))
      .rowsBetween(-win, -1)
    val vq = round(value.cast("double"), 6)
    val base = df.select(key.as("key"), bucket.as("bucket"), vq.as("v"),
      vq.cast(dec).as("__v1"), round(vq * vq, 6).cast(dec).as("__v2"))
    val n = count(col("__v1")).over(w)
    val s1 = sum(col("__v1")).over(w).cast("double")
    val s2 = sum(col("__v2")).over(w).cast("double")
    val mean = s1 / n
    val varPop = greatest((s2 - s1 * s1 / n) / (n - lit(1)), lit(0.0))
    val sd = sqrt(varPop)
    val z = when(n >= 2 && sd > 0, round((col("v") - mean) / sd, 6))
    base
      .withColumn("n_prior", n)
      .withColumn("z", z)
      .withColumn("is_anomaly", coalesce(abs(col("z")) > threshold, lit(false)))
      .drop("__v1", "__v2")
  }

  /** Per-key exponentially-weighted moving average — the classic
    * smoother (`ewma_i = α·v_i + (1−α)·ewma_{i−1}`, seeded with the
    * first point), folded to its FINAL value per key: the "current
    * smoothed level" a monitoring/feature pipeline keeps per entity.
    * Output: `(key, n_points, last_bucket, ewma)`.
    *
    * The recursion is inherently sequential, so it runs as an in-memory
    * fold over the key's bucket-ordered value array (`aggregate` over a
    * sorted `collect_list`) — the one operator in this file that
    * materializes a whole key in memory. The per-key point count is
    * MEASURED first (one cheap count-only pass, no arrays) and the
    * build fails by name above `maxPointsPerKey` instead of OOMing an
    * executor. The fold's float ops run in the same order on any
    * engine (DuckDB's `list_reduce` seeds with the first element too),
    * each step correctly rounded, so the result is bit-reproducible —
    * round-6 on output is cosmetic, not a tolerance.
    *
    * At 100 TB: the heavy exchange carries (key, bucket, value) rows
    * once into the key-grouped collect; keys distribute across
    * executors, and the guard bounds the worst key. For series longer
    * than the cap, coarsen buckets upstream — an EWMA's tail weight
    * below ~1e-7 of the cap's horizon is noise anyway. */
  /** Null-value poison for the smoothing folds: `collect_list` silently
    * SKIPS nulls while `count(lit(1))` counts every row, so a null value
    * would desynchronize `n_points` from the folded series (and an
    * all-null key would fold to null level/trend). Same in-column
    * `raise_error` convention as the sampling guards: zero cost on clean
    * data, fails by name at the first null when the value column is
    * consumed; the per-key count pre-pass prunes the column and is
    * unaffected. */
  private def guardedValue(op: String, value: Column): Column =
    when(value.isNull, raise_error(lit(
        s"$op: the value column contains nulls — the fold would silently " +
          "skip them (n_points would exceed the series length); filter " +
          "or impute them first")).cast("double"))
      .otherwise(value.cast("double"))

  def ewma(df: DataFrame, key: Column, bucket: Column, value: Column,
           alpha: Double, maxPointsPerKey: Long = 1000000L): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, s"need 0 < alpha <= 1, got $alpha")
    val base = df.select(key.as("key"), bucket.as("bucket"),
      guardedValue("ewma", value).as("v"))
    // max over an EMPTY frame is null — an empty input folds to an
    // empty output, it is not a guard violation (getLong would NPE)
    val worst = Option(base.groupBy(col("key")).count()
      .agg(max(col("count"))).head().getAs[java.lang.Long](0))
      .map(_.longValue).getOrElse(0L)
    require(worst <= maxPointsPerKey,
      s"ewma: a key has $worst points, over the $maxPointsPerKey cap — " +
        "the per-key fold array would dominate executor memory; coarsen " +
        "the bucket or raise the cap")
    base
      .groupBy(col("key"))
      .agg(count(lit(1)).as("n_points"), max(col("bucket")).as("last_bucket"),
        transform(sort_array(collect_list(struct(col("bucket"), col("v")))),
          x => x.getField("v")).as("__vals"))
      .select(col("key"), col("n_points"), col("last_bucket"),
        round(aggregate(
          slice(col("__vals"), lit(2),
            greatest(size(col("__vals")) - 1, lit(0))),
          element_at(col("__vals"), 1),
          (acc, x) => lit(alpha) * x + lit(1.0 - alpha) * acc), 6).as("ewma"))
  }

  /** Holt's LINEAR-TREND double exponential smoothing, folded to its
    * final state per key — [[ewma]] plus a trend component, the
    * standard one-step forecaster for trending series:
    * `l_i = α·v_i + (1−α)·(l_{i−1} + b_{i−1})`,
    * `b_i = β·(l_i − l_{i−1}) + (1−β)·b_{i−1}`, seeded `l_1 = v_1`,
    * `b_1 = 0` (the zero-trend seed keeps the single-point case exact
    * and the fold's accumulator type uniform — documented contract).
    * Output: `(key, n_points, last_bucket, level, trend, forecast_1)`
    * with `forecast_1 = level + trend`.
    *
    * Same execution and guard story as [[ewma]] (measured per-key count
    * before the fold; fails by name over the cap). The accumulator is a
    * two-field struct folded with `aggregate`; with α and β whose
    * complements are exactly representable (e.g. 0.5 / 0.25) every step
    * is a correctly-rounded IEEE op in a fixed order, so the result is
    * bit-reproducible across engines — the DuckDB oracle replays the
    * same recurrence (as a recursive CTE: DuckDB's struct-accumulator
    * `list_reduce` mis-evaluates the second field, so don't use it) and
    * hash-matches without a tolerance. */
  def holt(df: DataFrame, key: Column, bucket: Column, value: Column,
           alpha: Double, beta: Double,
           maxPointsPerKey: Long = 1000000L): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, s"need 0 < alpha <= 1, got $alpha")
    require(beta > 0.0 && beta <= 1.0, s"need 0 < beta <= 1, got $beta")
    val base = df.select(key.as("key"), bucket.as("bucket"),
      guardedValue("holt", value).as("v"))
    val worst = Option(base.groupBy(col("key")).count()
      .agg(max(col("count"))).head().getAs[java.lang.Long](0))
      .map(_.longValue).getOrElse(0L)
    require(worst <= maxPointsPerKey,
      s"holt: a key has $worst points, over the $maxPointsPerKey cap — " +
        "the per-key fold array would dominate executor memory; coarsen " +
        "the bucket or raise the cap")
    // l_new appears twice textually (once for `l`, once inside `b`) —
    // same expression, same operand order, same IEEE bits; Spark's
    // subexpression elimination may or may not merge them, the VALUE is
    // identical either way.
    def lNew(acc: Column, x: Column): Column =
      lit(alpha) * x +
        lit(1.0 - alpha) * (acc.getField("l") + acc.getField("b"))
    base
      .groupBy(col("key"))
      .agg(count(lit(1)).as("n_points"), max(col("bucket")).as("last_bucket"),
        transform(sort_array(collect_list(struct(col("bucket"), col("v")))),
          x => x.getField("v")).as("__vals"))
      .select(col("key"), col("n_points"), col("last_bucket"),
        aggregate(
          slice(col("__vals"), lit(2),
            greatest(size(col("__vals")) - 1, lit(0))),
          struct(element_at(col("__vals"), 1).as("l"), lit(0.0).as("b")),
          (acc, x) => struct(
            lNew(acc, x).as("l"),
            (lit(beta) * (lNew(acc, x) - acc.getField("l"))
              + lit(1.0 - beta) * acc.getField("b")).as("b"))).as("__hb"))
      .select(col("key"), col("n_points"), col("last_bucket"),
        round(col("__hb").getField("l"), 6).as("level"),
        round(col("__hb").getField("b"), 6).as("trend"),
        round(col("__hb").getField("l") + col("__hb").getField("b"), 6)
          .as("forecast_1"))
  }

  /** [[gapFillForwardFill]] plus LINEAR INTERPOLATION — the third
    * standard fill mode: a generated bucket between two observed values
    * gets `v_prev + (v_next − v_prev) · (b − b_prev)/(b_next − b_prev)`.
    * Both edges exist by construction — the grid spans [min, max]
    * OBSERVED buckets, so every generated bucket has an observed
    * neighbor on each side and the interpolation is always two-sided
    * (the carried-value fallback in the expression is defensive, not a
    * reachable mode). Output adds `value_interp`.
    *
    * The interpolation is REPRODUCIBLE TO THE BIT on any IEEE-754
    * engine evaluating the same expression shape: integer buckets
    * convert to double exactly, the stored doubles are used as-is, and
    * `+ − × ÷` are each correctly rounded — which is what lets the
    * DuckDB oracle hold the interpolated values to hash equality rather
    * than a tolerance. Plan shape: the same single-input-pass grid as
    * the forward fill, plus one more per-key window pass (the
    * look-ahead to the next observed bucket); still nothing quadratic. */
  def gapFillInterpolate(df: DataFrame, key: Column, bucket: Column,
                         value: Column, tieBreak: Seq[Column],
                         step: Long = 1L,
                         maxBucketsPerKey: Long = 1000000L): DataFrame = {
    val filled = gapFillForwardFill(df, key, bucket, value, tieBreak,
      step, maxBucketsPerKey)
    val wPast = Window.partitionBy(col("key")).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // the NEXT-observed lookahead runs as a RUNNING frame over the
    // DESCENDING bucket order — semantically identical to
    // first(..) over rowsBetween(1, unboundedFollowing), but that frame
    // shape makes Spark's WindowExec re-aggregate the remaining rows for
    // EVERY row (O(span²) per key: measured 629 s vs the fill's 16 s at
    // 16M events before this rewrite); a running frame is incremental,
    // O(span), at the cost of one extra in-partition sort
    val wNext = Window.partitionBy(col("key")).orderBy(col("bucket").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val obsBucket = when(col("observed"), col("bucket"))
    val obsValue = when(col("observed"), col("value_ffill"))
    filled
      .withColumn("__pb", last(obsBucket, ignoreNulls = true).over(wPast))
      .withColumn("__nb", last(obsBucket, ignoreNulls = true).over(wNext))
      .withColumn("__nv", last(obsValue, ignoreNulls = true).over(wNext))
      .withColumn("value_interp",
        when(col("observed") || col("__nb").isNull, col("value_ffill"))
          .otherwise(col("value_ffill")
            + (col("__nv") - col("value_ffill"))
              * ((col("bucket") - col("__pb")).cast("double")
                / (col("__nb") - col("__pb")).cast("double"))))
      .drop("__pb", "__nb", "__nv")
  }
}
