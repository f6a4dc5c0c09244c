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
    val worst = ranges
      .agg(max(floor((col("b1") - col("b0")) / lit(step)) + 1).as("m"))
      .head().getLong(0)
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
    val wNext = Window.partitionBy(col("key")).orderBy(col("bucket"))
      .rowsBetween(1, Window.unboundedFollowing)
    val obsBucket = when(col("observed"), col("bucket"))
    val obsValue = when(col("observed"), col("value_ffill"))
    filled
      .withColumn("__pb", last(obsBucket, ignoreNulls = true).over(wPast))
      .withColumn("__nb", first(obsBucket, ignoreNulls = true).over(wNext))
      .withColumn("__nv", first(obsValue, ignoreNulls = true).over(wNext))
      .withColumn("value_interp",
        when(col("observed") || col("__nb").isNull, col("value_ffill"))
          .otherwise(col("value_ffill")
            + (col("__nv") - col("value_ffill"))
              * ((col("bucket") - col("__pb")).cast("double")
                / (col("__nb") - col("__pb")).cast("double"))))
      .drop("__pb", "__nb", "__nv")
  }
}
