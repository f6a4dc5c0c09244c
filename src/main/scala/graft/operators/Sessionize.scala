package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization: rows of the same key belong to one session
  * while consecutive event times are within `gap`. Classic two-window
  * formulation — a lag to flag session starts, then a running sum to number
  * them — one shuffle on the key, everything whole-stage-codegen'd.
  */
object Sessionize {

  /** Adds `session_id` (1-based per key) to `df`. `order` must make the
    * per-key ordering unique for deterministic output. */
  def byGap(df: DataFrame, key: Column, ts: Column, gapSeconds: Long,
            tieBreak: Seq[Column] = Nil): DataFrame = {
    val ord = ts +: tieBreak
    val w = Window.partitionBy(key).orderBy(ord: _*)
    df.withColumn("__prev_ts", lag(ts, 1).over(w))
      .withColumn("__new_session",
        when(col("__prev_ts").isNull ||
          unix_micros(ts) - unix_micros(col("__prev_ts")) > gapSeconds * 1000000L, 1L)
          .otherwise(0L))
      .withColumn("session_id",
        sum(col("__new_session")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("__prev_ts", "__new_session")
  }

  /** Per-session rollup: bounds, duration, event count, value sum. */
  def sessionStats(df: DataFrame, key: Column, ts: Column, gapSeconds: Long,
                   value: Column, tieBreak: Seq[Column] = Nil): DataFrame =
    byGap(df, key, ts, gapSeconds, tieBreak)
      .groupBy(key.as("key"), col("session_id"))
      .agg(
        min(ts).as("session_start"),
        max(ts).as("session_end"),
        count(lit(1)).as("n_events"),
        sum(value.cast(org.apache.spark.sql.types.DecimalType(18, 6)))
          .cast("double").as("sum_value"))
}
