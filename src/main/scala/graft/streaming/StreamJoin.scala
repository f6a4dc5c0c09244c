package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream interval join — the attribution pattern: each left event
  * (impression) joins right events (clicks) on a key within
  * `[left_ts, left_ts + window]`.
  *
  * Both sides are buffered in the state store; the watermarks plus the
  * interval condition bound that state — Spark evicts a buffered left row
  * once the right watermark passes `left_ts + window` (no unbounded
  * buffering, unlike an unconstrained stream-stream join). State size is
  * therefore `rate × (window + delay)` per side regardless of stream
  * length, which is what makes this safe on an unbounded 100 TB/day
  * stream. `leftOuter` additionally emits unmatched left rows (null right
  * columns) once the watermark proves no match can arrive.
  *
  * Column contract: `left` has (`k`, `left_ts`, ...), `right` has
  * (`k`, `right_ts`, ...); output carries all columns of both sides with
  * the join key once.
  */
object StreamJoin {

  def intervalJoin(left: DataFrame, right: DataFrame,
                   window: String = "30 minutes",
                   delay: String = "10 minutes",
                   leftOuter: Boolean = false): DataFrame = {
    val l = left.withWatermark("left_ts", delay)
    val r = right.withWatermark("right_ts", delay)
      .withColumnRenamed("k", "__rk")
    val cond = col("k") === col("__rk") &&
      col("right_ts") >= col("left_ts") &&
      col("right_ts") <= col("left_ts") + expr(s"INTERVAL $window")
    l.join(r, cond, if (leftOuter) "leftOuter" else "inner").drop("__rk")
  }
}
