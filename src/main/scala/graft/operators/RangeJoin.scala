package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Point-in-interval (range) join at scale.
  *
  * A naive `points.join(intervals, ts >= start && ts < end)` has no equi
  * key, so Spark plans BroadcastNestedLoopJoin — O(points × intervals)
  * compares and a broadcast-or-bust shape. The scale form quantizes time
  * into fixed chunks: each point gets its chunk, each interval explodes to
  * the chunks it overlaps (intervals are short relative to the domain, so
  * a small constant fan-out), and the join becomes a hash equi-join on the
  * chunk with the exact range predicate as a residual filter. Shuffle
  * volume is `points + intervals × chunks_per_interval`; a point's chunk
  * appears once per interval, so no post-join dedup is needed.
  *
  * Pick `chunkMicros` near the typical interval length: much larger wastes
  * residual-filter work (many non-matching pairs share a chunk), much
  * smaller fans intervals out over many chunks.
  */
object RangeJoin {

  /** Join each point (`pointTs`) to every interval with
    * `start <= ts < end` (half-open). Both frames' columns survive;
    * rename collisions before calling. */
  def pointInInterval(points: DataFrame, pointTs: Column,
                      intervals: DataFrame, start: Column, end: Column,
                      chunkMicros: Long = 3600L * 1000000L): DataFrame = {
    val pm = unix_micros(pointTs.cast("timestamp"))
    val p = points.withColumn("__chunk", floor(pm / chunkMicros))
    // explode_outer: the non-outer generator would add an inferred
    // isnotnull constraint evaluated a second time in the scan filter
    val i = intervals
      .withColumn("__s", unix_micros(start.cast("timestamp")))
      .withColumn("__e", unix_micros(end.cast("timestamp")))
      // drop empty/inverted intervals BEFORE the explode: they can match
      // nothing (the residual filter is s <= ts < e), but sequence(a, b)
      // with b < a steps DOWNWARD, so one dirty row (e.g. a zeroed end
      // timestamp) would otherwise fan out into millions of chunk rows
      .filter(col("__e") > col("__s"))
      .withColumn("__chunk", explode_outer(sequence(
        floor(col("__s") / chunkMicros),
        floor((col("__e") - 1) / chunkMicros))))
    p.join(i, Seq("__chunk"))
      .filter(pm >= col("__s") && pm < col("__e"))
      .drop("__chunk", "__s", "__e")
  }
}
