package graft

import graft.operators.TimeSeries
import org.apache.spark.sql.functions._

/** Gap-fill + forward-fill: hand-checkable grid semantics, the
  * within-bucket tie-break, the step parameter, the measured
  * grid-explosion guard, and the plan's input-collapse property. */
class TimeSeriesSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(String, Long, Long, Double)],
                  step: Long = 1L, cap: Long = 1000000L) =
    TimeSeries.gapFillForwardFill(
      rows.toDF("k", "b", "eid", "v"),
      key = col("k"), bucket = col("b"), value = col("v"),
      tieBreak = Seq(col("b"), col("eid")), step = step,
      maxBucketsPerKey = cap)

  test("grid: gaps become zero-count unobserved buckets carrying the last value") {
    val out = run(Seq(
      ("a", 10L, 1L, 1.5), ("a", 13L, 2L, 7.25), // gap 11-12
      ("b", 5L, 3L, 2.0)))
      .orderBy("key", "bucket")
      .as[(String, Long, Long, Boolean, Double)].collect().toSeq
    assert(out == Seq(
      ("a", 10L, 1L, true, 1.5),
      ("a", 11L, 0L, false, 1.5),   // forward-filled across the gap
      ("a", 12L, 0L, false, 1.5),
      ("a", 13L, 1L, true, 7.25),
      ("b", 5L, 1L, true, 2.0)))    // single-bucket key: grid of one
  }

  test("within a bucket the LAST event wins (tie-break tuple), counts sum") {
    val out = run(Seq(
      ("a", 10L, 1L, 1.0), ("a", 10L, 3L, 9.0), ("a", 10L, 2L, 5.0),
      ("a", 12L, 4L, 2.0)))
      .orderBy("bucket")
      .as[(String, Long, Long, Boolean, Double)].collect().toSeq
    assert(out == Seq(
      ("a", 10L, 3L, true, 9.0),    // eid=3 is latest; count = 3
      ("a", 11L, 0L, false, 9.0),
      ("a", 12L, 1L, true, 2.0)))
  }

  test("step > 1 aligns buckets down and strides the grid") {
    val out = run(Seq(
      ("a", 17L, 1L, 1.0),          // aligns to 10 at step 10
      ("a", 41L, 2L, 3.0)),         // aligns to 40
      step = 10L)
      .orderBy("bucket")
      .as[(String, Long, Long, Boolean, Double)].collect().toSeq
    assert(out == Seq(
      ("a", 10L, 1L, true, 1.0),
      ("a", 20L, 0L, false, 1.0),
      ("a", 30L, 0L, false, 1.0),
      ("a", 40L, 1L, true, 3.0)))
  }

  test("a key spanning more buckets than the cap fails by name, not by OOM") {
    val e = intercept[IllegalArgumentException] {
      run(Seq(("a", 0L, 1L, 1.0), ("a", 10000000L, 2L, 2.0)), cap = 1000L)
        .count()
    }
    assert(e.getMessage.contains("buckets"), e.getMessage)
    // the same span is fine when the step coarsens it under the cap
    assert(run(Seq(("a", 0L, 1L, 1.0), ("a", 10000000L, 2L, 2.0)),
      step = 100000L, cap = 1000L).count() == 101)
  }

  test("interpolation: lerp between neighbors; grid edges are always observed") {
    val out = TimeSeries.gapFillInterpolate(
      Seq(("a", 10L, 1L, 1.0), ("a", 14L, 2L, 9.0), ("a", 16L, 3L, 3.0))
        .toDF("k", "b", "eid", "v"),
      key = col("k"), bucket = col("b"), value = col("v"),
      tieBreak = Seq(col("b"), col("eid")))
      .orderBy("bucket")
      .select("bucket", "observed", "value_interp")
      .as[(Long, Boolean, Double)].collect().toSeq
    assert(out == Seq(
      (10L, true, 1.0),
      (11L, false, 3.0),   // 1 + 8 * 1/4
      (12L, false, 5.0),
      (13L, false, 7.0),
      (14L, true, 9.0),
      (15L, false, 6.0),   // 9 + (3-9) * 1/2
      (16L, true, 3.0)))
    // within-bucket tie-break feeds the lerp's left endpoint; exact
    // thirds here pin the expression shape (every op correctly rounded)
    val tail = TimeSeries.gapFillInterpolate(
      Seq(("a", 1L, 1L, 5.0), ("a", 1L, 2L, 7.0), ("a", 4L, 3L, 1.0),
          ("b", 9L, 4L, 2.0)).toDF("k", "b", "eid", "v"),
      key = col("k"), bucket = col("b"), value = col("v"),
      tieBreak = Seq(col("b"), col("eid")))
    val a = tail.filter(col("key") === "a").orderBy("bucket")
      .select("value_interp").as[Double].collect().toSeq
    assert(a == Seq(7.0, 5.0, 3.0, 1.0)) // eid tie-break at b=1; exact lerp
  }

  test("plan: raw events collapse at the first aggregate; exchanges are fixed-width") {
    // the only pass over the input is the (key, bucket) partial+final
    // aggregate — no exchange carries the raw event rows
    val df = run(Seq(("a", 1L, 1L, 1.0), ("a", 5L, 2L, 2.0)))
    val plan = df.queryExecution.executedPlan.toString
    // partial+final aggregate (SortAggregate — struct max is sort-based);
    // the partial side runs BEFORE the exchange, so raw events collapse
    // map-side and the shuffle carries (key, bucket) rows only
    assert(plan.contains("partial_count"), plan)
    // one window (the forward fill), no nested-loop join
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"), plan)
  }
}
