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

  test("empty input yields an empty grid, not a guard NPE") {
    val empty = Seq.empty[(String, Long, Long, Double)].toDF("k", "b", "e", "v")
    assert(TimeSeries.gapFillForwardFill(empty, col("k"), col("b"),
      col("v"), tieBreak = Seq(col("e"))).isEmpty)
    assert(TimeSeries.gapFillInterpolate(empty, col("k"), col("b"),
      col("v"), tieBreak = Seq(col("e"))).isEmpty)
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

  test("anomalyZScore: hand-computed rolling moments; self-exclusion; constant-window null") {
    // key "a": values 10,10,10,10,40 — the spike scores against a
    // constant prior window (sd=0) → z NULL, not infinite
    // key "b": 1,3,5 then 100 — prior {1,3,5}: mean=3, var=4, sd=2
    val df = Seq(
      ("a", 1L, 10.0), ("a", 2L, 10.0), ("a", 3L, 10.0), ("a", 4L, 10.0),
      ("a", 5L, 40.0),
      ("b", 1L, 1.0), ("b", 2L, 3.0), ("b", 3L, 5.0), ("b", 4L, 100.0))
      .toDF("k", "b", "v")
    val got = TimeSeries.anomalyZScore(df, col("k"), col("b"), col("v"),
        win = 7)
      .orderBy("key", "bucket")
      .select("key", "bucket", "n_prior", "z", "is_anomaly")
      .as[(String, Long, Long, Option[Double], Boolean)].collect().toSeq
    val z3 = BigDecimal(3.0 / math.sqrt(2.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got == Seq(
      ("a", 1L, 0L, None, false),
      ("a", 2L, 1L, None, false),          // < 2 prior points
      ("a", 3L, 2L, None, false),          // constant prior: sd = 0
      ("a", 4L, 3L, None, false),
      ("a", 5L, 4L, None, false),          // spike invisible to itself
      ("b", 1L, 0L, None, false),
      ("b", 2L, 1L, None, false),
      ("b", 3L, 2L, Some(z3), false),      // prior {1,3}: mean 2, sd √2
      ("b", 4L, 3L, Some(48.5), true)))    // prior {1,3,5}: (100-3)/2
  }

  test("anomalyZScore: window slides (8th point drops the 1st); one exchange") {
    // 9 points: at bucket 9 the window is buckets 2..8, not 1..8
    val vals = Seq(100.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0)
    val df = vals.zipWithIndex.map { case (v, i) => ("k", (i + 1).toLong, v) }
      .toDF("k", "b", "v")
    val out = TimeSeries.anomalyZScore(df, col("k"), col("b"), col("v"), 7)
      .filter(col("bucket") === 9L).select("n_prior", "z").collect().head
    assert(out.getLong(0) == 7L && out.isNullAt(1),
      s"window must have slid past the 100.0 (constant prior => null z): $out")
    val plan = TimeSeries.anomalyZScore(df, col("k"), col("b"), col("v"), 7)
      .queryExecution.executedPlan.toString
    val n = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(n == 1, s"expected 1 hash exchange:\n$plan")
  }

  test("ewma: fold matches the recursion; single point; cap fails by name") {
    val df = Seq(("k", 3L, 4.0), ("k", 1L, 2.0), ("k", 2L, 8.0),
      ("solo", 1L, 7.5)).toDF("k", "b", "v")
    val got = TimeSeries.ewma(df, col("k"), col("b"), col("v"), alpha = 0.25)
      .orderBy("key").as[(String, Long, Long, Double)].collect().toSeq
    // hand recursion for "k" in bucket order 2.0, 8.0, 4.0:
    //   e1=2.0; e2=.25*8+.75*2=3.5; e3=.25*4+.75*3.5=3.625
    assert(got == Seq(("k", 3L, 3L, 3.625), ("solo", 1L, 1L, 7.5)))
    val e = intercept[IllegalArgumentException] {
      TimeSeries.ewma(df, col("k"), col("b"), col("v"), 0.25,
        maxPointsPerKey = 2L)
    }
    assert(e.getMessage.contains("ewma"), e.getMessage)
  }

  test("ewma/holt: null values poison by name instead of silently skipping the fold") {
    // collect_list would drop the null -> n_points 2 but a 1-long series;
    // the in-column poison fires when the fold consumes the value
    val withNull = Seq(("k", 1L, Some(2.0)), ("k", 2L, Option.empty[Double]))
      .toDF("k", "b", "v")
    def msg(t: Throwable): String =
      (Iterator.iterate(t)(_.getCause).takeWhile(_ != null).map(_.getMessage)
        ++ Iterator(t.toString)).mkString(" | ")
    val e1 = intercept[Exception] {
      TimeSeries.ewma(withNull, col("k"), col("b"), col("v"), 0.25).collect()
    }
    assert(msg(e1).contains("nulls"), msg(e1))
    val e2 = intercept[Exception] {
      TimeSeries.holt(withNull, col("k"), col("b"), col("v"), 0.5, 0.25)
        .collect()
    }
    assert(msg(e2).contains("nulls"), msg(e2))
  }

  test("holt: fold matches the hand recursion; single point; cap fails by name") {
    val df = Seq(("k", 1L, 10.0), ("k", 2L, 12.0), ("k", 3L, 11.0),
      ("k", 4L, 15.0), ("solo", 1L, 7.5)).toDF("k", "b", "v")
    val got = TimeSeries.holt(df, col("k"), col("b"), col("v"),
        alpha = 0.5, beta = 0.25)
      .orderBy("key")
      .as[(String, Long, Long, Double, Double, Double)].collect().toSeq
    // hand recursion, l1=10 b1=0:
    //   v=12: l=.5*12+.5*10=11,       b=.25*1+0=.25
    //   v=11: l=.5*11+.5*11.25=11.125, b=.25*.125+.75*.25=.21875
    //   v=15: l=.5*15+.5*11.34375=13.171875
    //         b=.25*2.046875+.75*.21875=.675781 (round 6)
    assert(got == Seq(
      ("k", 4L, 4L, 13.171875, 0.675781, 13.847656),
      ("solo", 1L, 1L, 7.5, 0.0, 7.5)))
    val e = intercept[IllegalArgumentException] {
      TimeSeries.holt(df, col("k"), col("b"), col("v"), 0.5, 0.25,
        maxPointsPerKey = 2L)
    }
    assert(e.getMessage.contains("holt"), e.getMessage)
    // a downward-trending series forecasts BELOW its last level — the
    // property ewma cannot have (its forecast is a lagging average)
    val down = Seq.tabulate(10)(i => ("d", i.toLong, 100.0 - 10.0 * i))
      .toDF("k", "b", "v")
    val (lvl, trend, fc) = TimeSeries.holt(down, col("k"), col("b"),
        col("v"), 0.5, 0.25)
      .select(col("level"), col("trend"), col("forecast_1"))
      .as[(Double, Double, Double)].head()
    assert(trend < 0 && fc < lvl, s"trend $trend, forecast $fc, level $lvl")
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
