package graft

import graft.operators.Quality
import graft.operators.Quality._
import org.apache.spark.sql.functions._

class QualitySpec extends SparkSpec {
  import spark.implicits._

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
      r.getBoolean(3))).toSeq

  test("report: each constraint counts its own violations in one pass") {
    val df = Seq(
      (1L, Some("a"), 10.0, "1-URGENT"),
      (2L, None, 150.0, "2-HIGH"),      // null name; range violation
      (2L, Some("c"), -5.0, "bad"),     // dup key; range + regex violations
      (3L, Some("d"), 50.0, "5-LOW")
    ).toDF("k", "name", "v", "pri")
    val dim = Seq(1L, 2L).toDF("id")     // 3L dangles
    val got = rows(Quality.report(df, Seq(
      NotNull("name"),
      Unique(Seq("k")),
      InRange("v", 0.0, 100.0),
      Matches("pri", "^[1-5]-"),
      RefIntegrity("k", dim, "id"))))
    assert(got == Seq(
      ("in_range(v)", 4L, 2L, false),
      ("matches(pri)", 4L, 1L, false),
      ("not_null(name)", 4L, 1L, false),
      ("ref(k->id)", 4L, 1L, false),
      ("unique(k)", 4L, 1L, false)), got.toString)
    // a clean table passes everything
    val clean = rows(Quality.report(df.filter(col("k") === 1L), Seq(
      NotNull("name"), Unique(Seq("k")), InRange("v", 0.0, 100.0))))
    assert(clean.forall(_._4), clean.toString)
  }

  test("report: null FKs belong to not_null, not ref; multi-column unique; guards") {
    val df = Seq((Some(1L), "x", "y"), (None, "x", "y"), (Some(9L), "x", "z"))
      .toDF("fk", "a", "b")
    val dim = Seq(1L).toDF("id")
    val got = rows(Quality.report(df, Seq(
      RefIntegrity("fk", dim, "id"),    // only the non-null 9 dangles
      NotNull("fk"),
      Unique(Seq("a", "b")))))          // (x,y) twice -> 1 violation
    assert(got == Seq(
      ("not_null(fk)", 3L, 1L, false),
      ("ref(fk->id)", 3L, 1L, false),
      ("unique(a,b)", 3L, 1L, false)), got.toString)
    // ONE null-keyed row is not a duplicate (null tuples collapse to
    // one distinct value — the documented semantics); a SECOND one is
    val oneNull = Seq(Some(1L), Some(2L), None).toDF("k")
    assert(rows(Quality.report(oneNull, Seq(Unique(Seq("k")), NotNull("k"))))
      == Seq(("not_null(k)", 3L, 1L, false), ("unique(k)", 3L, 0L, true)))
    val twoNulls = oneNull.unionByName(Seq(Option.empty[Long]).toDF("k"))
    assert(rows(Quality.report(twoNulls, Seq(Unique(Seq("k")))))
      == Seq(("unique(k)", 4L, 1L, false)))
    intercept[IllegalArgumentException] { Quality.report(df, Nil) }
    intercept[IllegalArgumentException] {
      Quality.report(df, Seq(NotNull("fk"), NotNull("fk")))
    }
    intercept[IllegalArgumentException] { InRange("v", 5.0, 1.0) }
  }

  test("plan: row-level constraints share ONE aggregate over the table") {
    val df = Tables(spark, sfDir).orders
    val rep = Quality.report(df, Seq(
      NotNull("o_custkey"), Unique(Seq("o_orderkey")),
      InRange("o_totalprice", 0.0, 1e9), Matches("o_orderstatus", "^[A-Z]$")))
    rep.collect()
    // the report's lineage starts from the 1-row checkpointed aggregate:
    // the orders scan appears in the CHECKPOINT, not per constraint —
    // the executed plan here must contain no parquet scan at all
    val plan = rep.queryExecution.executedPlan.toString
    assert(!plan.contains("FileScan"), s"report must not rescan per constraint:\n$plan")
  }

  test("observe: counts ride the main job, equal the dedicated report, reject non-row-level") {
    val df = Seq(
      (1L, Some("a"), 10.0), (2L, None, 150.0),
      (2L, Some("c"), -5.0), (3L, Some("d"), 50.0)
    ).toDF("k", "name", "v")
    val constraints = Seq(NotNull("name"), InRange("v", 0.0, 100.0),
      Matches("name", "^[a-d]$"))
    val (inst, obs) = Quality.observe(df, constraints)
    // the pipeline's own action — ONE scan total, no dedicated DQ pass
    val mainPlan = {
      val main = inst.groupBy(col("k")).agg(sum(col("v")))
      main.collect()
      // AQE's toString prints the final AND the initial plan — count
      // scans in the executed (final) section only
      main.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    }
    assert("LocalTableScan|Scan ExistingRDD".r.findAllIn(mainPlan).size <= 1,
      s"observation must not add a scan:\n$mainPlan")
    assert(mainPlan.contains("CollectMetrics"),
      s"constraints must ride the main job's plan:\n$mainPlan")
    val viaObserve = rows(Quality.observedReport(spark, obs, constraints))
    val viaReport = rows(Quality.report(df, constraints))
    assert(viaObserve == viaReport, s"$viaObserve vs $viaReport")
    assert(viaObserve.exists(r => r._3 > 0), "violations must be exercised")
    // Unique / RefIntegrity genuinely need their own plan — by name
    val e = intercept[IllegalArgumentException] {
      Quality.observe(df, Seq(Unique(Seq("k"))))
    }
    assert(e.getMessage.contains("observe"), e.getMessage)
    assert(e.getMessage.contains("Quality.report"), e.getMessage)
  }

  test("observeStream: every micro-batch surfaces its own violation counts") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val constraints = Seq(NotNull("name"), InRange("v", 0.0, 100.0))
    val input = MemoryStream[(Long, Option[String], Double)]
    val observed = Quality.observeStream(
      input.toDF().toDF("k", "name", "v"), constraints)
    val q = observed.writeStream.outputMode("append")
      .format("memory").queryName("dq_stream_out").start()
    try {
      input.addData((1L, Some("a"), 10.0), (2L, None, 150.0))
      q.processAllAvailable()
      input.addData((3L, Some("b"), 20.0))
      q.processAllAvailable()
      val perBatch = q.recentProgress.toSeq
        .flatMap(p => Option(p.observedMetrics.get("dq")))
        .filter(_ != null)
        .map(Quality.observedBatchReport(_, constraints))
      assert(perBatch == Seq(
        Seq(("in_range(v)", 2L, 1L, false), ("not_null(name)", 2L, 1L, false)),
        Seq(("in_range(v)", 1L, 0L, true), ("not_null(name)", 1L, 0L, true))
      ), perBatch.toString)
    } finally q.stop()
  }

  test("report: cached input splits Unique into separate scans, same numbers") {
    val df = Seq(
      (1L, Some("a"), 10.0), (2L, None, 150.0),
      (2L, Some("c"), -5.0), (3L, Some("d"), 50.0)
    ).toDF("k", "name", "v")
    val constraints = Seq(NotNull("name"), Unique(Seq("k")),
      InRange("v", 0.0, 100.0), Unique(Seq("k", "name")))
    val onePass = rows(Quality.report(df, constraints))
    val cached = df.cache()
    try {
      cached.count()
      // auto: storageLevel != NONE -> split; identical report either way
      assert(rows(Quality.report(cached, constraints)) == onePass)
      // the split shape's per-Unique count-distinct scans ride the
      // returned plan (cached re-reads), with no Expand anywhere...
      val splitPlan = Quality.report(cached, constraints,
        splitUnique = Some(true)).queryExecution.executedPlan.toString
      assert(splitPlan.contains("InMemoryTableScan"),
        s"split shape must re-scan the cached table per Unique:\n$splitPlan")
      assert(!splitPlan.contains("Expand"),
        s"split shape must not Expand:\n$splitPlan")
      // ...while the fused shape folds EVERYTHING (Expand included) into
      // the checkpointed one-row aggregate: its returned plan reads no
      // table at all — the same no-rescan observable the cold-path
      // plan-guard test asserts with FileScan
      val fusedPlan = Quality.report(cached, constraints,
        splitUnique = Some(false)).queryExecution.executedPlan.toString
      assert(!fusedPlan.contains("InMemoryTableScan"),
        s"one-pass shape must not rescan per constraint:\n$fusedPlan")
      // override produces the same numbers too
      assert(rows(Quality.report(cached, constraints,
        splitUnique = Some(false))) == onePass)
      // all-Unique cached report still works (empty fused row-level side)
      assert(rows(Quality.report(cached, Seq(Unique(Seq("k")))))
        == Seq(("unique(k)", 4L, 1L, false)))
    } finally cached.unpersist()
  }
}
