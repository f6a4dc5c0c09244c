package graft

import graft.operators.Dsir
import org.apache.spark.sql.functions._

/** DSIR importance resampling: hand-computed ratio/weight fixture,
  * planted domain shift selection, blank hygiene, determinism. */
class DsirSpec extends SparkSpec {
  import spark.implicits._

  test("ratioTable + weights: hand-computed Laplace log-ratios on a " +
       "two-feature fixture (unigrams only)") {
    val raw = Seq((1L, "aa aa bb"), (2L, "bb bb")).toDF("doc_id", "text")
    val tgt = Seq((10L, "aa aa aa bb")).toDF("doc_id", "text")
    // raw counts: aa 2, bb 3 (N_R = 5); tgt: aa 3, bb 1 (N_T = 4); V = 2
    val rt = Dsir.ratioTable(raw, tgt, col("doc_id"), col("text"),
        ngram = 1, nBuckets = 0)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val aaExp = r6(math.log(4.0 / 6.0) - math.log(3.0 / 7.0))
    val bbExp = r6(math.log(2.0 / 6.0) - math.log(4.0 / 7.0))
    assert(rt("aa") == ((3L, 2L, aaExp)), rt.toString)
    assert(rt("bb") == ((1L, 3L, bbExp)), rt.toString)
    // doc 1 = 2*aa + 1*bb, doc 2 = 2*bb — exact DECIMAL sums
    val w = Dsir.weights(raw, tgt, col("doc_id"), col("text"),
        ngram = 1, nBuckets = 0)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2))).toMap
    assert(w(1L)._1 == 3L && w(2L)._1 == 2L)
    assert(math.abs(w(1L)._2 -
      (BigDecimal(aaExp) * 2 + BigDecimal(bbExp)).toDouble) < 1e-12)
    assert(math.abs(w(2L)._2 - (BigDecimal(bbExp) * 2).toDouble) < 1e-12)
    // the target-leaning doc outranks the target-averse one
    assert(w(1L)._2 > w(2L)._2)
  }

  test("select: a planted domain shift pulls in-domain docs to the " +
       "top; blank docs score (0, 0.0); partitioning-invariant") {
    // raw: 200 docs from a shared vocab; every 10th carries the domain
    // marker tokens the target is made of
    val base = spark.range(200).select(col("id").as("doc_id"),
      concat(
        concat_ws(" ", transform(sequence(lit(0), lit(19)), i =>
          concat(lit("w"), pmod(xxhash64(col("id"), i), lit(50))
            .cast("string")))),
        when(pmod(col("id"), lit(10)) === 0,
          lit(" quantum flux capacitor")).otherwise(lit("")))
        .as("text"))
    // a target SAMPLE large enough that smoothing doesn't flatten it
    // (the operator's documented estimate-quality contract)
    val tgt = spark.range(30).select((col("id") + 500).as("doc_id"),
      lit("quantum flux capacitor experiments with quantum flux")
        .as("text"))
    val top = Dsir.select(base, tgt, col("doc_id"), col("text"), k = 20)
      .collect().map(_.getLong(0)).toSet
    assert(top == (0L until 200L by 10L).toSet,
      s"selection missed the planted domain: $top")
    // blank docs carry the paper's empty-vector ratio of 1 (logw 0)
    val raw = base.unionByName(
      Seq((900L, "   ")).toDF("doc_id", "text"))
    val w = Dsir.weights(raw, tgt, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2))).toMap
    assert(w(900L) == ((0L, 0.0)), s"blank doc: ${w(900L)}")
    // partitioning invariance
    val again = Dsir.select(base.repartition(13), tgt, col("doc_id"),
        col("text"), k = 20)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).sortBy(_._1)
    val first = Dsir.select(base, tgt, col("doc_id"), col("text"), k = 20)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).sortBy(_._1)
    assert(again.toSeq == first.toSeq)
  }

  test("hashed buckets: a SMALL target still finds the planted domain " +
       "(the tail pools into estimated buckets), and bucket counts " +
       "are a partition of the raw feature mass") {
    val base = spark.range(200).select(col("id").as("doc_id"),
      concat(
        concat_ws(" ", transform(sequence(lit(0), lit(19)), i =>
          concat(lit("w"), pmod(xxhash64(col("id"), i), lit(500))
            .cast("string")))),
        when(pmod(col("id"), lit(10)) === 0,
          lit(" quantum flux capacitor quantum flux")).otherwise(lit("")))
        .as("text"))
    // the UNHASHED form is estimate-starved at this target size; 64
    // WELL-FILLED buckets (pooling needs buckets ≪ mass, the
    // operator's documented dial) pool the 500-token tail and a MODEST
    // 10-row target sample is enough for the plant to dominate
    val tgt = spark.range(10).select((col("id") + 500).as("doc_id"),
      lit("quantum flux capacitor quantum flux").as("text"))
    val top = Dsir.select(base, tgt, col("doc_id"), col("text"), k = 20,
        ngram = 2, nBuckets = 64)
      .collect().map(_.getLong(0)).toSet
    // bucket collisions make the tiny-corpus ranking statistical —
    // demand strong recall plus clean mean separation, not exactness
    assert(top.count(_ % 10 == 0) >= 15,
      s"hashed selection found only ${top.count(_ % 10 == 0)}/20: $top")
    val w = Dsir.weights(base, tgt, col("doc_id"), col("text"),
        ngram = 2, nBuckets = 64)
      .collect().map(r => (r.getLong(0), r.getDouble(2)))
    val (pl, npl) = w.partition(_._1 % 10 == 0)
    val pm = pl.map(_._2).sum / pl.length
    val nm = npl.map(_._2).sum / npl.length
    assert(pm > nm + 2.0,
      f"planted mean $pm%.2f vs non-planted $nm%.2f — no separation")
    // bucket mass partition: Σ raw_n over buckets == total feature
    // occurrences
    val rt = Dsir.ratioTable(base, tgt, col("doc_id"), col("text"),
      ngram = 1, nBuckets = 64)
    val mass = rt.agg(sum(col("raw_n"))).head().getLong(0)
    assert(mass == 200L * 20L + 20L * 5L, s"bucket mass $mass")
  }

  test("select plan: rank-limited top-k, no global sort") {
    val raw = Tables(spark, sfDir).documents
    val tgt = raw.filter(col("doc_id") % 7 === 0)
    val plan = Dsir.select(raw, tgt, col("doc_id"), col("text"), k = 20)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"selection must be rank-limited:\n$plan")
  }

  test("scoreAgainst: unseen features take the Laplace-default ratio " +
       "(hand-computed), n_unseen counts them, blanks score (0,0,0)") {
    val raw = Seq((1L, "aa aa bb"), (2L, "bb bb")).toDF("doc_id", "text")
    val tgt = Seq((10L, "aa aa aa bb")).toDF("doc_id", "text")
    // V = 2, NR = 5, NT = 4 (the ratioTable fixture above)
    val m = Dsir.model(raw, tgt, col("doc_id"), col("text"), ngram = 1,
      nBuckets = 0)
    assert((m.nFeatures, m.nRawOcc, m.nTgtOcc) == ((2L, 5L, 4L)))
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val aaExp = r6(math.log(4.0 / 6.0) - math.log(3.0 / 7.0))
    val lr0 = r6(math.log(1.0 / 6.0) - math.log(1.0 / 7.0))
    val batch = Seq((100L, "aa cc"), (101L, "  ")).toDF("doc_id", "text")
    val out = Dsir.scoreAgainst(batch, m, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(out(100L)._1 == 2L && out(100L)._2 == 1L, out.toString)
    assert(math.abs(out(100L)._3 -
      (BigDecimal(aaExp) + BigDecimal(lr0)).toDouble) < 1e-12,
      s"${out(100L)._3} vs ${aaExp + lr0}")
    assert(out(101L) == ((0L, 0L, 0.0)), out.toString)
    // the gate: the blank passes at ANY threshold (no model evidence);
    // the scored doc obeys the threshold
    val rejAll = Dsir.gateRejects(batch, m, col("doc_id"), col("text"),
      minLogw = 1000.0).collect()
    assert(rejAll.map(_.getLong(0)).toSeq == Seq(100L) &&
      rejAll.head.getString(1) == "dsir_out_of_domain", rejAll.toSeq)
    assert(Dsir.gateRejects(batch, m, col("doc_id"), col("text"),
      minLogw = -1000.0).count() == 0L)
  }

  test("DsirStore: round trip reproduces the model bitwise; torn and " +
       "missing stores fail by name") {
    import graft.sources.DsirStore
    val raw = spark.range(60).select(col("id").as("doc_id"),
      concat(concat_ws(" ", transform(sequence(lit(0), lit(9)), i =>
          concat(lit("w"), pmod(xxhash64(col("id"), i), lit(30))
            .cast("string")))),
        when(pmod(col("id"), lit(10)) === 0, lit(" quantum flux"))
          .otherwise(lit(""))).as("text"))
    val tgt = spark.range(8).select((col("id") + 100).as("doc_id"),
      lit("quantum flux quantum flux").as("text"))
    DsirStore.drop(spark, "dst")
    val m = Dsir.model(raw, tgt, col("doc_id"), col("text"), ngram = 2,
      nBuckets = 1024)
    DsirStore.buildFrom(spark, "dst", m)
    val loaded = DsirStore.load(spark, "dst")
    assert((loaded.ngram, loaded.nBuckets, loaded.nFeatures,
      loaded.nRawOcc, loaded.nTgtOcc) ==
      ((m.ngram, m.nBuckets, m.nFeatures, m.nRawOcc, m.nTgtOcc)))
    val batch = spark.range(20).select((col("id") * 3).as("doc_id"),
      concat(lit("w1 w2 zznovel"),
        when(pmod(col("id"), lit(2)) === 0, lit(" quantum flux"))
          .otherwise(lit(""))).as("text"))
    val a = Dsir.scoreAgainst(batch, m, col("doc_id"), col("text"))
      .collect().map(_.toSeq).sortBy(_.head.toString)
    val b = Dsir.scoreAgainst(batch, loaded, col("doc_id"), col("text"))
      .collect().map(_.toSeq).sortBy(_.head.toString)
    assert(a.toSeq == b.toSeq, "stored model diverged from fresh model")
    // fences: a missing prefix and a torn (stampless) build reject by
    // name before any batch can be gated on partial ratios
    val eMissing = intercept[IllegalArgumentException](
      DsirStore.load(spark, "dst_nope"))
    assert(eMissing.getMessage.contains("DsirStore.build"),
      eMissing.getMessage)
    graft.sources.Bucketing.dropManagedTable(spark, "dst_torn_dsir")
    m.ratios.write.saveAsTable("dst_torn_dsir")
    val eTorn = intercept[IllegalArgumentException](
      DsirStore.load(spark, "dst_torn"))
    assert(eTorn.getMessage.contains("completeness stamp"),
      eTorn.getMessage)
    graft.sources.Bucketing.dropManagedTable(spark, "dst_torn_dsir")
    DsirStore.drop(spark, "dst")
  }

  test("ModelGate composition: qualityRejects(dsir = ...) emits exactly " +
       "gateRejects' verdicts alongside the heuristic gates") {
    val raw = spark.range(80).select(col("id").as("doc_id"),
      concat(concat_ws(" ", transform(sequence(lit(0), lit(11)), i =>
          concat(lit("w"), pmod(xxhash64(col("id"), i), lit(40))
            .cast("string")))),
        when(pmod(col("id"), lit(10)) === 0,
          lit(" quantum flux capacitor")).otherwise(lit("")))
        .as("text"))
    val tgt = spark.range(12).select((col("id") + 200).as("doc_id"),
      lit("quantum flux capacitor quantum flux").as("text"))
    val m = Dsir.model(raw, tgt, col("doc_id"), col("text"), ngram = 2,
      nBuckets = 1024)
    val batch = raw.filter(col("doc_id") % 2 === 0)
    val direct = Dsir.gateRejects(batch, m, col("doc_id"), col("text"),
        minLogw = 1.0)
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted
    assert(direct.nonEmpty, "fixture must reject something")
    val viaGate = graft.IngestApp.qualityRejects(batch,
        minQuality = -1.0,
        models = graft.IngestApp.ModelGate(dsir = Some(m -> 1.0)))
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted
    assert(viaGate.toSeq == direct.toSeq,
      s"gate chain diverged: ${viaGate.toSeq} vs ${direct.toSeq}")
  }

  test("sampled: Gumbel-top-k matches an in-engine replay of the " +
       "priority formula; deterministic under repartitioning; a " +
       "dominant log-weight always wins") {
    val raw = spark.range(150).select(col("id").as("doc_id"),
      concat_ws(" ", transform(sequence(lit(0), lit(9)), i =>
        concat(lit("w"), pmod(xxhash64(col("id"), i), lit(40))
          .cast("string")))).as("text"))
    val tgt = spark.range(10).select((col("id") + 300).as("doc_id"),
      lit("w1 w2 w3 w4 quantum").as("text"))
    val out = Dsir.sampled(raw, tgt, col("doc_id"), col("text"), k = 15,
        ngram = 1, nBuckets = 256)
      .collect().map(r => (r.getLong(0), r.getDouble(3)))
    // replay: the same u / Gumbel arithmetic, independently composed
    val w = Dsir.weights(raw, tgt, col("doc_id"), col("text"),
      ngram = 1, nBuckets = 256)
    val u = (conv(substring(md5(col("doc_id").cast("string")), 1, 13),
      16, 10).cast("double") + lit(1.0)) / lit(4503599627370496.0)
    val replay = w.select(col("doc_id"),
        round(col("logw") - log(-log(u)), 6).as("priority"))
      .orderBy(col("priority").desc, col("doc_id")).limit(15)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(out.toSeq == replay.toSeq)
    val again = Dsir.sampled(raw.repartition(7), tgt, col("doc_id"),
        col("text"), k = 15, ngram = 1, nBuckets = 256)
      .collect().map(r => (r.getLong(0), r.getDouble(3)))
    assert(again.sorted.toSeq == out.sorted.toSeq)
    // Gumbel noise is O(few nats): a +1000-nat doc must always draw
    val boosted = graft.operators.Sampling.gumbelTopK(
      w.withColumn("logw", when(col("doc_id") === 77L,
        col("logw") + 1000.0).otherwise(col("logw"))),
      col("doc_id"), col("logw"), k = 1).collect()
    assert(boosted.map(_.getLong(0)).toSeq == Seq(77L))
  }

  test("gumbelStratifiedTopK: every stratum draws exactly its own k, " +
       "and each stratum's draw equals gumbelTopK applied alone") {
    import graft.operators.Sampling
    val df = spark.range(100).select(col("id").as("doc_id"),
      pmod(col("id"), lit(4)).cast("string").as("src"),
      (col("id") % 7).cast("double").as("lw"))
    val strat = Sampling.gumbelStratifiedTopK(df, Seq(col("src")),
        col("doc_id"), col("lw"), k = 5)
      .collect().map(r => (r.getString(1), r.getLong(0), r.getDouble(3)))
    assert(strat.groupBy(_._1).forall(_._2.length == 5), strat.toSeq)
    (0 until 4).foreach { s0 =>
      val alone = Sampling.gumbelTopK(
          df.filter(col("src") === s0.toString),
          col("doc_id"), col("lw"), k = 5)
        .collect().map(r => (r.getString(1), r.getLong(0), r.getDouble(3)))
        .toSet
      assert(strat.filter(_._1 == s0.toString).toSet == alone,
        s"stratum $s0 diverged from the standalone draw")
    }
  }

  test("model: a featureless corpus pair fails by name at the " +
       "training boundary, never an NPE or infinite default ratio") {
    val blank = Seq((1L, "   "), (2L, "")).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException](
      Dsir.model(blank, blank, col("doc_id"), col("text"),
        ngram = 1, nBuckets = 64))
    assert(e.getMessage.contains("ZERO features"), e.getMessage)
  }

  test("raw-gram mode guard: a feature space past maxFeatures fails by " +
       "name citing the hashing lever") {
    val raw = spark.range(500).select(col("id").as("doc_id"),
      concat_ws(" ", transform(sequence(lit(0), lit(9)), i =>
        concat(lit("u"), (col("id") * 10 + i).cast("string"))))
        .as("text"))
    val tgt = raw.limit(10)
    val e = intercept[IllegalArgumentException](
      Dsir.model(raw, tgt, col("doc_id"), col("text"), ngram = 2,
        nBuckets = 0, maxFeatures = 100))
    assert(e.getMessage.contains("nBuckets") &&
      e.getMessage.contains("maxFeatures"), e.getMessage)
  }

  test("calibration lifecycle: buildCalibrated stamps a loadable " +
       "threshold whose exact rank honors the 2*eps bound; gateRejects " +
       "uses the model-carried value; uncalibrated models fail by name") {
    import graft.sources.DsirStore
    val raw = spark.range(120).select(col("id").as("doc_id"),
      concat(concat_ws(" ", transform(sequence(lit(0), lit(9)), i =>
          concat(lit("w"), pmod(xxhash64(col("id"), i), lit(30))
            .cast("string")))),
        when(pmod(col("id"), lit(10)) === 0, lit(" quantum flux"))
          .otherwise(lit(""))).as("text"))
    val tgt = spark.range(8).select((col("id") + 500).as("doc_id"),
      lit("quantum flux quantum flux").as("text"))
    DsirStore.drop(spark, "dcal")
    val m = DsirStore.buildCalibrated(spark, "dcal", raw, tgt,
      col("doc_id"), col("text"), q = 0.5, ngram = 2, nBuckets = 1024)
    assert(m.minLogw.isDefined, "buildCalibrated must carry minLogw")
    val loaded = DsirStore.load(spark, "dcal")
    assert(loaded.minLogw == m.minLogw,
      s"store round-trip lost the threshold: ${loaded.minLogw} vs " +
        s"${m.minLogw}")
    val (thr, q, eps) = DsirStore.loadCalibration(spark, "dcal")
      .getOrElse(fail("store carries no calibration stamp"))
    assert(thr == m.minLogw.get && q == 0.5 && eps > 0.0)
    // exact-rank certification: the thing the registered query attests
    val w = Dsir.weightsWith(raw, m, col("doc_id"), col("text"))
      .select(col("logw")).as[Double].collect()
    val frac = w.count(_ <= thr).toDouble / w.length
    assert(math.abs(frac - q) <= 2 * eps,
      s"calibrated threshold rank $frac vs q=$q (eps=$eps)")
    // the no-threshold overload gates at the stored value
    val batch = raw.filter(col("doc_id") % 3 === 0)
    val viaModel = Dsir.gateRejects(batch, loaded, col("doc_id"),
      col("text")).collect().map(_.getLong(0)).sorted.toSeq
    val explicit = Dsir.gateRejects(batch, loaded, col("doc_id"),
      col("text"), thr).collect().map(_.getLong(0)).sorted.toSeq
    assert(viaModel == explicit && viaModel.nonEmpty)
    // an uncalibrated model refuses the implicit form by name
    val bare = Dsir.model(raw, tgt, col("doc_id"), col("text"),
      ngram = 2, nBuckets = 1024)
    val e = intercept[IllegalArgumentException](
      Dsir.gateRejects(batch, bare, col("doc_id"), col("text")))
    assert(e.getMessage.contains("minLogw"), e.getMessage)
    DsirStore.drop(spark, "dcal")
  }

  test("stalenessReport: novel grams raise exactly their cohort's " +
       "unseen fraction, quant6 quotient verified by hand") {
    val raw = Seq((1L, "aa aa bb"), (2L, "bb bb")).toDF("doc_id", "text")
    val tgt = Seq((10L, "aa bb")).toDF("doc_id", "text")
    val m = Dsir.model(raw, tgt, col("doc_id"), col("text"),
      ngram = 1, nBuckets = 0)
    val batch = Seq(
      (1L, "aa zz9nov", "novel"),
      (2L, "aa bb", "in_vocab"),
      (3L, "bb zz9nov zz9nov", "novel")).toDF("doc_id", "text", "cohort")
    val got = Dsir.stalenessReport(batch, m, col("doc_id"), col("text"),
        Seq("cohort" -> col("cohort")), staleFrac = 0.1)
      .orderBy(col("cohort"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4), r.getBoolean(5)))
    // novel: docs 1+3 — features 2+3=5, unseen 1+2=3 → 0.6; in_vocab: 0
    assert(got.toSeq == Seq(
      ("in_vocab", 1L, 2L, 0L, 0.0, false),
      ("novel", 2L, 5L, 3L, 0.6, true)), got.toSeq.toString)
  }

  test("modelMulti/weightsMultiWith: hand-computed per-domain ratios " +
       "over the SHARED vocabulary; zero-feature docs restored; k " +
       "domains cost the same exchanges as one") {
    val raw = Seq((1L, "aa aa bb"), (2L, "bb bb"), (3L, ""))
      .toDF("doc_id", "text")
    val tgtA = Seq((10L, "aa aa aa bb")).toDF("doc_id", "text")
    val tgtB = Seq((20L, "bb cc")).toDF("doc_id", "text")
    val mm = Dsir.modelMulti(raw, Seq("a" -> tgtA, "b" -> tgtB),
      col("doc_id"), col("text"), ngram = 1, nBuckets = 0)
    // shared V = {aa, bb, cc} (cc only in target B) → v=3; NR=5;
    // NTa=4, NTb=2 — per-domain denominators, common raw side
    assert(mm.nFeatures == 3 && mm.nRawOcc == 5 &&
      mm.domains == Seq("a", "b"))
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val rt = mm.ratios.collect().map(r => (r.getString(0), r.getString(1))
      -> (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(rt(("a", "aa")) ==
      ((3L, 2L, r6(math.log(4.0 / 7.0) - math.log(3.0 / 8.0)))))
    assert(rt(("a", "cc")) ==
      ((0L, 0L, r6(math.log(1.0 / 7.0) - math.log(1.0 / 8.0)))))
    assert(rt(("b", "bb")) ==
      ((1L, 3L, r6(math.log(2.0 / 5.0) - math.log(4.0 / 8.0)))))
    assert(rt(("b", "aa")) ==
      ((0L, 2L, r6(math.log(1.0 / 5.0) - math.log(3.0 / 8.0)))))
    assert(rt.size == 6, s"full grid must hold k*|V| rows: ${rt.size}")
    // weights: DECIMAL sums of the rounded ratios, per (doc, domain);
    // the blank doc surfaces in BOTH domains at logw 0
    val w = Dsir.weightsMultiWith(raw, mm, col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    def dsum(parts: (Double, Int)*) = parts.map { case (lr, n) =>
      BigDecimal(r6(lr)) * n }.sum.toDouble
    assert(w((1L, "a")) == ((3L, dsum(
      (math.log(4.0 / 7.0) - math.log(3.0 / 8.0), 2),
      (math.log(2.0 / 7.0) - math.log(4.0 / 8.0), 1)))))
    assert(w((2L, "b")) == ((2L, dsum(
      (math.log(2.0 / 5.0) - math.log(4.0 / 8.0), 2)))))
    assert(w((3L, "a")) == ((0L, 0.0)) && w((3L, "b")) == ((0L, 0.0)))
    assert(w.size == 6)
    // the GATE form on a novel batch: the unseen gram is counted once
    // per doc and charged each domain's OWN Laplace default
    // (counts 0/0 under that domain's totals)
    assert(mm.nTgtOcc == Map("a" -> 4L, "b" -> 2L))
    val batch = Seq((1L, "aa zz"), (2L, "")).toDF("doc_id", "text")
    val g = Dsir.scoreAgainstMulti(batch, mm, col("doc_id"), col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    val lr0a = math.log(1.0 / 7.0) - math.log(1.0 / 8.0)
    val lr0b = math.log(1.0 / 5.0) - math.log(1.0 / 8.0)
    assert(g((1L, "a")) == ((2L, 1L, dsum(
      (math.log(4.0 / 7.0) - math.log(3.0 / 8.0), 1), (lr0a, 1)))))
    assert(g((1L, "b")) == ((2L, 1L, dsum(
      (math.log(1.0 / 5.0) - math.log(3.0 / 8.0), 1), (lr0b, 1)))))
    assert(g((2L, "a")) == ((0L, 0L, 0.0)) &&
      g((2L, "b")) == ((0L, 0L, 0.0)))
    assert(g.size == 4)
    // the one-exchange claim: scoring k=2 domains plans exactly the
    // same number of shuffle exchanges as k=1 (the stacked grid rides
    // the SAME feature-keyed join; domains fan out map-side)
    // the one-pass claim, plan-pinned: the corpus features EXPLODE
    // exactly once whatever k is (all domains ride the single
    // feature-keyed join against the stacked grid — never one corpus
    // pass per domain), and the per-(doc, domain) fold is one
    // aggregation exchange. (Total exchange counts are not compared:
    // at fixture scale the restore join legitimately flips between
    // broadcast and shuffle on size estimates — orthogonal to k.)
    def planOf(k: Int): String = {
      val doms = Seq("a" -> tgtA, "b" -> tgtB).take(k)
      Dsir.weightsMultiWith(raw,
          Dsir.modelMulti(raw, doms, col("doc_id"), col("text"),
            ngram = 1, nBuckets = 0),
          col("doc_id"), col("text"))
        .queryExecution.executedPlan.toString
    }
    def scans(p: String): Int = "Generate explode".r.findAllIn(p).length
    def aggExchanges(p: String): Int =
      "Exchange hashpartitioning\\(doc_id#\\d+L, domain#".r
        .findAllIn(p).length
    val (p1, p2) = (planOf(1), planOf(2))
    assert(scans(p1) == 1 && scans(p2) == 1,
      s"corpus features must explode ONCE regardless of k:\n$p2")
    // the fold + (at most) the restore join — never k-proportional
    assert(aggExchanges(p1) <= 2 && aggExchanges(p2) <= 2,
      s"(doc, domain) exchanges must stay k-independent:\n$p2")
    // guards: duplicate domain names and a featureless target fail by name
    val eDup = intercept[IllegalArgumentException](Dsir.modelMulti(raw,
      Seq("a" -> tgtA, "a" -> tgtB), col("doc_id"), col("text"),
      ngram = 1, nBuckets = 0))
    assert(eDup.getMessage.contains("duplicate"), eDup.getMessage)
    val blank = Seq((30L, "  ")).toDF("doc_id", "text")
    val eBlank = intercept[IllegalArgumentException](Dsir.modelMulti(raw,
      Seq("a" -> tgtA, "b" -> blank), col("doc_id"), col("text"),
      ngram = 1, nBuckets = 0))
    assert(eBlank.getMessage.contains("'b'"), eBlank.getMessage)
  }
}
