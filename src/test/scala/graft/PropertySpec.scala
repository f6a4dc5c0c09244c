package graft

import graft.operators.{Dedup, OrderAnalytics, Sessionize, TextAnalysis}
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property-based invariants (ScalaCheck driven through explicit
  * Test.check so no scalatest-plus bridge is needed). */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def check(prop: Prop, n: Int = 10): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(n), prop)
    assert(res.passed, res.status.toString)
  }

  private val recGen: Gen[(Int, Long, Boolean)] = for {
    day <- Gen.choose(1, 4)
    fee <- Gen.choose(0L, 499L)
    flag <- Gen.oneOf(true, false)
  } yield (day, fee, flag)

  test("property: wire-pipeline aggregates equal a brute-force fold") {
    check(Prop.forAll(Gen.listOfN(60, recGen)) { recs =>
      val raw = recs.map { case (d, f, fl) =>
        s"""{"time":"2024-02-0$d 09:00:00","userId":"1","courseId":"2","fee":"$f","flag":"${if (fl) 1 else 0}","orderId":"o"}"""
      }.toDF("value")
      val got = OrderAnalytics.dailyStatsFromWire(raw).collect()
        .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
      val expect = recs.groupBy(_._1).map { case (d, rs) =>
        s"2024-02-0$d" -> ((rs.size.toLong, rs.count(_._3).toLong,
          rs.filter(_._3).map(_._2).sum.toDouble))
      }
      got == expect
    }, n = 8)
  }

  test("property: minhash signature agreement estimates true shingle jaccard") {
    val vocab = Vector("a", "b", "c", "d", "e", "f", "g", "h")
    val docGen = Gen.listOfN(40, Gen.oneOf(vocab)).map(_.mkString(" "))
    check(Prop.forAll(docGen, docGen) { (t1, t2) =>
      val rows = Seq(t1, t2).toDF("text")
        .select(Dedup.shingles(col("text"), 3).as("sh"),
          graft.functions.TextHashExpressions.shingleMinhash(col("text"), 3, 64).as("mh"))
        .collect()
      val (s1, s2) = (rows(0).getSeq[String](0).toSet, rows(1).getSeq[String](0).toSet)
      val trueJ = (s1 & s2).size.toDouble / (s1 | s2).size
      val (m1, m2) = (rows(0).getSeq[Long](1), rows(1).getSeq[Long](1))
      val est = m1.zip(m2).count { case (x, y) => x == y }.toDouble / 64
      math.abs(est - trueJ) <= 0.3   // ~5 sigma for 64 hashes
    }, n = 10)
  }

  test("property: session count = 1 + number of gaps > threshold") {
    val deltasGen = Gen.listOfN(30, Gen.choose(1L, 4000L))
    check(Prop.forAll(deltasGen) { deltas =>
      val times = deltas.scanLeft(0L)(_ + _)
      val df = times.map(t =>
        (1L, new java.sql.Timestamp(1704067200000L + t * 1000))).toDF("k", "ts")
      val nSessions = Sessionize.byGap(df, col("k"), col("ts"), 1800L)
        .agg(max("session_id")).head().getLong(0)
      val expected = 1 + deltas.count(_ > 1800L)
      nSessions == expected
    }, n = 8)
  }

  test("property: zero-overlap chunks partition the doc; overlap covers every token") {
    val docGen = Gen.choose(1, 120).flatMap(n =>
      Gen.listOfN(n, Gen.alphaLowerStr.suchThat(_.nonEmpty).map(_.take(4))))
    check(Prop.forAll(docGen, Gen.choose(2, 12), Gen.choose(0, 1)) {
      (toks, size, ovFlag) =>
        val overlap = if (ovFlag == 1) size / 2 else 0
        val doc = toks.mkString(" ")
        val chunks = TextAnalysis.chunkByTokens(
            Seq(("d", doc)).toDF("doc_id", "text"), col("doc_id"), col("text"),
            chunkSize = size, overlap = overlap)
          .orderBy("chunk_id").select("chunk_text").as[String].collect()
          .map(_.split(" ").toSeq)
        if (overlap == 0)
          // exact partition: concatenation reconstructs the document
          chunks.flatten.toSeq == toks
        else {
          // every chunk starts step tokens after the previous; each covers
          // its slice of the doc; union covers every token index
          val step = size - overlap
          chunks.zipWithIndex.forall { case (c, i) =>
            c == toks.slice(i * step, i * step + size)
          } && (chunks.length - 1) * step + chunks.last.length == toks.length &&
            // every chunk past the first contributes new tokens
            (chunks.length == 1 || chunks.last.length > overlap)
        }
    })
  }

  test("property: span hashes — position count, injectivity vs windows, shingle agreement") {
    val vocab = Vector("a", "b", "cc", "d", "e", "longword", "g", "h")
    val docGen = for {
      n <- Gen.choose(0, 30)
      toks <- Gen.listOfN(n, Gen.oneOf(vocab))
    } yield toks
    check(Prop.forAll(docGen) { toks =>
      val text = toks.mkString(" ")
      val k = 4
      val row = Seq(text).toDF("text")
        .select(graft.functions.TextHashExpressions.spanHashes(col("text"), k).as("whs"),
          Dedup.shingles(col("text"), k).as("sh"))
        .head()
      val whs = if (row.isNullAt(0)) Seq.empty[Long] else row.getSeq[Long](0)
      val sh = if (row.isNullAt(1)) Seq.empty[String] else row.getSeq[String](1)
      val windows = toks.sliding(k).filter(_.size == k).map(_.mkString(" ")).toSeq
      // one hash per position; equal windows <=> equal hashes (no 64-bit
      // collisions at this scale); distinct hash count == shingle count
      whs.length == windows.length &&
        windows.zip(whs).groupBy(_._1).values
          .forall(g => g.map(_._2).distinct.length == 1) &&
        whs.distinct.length == windows.distinct.length &&
        whs.distinct.length == sh.length
    }, n = 40)
  }

  test("count-min sketch estimates are one-sided within eps*N") {
    val events = Tables(spark, sfDir).events
    val cms = events.stat.countMinSketch(col("event_type"), 0.001, 0.999, 42)
    val slack = math.ceil(1e-3 * cms.totalCount).toLong
    val exact = events.groupBy("event_type").count().collect()
    assert(exact.nonEmpty)
    exact.foreach { r =>
      val (k, n) = (r.getString(0), r.getLong(1))
      val est = cms.estimateCount(k)
      assert(est >= n && est <= n + slack,
        s"CMS estimate for '$k': $est outside [$n, ${n + slack}]")
    }
    // a never-seen key can only over-count, never report negative
    val ghost = cms.estimateCount("no_such_event_type")
    assert(ghost >= 0 && ghost <= slack, s"ghost key estimate $ghost")
  }

  test("approx_count_distinct is within its documented error bound") {
    val events = Tables(spark, sfDir).events
    val r = events.agg(
      approx_count_distinct(col("user_id")).as("approx"),
      countDistinct(col("user_id")).as("exact")).head()
    val (approx, exact) = (r.getLong(0).toDouble, r.getLong(1).toDouble)
    assert(math.abs(approx - exact) / exact < 0.05,
      s"approx=$approx exact=$exact")
  }

  private val histGen: Gen[List[(Long, Long, String)]] =
    Gen.listOfN(80, for {
      k <- Gen.choose(0L, 5L)
      ts <- Gen.choose(1L, 40L)
      v <- Gen.oneOf("a", "b", "c")
    } yield (k, ts, v))

  test("property: SCD2 chain invariants + merge == rebuild at any split") {
    check(Prop.forAll(histGen, Gen.choose(5L, 35L)) { (recs, split) =>
      // dedupe (k, ts): equal-ts duplicates make run content order-
      // dependent without a tie-break column, which this prop omits
      val hist = recs.groupBy(r => (r._1, r._2)).map(_._2.head).toList
      val df = hist.toDF("k", "ts", "v")
      val dim = graft.operators.Cdc
        .scd2FromHistory(df, col("k"), col("ts"), col("v"))
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getLong(3)), r.getBoolean(4)))
      val byKey = dim.groupBy(_._1)
      val chainOk = byKey.values.forall { vs =>
        val s = vs.sortBy(_._3).toList
        // exactly one open version; each valid_to links to the next
        s.count(_._5) == 1 && s.last._5 &&
          s.sliding(2).filter(_.size == 2).forall {
            case Seq(a, b) => a._4.contains(b._3) && !a._5
          } &&
          // consecutive versions never carry the same value (runs
          // collapsed), and version count matches a fold of the history
          s.sliding(2).filter(_.size == 2).forall {
            case Seq(a, b) => a._2 != b._2
          }
      }
      val expectedRuns = hist.groupBy(_._1).map { case (_, rs) =>
        val vals = rs.sortBy(_._2).map(_._3)
        1 + vals.sliding(2).count { case Seq(a, b) => a != b; case _ => false }
      }.sum
      val mergeEqRebuild = {
        val lo = df.filter(col("ts") < split)
        val hi = df.filter(col("ts") >= split)
        val merged =
          if (lo.isEmpty || hi.isEmpty) dim.toSet
          else graft.operators.Cdc.scd2Merge(
            graft.operators.Cdc.scd2FromHistory(lo, col("k"), col("ts"),
              col("v")), hi, col("k"), col("ts"), col("v"))
            .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
              if (r.isNullAt(3)) None else Some(r.getLong(3)),
              r.getBoolean(4))).toSet
        merged == dim.toSet
      }
      chainOk && dim.length == expectedRuns && mergeEqRebuild
    }, n = 12)
  }

  test("property: gap-fill grid is the exact per-key span; interp is bounded by its endpoints") {
    val ptsGen = Gen.listOfN(40, for {
      k <- Gen.choose(0L, 3L)
      b <- Gen.choose(0L, 30L)
      v <- Gen.choose(-50, 50)
    } yield (k, b, v.toDouble))
    check(Prop.forAll(ptsGen) { recs =>
      val hist = recs.groupBy(r => (r._1, r._2)).map(_._2.head).toList
      val df = hist.toDF("k", "b", "v")
      val out = graft.operators.TimeSeries.gapFillInterpolate(df,
          col("k"), col("b"), col("v"), tieBreak = Seq(col("b")))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(3),
          r.getDouble(4), r.getDouble(5)))
      val spans = hist.groupBy(_._1).map { case (_, rs) =>
        rs.map(_._2).max - rs.map(_._2).min + 1 }.sum
      val gridOk = out.length == spans
      // every interpolated value lies within [min, max] of the key's
      // observed values (convexity of the lerp)
      val boundsOk = out.groupBy(_._1).forall { case (k, rows) =>
        val obs = hist.filter(_._1 == k).map(_._3)
        rows.forall(r => r._5 >= obs.min - 1e-9 && r._5 <= obs.max + 1e-9)
      }
      gridOk && boundsOk
    }, n = 12)
  }
  test("property: BPE encode — kernel == replace-reference, lossless, merges apply") {
    // random lowercase-ish docs with punctuation/caps/digits mixed in,
    // random-but-valid merge tables TRAINED on the doc itself (so the
    // merges actually fire), checked three ways per sample
    val wordGen = Gen.frequency(
      (8, Gen.listOfN(5, Gen.choose('a', 'f')).map(_.mkString)),
      (1, Gen.oneOf("Xy9", "don't", "1234", "a", "zz")))
    val docGen = Gen.chooseNum(1, 40)
      .flatMap(k => Gen.listOfN(k, wordGen)).map(_.mkString(" "))
    check(Prop.forAll(docGen, Gen.chooseNum(1, 6)) { (doc, nM) =>
      val df = Seq((0L, doc)).toDF("doc_id", "text")
      val merges = TextAnalysis.bpeMerges(
        TextAnalysis.bpeTrain(df, col("text"), nMerges = nM))
      merges.isEmpty || {
        val r = df.select(
          TextAnalysis.bpeEncode(col("text"), merges).as("fast"),
          TextAnalysis.bpeEncodeViaReplace(col("text"), merges).as("ref"),
          TextAnalysis.bpeDetokenize(
            TextAnalysis.bpeEncodeMarked(col("text"), merges)).as("detok"),
          array_join(TextAnalysis.tokens(col("text")), " ").as("norm")).head()
        val fast = r.getSeq[String](0)
        // (1) the two classical algorithms agree; (2) no byte invented
        // or lost; (3) the marked pair inverts; (4) some merge APPLIED
        // (trained on this very doc, rank 1 must fire somewhere)
        fast == r.getSeq[String](1) &&
          fast.mkString("") == r.getString(3).replace(" ", "") &&
          r.getString(2) == r.getString(3) &&
          fast.exists(_.length >= 2)
      }
    }, n = 12)
  }
}
