package graft

import graft.operators.{Contamination, Sampling}
import org.apache.spark.sql.functions._

/** Determinism and exactness of the sampling/mixing/contamination
  * operators (their value over df.sample is exactly these properties). */
class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val events = Tables(spark, sfDir).events
  private lazy val docs = Tables(spark, sfDir).documents

  test("weightedTopK: exact A-Res priorities, weight dominance, determinism, guards") {
    // the u behind the priority matches a from-first-principles md5
    val u0 = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest("7".getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString.substring(0, 13)
      (java.lang.Long.parseLong(hex, 16).toDouble + 1.0) / 4503599627370496.0
    }
    val one = Sampling.weightedTopK(
        Seq((7L, 10L)).toDF("id", "w"), col("id"), col("w"), k = 1)
      .select(col("priority")).as[Double].head()
    assert(one == BigDecimal(math.log(u0) / 10.0)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    // a 1e9× weight pushes priority toward 0: all heavy rows outrank light
    val pop = spark.range(200)
      .select(col("id"), when(col("id") < 10, 1e9).otherwise(1e-3).as("w"))
    val top = Sampling.weightedTopK(pop, col("id"), col("w"), k = 10)
      .select(col("id")).as[Long].collect().toSet
    assert(top == (0L until 10L).toSet, s"heavy rows must win: $top")
    // partitioning-invariant
    val a = Sampling.weightedTopK(docs, col("doc_id"), col("n_chars"), 20)
      .select(col("doc_id")).as[Long].collect().toSeq
    val b = Sampling.weightedTopK(docs.repartition(7), col("doc_id"),
      col("n_chars"), 20).select(col("doc_id")).as[Long].collect().toSeq
    assert(a == b, "selection must not depend on partitioning")
    // non-positive weights are excluded, never ranked
    val guarded = Sampling.weightedTopK(
        Seq((1L, 0L), (2L, -5L), (3L, 2L)).toDF("id", "w"),
        col("id"), col("w"), k = 3)
      .select(col("id")).as[Long].collect().toSeq
    assert(guarded == Seq(3L), s"w <= 0 must be excluded: $guarded")
  }

  test("weightedTopK plans: global is rank-limited sort; stratified prunes per stratum") {
    val g = Sampling.weightedTopK(docs, col("doc_id"), col("n_chars"), 20)
      .queryExecution.executedPlan.toString
    assert(g.contains("TakeOrderedAndProject"), s"global top-k plan:\n$g")
    val s = Sampling.weightedStratifiedTopK(docs, Seq(col("source")),
        col("doc_id"), col("n_chars"), 5)
      .queryExecution.executedPlan.toString
    assert(s.contains("WindowGroupLimit"), s"stratified top-k plan:\n$s")
    // stratified: exactly k per stratum (corpus has >= k docs per source)
    val perSource = Sampling.weightedStratifiedTopK(docs, Seq(col("source")),
        col("doc_id"), col("n_chars"), 5)
      .groupBy(col("source")).count().select(col("count")).as[Long]
      .collect()
    assert(perSource.nonEmpty && perSource.forall(_ == 5L))
  }

  test("stratified sample is exact per stratum and partitioning-invariant") {
    val frac = 0.2
    val got = Sampling.stratified(events, Seq(col("event_type")), col("event_id"), frac)
    val perStratum = got.groupBy("event_type").count()
      .as[(String, Long)].collect().toMap
    val sizes = events.groupBy("event_type").count()
      .as[(String, Long)].collect().toMap
    sizes.foreach { case (s, n) =>
      assert(perStratum(s) == math.ceil(n * frac).toLong, s"stratum $s")
    }
    // identical ids regardless of input partitioning
    val a = got.select("event_id").as[Long].collect().sorted.toSeq
    val b = Sampling.stratified(events.repartition(7, col("user_id")),
        Seq(col("event_type")), col("event_id"), frac)
      .select("event_id").as[Long].collect().sorted.toSeq
    assert(a == b)
  }

  test("mixture respects per-source weights and the default") {
    val weights = Map("src0" -> 0.5, "src1" -> 0.0)
    val got = Sampling.mixture(docs, col("source"), col("doc_id"), weights,
      defaultWeight = 0.1)
    val perSource = got.groupBy("source").count().as[(String, Long)].collect().toMap
    val sizes = docs.groupBy("source").count().as[(String, Long)].collect().toMap
    sizes.foreach { case (s, n) =>
      val w = weights.getOrElse(s, 0.1)
      assert(perSource.getOrElse(s, 0L) == math.ceil(n * w).toLong, s"source $s")
    }
  }

  test("hash sampler: deterministic, shuffle-free plan, fraction near target") {
    val frac = 0.3
    val got = Sampling.hashSample(events, col("event_id"), frac)
    // no exchange anywhere: per-row filter only (ignoring the scan itself)
    val plan = got.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"hash sample shuffled:\n$plan")
    // deterministic across partitionings
    val a = got.select("event_id").as[Long].collect().sorted.toSeq
    val b = Sampling.hashSample(events.repartition(13), col("event_id"), frac)
      .select("event_id").as[Long].collect().sorted.toSeq
    assert(a == b)
    // binomial tolerance: well within ±5 sigma of n*frac
    val n = events.count().toDouble
    val sigma = math.sqrt(n * frac * (1 - frac))
    assert(math.abs(a.size - n * frac) < 5 * sigma, s"kept ${a.size} of $n")
    // edge fractions
    assert(Sampling.hashSample(events, col("event_id"), 1.0).count() == n.toLong)
    assert(Sampling.hashSample(events, col("event_id"), 0.0).count() == 0)
  }

  test("corpus shuffle: total, balanced-ish, decorrelated, reproducible, reseedable") {
    val n = docs.count()
    val got = Sampling.shuffleShards(docs.select(col("doc_id")), col("doc_id"),
      nShards = 8, salt = "s1")
    val rows = got.select("doc_id", "shard", "pos").as[(Long, Int, Int)].collect()
    // a permutation: every doc exactly once, pos is 1..count within shard
    assert(rows.length == n)
    assert(rows.map(_._1).distinct.length == n)
    rows.groupBy(_._2).foreach { case (shard, rs) =>
      assert(rs.map(_._3).sorted.toSeq == (1 to rs.length), s"shard $shard pos gaps")
    }
    // shards carry roughly n/8 each (binomial, ±5 sigma)
    val sigma = math.sqrt(n / 8.0 * (1 - 1.0 / 8))
    rows.groupBy(_._2).values.foreach(rs =>
      assert(math.abs(rs.length - n / 8.0) < 5 * sigma, s"shard size ${rs.length}"))
    // order decorrelated from id: consecutive ids rarely adjacent in order
    val posOf = rows.map(r => r._1 -> (r._2.toLong << 32 | r._3.toLong)).toMap
    val adjacent = (0L until n - 1)
      .count(i => math.abs(posOf(i) - posOf(i + 1)) == 1)
    assert(adjacent < n / 20, s"$adjacent of $n consecutive ids stayed adjacent")
    // bit-reproducible; a different salt is a different permutation
    val again = Sampling.shuffleShards(docs.select(col("doc_id")), col("doc_id"),
      nShards = 8, salt = "s1").select("doc_id", "shard", "pos")
      .as[(Long, Int, Int)].collect()
    assert(rows.sortBy(_._1).toSeq == again.sortBy(_._1).toSeq)
    val reseeded = Sampling.shuffleShards(docs.select(col("doc_id")), col("doc_id"),
      nShards = 8, salt = "s2").select("doc_id", "shard", "pos")
      .as[(Long, Int, Int)].collect()
    assert(rows.sortBy(_._1).toSeq != reseeded.sortBy(_._1).toSeq)
  }

  test("temperatureMixture flattens shares toward p^alpha, downsample-only") {
    import graft.operators.Sampling
    val docs = Tables(spark, sfDir).documents
    val before = docs.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val nMin = before.values.min
    val kept = Sampling.temperatureMixture(docs, col("lang"), col("doc_id"), 0.5)
    val after = kept.groupBy("lang").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // the smallest stratum is kept whole (weight exactly 1.0)
    val minLang = before.minBy(_._2)._1
    assert(after(minLang) == before(minLang),
      s"smallest stratum $minLang must keep weight 1.0")
    // every stratum only shrinks, and lands near n_g * sqrt(nmin/n_g)
    // (hash-threshold keep is binomial around the target)
    before.foreach { case (g, n) =>
      val target = n * math.sqrt(nMin.toDouble / n)
      val got = after.getOrElse(g, 0L).toDouble
      assert(got <= n, s"$g grew")
      assert(math.abs(got - target) <= math.max(5.0, 4 * math.sqrt(target)),
        s"$g: kept $got, target $target")
    }
    // alpha = 1 is the identity (all weights 1.0)
    val natural = Sampling
      .temperatureMixture(docs, col("lang"), col("doc_id"), 1.0).count()
    assert(natural == docs.count(), "alpha=1 must keep everything")
    // deterministic + partitioning-invariant (hash filter, no window)
    val a = kept.select("doc_id").as[Long].collect().toSet
    val b = Sampling.temperatureMixture(docs.repartition(7), col("lang"),
      col("doc_id"), 0.5).select("doc_id").as[Long].collect().toSet
    assert(a == b)
    // invalid alpha fails fast
    intercept[IllegalArgumentException] {
      Sampling.temperatureMixture(docs, col("lang"), col("doc_id"), 0.0)
    }
  }

  test("mixtureHash keeps full 1.0-weight strata and samples the rest") {
    val got = Sampling.mixtureHash(docs, col("source"), col("doc_id"),
      Map("src0" -> 1.0, "src1" -> 0.0), defaultWeight = 0.5)
    val per = got.groupBy("source").count().as[(String, Long)].collect().toMap
    val sizes = docs.groupBy("source").count().as[(String, Long)].collect().toMap
    assert(per("src0") == sizes("src0"))          // weight 1.0 keeps all
    assert(!per.contains("src1"))                 // weight 0.0 keeps none
    val others = per.filter { case (k, _) => k != "src0" }.values.sum.toDouble
    val othersTotal = sizes.filter { case (k, _) => k != "src0" && k != "src1" }
      .values.sum.toDouble
    assert(others > 0.2 * othersTotal && others < 0.8 * othersTotal)
  }

  test("contamination overlap counts equal driver-side shingle intersection") {
    val test = docs.filter(col("doc_id") < 50)
    val got = Contamination.ngramOverlap(docs, col("doc_id"), col("text"),
        test, col("doc_id"), col("text"), ngram = 3, minShared = 3)
      .filter(col("doc_id") =!= col("test_id"))
      .as[(Long, Long, Long)].collect()
    assert(got.nonEmpty, "planted near-dups should contaminate")
    val sh = docs.select(col("doc_id"),
        graft.functions.TextHashExpressions.shingles(col("text"), 3).as("sh"))
      .as[(Long, Seq[String])].collect().toMap
    got.foreach { case (a, b, n) =>
      assert((sh(a).toSet & sh(b).toSet).size.toLong == n, s"pair ($a,$b)")
    }
  }

  test("token budget keeps exactly the hash-order prefix; first overshoot included") {
    val budget = 100L
    val toks = graft.operators.TextAnalysis.tokenCount(col("text")).cast("long")
    val got = Sampling.tokenBudget(docs, Seq(col("source")), col("doc_id"),
        toks, budget)
      .select(col("doc_id"), col("source"), toks.as("n"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    // reproduce the selection rule per stratum from the raw order
    val ordered = docs
      .select(col("doc_id"), col("source"), toks.as("n"),
        md5(col("doc_id").cast("string")).as("h"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3)))
      .groupBy(_._2)
    val expect = ordered.values.flatMap { rows =>
      val sorted = rows.sortBy(r => (r._4, r._1))
      val cum = sorted.scanLeft(0L)(_ + _._3)
      sorted.zip(cum).filter(_._2 < budget).map(_._1)
    }.map(r => (r._1, r._2, r._3)).toSet
    assert(got.toSet == expect, s"missing ${expect -- got.toSet}")
    // the budget binds (some docs dropped) and every stratum reaches it
    assert(got.length < docs.count())
    expect.groupBy(_._2).foreach { case (s, rows) =>
      assert(rows.toSeq.map(_._3).sum >= budget, s"stratum $s under budget")
    }
    // partitioning-invariant
    val again = Sampling.tokenBudget(docs.repartition(7, col("doc_id")),
        Seq(col("source")), col("doc_id"), toks, budget)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(again == got.map(_._1).sorted.toSeq)
  }

  test("exact-substring contamination finds planted verbatim copies only") {
    val train = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "prefix words alpha beta gamma delta suffix"),   // contains frag of 1
      (3L, "completely different text here entirely"),
      (4L, "alpha beta gamma DELTA epsilon")                // case differs: no match
    ).toDF("doc_id", "text")
    val frags = Seq((10L, "alpha beta gamma delta")).toDF("test_id", "frag")
    val got = Contamination.exactSubstring(train, col("doc_id"), col("text"),
        frags, col("test_id"), col("frag"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 10L), (2L, 10L)), s"got $got")
    // a blank fragment (instr(text, '') = 1 everywhere) is dropped, not
    // matched against the whole corpus
    val withBlank = frags.unionByName(Seq((11L, "")).toDF("test_id", "frag"))
    val got2 = Contamination.exactSubstring(train, col("doc_id"), col("text"),
        withBlank, col("test_id"), col("frag"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got2 == got, s"blank fragment leaked: $got2")
  }

  test("packSequencesPosBy + packReport: pieces tile each sequence on " +
       "seq_pos, report identities hold (waste = tail only)") {
    val seqLen = 64
    val posMap = Sampling.packSequencesPosBy(docs, col("doc_id"),
      graft.operators.TextAnalysis.tokenCount(col("text")).cast("long"),
      nShards = 4, seqLen = seqLen, salt = "t")
    val rows = posMap.collect().map(r => (r.getAs[Int]("shard"),
      r.getAs[Long]("seq_id"), r.getAs[Long]("doc_id"),
      r.getAs[Long]("n_toks"), r.getAs[Long]("seq_pos")))
    // within each (shard, seq): pieces tile [0, fill) contiguously
    rows.groupBy(t => (t._1, t._2)).foreach { case ((sh, sq), ps) =>
      val sorted = ps.sortBy(_._5)
      assert(sorted.head._5 == 0L, s"shard $sh seq $sq starts at ${sorted.head._5}")
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._5 + a._4 == b._5, s"shard $sh seq $sq gap/overlap")
        case _ =>
      }
      assert(sorted.last._5 + sorted.last._4 <= seqLen)
    }
    // report identities per shard
    val rep = Sampling.packReport(posMap.drop("seq_pos"), seqLen)
      .collect()
    assert(rep.nonEmpty)
    rep.foreach { r =>
      val nSeqs = r.getAs[Long]("n_seqs"); val total = r.getAs[Long]("total_tokens")
      val waste = r.getAs[Long]("tail_waste"); val fill = r.getAs[Double]("fill_frac")
      assert(waste >= 0 && waste < seqLen, r.toString)
      assert(total + waste == nSeqs * seqLen, r.toString)
      assert(fill > 0.0 && fill <= 1.0, r.toString)
      assert(r.getAs[Long]("n_pieces") >= r.getAs[Long]("n_docs"), r.toString)
    }
  }

  test("packSequencesWholeBy: BFD invariants (docs whole, bins never " +
       "overflow, positions tile), driver-replay bit equality, " +
       "oversized doc fails by name, partitioning-invariant") {
    val seqLen = 128
    val counts = docs.select(col("doc_id"),
      graft.operators.TextAnalysis.tokenCount(col("text")).cast("long")
        .as("n")).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val out = Sampling.packSequencesWholeBy(docs, col("doc_id"),
      graft.operators.TextAnalysis.tokenCount(col("text")).cast("long"),
      nShards = 3, seqLen = seqLen, salt = "bf")
    val rows = out.collect().map(r => (r.getAs[Int]("shard"),
      r.getAs[Long]("seq_id"), r.getAs[Long]("doc_id"),
      r.getAs[Long]("tok_start"), r.getAs[Long]("n_toks"),
      r.getAs[Long]("seq_pos")))
    // every doc exactly once, whole
    assert(rows.map(_._3).toSet == counts.filter(_._2 > 0).keySet)
    assert(rows.length == rows.map(_._3).distinct.length)
    rows.foreach { t =>
      assert(t._4 == 0L && t._5 == counts(t._3), t.toString)
    }
    // per (shard, seq): no overflow, positions tile [0, fill)
    rows.groupBy(t => (t._1, t._2)).foreach { case ((sh, sq), ps) =>
      val sorted = ps.sortBy(_._6)
      assert(sorted.head._6 == 0L, s"$sh/$sq starts at ${sorted.head._6}")
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a._6 + a._5 == b._6, s"$sh/$sq gap")
        case _ =>
      }
      assert(sorted.last._6 + sorted.last._5 <= seqLen, s"$sh/$sq overflow")
    }
    // driver BFD replay on the same (n DESC, doc_id) order, bit equality
    val byShard = rows.groupBy(_._1)
    byShard.foreach { case (sh, ps) =>
      val order = ps.map(t => (t._3, counts(t._3)))
        .sortBy { case (id, n) => (-n, id) }
      val bins = scala.collection.mutable.ArrayBuffer[Long]()
      val expect = order.map { case (id, n) =>
        val open = bins.zipWithIndex
          .filter { case (fill, _) => seqLen - fill >= n }
        val sid =
          if (open.isEmpty) { bins += 0L; bins.length - 1 }
          else open.minBy { case (fill, i) => (seqLen - fill, i) }._2
        val pos = bins(sid)
        bins(sid) = pos + n
        id -> ((sid.toLong, pos))
      }.toMap
      ps.foreach { t =>
        assert(expect(t._3) == ((t._2, t._6)),
          s"shard $sh doc ${t._3}: ${expect(t._3)} vs ${(t._2, t._6)}")
      }
    }
    // packReport prices the padding of the no-split regime
    val rep = Sampling.packReport(out.drop("seq_pos"), seqLen).collect()
    rep.foreach { r =>
      assert(r.getAs[Long]("n_split_docs") == 0L, r.toString)
      assert(r.getAs[Long]("tail_waste") ==
        r.getAs[Long]("n_seqs") * seqLen - r.getAs[Long]("total_tokens"))
    }
    // an oversized doc fails by name
    val e = intercept[Exception] {
      Sampling.packSequencesWholeBy(
        Seq((1L, 100L)).toDF("doc_id", "n"), col("doc_id"), col("n"),
        nShards = 1, seqLen = 64).collect()
    }
    assert(messageChain(e).contains("packSequencesWholeBy"),
      messageChain(e))
    // partitioning invariance
    val again = Sampling.packSequencesWholeBy(docs.repartition(13),
        col("doc_id"),
        graft.operators.TextAnalysis.tokenCount(col("text")).cast("long"),
        nShards = 3, seqLen = seqLen, salt = "bf")
      .collect().map(r => (r.getAs[Int]("shard"), r.getAs[Long]("seq_id"),
        r.getAs[Long]("doc_id"), r.getAs[Long]("tok_start"),
        r.getAs[Long]("n_toks"), r.getAs[Long]("seq_pos"))).sortBy(_._3)
    assert(again.toSeq == rows.sortBy(_._3).toSeq)
  }

  test("sequence packing: full bins, contiguous doc coverage, partitioning-invariant") {
    val seqLen = 64
    val out = Sampling.packSequences(docs, col("doc_id"), col("text"),
        nShards = 4, seqLen = seqLen, salt = "t")
      .collect().map(r =>
        (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out.nonEmpty)
    // every sequence is exactly seqLen tokens except each shard's last
    out.groupBy(_._1).foreach { case (shard, rows) =>
      val perSeq = rows.groupBy(_._2).view.mapValues(_.map(_._5).sum)
      val lastSeq = perSeq.keys.max
      perSeq.foreach { case (seq, total) =>
        if (seq != lastSeq)
          assert(total == seqLen, s"shard $shard seq $seq has $total tokens")
        else assert(total >= 1 && total <= seqLen)
      }
    }
    // each doc's pieces tile [0, n) contiguously, no overlap, nothing lost
    val tokCounts = docs
      .select(col("doc_id"),
        graft.operators.TextAnalysis.tokenCount(col("text")).cast("long").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    out.groupBy(_._3).foreach { case (doc, pieces) =>
      val sorted = pieces.sortBy(_._4)
      assert(sorted.head._4 == 0L, s"doc $doc first piece starts at ${sorted.head._4}")
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a._4 + a._5 == b._4, s"doc $doc gap/overlap")
        case _ =>
      }
      assert(sorted.map(_._5).sum == tokCounts(doc), s"doc $doc coverage")
    }
    // identical map whatever the input partitioning
    val again = Sampling.packSequences(docs.repartition(7, col("source")),
        col("doc_id"), col("text"), nShards = 4, seqLen = seqLen, salt = "t")
      .collect().map(r =>
        (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(again.sortBy(t => (t._1, t._2, t._3)).toSeq ==
      out.sortBy(t => (t._1, t._2, t._3)).toSeq)
  }

  test("indexed contamination: token-aligned matches only, equals per-row form there") {
    val frag = "alpha beta gamma delta epsilon zeta eta theta"
    val train = Seq(
      (1L, s"lead in $frag trail out"),        // token-aligned copy
      (2L, s"xx$frag"),                        // first token fused: byte-level only
      (3L, "nothing shared here at all today whatsoever")
    ).toDF("doc_id", "text")
    val frags = Seq((10L, frag)).toDF("test_id", "frag")
    val byteLevel = Contamination.exactSubstring(train, col("doc_id"), col("text"),
        frags, col("test_id"), col("frag"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val indexed = Contamination.exactSubstringIndexed(train, col("doc_id"), col("text"),
        frags, col("test_id"), col("frag"), k = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(byteLevel == Set((1L, 10L), (2L, 10L)), s"byte-level $byteLevel")
    // the fused-token doc is byte-contained but not token-aligned — the
    // indexed form's documented semantics exclude it
    assert(indexed == Set((1L, 10L)), s"indexed $indexed")
    // fragments of the wrong token count are ignored, not mismatched
    val shortFrag = Seq((11L, "alpha beta gamma")).toDF("test_id", "frag")
    assert(Contamination.exactSubstringIndexed(train, col("doc_id"), col("text"),
      shortFrag, col("test_id"), col("frag"), k = 8).count() == 0)
  }

  test("indexed contamination string re-verify keeps every true match") {
    // The collision re-verification must not delete real matches: a true
    // hash match means the fragment's bytes equal a window's bytes, so
    // the space-padded containment check must accept it at every
    // position — mid-document, the very first window, and the very last
    // (string edges have no ' ' boundary; the sentinels supply it).
    val frag = "alpha beta gamma delta epsilon zeta eta theta"
    val train = Seq(
      (1L, s"lead in $frag trail out"),   // interior window
      (2L, s"$frag trail out"),           // doc-initial window
      (3L, s"lead in $frag"),             // doc-final window
      (4L, frag),                         // the whole document
      (5L, "no match in this document at all whatsoever today")
    ).toDF("doc_id", "text")
    val frags = Seq((10L, frag)).toDF("test_id", "frag")
    val got = Contamination.exactSubstringIndexed(train, col("doc_id"), col("text"),
        frags, col("test_id"), col("frag"), k = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 10L), (2L, 10L), (3L, 10L), (4L, 10L)), s"got $got")
  }

  test("splitByGroup: groups never straddle, fractions near target, stable under growth") {
    // many rows per group: every member must land where its group lands
    val rows = spark.range(30000)
      .select(col("id"), (col("id") % 3000).as("grp"))
    val split = Sampling.splitByGroup(rows, col("grp"),
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    val straddlers = split.groupBy("grp")
      .agg(countDistinct(col("split")).as("k"))
      .filter(col("k") > 1).count()
    assert(straddlers == 0, "a group must map to exactly one split")
    // fractions over GROUPS are binomial around the target
    val byName = split.select("grp", "split").distinct()
      .groupBy("split").count().as[(String, Long)].collect().toMap
    assert(byName.keySet == Set("train", "val", "test"), byName.toString)
    assert(math.abs(byName("train") - 2400L) < 150, byName.toString)
    assert(math.abs(byName("val") - 300L) < 80, byName.toString)
    // stability: a grown corpus never reassigns an existing group
    val grown = Sampling.splitByGroup(
      spark.range(60000).select(col("id"), (col("id") % 6000).as("grp")),
      col("grp"), Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    val moved = split.select("grp", "split").distinct()
      .join(grown.select(col("grp"), col("split").as("s2")).distinct(), "grp")
      .filter(col("split") =!= col("s2")).count()
    assert(moved == 0, "existing groups must keep their split as the corpus grows")
    // the remainder falls to the LAST split when fractions sum under 1
    val partial = Sampling.splitByGroup(rows, col("grp"),
      Seq("train" -> 0.5, "rest" -> 0.1))
    val names = partial.select("split").distinct().as[String].collect().toSet
    assert(names == Set("train", "rest"))
    val nRest = partial.select("grp", "split").distinct()
      .filter(col("split") === "rest").count()
    assert(math.abs(nRest - 1500L) < 150, s"remainder must fall to last: $nRest")
    // misuse fails by name
    intercept[IllegalArgumentException] {
      Sampling.splitByGroup(rows, col("grp"), Seq("only" -> 1.0))
    }
    intercept[IllegalArgumentException] {
      Sampling.splitByGroup(rows, col("grp"),
        Seq("a" -> 0.8, "b" -> 0.4))
    }
  }

  test("curriculumBinsBy: per-stratum boundaries; null score/stratum poison; no window") {
    // two strata with DIFFERENT scales: a global split would put all of
    // 'b' in the top bin; per-stratum terciles split each 1..6 run the
    // same way
    val df = (1 to 6).map(i => ("a", i.toLong, i.toDouble))
      .++((1 to 6).map(i => ("b", 10L + i, 100.0 + i)))
      .toDF("grp", "id", "s")
    val got = Sampling.curriculumBinsBy(df, Seq("grp"), col("s"), 3)
      .orderBy("id").select("bin").as[Int].collect().toSeq
    assert(got == Seq(1, 1, 2, 2, 3, 3, 1, 1, 2, 2, 3, 3), got.toString)
    // no window, no sort-merge join: one grouped aggregate broadcast back
    val plan = Sampling.curriculumBinsBy(df, Seq("grp"), col("s"), 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin") && !plan.contains("Window"),
      s"per-stratum binning must be broadcast + projection:\n$plan")
    // null score poisons by name
    val withNull = Seq(("a", 1L, Some(2.0)), ("a", 2L, Option.empty[Double]))
      .toDF("grp", "id", "s")
    val e = intercept[Exception] {
      Sampling.curriculumBinsBy(withNull, Seq("grp"), col("s"), 2)
        .select("bin").collect()
    }
    assert(messageChain(e).contains("curriculumBinsBy"), messageChain(e))
    // null stratum key poisons by name (its boundaries cannot join)
    val nullGrp = Seq((Some("a"), 1L, 1.0), (Option.empty[String], 2L, 2.0))
      .toDF("grp", "id", "s")
    val e2 = intercept[Exception] {
      Sampling.curriculumBinsBy(nullGrp, Seq("grp"), col("s"), 2)
        .select("bin").collect()
    }
    assert(messageChain(e2).contains("stratum key is null"), messageChain(e2))
    intercept[IllegalArgumentException] {
      Sampling.curriculumBinsBy(df, Seq.empty, col("s"), 3)
    }
  }

  test("curriculumBins: interval bins on exact boundaries; ties share a bin; map-only plan") {
    // scores 1..8: quartile boundaries 2.75 / 4.5 / 6.25 → bins 1,1,2,2,3,3,4,4
    val df = (1 to 8).map(i => (i.toLong, i.toDouble)).toDF("id", "s")
    val got = Sampling.curriculumBins(df, col("s"), 4)
      .orderBy("id").select("bin").as[Int].collect().toSeq
    assert(got == Seq(1, 1, 2, 2, 3, 3, 4, 4), got.toString)
    // ties: equal scores land in the SAME bin (value intervals, not
    // equal-count slices — the documented difference to ntile)
    val tied = Seq((1L, 5.0), (2L, 5.0), (3L, 5.0), (4L, 1.0))
      .toDF("id", "s")
    val bins = Sampling.curriculumBins(tied, col("s"), 2)
      .filter(col("s") === 5.0).select("bin").distinct().as[Int].collect()
    assert(bins.length == 1, s"equal scores must share a bin: ${bins.toSeq}")
    // the assignment side is map-only: no exchange above the scan except
    // the 1-row boundary broadcast
    val plan = Sampling.curriculumBins(df, col("s"), 4)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin") && !plan.contains("Window"),
      s"binning must be broadcast + projection:\n$plan")
    intercept[IllegalArgumentException] {
      Sampling.curriculumBins(df, col("s"), 1)
    }
    // null scores would silently land in bin 1 — the per-row poison
    // fails by name at first null (zero cost on clean data: no
    // construction-time re-execution of the input lineage)
    val withNull = Seq((1L, Some(2.0)), (2L, Option.empty[Double]))
      .toDF("id", "s")
    val e = intercept[Exception] {
      // the poison lives in the bin column: consuming IT trips the
      // guard (a count() that prunes the column never corrupts anything)
      Sampling.curriculumBins(withNull, col("s"), 2)
        .select("bin").collect()
    }
    assert(e.getMessage.contains("null") ||
      Option(e.getCause).exists(_.getMessage.contains("null")), e.toString)
    // …and a null GROUP key fails splitByGroup the same way
    val nullGrp = Seq((1L, Some(1L)), (2L, Option.empty[Long]))
      .toDF("id", "grp")
    val e2 = intercept[Exception] {
      Sampling.splitByGroup(nullGrp, col("grp"),
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
        .select("split").collect()
    }
    assert(e2.getMessage.contains("null") ||
      Option(e2.getCause).exists(_.getMessage.contains("null")), e2.toString)
  }

  test("linear- and log-space draws coincide where weights correspond: " +
       "gumbelTopK at logw = ln(w) selects the same ranked ids as " +
       "weightedTopK at w, globally and per stratum") {
    // both priorities are monotone transforms of −ln(u)/w (A-Res ranks
    // by ln(u)/w desc ⟺ −ln(u)/w asc; Gumbel by −ln(−ln(u)/w) desc ⟺
    // the same), so the SELECTED ID SEQUENCES must be identical — the
    // shared-priority-helper contract. Priorities themselves differ
    // (different formulas), so compare rankings, not values.
    val pop = spark.range(300).select(col("id"),
      (pmod(xxhash64(col("id")), lit(97)) + 1).cast("double").as("w"),
      pmod(col("id"), lit(4)).cast("string").as("src"))
    val linIds = Sampling.weightedTopK(pop, col("id"), col("w"), k = 25)
      .select(col("id")).as[Long].collect().toSeq
    val logIds = Sampling.gumbelTopK(pop.withColumn("lw", log(col("w"))),
        col("id"), col("lw"), k = 25)
      .select(col("id")).as[Long].collect().toSeq
    assert(linIds == logIds, s"global rankings diverged:\n$linIds\n$logIds")
    val linS = Sampling.weightedStratifiedTopK(pop, Seq(col("src")),
        col("id"), col("w"), k = 6)
      .orderBy(col("src"), col("priority").desc, col("id"))
      .select(col("id")).as[Long].collect().toSeq
    val logS = Sampling.gumbelStratifiedTopK(
        pop.withColumn("lw", log(col("w"))), Seq(col("src")),
        col("id"), col("lw"), k = 6)
      .orderBy(col("src"), col("priority").desc, col("id"))
      .select(col("id")).as[Long].collect().toSeq
    assert(linS == logS, s"stratified rankings diverged:\n$linS\n$logS")
  }
}
