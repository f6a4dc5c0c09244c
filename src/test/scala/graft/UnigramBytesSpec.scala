package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.{TextKernels, UnigramByteTable}
import graft.operators.TextAnalysis

/** BYTE-level unigram: hand-checked init counting, fast-trainer
  * bit-equality against the distributed formulation (init and chained
  * EM rounds), Viterbi path self-consistency on full-Unicode text
  * (astral planes included), and the >8-byte piece fallback path. */
class UnigramBytesSpec extends SparkSpec {
  import spark.implicits._

  private def docs(texts: String*): DataFrame =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")

  private def modelSet(df: DataFrame): Set[(String, Long, Long)] =
    df.select("piece", "cnt", "logp_micro").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet

  test("unigramTrainBytes: hand-checked counts on a two-word corpus, " +
       "single bytes always retained, minCount prunes longer pieces") {
    // "ab ab b" -> words: ab(f=2), b(f=1)
    // pieces: 61(2), 62(2+1=3), 6162(2)
    val m = TextAnalysis.unigramTrainBytes(docs("ab ab b"), col("text"),
      maxPieceLen = 2, minCount = 2L).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(m.keySet == Set("61", "62", "6162"))
    assert(m("61")._1 == 2L && m("62")._1 == 3L && m("6162")._1 == 2L)
    // total = 7; check one quantized score exactly
    val exp61 = java.lang.Math.floor(
      java.lang.Math.log(2.0 / 7.0) * 1000000.0 + 0.5).toLong
    assert(m("61")._2 == exp61)
  }

  test("unigramTrainBytesFast(emRounds=0) is bit-identical to the " +
       "distributed unigramTrainBytes — full frame equality") {
    val d = docs("the naïve café crew", "café crew 東京 🚀🚀 mix3d CASE",
      "the the crew 東京タワー")
    val slow = modelSet(TextAnalysis.unigramTrainBytes(d, col("text")))
    val fast = modelSet(TextAnalysis.unigramTrainBytesFast(d, col("text")))
    assert(fast == slow)
    assert(slow.nonEmpty)
  }

  test("unigramTrainBytesFast(emRounds=2) equals two chained distributed " +
       "unigramEmStepBytes rounds — full frame equality") {
    val d = docs("segmentation segments the segment", "the token tokens",
      "naïve café 🚀 segment token the the")
    val init = TextAnalysis.unigramTrainBytes(d, col("text"))
      .localCheckpoint()
    val p1 = TextAnalysis.unigramPieces(init)
    val em1 = TextAnalysis.unigramEmStepBytes(d, col("text"), p1)
      .localCheckpoint()
    val em2 = TextAnalysis.unigramEmStepBytes(d, col("text"),
      TextAnalysis.unigramPieces(em1))
    val fast = modelSet(
      TextAnalysis.unigramTrainBytesFast(d, col("text"), emRounds = 2))
    assert(fast == modelSet(em2))
    // EM actually moved the model (rounds are not a no-op on this corpus)
    assert(modelSet(em1) != modelSet(init.select(col("piece"), col("cnt"),
      col("logp_micro"))))
  }

  test("byte Viterbi self-consistency on full-Unicode text: path pieces " +
       "concat to the word's hex, scores sum to logp_micro, count " +
       "matches n_pieces — no OOV passthrough for any script") {
    val d = docs("naïve café 東京タワー 🚀🌍 MixedCASE tok3ns ¿señor?",
      "plain ascii words too")
    val model = TextAnalysis.unigramTrainBytes(d, col("text"))
      .localCheckpoint()
    val pieces = TextAnalysis.unigramPieces(model)
    val table = new UnigramByteTable(pieces, 8)
    val rows = d.select(col("text"),
        TextAnalysis.unigramSegmentBytes(col("text"), pieces).as("s"),
        TextAnalysis.unigramSegmentBytesPieces(col("text"), pieces).as("p"))
      .collect()
    rows.foreach { r =>
      val text = r.getString(0)
      val logp = r.getStruct(1).getLong(0)
      val np = r.getStruct(1).getLong(1)
      val path = r.getSeq[String](2)
      assert(path.length.toLong == np)
      // concat property: the path re-spells the text's tokens in hex
      val hexTokens = text.trim.split("\\s+").filter(_.nonEmpty)
        .map(w => w.getBytes("UTF-8").map(b => f"${b & 0xff}%02x").mkString)
      assert(path.mkString == hexTokens.mkString)
      // score property: each path piece scores through the same table
      val rescored = path.map { hexPc =>
        val b = hexPc.grouped(2)
          .map(h => Integer.parseInt(h, 16).toByte).toArray
        val s = table.score(b, 0, b.length)
        if (s == Long.MinValue) {
          assert(b.length == 1, s"unseen multi-byte piece $hexPc on path")
          TextKernels.UnigramUnkMicro
        } else s
      }.sum
      assert(rescored == logp)
    }
  }

  test("pieces longer than 8 bytes: training at maxPieceLen=12 learns " +
       "them and the HashMap fallback probe segments through them") {
    // one long word repeated: its full 10-byte form becomes a piece
    val d = docs("serendipity serendipity serendipity xy xy")
    val model = TextAnalysis.unigramTrainBytes(d, col("text"),
      maxPieceLen = 12, minCount = 2L).localCheckpoint()
    val pieces = TextAnalysis.unigramPieces(model)
    val longOnes = pieces.filter(_._1.length > 16)
    assert(longOnes.nonEmpty, "no piece longer than 8 bytes was trained")
    val seg = d.select(
        TextAnalysis.unigramSegmentBytes(col("text"), pieces, maxLen = 12)
          .as("s"))
      .head().getStruct(0)
    // best path tokenizes each "serendipity" as ONE 11-byte piece: the
    // single-piece score ln(c/T) always beats any multi-piece split
    // (scores are log-probs of one distribution; splitting adds terms)
    val word = "serendipity".getBytes("UTF-8")
    val t12 = new UnigramByteTable(pieces, 12)
    assert(t12.score(word, 0, word.length) != Long.MinValue)
    assert(seg.getLong(1) == 3L + 2L) // 3 one-piece words + 2 "xy"
    // fast trainer agrees at maxPieceLen=12 too
    val fast = modelSet(TextAnalysis.unigramTrainBytesFast(d, col("text"),
      maxPieceLen = 12, minCount = 2L))
    assert(fast == modelSet(model))
  }

  test("unigramSegmentBytesIds: ids follow the (cnt DESC, piece ASC) " +
       "vocabulary ranking; byte fallback leaves no -1 on in-corpus text") {
    val d = docs("aa bb aa 🚀", "bb aa zz")
    val model = TextAnalysis.unigramTrainBytes(d, col("text"))
      .localCheckpoint()
    val pieces = TextAnalysis.unigramPieces(model)
    val vocab = TextAnalysis.unigramVocab(model)
    val out = d.orderBy("doc_id").select(
        TextAnalysis.unigramSegmentBytesIds(col("text"), pieces, vocab)
          .as("ids"))
      .collect().map(_.getSeq[Int](0))
    assert(out.forall(_.forall(_ >= 0)), "byte fallback must leave no -1")
    // ids round-trip to the pieces emitted by the path kernel
    val idOf = vocab.toMap
    val paths = d.orderBy("doc_id").select(
        TextAnalysis.unigramSegmentBytesPieces(col("text"), pieces).as("p"))
      .collect().map(_.getSeq[String](0))
    paths.zip(out).foreach { case (path, ids) =>
      assert(path.map(idOf) == ids)
    }
  }

  test("fast trainer: measured driver-footprint guard fails by name " +
       "citing the minWordFreq lever") {
    val d = docs("alpha beta gamma delta")
    val e = intercept[IllegalArgumentException] {
      TextAnalysis.unigramTrainBytesFast(d, col("text"),
        maxTableBytes = 16L)
    }
    assert(e.getMessage.contains("unigramTrainBytesFast"))
    assert(e.getMessage.contains("minWordFreq"))
  }

  test("marked pieces + detok: exact round trip to the whitespace-" +
       "normalized text, even when pieces split an astral emoji's " +
       "4-byte sequence") {
    val d = docs("  naïve   café\t東京タワー 🚀🌍 plain ",
      "MixedCASE tok3ns ¿señor? 🚀")
    val model = TextAnalysis.unigramTrainBytes(d, col("text"))
      .localCheckpoint()
    val pieces = TextAnalysis.unigramPieces(model)
    val rows = d.select(col("text"),
        TextAnalysis.unigramSegmentBytesPiecesMarked(col("text"), pieces)
          .as("m"),
        TextAnalysis.unigramDetokBytes(
          TextAnalysis.unigramSegmentBytesPiecesMarked(col("text"),
            pieces)).as("dt"),
        TextAnalysis.unigramSegmentBytesPieces(col("text"), pieces)
          .as("p"))
      .collect()
    rows.foreach { r =>
      val norm = r.getString(0).trim.split("\\s+").filter(_.nonEmpty)
        .mkString(" ")
      assert(r.getString(2) == norm,
        s"round trip broke: '${r.getString(2)}' vs '$norm'")
      // marked stream == unmarked stream with one _ per token
      val marked = r.getSeq[String](1)
      val plain = r.getSeq[String](3)
      assert(marked.map(_.stripPrefix("_")) == plain)
      assert(marked.count(_.startsWith("_")) ==
        r.getString(0).trim.split("\\s+").count(_.nonEmpty))
    }
    // a piece that splits the rocket's 4-byte sequence must still
    // decode: force a 2-byte-max table so every emoji splits
    val tiny = pieces.filter(_._1.length <= 4)
    val split = d.select(TextAnalysis.unigramDetokBytes(
        TextAnalysis.unigramSegmentBytesPiecesMarked(col("text"), tiny,
          maxLen = 2)).as("dt"), col("text"))
      .collect()
    split.foreach { r =>
      val norm = r.getString(1).trim.split("\\s+").filter(_.nonEmpty)
        .mkString(" ")
      assert(r.getString(0) == norm, s"split-decode broke: $r")
    }
  }

  test("unigramPruneToVocab: singles always kept, top multi-byte by " +
       "(cnt DESC, piece ASC), renormalized; fast trainer's targetVocab " +
       "is bit-identical; impossible target fails by name") {
    val d = docs("the naïve café crew 🚀", "the the crew café token",
      "token the crew naïve naïve")
    val init = TextAnalysis.unigramTrainBytes(d, col("text"))
      .localCheckpoint()
    val nSingles = init.filter(length(col("piece")) === 2).count()
    val target = nSingles.toInt + 5
    val pruned = TextAnalysis.unigramPruneToVocab(init, target)
      .localCheckpoint()
    assert(pruned.count() == target.toLong)
    // every single survived; the 5 multi-byte keeps are the count-top 5
    assert(pruned.filter(length(col("piece")) === 2).count() == nSingles)
    val keptMulti = pruned.filter(length(col("piece")) > 2)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val topMulti = init.filter(length(col("piece")) > 2)
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .sortBy { case (p, c) => (-c, p) }.take(5).toSet
    assert(keptMulti == topMulti)
    // renormalization: scores are ln(cnt/keptTotal) micro-quantized
    val t = pruned.agg(sum(col("cnt"))).head().getLong(0)
    pruned.collect().foreach { r =>
      val exp = java.lang.Math.floor(java.lang.Math.log(
        r.getLong(1).toDouble / t.toDouble) * 1000000.0 + 0.5).toLong
      assert(r.getLong(2) == exp, r.toString)
    }
    // fast trainer with targetVocab == distributed prune(init), exactly
    val fast = modelSet(TextAnalysis.unigramTrainBytesFast(d, col("text"),
      targetVocab = target))
    assert(fast == modelSet(pruned))
    // and with an EM round on top: fast == emStep(prune(init))
    val fastEm = modelSet(TextAnalysis.unigramTrainBytesFast(d,
      col("text"), emRounds = 1, targetVocab = target))
    val chained = modelSet(TextAnalysis.unigramEmStepBytes(d, col("text"),
      TextAnalysis.unigramPieces(pruned)))
    assert(fastEm == chained)
    // a target below the alphabet fails by name
    val e = intercept[IllegalArgumentException] {
      TextAnalysis.unigramPruneToVocab(init, 2)
    }
    assert(e.getMessage.contains("unigramPruneToVocab"), e.getMessage)
  }

  test("soft EM: expected counts equal brute-force segmentation " +
       "enumeration on a small word; support keeps every init piece") {
    // corpus: "aba" x3, "ab" x2 — enumerable by hand
    val d = docs("aba aba aba ab ab")
    val init = TextAnalysis.unigramTrainBytes(d, col("text"),
      maxPieceLen = 3, minCount = 2L).localCheckpoint()
    val pieces = TextAnalysis.unigramPieces(init)
    val scores = pieces.toMap.map { case (p, lp) => p -> lp / 1e6 }
    // brute force: all segmentations of a byte string over the table
    def segs(hex: String): Seq[Seq[String]] =
      if (hex.isEmpty) Seq(Seq.empty)
      else (1 to math.min(3, hex.length / 2)).flatMap { k =>
        val h = hex.take(2 * k)
        if (scores.contains(h)) segs(hex.drop(2 * k)).map(h +: _)
        else Seq.empty
      }
    def hexOf(s: String) =
      s.getBytes("UTF-8").map(b => f"${b & 0xff}%02x").mkString
    def expectedCounts(word: String): (Map[String, Double], Double) = {
      val all = segs(hexOf(word))
      val ws = all.map(sg => sg.map(scores).sum).map(math.exp)
      val z = ws.sum
      val ec = all.zip(ws).flatMap { case (sg, w) =>
        sg.map(p => p -> w / z)
      }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      (ec, math.log(z))
    }
    val (ecAba, llAba) = expectedCounts("aba")
    val (ecAb, llAb) = expectedCounts("ab")
    val (model, lls, _) = TextAnalysis.unigramTrainBytesSoftDiag(
      d, col("text"), maxPieceLen = 3, minCount = 2L, emRounds = 1)
    val got = model.map(t => t._1 -> t._2).toMap
    val want = (ecAba.keySet ++ ecAb.keySet).map { p =>
      p -> (3.0 * ecAba.getOrElse(p, 0.0) + 2.0 * ecAb.getOrElse(p, 0.0))
    }.toMap
    assert(got.keySet == want.keySet, s"$got vs $want")
    want.foreach { case (p, v) =>
      assert(math.abs(got(p) - v) < 1e-9, s"piece $p: ${got(p)} vs $v")
    }
    assert(math.abs(lls.head - (3 * llAba + 2 * llAb)) < 1e-9)
    // support identity: soft EM keeps every init piece
    assert(got.keySet == pieces.map(_._1).toSet)
  }

  test("soft EM: corpus log-likelihood is non-decreasing across rounds " +
       "(the EM guarantee) and the run is bit-reproducible") {
    val d = docs("segment the segments", "token the tokens the",
      "naïve café 🚀 segment")
    val (_, lls, ep) = TextAnalysis.unigramTrainBytesSoftDiag(
      d, col("text"), emRounds = 4)
    assert(lls.length == 4)
    lls.sliding(2).foreach {
      case Seq(a, b) =>
        assert(b >= a - 1e-9, s"EM likelihood decreased: $lls")
      case _ =>
    }
    assert(ep > 0.0)
    val (m1, lls1, _) = TextAnalysis.unigramTrainBytesSoftDiag(
      d, col("text"), emRounds = 4)
    val (m2, lls2, _) = TextAnalysis.unigramTrainBytesSoftDiag(
      d.repartition(5), col("text"), emRounds = 4)
    assert(lls1 == lls2 && m1.toSet == m2.toSet,
      "soft EM must be bit-reproducible across partitionings")
  }

  test("soft EM underflow floor: an occurrence whose posterior " +
       "underflows exp() to 0.0 keeps its piece at the denormal floor " +
       "— the support identity holds by construction") {
    // synthetic extreme-skew model over one 200-byte word: the
    // whole-word piece at -1 nat vs singles at -20 nats each — the
    // all-singles path sits ~3999 nats below the best, so every
    // mid-word single's posterior is exp(-3979) = 0.0 in IEEE doubles
    val w = Array.fill(200)('a'.toByte)
    val fullHex = w.map(b => f"${b & 0xff}%02x").mkString
    val model = Seq((fullHex, 1.0, -1000000L), ("61", 1.0, -20000000L))
    val (next, ll, _) = TextAnalysis.unigramSoftEmLocal(
      Array(w), Array(1L), model, maxLen = 200)
    val got = next.map(t => t._1 -> t._2).toMap
    assert(got.keySet == Set(fullHex, "61"),
      s"support broke: ${got.keySet.size} pieces")
    // the single survived at exactly the floor; the whole word at ~1
    assert(got("61") == java.lang.Double.MIN_VALUE, got.toString)
    assert(math.abs(got(fullHex) - 1.0) < 1e-9, got.toString)
    assert(math.abs(ll - (-1.0)) < 1e-6, s"ll $ll")
    // and the corpus-level trainer keeps the identity on a long-word
    // corpus end to end
    val ww = "ab" * 120
    val d = docs(s"$ww $ww cc cc")
    val init = TextAnalysis.unigramTrainBytes(d, col("text"),
      maxPieceLen = 240).localCheckpoint()
    val initSet = TextAnalysis.unigramPieces(init, maxPieces = 1 << 21)
      .map(_._1).toSet
    val (m2, _, _) = TextAnalysis.unigramTrainBytesSoftDiag(
      d, col("text"), maxPieceLen = 240, emRounds = 1)
    assert(m2.map(_._1).toSet == initSet,
      s"soft EM dropped ${(initSet -- m2.map(_._1).toSet).size} pieces")
  }

  test("soft EM agrees with hard EM in the peaked limit (one dominant " +
       "segmentation per word)") {
    // one 36-byte all-distinct word repeated: under the uniform init
    // (666 substrings, p = 1/666 each), the single-piece segmentation
    // outweighs ALL 2^35-1 splits combined by ~19:1 — so the soft
    // posterior concentrates on exactly the path hard EM picks
    val w = "abcdefghijklmnopqrstuvwxyz0123456789"
    val d = docs(Seq.fill(8)(w).mkString(" "))
    val init = TextAnalysis.unigramTrainBytes(d, col("text"),
      maxPieceLen = 36).localCheckpoint()
    val hard = TextAnalysis.unigramEmStepBytes(d, col("text"),
        TextAnalysis.unigramPieces(init), maxLen = 36)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val fullHex = w.getBytes("UTF-8").map(b => f"${b & 0xff}%02x").mkString
    assert(hard.keySet == Set(fullHex) && hard(fullHex) == 8L,
      s"hard EM should keep only the whole-word path: $hard")
    val (soft, _, _) = TextAnalysis.unigramTrainBytesSoftDiag(
      d, col("text"), maxPieceLen = 36, emRounds = 1)
    val softMap = soft.map(t => t._1 -> t._2).toMap
    assert(math.abs(softMap(fullHex) - 8.0) / 8.0 < 0.1,
      s"soft ${softMap(fullHex)} vs hard 8")
    // the dominant piece carries the max expected count
    assert(softMap.maxBy(_._2)._1 == fullHex)
  }

  test("unigramPruneSoftToVocab: singles always kept, top multi-byte " +
       "by (ecount DESC, piece ASC), renormalized over kept expected " +
       "mass; pruned table segments with no OOV; impossible target " +
       "fails by name") {
    val d = docs("the naïve café crew 🚀", "the the crew café token",
      "token the crew naïve naïve")
    val soft = TextAnalysis.unigramTrainBytesSoft(d, col("text"),
      emRounds = 1).localCheckpoint()
    val nS = soft.filter(length(col("piece")) === 2).count()
    val target = nS.toInt + 5
    val pruned = TextAnalysis.unigramPruneSoftToVocab(soft, target)
      .localCheckpoint()
    assert(pruned.count() == target.toLong)
    assert(pruned.filter(length(col("piece")) === 2).count() == nS)
    val keptMulti = pruned.filter(length(col("piece")) > 2)
      .collect().map(_.getString(0)).toSet
    val topMulti = soft.filter(length(col("piece")) > 2)
      .collect().map(r => (r.getString(0), r.getDouble(1)))
      .sortBy { case (p, c) => (-c, p) }.take(5).map(_._1).toSet
    assert(keptMulti == topMulti)
    // renormalization: ln(ecount / kept expected mass), micro-quantized
    // (1-micro-nat slack for float summation order)
    val t = pruned.agg(sum(col("ecount"))).head().getDouble(0)
    pruned.collect().foreach { r =>
      val exp = math.floor(math.log(r.getDouble(1) / t) * 1e6 + 0.5).toLong
      assert(math.abs(r.getLong(2) - exp) <= 1L, r.toString)
    }
    // the soft-pruned vocabulary drives the SAME segmentation kernels:
    // singles survive, so every token of the corpus segments
    val segged = d.select(TextAnalysis.unigramSegmentBytes(col("text"),
        TextAnalysis.unigramPieces(pruned)).as("s"))
      .agg(sum(col("s.n_pieces")).cast("long")).head().getLong(0)
    assert(segged > 0L)
    val e = intercept[IllegalArgumentException](
      TextAnalysis.unigramPruneSoftToVocab(soft, 2))
    assert(e.getMessage.contains("unigramPruneSoftToVocab"), e.getMessage)
  }

  test("UnigramByteTable: rejects non-hex and odd-length pieces; " +
       "kernel probe distinguishes same-prefix different-length pieces") {
    intercept[IllegalArgumentException] {
      new UnigramByteTable(Seq(("6e6", -1L)), 8)
    }
    intercept[IllegalArgumentException] {
      new UnigramByteTable(Seq(("6E61", -1L)), 8)
    }
    val t = new UnigramByteTable(
      Seq(("61", -10L), ("6161", -20L), ("616161", -30L)), 8)
    val b = "aaaa".getBytes("UTF-8")
    assert(t.score(b, 0, 1) == -10L)
    assert(t.score(b, 0, 2) == -20L)
    assert(t.score(b, 0, 3) == -30L)
    assert(t.score(b, 0, 4) == Long.MinValue)
  }
}
