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
