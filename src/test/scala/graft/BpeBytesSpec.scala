package graft

import graft.operators.TextAnalysis
import graft.sources.TokenizerStore
import org.apache.spark.sql.functions._

/** Byte-level BPE (GPT-2-style byte fallback): hand-computed training,
  * kernel == sequential-replace on the corpus, the no-OOV id space, and
  * the exact marked round trip on non-BMP input — the property the
  * char-level tokenizer cannot have. */
class BpeBytesSpec extends SparkSpec {
  import spark.implicits._

  private def enc(texts: Seq[String],
                  merges: Seq[(String, String)]): Seq[Seq[String]] =
    texts.toDF("text")
      .select(TextAnalysis.bpeEncodeBytes(col("text"), merges))
      .collect().map(_.getSeq[String](0)).toSeq

  test("hand-computed byte training; every script participates") {
    // tokens: "aa" x3 (hex 6161), "ab" x2 (6162), "é" x1 (c3a9)
    val docs = Seq("aa aa ab", "aa ab é").toDF("text")
    val m = TextAnalysis.bpeMerges(
      TextAnalysis.bpeTrainBytes(docs, col("text"), nMerges = 3))
    // pairs round 1: (61,61) f3, (61,62) f2, (c3,a9) f1 -> merge 6161
    assert(m.head == ("61", "61"), m.toString)
    // round 2: (61,62) f2 beats (c3,a9) f1
    assert(m(1) == ("61", "62"), m.toString)
    // round 3: the non-ASCII token's pair merges too — no OOV skip
    assert(m(2) == ("a9" -> "a9") || m(2) == ("c3", "a9"), m.toString)
    assert(m(2) == ("c3", "a9"), m.toString)
    // encode applies all three; é becomes ONE merged symbol
    assert(enc(Seq("aa ab é x"), m) ==
      Seq(Seq("6161", "6162", "c3a9", "78")))
  }

  test("kernel == sequential-replace reference on the corpus; counts") {
    val docs = Tables(spark, sfDir).documents
    val merges = TextAnalysis.bpeMerges(
      TextAnalysis.bpeTrainBytes(docs, col("text"), nMerges = 12))
    assert(merges.size == 12)
    val both = docs.select(col("doc_id"),
      TextAnalysis.bpeEncodeBytes(col("text"), merges).as("fast"),
      TextAnalysis.bpeEncodeBytesViaReplace(col("text"), merges).as("ref"))
    assert(both.filter(col("fast") =!= col("ref")).count() == 0,
      "min-rank kernel diverges from the sequential-replace formulation")
    // count column = encode length everywhere
    assert(docs.select(
        (TextAnalysis.bpeEncodeBytesCount(col("text"), merges) =!=
          size(TextAnalysis.bpeEncodeBytes(col("text"), merges))).as("d"))
      .filter(col("d")).count() == 0)
  }

  test("marked round trip is EXACT on non-BMP and arbitrary input") {
    val docs = Tables(spark, sfDir).documents
    val merges = TextAnalysis.bpeMerges(
      TextAnalysis.bpeTrainBytes(docs, col("text"), nMerges = 8))
    // fixtures the char-level tokenizer cannot round-trip or even
    // count correctly: emoji (non-BMP), CJK Ext-B, combining marks,
    // the marker char itself, mixed junk
    val fixtures = Seq(
      "hello world",
      "😀 emoji 🤖🤖 end",    // 😀 🤖🤖
      "𠀀𠀁 cjk-b",                     // 𠀀𠀁
      "é combining",                                   // e + ́
      "literal ▁ marker ▁▁ inside",
      "  leading  and   trailing   ",
      "tabs\tand\nnewlines\rmix",
      "ASCII-punct !@#$%^&*() 12345",
      "")
    val df = fixtures.toDF("text").select(col("text"),
      TextAnalysis.bpeDetokenizeBytes(
        TextAnalysis.bpeEncodeBytesMarked(col("text"), merges)).as("detok"),
      array_join(TextAnalysis.tokens(col("text")), " ").as("norm"))
    val bad = df.filter(col("detok") =!= col("norm")).collect()
    assert(bad.isEmpty, bad.mkString("\n"))
    // and on the whole real corpus
    val badCorpus = docs.select(
        TextAnalysis.bpeDetokenizeBytes(
          TextAnalysis.bpeEncodeBytesMarked(col("text"), merges)).as("detok"),
        array_join(TextAnalysis.tokens(col("text")), " ").as("norm"))
      .filter(col("detok") =!= col("norm")).count()
    assert(badCorpus == 0)
  }

  test("id space: 256 base bytes + merge outputs, NO OOV id") {
    val merges = Seq("61" -> "61", "6161" -> "62")
    val vocab = TextAnalysis.bpeVocabBytes(merges).toMap
    assert(vocab("00") == 0 && vocab("62") == 0x62 && vocab("ff") == 255)
    assert(vocab("6161") == 256 && vocab("616162") == 257)
    // colliding outputs keep the lowest-rank id
    assert(TextAnalysis.bpeVocabBytes(
      Seq("61" -> "6263", "6162" -> "63", "61" -> "61"))
      .count(_._1 == "616263") == 1)
    val ids = Seq("aab é 😀").toDF("text")
      .select(TextAnalysis.bpeEncodeIdsBytes(col("text"), merges))
      .head().getSeq[Int](0)
    // aab -> 6161|62 -> merged 616162 (id 257); é/emoji stay base bytes
    assert(ids.head == 257, ids.toString)
    assert(ids.forall(_ >= 0), s"byte-level ids must never be OOV: $ids")
  }

  test("bpeTableBytes contract failures by name") {
    val eHex = intercept[Exception](enc(Seq("x"), Seq("6" -> "1")))
    assert(messageChain(eHex).contains("bpeTableBytes"), messageChain(eHex))
    val eDer = intercept[Exception](
      enc(Seq("x"), Seq("6161" -> "62", "61" -> "61")))
    assert(messageChain(eDer).contains("lower-ranked merge"),
      messageChain(eDer))
    val eDup = intercept[Exception](
      enc(Seq("x"), Seq("61" -> "62", "61" -> "62")))
    assert(messageChain(eDup).contains("duplicate merge pair"),
      messageChain(eDup))
  }

  test("TokenizerStore stamps the mode; cross-mode loads fail by name") {
    val docs = Tables(spark, sfDir).documents.limit(200)
    TokenizerStore.drop(spark, "tokb")
    TokenizerStore.build(spark, "tokb", docs, col("text"), nMerges = 5,
      byteLevel = true)
    assert(TokenizerStore.mode(spark, "tokb") == "bytes")
    val stored = TokenizerStore.loadBytes(spark, "tokb")
    val fresh = TextAnalysis.bpeMerges(
      TextAnalysis.bpeTrainBytes(docs, col("text"), nMerges = 5))
    assert(stored == fresh)
    // the char-level loader rejects a byte store by name
    val e = intercept[IllegalArgumentException](
      TokenizerStore.load(spark, "tokb"))
    assert(e.getMessage.contains("'bytes' mode") &&
      e.getMessage.contains("loadBytes"), e.getMessage)
    // and vice versa
    TokenizerStore.build(spark, "tokb", docs, col("text"), nMerges = 3)
    assert(TokenizerStore.mode(spark, "tokb") == "chars")
    val e2 = intercept[IllegalArgumentException](
      TokenizerStore.loadBytes(spark, "tokb"))
    assert(e2.getMessage.contains("'chars' mode"), e2.getMessage)
    TokenizerStore.drop(spark, "tokb")
  }
}
