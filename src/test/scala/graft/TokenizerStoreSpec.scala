package graft

import graft.operators.TextAnalysis
import graft.sources.{CatalogProps, TokenizerStore}
import org.apache.spark.sql.functions._

/** Persisted tokenizer: stored merges == freshly trained ones, encode
  * parity through the store, and every torn-state fence fires by name. */
class TokenizerStoreSpec extends SparkSpec {
  import spark.implicits._

  test("build -> load round trip, encode parity, rebuild semantics, fences") {
    val docs = Tables(spark, sfDir).documents
    TokenizerStore.drop(spark, "tokx")
    assert(!TokenizerStore.isComplete(spark, "tokx"))
    TokenizerStore.build(spark, "tokx", docs, col("text"), nMerges = 8)
    assert(TokenizerStore.isComplete(spark, "tokx"))
    val stored = TokenizerStore.load(spark, "tokx")
    val fresh = TextAnalysis.bpeMerges(
      TextAnalysis.bpeTrain(docs, col("text"), nMerges = 8))
    assert(stored == fresh, "stored merges differ from a fresh training")
    // applying the LOADED model reproduces the in-session encode exactly
    val diff = docs.limit(100).select(
        TextAnalysis.bpeEncode(col("text"), stored).as("a"),
        TextAnalysis.bpeEncode(col("text"), fresh).as("b"))
      .filter(col("a") =!= col("b")).count()
    assert(diff == 0)
    // rebuild with a different size replaces, not appends
    TokenizerStore.build(spark, "tokx", docs, col("text"), nMerges = 3)
    assert(TokenizerStore.load(spark, "tokx").size == 3)
    // a store missing its completeness stamp (torn build) loads by name
    CatalogProps.setProps(spark, TokenizerStore.bpeTable("tokx"),
      Map("graft.tok.complete" -> "torn"))
    val e1 = intercept[IllegalArgumentException](
      TokenizerStore.load(spark, "tokx"))
    assert(e1.getMessage.contains("completeness stamp"), e1.getMessage)
    // a stamped count disagreeing with the rows read fails by name
    CatalogProps.setProps(spark, TokenizerStore.bpeTable("tokx"),
      Map("graft.tok.complete" -> "true", "graft.tok.nmerges" -> "7"))
    val e2 = intercept[IllegalArgumentException](
      TokenizerStore.load(spark, "tokx"))
    assert(e2.getMessage.contains("partial data"), e2.getMessage)
    // a missing table fails by name
    TokenizerStore.drop(spark, "tokx")
    val e3 = intercept[IllegalArgumentException](
      TokenizerStore.load(spark, "tokx"))
    assert(e3.getMessage.contains("no table"), e3.getMessage)
  }

  test("unigram store: build -> load round trip, segmentation parity, " +
       "torn-build and partial-data fences") {
    import graft.operators.TextAnalysis
    import graft.sources.{CatalogProps, TokenizerStore}
    val docs = Seq((1L, "ab ab b cd cd cd")).toDF("doc_id", "text")
    TokenizerStore.buildUnigram(spark, "utokx", docs, col("text"))
    val (pieces, maxLen) = TokenizerStore.loadUnigram(spark, "utokx")
    assert(maxLen == 4)
    // stored model segments exactly like the freshly-trained one
    val fresh = TextAnalysis.unigramPieces(
      TextAnalysis.unigramTrain(docs, col("text")))
    assert(pieces.toMap == fresh.toMap, pieces.toString)
    val seg = docs.select(
      TextAnalysis.unigramSegment(col("text"), pieces, maxLen).as("s"))
      .select(col("s.logp_micro"), col("s.n_pieces")).collect()(0)
    val segF = docs.select(
      TextAnalysis.unigramSegment(col("text"), fresh).as("s"))
      .select(col("s.logp_micro"), col("s.n_pieces")).collect()(0)
    assert(seg == segF, s"$seg vs $segF")
    // torn build rejected by name
    CatalogProps.setProps(spark, TokenizerStore.unigramTable("utokx"),
      Map("graft.tok.complete" -> "torn"))
    val e1 = intercept[IllegalArgumentException](
      TokenizerStore.loadUnigram(spark, "utokx"))
    assert(e1.getMessage.contains("completeness stamp"), e1.getMessage)
    // stamped-count mismatch rejected by name
    CatalogProps.setProps(spark, TokenizerStore.unigramTable("utokx"),
      Map("graft.tok.complete" -> "true", "graft.tok.npieces" -> "3"))
    val e2 = intercept[IllegalArgumentException](
      TokenizerStore.loadUnigram(spark, "utokx"))
    assert(e2.getMessage.contains("partial data"), e2.getMessage)
    TokenizerStore.dropUnigram(spark, "utokx")
    val e3 = intercept[IllegalArgumentException](
      TokenizerStore.loadUnigram(spark, "utokx"))
    assert(e3.getMessage.contains("no table"), e3.getMessage)
  }

  test("BYTE unigram store: fast-trained build -> load round trip, " +
       "segmentation parity on full-Unicode text, alphabet cross-load " +
       "fences both ways") {
    import graft.operators.TextAnalysis
    import graft.sources.TokenizerStore
    val docs = Seq((1L, "café café 🚀 ab ab"),
      (2L, "ab café 東京")).toDF("doc_id", "text")
    TokenizerStore.buildUnigramBytes(spark, "utokb", docs, col("text"),
      emRounds = 1)
    val (pieces, maxLen) = TokenizerStore.loadUnigramBytes(spark, "utokb")
    assert(maxLen == 8)
    // stored model == the fast trainer's fresh output, and it segments
    // identically
    val fresh = TextAnalysis.unigramPieces(
      TextAnalysis.unigramTrainBytesFast(docs, col("text"), emRounds = 1))
    assert(pieces.toMap == fresh.toMap)
    val seg = docs.orderBy("doc_id").select(
        TextAnalysis.unigramSegmentBytes(col("text"), pieces, maxLen)
          .as("s"))
      .select(col("s.logp_micro"), col("s.n_pieces")).collect().toSeq
    val segF = docs.orderBy("doc_id").select(
        TextAnalysis.unigramSegmentBytes(col("text"), fresh).as("s"))
      .select(col("s.logp_micro"), col("s.n_pieces")).collect().toSeq
    assert(seg == segF)
    // a byte model refuses the char loader, and vice versa — by name
    val e1 = intercept[IllegalArgumentException](
      TokenizerStore.loadUnigram(spark, "utokb"))
    assert(e1.getMessage.contains("BYTE-level"), e1.getMessage)
    TokenizerStore.buildUnigram(spark, "utokc",
      Seq((1L, "ab ab b")).toDF("doc_id", "text"), col("text"))
    val e2 = intercept[IllegalArgumentException](
      TokenizerStore.loadUnigramBytes(spark, "utokc"))
    assert(e2.getMessage.contains("CHAR-level"), e2.getMessage)
    TokenizerStore.dropUnigram(spark, "utokb")
    TokenizerStore.dropUnigram(spark, "utokc")
  }
}
