package graft.sources

import graft.operators.TextAnalysis
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Persisted trained tokenizer (the BPE merge table) — the deployment
  * shape the in-query training deliberately avoids: train ONCE
  * ([[graft.operators.TextAnalysis.bpeTrain]]'s corpus passes), persist,
  * and APPLY from any later session, stream, or cluster without
  * retraining — the same train/store/probe split as the ANN sidecars
  * and the BM25 index, at the tokenizer's (model-sized) scale.
  *
  * One catalog table `<prefix>_bpe` `(rank, left, right, freq)`, stamped
  * with the merge count and a completeness marker written LAST: a torn
  * build or a mistakenly-pointed prefix is a NAMED failure at load time,
  * never a silently-truncated merge list — a missing tail of merges
  * would re-segment every downstream document differently, the worst
  * kind of quiet corruption for a training corpus. */
object TokenizerStore {

  def bpeTable(prefix: String): String = s"${prefix}_bpe"

  /** Train `nMerges` rules on the corpus and persist them. Drops any
    * previous store under the prefix first (rebuild semantics).
    * `byteLevel = true` trains the byte-alphabet tokenizer
    * ([[TextAnalysis.bpeTrainBytes]]); the MODE is stamped into the
    * catalog and fenced at load — applying a byte-level table with the
    * char-level encoder (or vice versa) would re-segment every document
    * silently, so the two load paths reject each other by name. */
  def build(spark: SparkSession, prefix: String, docs: DataFrame,
            text: Column, nMerges: Int, byteLevel: Boolean = false): Unit =
    // the delta-updated trainer: bit-identical merges
    // (BpeFastTrainSpec + the text_bpe_train_fast oracle), one corpus
    // scan regardless of nMerges — production vocabulary depths train
    // at the same job count as 8 merges
    buildFrom(spark, prefix,
      if (byteLevel) TextAnalysis.bpeTrainBytesFast(docs, text, nMerges)
      else TextAnalysis.bpeTrainFast(docs, text, nMerges),
      byteLevel)

  /** Persist an ALREADY-TRAINED merge model (any [[TextAnalysis]]
    * trainer's output frame) under the prefix — the hand-off for callers
    * that train once and store, e.g. the production-depth scale probe. */
  def buildFrom(spark: SparkSession, prefix: String, trained: DataFrame,
                byteLevel: Boolean): Unit = {
    Bucketing.dropManagedTable(spark, bpeTable(prefix))
    val model = trained
      .localCheckpoint(true) // model-sized; pin before count + write
    val n = model.count()
    model.write.saveAsTable(bpeTable(prefix))
    // marker LAST: a crash before this line leaves a table without its
    // completeness stamp, which load rejects by name
    CatalogProps.setProps(spark, bpeTable(prefix), Map(
      "graft.tok.nmerges" -> n.toString,
      "graft.tok.mode" -> (if (byteLevel) "bytes" else "chars"),
      "graft.tok.complete" -> "true"))
  }

  /** The stamped mode of a store; pre-mode stores (no stamp) were all
    * char-trained, so absence reads as "chars". */
  def mode(spark: SparkSession, prefix: String): String =
    CatalogProps.propOption(spark, bpeTable(prefix), "graft.tok.mode")
      .getOrElse("chars")

  def isComplete(spark: SparkSession, prefix: String): Boolean =
    spark.catalog.tableExists(bpeTable(prefix)) &&
      CatalogProps.propOption(spark, bpeTable(prefix), "graft.tok.complete")
        .contains("true")

  /** Rank-ordered CHAR-LEVEL merges from the store — the argument every
    * [[graft.operators.TextAnalysis.bpeEncode]]-family call takes. Fails
    * by name on a missing table, an unstamped (torn) store, a row count
    * disagreeing with the stamped merge count, or a store trained in
    * byte-level mode (use [[loadBytes]]). */
  def load(spark: SparkSession, prefix: String): Seq[(String, String)] =
    loadMode(spark, prefix, "chars")

  /** Rank-ordered BYTE-LEVEL merges — the argument the
    * [[graft.operators.TextAnalysis.bpeEncodeBytes]] family takes. Same
    * fences as [[load]], rejecting a char-level store by name. */
  def loadBytes(spark: SparkSession, prefix: String): Seq[(String, String)] =
    loadMode(spark, prefix, "bytes")

  private def loadMode(spark: SparkSession, prefix: String,
                       want: String): Seq[(String, String)] = {
    require(spark.catalog.tableExists(bpeTable(prefix)),
      s"TokenizerStore: no table ${bpeTable(prefix)} — build with " +
        "TokenizerStore.build")
    require(isComplete(spark, prefix),
      s"TokenizerStore ${bpeTable(prefix)} lacks its completeness stamp — " +
        "torn build; rebuild with TokenizerStore.build")
    val got = mode(spark, prefix)
    require(got == want,
      s"TokenizerStore ${bpeTable(prefix)} was trained in '$got' mode but " +
        s"was loaded for the '$want' encoder — the two alphabets would " +
        "re-segment every document silently; load with " +
        (if (got == "bytes") "loadBytes" else "load") + " instead")
    val declared = CatalogProps.prop(spark, bpeTable(prefix),
      "graft.tok.nmerges", "TokenizerStore").toLong
    val merges = TextAnalysis.bpeMerges(spark.table(bpeTable(prefix)))
    require(merges.size.toLong == declared,
      s"TokenizerStore ${bpeTable(prefix)}: stamped $declared merges but " +
        s"read ${merges.size} — partial data; rebuild with TokenizerStore.build")
    merges
  }

  def drop(spark: SparkSession, prefix: String): Unit =
    Bucketing.dropManagedTable(spark, bpeTable(prefix))

  // ---- unigram (SentencePiece-family) model store ----------------------

  def unigramTable(prefix: String): String = s"${prefix}_unigram"

  /** Train the frequency-initialized unigram piece table
    * ([[TextAnalysis.unigramTrain]]) and persist it under the prefix —
    * the same build/stamp/fence lifecycle as the BPE store: piece count
    * and maxPieceLen stamped, completeness marker written LAST so a
    * torn build is rejected by name at load. */
  def buildUnigram(spark: SparkSession, prefix: String, docs: DataFrame,
                   text: Column, maxPieceLen: Int = 4,
                   minCount: Long = 2L): Unit =
    buildUnigramFrom(spark, prefix,
      TextAnalysis.unigramTrain(docs, text, maxPieceLen, minCount),
      maxPieceLen)

  /** Persist an ALREADY-TRAINED char-level unigram model under the
    * prefix — the [[buildFrom]] hand-off for the char alphabet (the
    * byte twin is [[buildUnigramBytesFrom]]); the import half of
    * [[TokenizerInterop]] needs exactly this seam. */
  def buildUnigramFrom(spark: SparkSession, prefix: String,
                       trained: DataFrame, maxPieceLen: Int): Unit = {
    Bucketing.dropManagedTable(spark, unigramTable(prefix))
    val model = trained.localCheckpoint(true)
    val n = model.count()
    model.write.saveAsTable(unigramTable(prefix))
    CatalogProps.setProps(spark, unigramTable(prefix), Map(
      "graft.tok.npieces" -> n.toString,
      "graft.tok.maxlen" -> maxPieceLen.toString,
      "graft.tok.complete" -> "true"))
  }

  /** The stored unigram model as `(pieces, maxLen)` — the two arguments
    * [[TextAnalysis.unigramSegment]] takes. Fails by name on a missing
    * table, a torn build, or a row count disagreeing with the stamp. */
  def loadUnigram(spark: SparkSession,
                  prefix: String): (Seq[(String, Long)], Int) = {
    val t = unigramTable(prefix)
    require(spark.catalog.tableExists(t),
      s"TokenizerStore: no table $t — build with " +
        "TokenizerStore.buildUnigram")
    require(CatalogProps.propOption(spark, t, "graft.tok.complete")
        .contains("true"),
      s"TokenizerStore $t lacks its completeness stamp — torn build; " +
        "rebuild with TokenizerStore.buildUnigram")
    val declared = CatalogProps.prop(spark, t, "graft.tok.npieces",
      "TokenizerStore").toLong
    val maxLen = CatalogProps.prop(spark, t, "graft.tok.maxlen",
      "TokenizerStore").toInt
    require(!CatalogProps.propOption(spark, t, "graft.tok.alphabet")
        .contains("bytes"),
      s"TokenizerStore $t holds a BYTE-level model — load with " +
        "TokenizerStore.loadUnigramBytes")
    // stamp check FIRST (a cheap model-table count), then the hand-off
    // with the stamped count as its cap — a model legitimately stored
    // past unigramPieces' default maxPieces must stay loadable
    val actual = spark.table(t).count()
    require(actual == declared,
      s"TokenizerStore $t: stamped $declared pieces but holds " +
        s"$actual — partial data; rebuild with " +
        "TokenizerStore.buildUnigram")
    val pieces = TextAnalysis.unigramPieces(spark.table(t),
      maxPieces = math.max(declared, 1L).min(Int.MaxValue.toLong).toInt)
    (pieces, maxLen)
  }

  def dropUnigram(spark: SparkSession, prefix: String): Unit =
    Bucketing.dropManagedTable(spark, unigramTable(prefix))

  /** Train the BYTE-level unigram model through the production-depth
    * fast trainer ([[TextAnalysis.unigramTrainBytesFast]]: one corpus
    * scan, measured driver guard, driver-local init + `emRounds`
    * hard-EM) and persist it under the prefix — same lifecycle as the
    * char store plus an `alphabet = bytes` stamp so the two model kinds
    * can never be cross-loaded silently. */
  def buildUnigramBytes(spark: SparkSession, prefix: String, docs: DataFrame,
                        text: Column, maxPieceLen: Int = 8,
                        minCount: Long = 2L, emRounds: Int = 0,
                        minWordFreq: Long = 1L,
                        maxTableBytes: Long = 2L << 30): Unit = {
    buildUnigramBytesFrom(spark, prefix,
      TextAnalysis.unigramTrainBytesFast(docs, text, maxPieceLen, minCount,
        emRounds, minWordFreq, maxTableBytes),
      maxPieceLen, emRounds)
  }

  /** Persist an ALREADY-TRAINED byte-level unigram model (any
    * [[TextAnalysis]] unigram trainer's output frame) under the prefix
    * — the [[buildFrom]] hand-off for callers that train once and
    * store, e.g. the production-depth scale probe. */
  def buildUnigramBytesFrom(spark: SparkSession, prefix: String,
                            trained: DataFrame, maxPieceLen: Int,
                            emRounds: Int = 0): Unit = {
    Bucketing.dropManagedTable(spark, unigramTable(prefix))
    val model = trained.localCheckpoint(true)
    val n = model.count()
    model.write.saveAsTable(unigramTable(prefix))
    CatalogProps.setProps(spark, unigramTable(prefix), Map(
      "graft.tok.npieces" -> n.toString,
      "graft.tok.maxlen" -> maxPieceLen.toString,
      "graft.tok.alphabet" -> "bytes",
      "graft.tok.emrounds" -> emRounds.toString,
      "graft.tok.complete" -> "true"))
  }

  /** The stored BYTE-level model as `(pieces, maxLen)` — the arguments
    * [[TextAnalysis.unigramSegmentBytes]] takes. Fails by name on a
    * missing table, a torn build, a char-level model under the prefix,
    * or a row count disagreeing with the stamp. */
  def loadUnigramBytes(spark: SparkSession,
                       prefix: String): (Seq[(String, Long)], Int) = {
    val t = unigramTable(prefix)
    require(spark.catalog.tableExists(t),
      s"TokenizerStore: no table $t — build with " +
        "TokenizerStore.buildUnigramBytes")
    require(CatalogProps.propOption(spark, t, "graft.tok.complete")
        .contains("true"),
      s"TokenizerStore $t lacks its completeness stamp — torn build; " +
        "rebuild with TokenizerStore.buildUnigramBytes")
    require(CatalogProps.propOption(spark, t, "graft.tok.alphabet")
        .contains("bytes"),
      s"TokenizerStore $t holds a CHAR-level model — load with " +
        "TokenizerStore.loadUnigram")
    val declared = CatalogProps.prop(spark, t, "graft.tok.npieces",
      "TokenizerStore").toLong
    val maxLen = CatalogProps.prop(spark, t, "graft.tok.maxlen",
      "TokenizerStore").toInt
    // stamp check FIRST, then the hand-off with the stamped count as
    // its cap: a web-scale byte model legitimately exceeds
    // unigramPieces' default maxPieces (the scale probe's own 16-byte
    // model needs 4<<20) and must stay loadable
    val actual = spark.table(t).count()
    require(actual == declared,
      s"TokenizerStore $t: stamped $declared pieces but holds " +
        s"$actual — partial data; rebuild with " +
        "TokenizerStore.buildUnigramBytes")
    val pieces = TextAnalysis.unigramPieces(spark.table(t),
      maxPieces = math.max(declared, 1L).min(Int.MaxValue.toLong).toInt)
    (pieces, maxLen)
  }
}
