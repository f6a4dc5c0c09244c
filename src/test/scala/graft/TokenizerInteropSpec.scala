package graft

import graft.sources.{TokenizerInterop, TokenizerStore}
import org.apache.spark.sql.functions._

/** Tokenizer interop: store → export → import is bit-lossless for both
  * model families and both alphabets; the envelope fences (format,
  * version, kind) reject foreign or damaged files by name before any
  * store is touched. */
class TokenizerInteropSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(name: String): String =
    spark.conf.get("spark.sql.warehouse.dir") + s"/interop_spec_$name.json"

  private def readFile(path: String): String = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    try {
      val bos = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n >= 0) { bos.write(buf, 0, n); n = in.read(buf) }
      new String(bos.toByteArray, "UTF-8")
    } finally in.close()
  }

  private def writeFile(path: String, s: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(s.getBytes("UTF-8")) finally out.close()
  }

  private val corpus = Seq(
    (1L, "the cat sat on the mat"),
    (2L, "the cat ate the rat"),
    (3L, "naïve café 東京 🚀 mixed"),
    (4L, "the the the cat cat mat")).toDF("doc_id", "text")

  test("byte-BPE: export → import is bit-lossless and the re-export is " +
       "byte-identical; the file carries the documented envelope") {
    TokenizerStore.drop(spark, "iox")
    TokenizerStore.drop(spark, "iox_imp")
    TokenizerStore.build(spark, "iox", corpus, col("text"), nMerges = 6,
      byteLevel = true)
    val f = tmp("bpeb")
    TokenizerInterop.exportBpe(spark, "iox", f)
    val json = readFile(f)
    assert(json.contains("\"format\":\"graft-tokenizer\"") &&
      json.contains("\"kind\":\"bpe\"") &&
      json.contains("\"alphabet\":\"bytes\""), json.take(200))
    TokenizerInterop.importBpe(spark, f, "iox_imp")
    assert(TokenizerStore.loadBytes(spark, "iox_imp") ==
      TokenizerStore.loadBytes(spark, "iox"),
      "imported merges diverged from the source store")
    // the freq column survives too: re-exporting the imported store
    // yields the byte-identical file (full losslessness, not just the
    // (left, right) projection the encoder consumes)
    val f2 = tmp("bpeb2")
    TokenizerInterop.exportBpe(spark, "iox_imp", f2)
    assert(readFile(f2) == json, "re-export diverged — lossy import")
    TokenizerStore.drop(spark, "iox")
    TokenizerStore.drop(spark, "iox_imp")
  }

  test("char-BPE: the chars alphabet rides the stamp through the file, " +
       "so the imported store keeps the byte/char cross-load fence") {
    TokenizerStore.drop(spark, "ioc")
    TokenizerStore.drop(spark, "ioc_imp")
    TokenizerStore.build(spark, "ioc", corpus, col("text"), nMerges = 5)
    val f = tmp("bpec")
    TokenizerInterop.exportBpe(spark, "ioc", f)
    TokenizerInterop.importBpe(spark, f, "ioc_imp")
    assert(TokenizerStore.load(spark, "ioc_imp") ==
      TokenizerStore.load(spark, "ioc"))
    val e = intercept[IllegalArgumentException](
      TokenizerStore.loadBytes(spark, "ioc_imp"))
    assert(e.getMessage.contains("chars"), e.getMessage)
    TokenizerStore.drop(spark, "ioc")
    TokenizerStore.drop(spark, "ioc_imp")
  }

  test("byte-unigram: pieces, maxPieceLen, and emRounds all survive the " +
       "round trip; char-unigram rides buildUnigramFrom") {
    TokenizerStore.dropUnigram(spark, "iou")
    TokenizerStore.dropUnigram(spark, "iou_imp")
    TokenizerStore.buildUnigramBytes(spark, "iou", corpus, col("text"),
      maxPieceLen = 6, emRounds = 1)
    val f = tmp("unib")
    TokenizerInterop.exportUnigram(spark, "iou", f)
    assert(readFile(f).contains("\"kind\":\"unigram\""))
    TokenizerInterop.importUnigram(spark, f, "iou_imp")
    val (p0, l0) = TokenizerStore.loadUnigramBytes(spark, "iou")
    val (p1, l1) = TokenizerStore.loadUnigramBytes(spark, "iou_imp")
    assert(p0.sorted == p1.sorted && l0 == l1)
    assert(graft.sources.CatalogProps.propOption(spark,
      TokenizerStore.unigramTable("iou_imp"), "graft.tok.emrounds")
      .contains("1"))
    // char family through the same seam
    TokenizerStore.dropUnigram(spark, "iouc")
    TokenizerStore.dropUnigram(spark, "iouc_imp")
    TokenizerStore.buildUnigram(spark, "iouc", corpus, col("text"))
    val fc = tmp("unic")
    TokenizerInterop.exportUnigram(spark, "iouc", fc)
    TokenizerInterop.importUnigram(spark, fc, "iouc_imp")
    val (c0, m0) = TokenizerStore.loadUnigram(spark, "iouc")
    val (c1, m1) = TokenizerStore.loadUnigram(spark, "iouc_imp")
    assert(c0.sorted == c1.sorted && m0 == m1)
    Seq("iou", "iou_imp", "iouc", "iouc_imp")
      .foreach(TokenizerStore.dropUnigram(spark, _))
  }

  test("envelope fences: foreign format, future version, wrong kind, " +
       "damaged JSON, and a missing store all fail by name") {
    TokenizerStore.drop(spark, "iof")
    TokenizerStore.build(spark, "iof", corpus, col("text"), nMerges = 4,
      byteLevel = true)
    val f = tmp("fence")
    TokenizerInterop.exportBpe(spark, "iof", f)
    // wrong kind: a bpe file imported as unigram
    val eKind = intercept[IllegalArgumentException](
      TokenizerInterop.importUnigram(spark, f, "iof_bad"))
    assert(eKind.getMessage.contains("'bpe'") &&
      eKind.getMessage.contains("'unigram'"), eKind.getMessage)
    // future version
    writeFile(f, readFile(f).replace("\"version\":1", "\"version\":9"))
    val eVer = intercept[IllegalArgumentException](
      TokenizerInterop.importBpe(spark, f, "iof_bad"))
    assert(eVer.getMessage.contains("version"), eVer.getMessage)
    // foreign format name
    writeFile(f, """{"format":"other-tok","version":1,"kind":"bpe"}""")
    val eFmt = intercept[IllegalArgumentException](
      TokenizerInterop.importBpe(spark, f, "iof_bad"))
    assert(eFmt.getMessage.contains("graft-tokenizer"), eFmt.getMessage)
    // damaged JSON parses to an error, not a store
    writeFile(f, """{"format":"graft-tokenizer","ver""")
    intercept[Exception](TokenizerInterop.importBpe(spark, f, "iof_bad"))
    // exporting a store that does not exist fails by name
    val eMiss = intercept[IllegalArgumentException](
      TokenizerInterop.exportBpe(spark, "iof_nope", tmp("none")))
    assert(eMiss.getMessage.contains("iof_nope"), eMiss.getMessage)
    assert(!spark.catalog.tableExists(
      TokenizerStore.bpeTable("iof_bad")),
      "a fenced import must not leave a store behind")
    TokenizerStore.drop(spark, "iof")
  }
}
