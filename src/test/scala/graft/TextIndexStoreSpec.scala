package graft

import graft.operators.TextAnalysis
import graft.sources.TextIndexStore
import org.apache.spark.sql.functions._

class TextIndexStoreSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables(spark, sfDir).documents

  test("stored-index search equals the in-query bm25Search exactly") {
    TextIndexStore.drop(spark, "tix1")
    TextIndexStore.build(spark, "tix1", docs, col("doc_id"), col("text"))
    val direct = TextAnalysis.bm25Search(docs, col("doc_id"), col("text"),
        Seq("spark", "merge"), k = 15)
      .as[(Int, Long, Long, Double)].collect().toSeq
    val stored = TextIndexStore.search(spark, "tix1", Seq("spark", "merge"),
        k = 15).as[(Int, Long, Long, Double)].collect().toSeq
    assert(stored == direct)
    TextIndexStore.drop(spark, "tix1")
  }

  test("the term filter prunes the postings scan to the terms' buckets") {
    TextIndexStore.drop(spark, "tix2")
    TextIndexStore.build(spark, "tix2", docs, col("doc_id"), col("text"),
      nBuckets = 16)
    val plan = TextIndexStore.search(spark, "tix2", Seq("spark"), k = 5)
      .queryExecution.executedPlan.toString
    val m = "SelectedBucketsCount: (\\d+) out of 16".r.findFirstMatchIn(plan)
    assert(m.isDefined, s"expected bucket pruning on the _tf scan:\n$plan")
    assert(m.get.group(1).toInt <= 1, s"one term must probe one bucket: $plan")
    TextIndexStore.drop(spark, "tix2")
  }

  test("appended store ranks identically to a fresh build over the union") {
    TextIndexStore.drop(spark, "tix4")
    TextIndexStore.drop(spark, "tix5")
    val first = docs.filter(col("doc_id") % 2 === 0)
    val rest = docs.filter(col("doc_id") % 2 === 1)
    TextIndexStore.build(spark, "tix4", first, col("doc_id"), col("text"))
    TextIndexStore.append(spark, "tix4", rest, col("doc_id"), col("text"))
    TextIndexStore.build(spark, "tix5", docs, col("doc_id"), col("text"))
    val a = TextIndexStore.search(spark, "tix4", Seq("spark", "merge"), 15)
      .as[(Int, Long, Long, Double)].collect().toSeq
    val b = TextIndexStore.search(spark, "tix5", Seq("spark", "merge"), 15)
      .as[(Int, Long, Long, Double)].collect().toSeq
    assert(a == b, "append must be indistinguishable from rebuild")
    TextIndexStore.drop(spark, "tix4")
    TextIndexStore.drop(spark, "tix5")
  }

  test("streamed ingest: cross-batch append, replay leaves the store byte-identical") {
    val root = java.nio.file.Files.createTempDirectory("tixs").toString
    TextIndexStore.drop(spark, "tix6")
    TextIndexStore.drop(spark, "tix7")
    def land(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      val tmp = s"$root/tmp_$name"
      df.coalesce(1).write.parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      java.nio.file.Files.createDirectories(
        java.nio.file.Paths.get(s"$root/src"))
      java.nio.file.Files.move(part.toPath,
        java.nio.file.Paths.get(s"$root/src/$name.parquet"))
    }
    val w1 = docs.filter(col("doc_id") % 2 === 0)
      .select(col("doc_id"), col("text"))
    // wave 2 re-ships some wave-1 docs: admission must drop them
    val w2 = docs.filter(col("doc_id") % 2 === 1)
      .select(col("doc_id"), col("text"))
      .union(w1.limit(5))
    land("w1", w1)
    var q = TextIndexStore.stream(spark, s"$root/src", "tix6", s"$root/ckpt")
    q.awaitTermination()
    land("w2", w2)
    q = TextIndexStore.stream(spark, s"$root/src", "tix6", s"$root/ckpt")
    q.awaitTermination()
    TextIndexStore.build(spark, "tix7", docs, col("doc_id"), col("text"))
    val streamed = TextIndexStore.search(spark, "tix6", Seq("spark", "merge"),
      15).as[(Int, Long, Long, Double)].collect().toSeq
    val built = TextIndexStore.search(spark, "tix7", Seq("spark", "merge"),
      15).as[(Int, Long, Long, Double)].collect().toSeq
    assert(streamed == built, "streamed store must rank like a fresh build")
    // full replay, fresh checkpoint: every doc self-rejects at admission
    val tfBefore = spark.table("tix6_tf").groupBy("doc_id", "token")
      .agg(sum("tf")).collect().toSet
    q = TextIndexStore.stream(spark, s"$root/src", "tix6", s"$root/ckpt2")
    q.awaitTermination()
    val tfAfter = spark.table("tix6_tf").groupBy("doc_id", "token")
      .agg(sum("tf")).collect().toSet
    assert(tfAfter == tfBefore, "replay must append nothing")
    TextIndexStore.drop(spark, "tix6")
    TextIndexStore.drop(spark, "tix7")
  }

  test("stream: a torn APPEND fails the stream by name, never rebuilds from one batch") {
    val root = java.nio.file.Files.createTempDirectory("tixt").toString
    TextIndexStore.drop(spark, "tix8")
    def land(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      val tmp = s"$root/tmp_$name"
      df.coalesce(1).write.parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      java.nio.file.Files.createDirectories(
        java.nio.file.Paths.get(s"$root/src"))
      java.nio.file.Files.move(part.toPath,
        java.nio.file.Paths.get(s"$root/src/$name.parquet"))
    }
    land("w1", docs.filter(col("doc_id") < 100)
      .select(col("doc_id"), col("text")))
    var q = TextIndexStore.stream(spark, s"$root/src", "tix8", s"$root/ckpt")
    q.awaitTermination()
    val nDocs = spark.table("tix8_dl").count()
    assert(nDocs > 0)
    // simulate an append that crashed mid-write: the fence is torn
    Seq("tix8_stats", "tix8_dl", "tix8_tf").foreach(t =>
      spark.sql(s"ALTER TABLE $t SET TBLPROPERTIES " +
        "('graft.text.version'='torn_append_of_x')"))
    land("w2", docs.filter(col("doc_id") >= 100 && col("doc_id") < 150)
      .select(col("doc_id"), col("text")))
    // the stream must FAIL BY NAME — before this guard it routed to
    // build() and silently shrank the index to the replayed batch
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      TextIndexStore.stream(spark, s"$root/src", "tix8", s"$root/ckpt")
        .awaitTermination()
    }
    assert(e.getMessage.contains("torn") || Option(e.getCause).exists(
      _.getMessage.contains("torn")), e.getMessage)
    assert(spark.table("tix8_dl").count() == nDocs,
      "the torn store's data must be untouched, not shrunk to one batch")
    TextIndexStore.drop(spark, "tix8")
  }

  test("version fence: a half-dropped or torn family fails by name") {
    TextIndexStore.drop(spark, "tix3")
    TextIndexStore.build(spark, "tix3", docs, col("doc_id"), col("text"))
    spark.sql("ALTER TABLE tix3_dl SET TBLPROPERTIES " +
      "('graft.text.version'='stale')")
    val e = intercept[IllegalArgumentException] {
      TextIndexStore.search(spark, "tix3", Seq("spark"), k = 5)
    }
    assert(e.getMessage.contains("version fence"), e.getMessage)
    TextIndexStore.drop(spark, "tix3")
  }
}
