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
