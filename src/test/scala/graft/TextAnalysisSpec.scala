package graft

import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("token count: empty, single, multi, extra whitespace") {
    val df = Seq("", "   ", "one", "two words", "  padded   out  ").toDF("text")
    val got = df.select(TextAnalysis.tokenCount(col("text"))).as[Int].collect().toSeq
    assert(got == Seq(0, 0, 1, 2, 2))
  }

  test("langId picks the language with most stopword hits") {
    val df = Seq(
      "the cat and the dog is in a house",
      "der hund und die katze ist ein tier",
      "le chat et la maison est une idee",
      "xyzzy qwerty plugh").toDF("text")
    val got = df.select(TextAnalysis.langId(col("text"))).as[String].collect().toSeq
    assert(got == Seq("en", "de", "fr", "und"))
  }

  test("fingerprint is whitespace/case-insensitive, content-sensitive") {
    val df = Seq(
      ("a", "Hello  World"),
      ("b", "hello world"),
      ("c", " hello   WORLD  "),
      ("d", "hello worlds")).toDF("id", "text")
    val fps = df.select(col("id"), TextAnalysis.fingerprint(col("text")))
      .as[(String, String)].collect().toMap
    assert(fps("a") == fps("b") && fps("b") == fps("c"))
    assert(fps("d") != fps("a"))
  }

  test("quality features on edge-case docs") {
    val df = Seq(("1", ""), ("2", "!!! ??? ..."), ("3", ("word " * 200).trim))
      .toDF("doc_id", "text")
    val rows = TextAnalysis.qualityFeatures(df, col("doc_id"), col("text"))
      .orderBy("doc_id").collect()
    assert(rows(0).getAs[Double]("quality_score") == 0.0)      // empty
    assert(rows(1).getAs[Double]("quality_score") == 0.0)      // punct soup
    assert(rows(2).getAs[Double]("quality_score") == 1.0)      // long clean text
  }
}
