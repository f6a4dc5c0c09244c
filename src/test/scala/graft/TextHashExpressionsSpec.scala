package graft

import graft.functions.TextHashExpressions
import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** Edge cases for the byte-scanning text-hash expressions: the shingle
  * byte-range trick must hold for multibyte UTF-8, consecutive spaces,
  * and short/empty inputs. */
class TextHashExpressionsSpec extends SparkSpec {
  import spark.implicits._

  private def shinglesOf(text: String): Option[Seq[String]] = {
    val r = Seq(text).toDF("t")
      .select(TextHashExpressions.shingles(col("t"), 3)).head()
    if (r.isNullAt(0)) None else Some(r.getSeq[String](0))
  }

  /** Reference implementation: split on single space, join n consecutive
    * tokens — the semantics the oracle SQL uses. */
  private def expected(text: String, n: Int = 3): Option[Seq[String]] = {
    val toks = text.split(" ", -1).toSeq
    if (text.isEmpty || toks.length < n) None
    else Some(toks.sliding(n).map(_.mkString(" ")).toSeq.distinct)
  }

  test("shingles match split-join semantics on plain text") {
    val t = "the quick brown fox jumps"
    assert(shinglesOf(t).get == expected(t).get)
  }

  test("shingles with multibyte UTF-8 content") {
    val t = "数据 引擎 很 快 的 系统"
    assert(shinglesOf(t).get == expected(t).get)
    val mixed = "spark 数据 engine 引擎 fast 系统"
    assert(shinglesOf(mixed).get == expected(mixed).get)
  }

  test("shingles with consecutive and leading/trailing spaces") {
    for (t <- Seq("a  b c", " a b c", "a b c ", "a  b  c  d")) {
      assert(shinglesOf(t).get == expected(t).get, s"for <$t>")
    }
  }

  test("short and empty inputs yield null") {
    for (t <- Seq("", "one", "two words")) {
      assert(shinglesOf(t).isEmpty, s"for <$t>")
    }
  }

  test("minhash and simhash are non-null exactly when shingles exist, and deterministic") {
    val df = Seq("a b c d", "x y", "", "多 字 节 文 本").toDF("t")
      .select(col("t"),
        TextHashExpressions.shingleMinhash(col("t"), 3, 16).as("mh"),
        Dedup.simhash64(col("t")).as("sh"))
    val rows = df.collect()
    rows.foreach { r =>
      val hasShingles = expected(r.getString(0)).isDefined
      assert(!r.isNullAt(1) == hasShingles, s"minhash for <${r.getString(0)}>")
      assert(!r.isNullAt(2) == hasShingles, s"simhash for <${r.getString(0)}>")
    }
    // identical content → identical signatures
    val two = Seq("p q r s", "p q r s").toDF("t")
      .select(TextHashExpressions.shingleMinhash(col("t"), 3, 16)).collect()
    assert(two(0).getSeq[Long](0) == two(1).getSeq[Long](0))
  }
}
