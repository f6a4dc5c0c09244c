package graft

import graft.operators.{AsOfJoin, Retention, Sessionize}
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Sessionization, as-of join, and SQL extension registration. */
class EventOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("sessionize splits on gap and numbers sessions per key") {
    val df = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1.0),
      (1L, ts("2024-01-01 10:10:00"), 2.0),   // same session (10 min)
      (1L, ts("2024-01-01 11:00:00"), 3.0),   // 50 min gap -> new session
      (2L, ts("2024-01-01 10:00:00"), 4.0)
    ).toDF("user_id", "ts", "value")
    val got = Sessionize.byGap(df, col("user_id"), col("ts"), 1800L)
      .select("user_id", "ts", "session_id")
      .as[(Long, Timestamp, Long)].collect().toSet
    assert(got == Set(
      (1L, ts("2024-01-01 10:00:00"), 1L),
      (1L, ts("2024-01-01 10:10:00"), 1L),
      (1L, ts("2024-01-01 11:00:00"), 2L),
      (2L, ts("2024-01-01 10:00:00"), 1L)))
  }

  test("sessionize: exactly-gap boundary stays in the same session") {
    val df = Seq(
      (1L, ts("2024-01-01 10:00:00"), 1.0),
      (1L, ts("2024-01-01 10:30:00"), 1.0)    // exactly 1800 s: not > gap
    ).toDF("user_id", "ts", "value")
    val sessions = Sessionize.byGap(df, col("user_id"), col("ts"), 1800L)
      .select("session_id").as[Long].collect().toSet
    assert(sessions == Set(1L))
  }

  test("cohort retention: first-seen day buckets, distinct-active offsets") {
    val df = Seq(
      (1L, ts("2024-01-01 09:00:00")),  // u1 cohort 01-01
      (1L, ts("2024-01-01 18:00:00")),  // same day, still one active-day
      (1L, ts("2024-01-03 10:00:00")),  // offset 2
      (2L, ts("2024-01-01 12:00:00")),  // u2 cohort 01-01
      (2L, ts("2024-01-02 12:00:00")),  // offset 1
      (3L, ts("2024-01-02 08:00:00"))   // u3 cohort 01-02
    ).toDF("user_id", "ts")
    val got = Retention.cohortRetention(df, col("user_id"), col("ts"))
      .as[(java.sql.Date, Long, Long)].collect().toSet
    val d1 = java.sql.Date.valueOf("2024-01-01")
    val d2 = java.sql.Date.valueOf("2024-01-02")
    assert(got == Set((d1, 0L, 2L), (d1, 1L, 1L), (d1, 2L, 1L), (d2, 0L, 1L)))
  }

  test("as-of backward join picks latest right row at or before left ts") {
    val left = Seq(
      (100L, 1L, ts("2024-01-05 00:00:00")),
      (101L, 1L, ts("2024-01-10 00:00:00")),
      (102L, 1L, ts("2024-01-02 00:00:00")),  // before any right row
      (103L, 2L, ts("2024-01-05 00:00:00"))
    ).toDF("event_id", "k", "ts")
    val right = Seq(
      (1L, ts("2024-01-03 00:00:00"), "r1a"),
      (1L, ts("2024-01-05 00:00:00"), "r1b"), // equal ts: inclusive match
      (1L, ts("2024-01-08 00:00:00"), "r1c"),
      (2L, ts("2024-01-01 00:00:00"), "r2a")
    ).toDF("k", "rts", "tag")
    val got = AsOfJoin.backward(left, right,
        col("k"), col("k"), col("ts"), col("rts"), Seq("tag" -> col("tag")))
      .select("event_id", "tag").as[(Long, Option[String])].collect().toMap
    assert(got == Map(
      100L -> Some("r1b"), 101L -> Some("r1c"), 102L -> None, 103L -> Some("r2a")))
  }

  test("extensions register SQL functions: simhash64 / shingle_minhash") {
    val r = spark.sql(
      """SELECT simhash64('a b c d e') AS sh,
                size(shingle_minhash('a b c d e', 3, 16)) AS k""").head()
    assert(r.getLong(0) != 0L)
    assert(r.getInt(1) == 16)
    // SQL function and Column API agree
    val viaCol = Seq("a b c d e").toDF("t")
      .select(graft.functions.TextHashExpressions.simhash64(col("t"))).head().getLong(0)
    assert(r.getLong(0) == viaCol)
  }

  test("extensions register SQL functions: span_hashes / offset hyperplane bucket") {
    val r = spark.sql(
      """SELECT size(span_hashes('a b c d e f g', 6)) AS n,
                span_hashes('a b c d e f g', 6)[0] AS h0,
                hyperplane_lsh_bucket(array(1.0d, -1.0d), 4, 8) AS bkt""").head()
    assert(r.getInt(0) == 2)   // 7 tokens, 6-gram windows at 2 positions
    val viaCol = Seq("a b c d e f g").toDF("t")
      .select(graft.functions.TextHashExpressions.spanHashes(col("t"), 6))
      .head().getSeq[Long](0)
    assert(r.getLong(1) == viaCol.head)
    val bktCol = Seq((Seq(1.0, -1.0), 0)).toDF("v", "x")
      .select(graft.functions.VectorExpressions
        .hyperplaneLshBucket(col("v"), 4, planeOffset = 8))
      .head().getLong(0)
    assert(r.getLong(2) == bktCol)
  }

  test("extensions register SQL functions: jaccard / shingles / vector ops") {
    val r = spark.sql(
      """SELECT shingle_jaccard('a b c d', 'a b c e') AS j,
                size(shingles('a b c d')) AS ns,
                vector_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d,
                hyperplane_lsh_bucket(array(1.0d, -1.0d), 4) AS bkt""").head()
    // sets {abc,bcd} vs {abc,bce}: intersection 1, union 3
    assert(math.abs(r.getDouble(0) - 1.0 / 3) < 1e-15)
    assert(r.getInt(1) == 2)
    assert(r.getDouble(2) == 11.0)
    val viaCol = Seq((Seq(1.0, -1.0), 0)).toDF("v", "x")
      .select(graft.functions.VectorExpressions.hyperplaneLshBucket(col("v"), 4))
      .head().getLong(0)
    assert(r.getLong(3) == viaCol)
  }

  test("extensions register repetition_stats; kernel handles UTF-8 and NBSP") {
    val r = spark.sql(
      "SELECT repetition_stats('go go stop') AS r").select("r.*").head()
    assert((r.getInt(0), r.getInt(1), r.getInt(2), r.getInt(3)) == ((3, 2, 2, 1)))
    // multi-byte tokens count correctly; U+00A0 (non-breaking space, a
    // multi-byte sequence) is NOT a separator — matches Java \s semantics.
    // The NBSP is spliced in via its escape so no invisible byte hides in
    // the literal: the last "token" is a<NBSP>b, so 5 tokens, 3 distinct.
    val nbsp = "\u00a0"
    val u = spark.sql(s"SELECT repetition_stats('日本 語 日本 語 a${nbsp}b') AS r")
      .select("r.*").head()
    assert((u.getInt(0), u.getInt(1), u.getInt(2)) == ((5, 3, 2)))
  }
}
