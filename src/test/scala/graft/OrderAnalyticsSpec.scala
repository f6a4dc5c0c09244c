package graft

import graft.operators.OrderAnalytics
import org.apache.spark.sql.functions._

/** Reference-parity semantics over crafted wire records: conditional
  * metrics, malformed JSON tolerance, day boundaries. */
class OrderAnalyticsSpec extends SparkSpec {
  import spark.implicits._

  private def wire(time: String, fee: Long, flag: String): String =
    s"""{"time":"$time","userId":"7","courseId":"42","fee":"$fee","flag":"$flag","orderId":"x"}"""

  test("daily stats: conditional count and fee, keyed by day") {
    val raw = Seq(
      wire("2024-03-01 10:00:00", 100, "1"),
      wire("2024-03-01 11:30:00", 50, "0"),   // counts toward total only
      wire("2024-03-01 23:59:59", 25, "1"),
      wire("2024-03-02 00:00:00", 10, "1")    // next day boundary
    ).toDF("value")
    val got = OrderAnalytics.dailyStatsFromWire(raw)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(got.toSeq == Seq(
      ("2024-03-01", 3L, 2L, 125.0),
      ("2024-03-02", 1L, 1L, 10.0)))
  }

  test("malformed JSON yields null fields, batch survives (PERMISSIVE)") {
    val raw = Seq(wire("2024-03-01 10:00:00", 5, "1"), "{not json at all").toDF("value")
    val parsed = OrderAnalytics.parseWire(raw)
    assert(parsed.count() == 2)
    assert(parsed.filter(col("time").isNull).count() == 1)
  }

  test("hour/minute derivation matches substring semantics") {
    val df = OrderAnalytics.withTimeParts(
      Seq(("2024-03-01 07:08:09", 1L, "1")).toDF("time", "fee", "flag"))
    val r = df.select("day", "hour", "minute").head()
    assert((r.getString(0), r.getString(1), r.getString(2)) == ("2024-03-01", "07", "08"))
  }

  test("aggregates equal a brute-force fold over random records") {
    val rnd = new scala.util.Random(42)
    val recs = (1 to 500).map { i =>
      val day = s"2024-01-${"%02d".format(1 + rnd.nextInt(5))}"
      val fee = rnd.nextInt(500).toLong
      val flag = if (rnd.nextBoolean()) "1" else "0"
      (day, fee, flag)
    }
    val raw = recs.map { case (d, f, fl) => wire(s"$d 12:00:00", f, fl) }.toDF("value")
    val got = OrderAnalytics.dailyStatsFromWire(raw).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    val expect = recs.groupBy(_._1).map { case (d, rs) =>
      d -> ((rs.size.toLong, rs.count(_._3 == "1").toLong,
        rs.filter(_._3 == "1").map(_._2).sum.toDouble))
    }
    assert(got == expect)
  }
}
