package graft

import graft.operators.RangeJoin
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  test("chunked range join equals the naive non-equi join, no nested loop") {
    val t = Tables(spark, sfDir)
    val points = t.events.select(col("event_id"), col("ts"))
    val windows = t.events.filter(pmod(col("event_id"), lit(97)) === 0)
      .select(col("event_id").as("window_id"), col("ts").as("w_start"),
        (col("ts") + expr("INTERVAL 2 HOURS")).as("w_end"))

    val chunked = RangeJoin.pointInInterval(points, col("ts"),
      windows, col("w_start"), col("w_end"))
    val naive = points.join(windows,
      col("ts") >= col("w_start") && col("ts") < col("w_end"))

    val got = chunked.select(col("event_id"), col("window_id"))
      .as[(Long, Long)].collect().toSet
    val want = naive.select(col("event_id"), col("window_id"))
      .as[(Long, Long)].collect().toSet
    assert(want.nonEmpty)
    assert(got == want)
    // duplicates impossible: a point's chunk meets each interval once
    assert(chunked.count() == got.size)

    // the point of the operator: an equi-join plan, not a nested loop
    val chunkedPlan = chunked.queryExecution.executedPlan.toString
    assert(!chunkedPlan.contains("BroadcastNestedLoopJoin"), chunkedPlan)
    val naivePlan = naive.queryExecution.executedPlan.toString
    assert(naivePlan.contains("BroadcastNestedLoopJoin"),
      s"naive plan unexpectedly not a nested loop:\n$naivePlan")
  }
}
