package graft

import graft.sources.Bucketing
import org.apache.spark.sql.functions._

/** Co-located joins and aggregations over bucketed tables: the plans must
  * contain NO shuffle exchange — the whole point of paying the bucketing
  * shuffle at ingest. */
class BucketingSpec extends SparkSpec {

  test("co-bucketed join and bucket-key aggregation plan without exchanges") {
    val t = Tables(spark, sfDir)
    Bucketing.writeBucketed(
      t.events.select(col("event_id"), col("user_id"), col("value")),
      "ev_bucketed", "user_id", buckets = 8)
    Bucketing.writeBucketed(
      t.events.groupBy("user_id").agg(count(lit(1)).as("n")),
      "usr_bucketed", "user_id", buckets = 8)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("ev_bucketed")
        .join(spark.table("usr_bucketed"), "user_id")
      val joinPlan = joined.queryExecution.executedPlan.toString
      assert(!joinPlan.contains("Exchange"), s"bucketed join shuffled:\n$joinPlan")
      assert(joined.count() == t.events.count())

      val agg = spark.table("ev_bucketed").groupBy("user_id")
        .agg(sum(col("value")).as("s"))
      val aggPlan = agg.queryExecution.executedPlan.toString
      assert(!aggPlan.contains("Exchange"), s"bucket-key agg shuffled:\n$aggPlan")
      assert(agg.count() == spark.table("usr_bucketed").count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS ev_bucketed")
      spark.sql("DROP TABLE IF EXISTS usr_bucketed")
    }
  }
}
