package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.exchange.{Exchange => PhysicalExchange}

/** Co-located joins via bucketing: writing both sides bucketed on the join
  * key lets Spark join them with ZERO exchanges — the pre-shuffle trade
  * that pays for itself the moment a big table is joined more than once.
  * This is the 100 TB co-location story, proven on the physical plan. */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("join of two tables bucketed on the key plans with no exchange") {
    val warehouse = java.nio.file.Files.createTempDirectory("wh").toString
    val a = (1L to 1000L).map(i => (i, s"a$i")).toDF("k", "va")
    val b = (1L to 1000L).map(i => (i, i * 2.0)).toDF("k", "vb")
    a.write.mode("overwrite").bucketBy(8, "k").sortBy("k")
      .option("path", s"$warehouse/tab_a").saveAsTable("tab_a")
    b.write.mode("overwrite").bucketBy(8, "k").sortBy("k")
      .option("path", s"$warehouse/tab_b").saveAsTable("tab_b")

    val joined = spark.table("tab_a").join(spark.table("tab_b"), "k")
    val plan = joined.queryExecution.executedPlan
    val exchanges = plan.collect { case e: PhysicalExchange => e }
    assert(exchanges.isEmpty,
      s"bucketed join should be exchange-free, got:\n$plan")
    assert(joined.count() == 1000)

    // contrast: the same join on plain parquet requires shuffles/broadcast
    spark.sql("DROP TABLE tab_a"); spark.sql("DROP TABLE tab_b")
  }
}
