package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic, distributed port of the reference's mock order generator
  * (`MockData.scala:22-43` / `KafkaProducerApp.scala:37-57`): same field
  * domains — userId 0–999, courseId 0–499, fee 0–499, flag ∈ {0,1},
  * uuid-ish orderId, wall-clock-style event time — but seeded and built
  * from `spark.range`, so any number of rows generates in parallel with
  * reproducible content (the reference used `java.util.Random` in a
  * driver-side loop of 10).
  */
object MockOrderGenerator {

  /** `n` synthetic order events spread minute-by-minute from `startDay`. */
  def orders(spark: SparkSession, n: Long, seed: Long = 42L,
             startDay: String = "2024-01-01"): DataFrame = {
    val h = (salt: Int) => abs(xxhash64(col("id"), lit(seed), lit(salt)))
    spark.range(n)
      .select(
        date_format(
          timestamp_seconds(unix_timestamp(lit(startDay), "yyyy-MM-dd")
            + col("id") * 60 + pmod(h(0), lit(60))),
          "yyyy-MM-dd HH:mm:ss").as("time"),
        pmod(h(1), lit(1000)).cast("string").as("userId"),
        pmod(h(2), lit(500)).cast("string").as("courseId"),
        pmod(h(3), lit(500)).cast("string").as("fee"),
        pmod(h(4), lit(2)).cast("string").as("flag"),
        lower(hex(h(5))).as("orderId"))
  }

  /** The Kafka wire form: one JSON string per record, all fields strings —
    * exactly what `KafkaProducerApp` produced. Write with
    * `.write.format("kafka")` (batch) or feed to a MemoryStream (tests). */
  def wireJson(orders: DataFrame): DataFrame =
    orders.select(to_json(struct(
      col("time"), col("userId"), col("courseId"),
      col("fee"), col("flag"), col("orderId"))).as("value"))
}
