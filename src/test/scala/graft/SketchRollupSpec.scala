package graft

import org.apache.spark.sql.functions._

/** The property q_sketch_rollup leans on: DataSketches HLL sketches are
  * MERGEABLE — the union of per-partition sketches answers exactly what
  * one sketch over the union would, and the binary survives a parquet
  * round trip (the materialized sketch table is a real table). */
class SketchRollupSpec extends SparkSpec {
  import spark.implicits._

  test("union of daily sketches == one sketch over the union; parquet round-trips") {
    val ev = Tables(spark, sfDir).events
      .select(col("user_id"),
        datediff(to_date(col("ts")), lit("1970-01-01").cast("date")).as("day"))
    val direct = ev.agg(
      hll_sketch_estimate(hll_sketch_agg(col("user_id"))).as("e"))
      .as[Long].head()
    val daily = ev.groupBy(col("day"))
      .agg(hll_sketch_agg(col("user_id")).as("sk"))
    val merged = daily.agg(
      hll_sketch_estimate(hll_union_agg(col("sk"))).as("e")).as[Long].head()
    assert(merged == direct,
      s"sketch union must equal the one-shot sketch: $merged vs $direct")
    val dir = java.nio.file.Files.createTempDirectory("skt").toString
    daily.write.parquet(s"$dir/daily")
    val reloaded = spark.read.parquet(s"$dir/daily").agg(
      hll_sketch_estimate(hll_union_agg(col("sk"))).as("e")).as[Long].head()
    assert(reloaded == direct, "persisted sketches must union identically")
    // and the estimate is actually close to exact
    val exact = ev.agg(count_distinct(col("user_id"))).as[Long].head()
    assert(math.abs(direct - exact) <= exact / 10,
      s"estimate $direct vs exact $exact")
  }
}
