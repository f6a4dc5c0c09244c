package graft

import graft.sources.Formats
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.nio.file.Files

class FormatsSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("name", StringType),
    StructField("score", DoubleType)))

  private lazy val df = Seq((1L, "a", 1.5), (2L, "b", 2.5), (3L, "c", -0.5))
    .toDF("id", "name", "score")

  test("csv round-trip preserves data under explicit schema") {
    val dir = Files.createTempDirectory("csv").toString
    Formats.writeCsv(df, dir)
    val back = Formats.readCsv(spark, dir, schema)
      .select("id", "name", "score").orderBy("id")
    assert(back.as[(Long, String, Double)].collect().toSeq ==
      Seq((1L, "a", 1.5), (2L, "b", 2.5), (3L, "c", -0.5)))
  }

  test("json-lines round-trip preserves data") {
    val dir = Files.createTempDirectory("json").toString
    Formats.writeJsonLines(df, dir)
    val back = Formats.readJsonLines(spark, dir, schema)
      .select("id", "name", "score").orderBy("id")
    assert(back.as[(Long, String, Double)].collect().toSeq ==
      Seq((1L, "a", 1.5), (2L, "b", 2.5), (3L, "c", -0.5)))
  }

  test("malformed json records land in _corrupt_record, batch survives") {
    val dir = Files.createTempDirectory("badjson")
    Files.writeString(dir.resolve("part-0.json"),
      """{"id": 1, "name": "ok", "score": 1.0}
        |{definitely not json
        |""".stripMargin)
    // Spark disallows querying only _corrupt_record straight off raw JSON;
    // materialize the parse first (documented limitation).
    val back = Formats.readJsonLines(spark, dir.toString, schema).cache()
    assert(back.count() == 2)
    assert(back.filter(col(Formats.CorruptColumn).isNotNull).count() == 1)
    assert(back.filter(col("id") === 1).count() == 1)
  }

  test("parquet write partitioned by column lays out directories") {
    val dir = Files.createTempDirectory("pq").toString
    Formats.writeParquet(df.withColumn("part", col("id") % 2), dir, Seq("part"))
    val back = Formats.readParquet(spark, dir)
    assert(back.count() == 3)
    assert(new java.io.File(dir).list().exists(_.startsWith("part=")))
  }
}
