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

  test("parquet bloom filters are written per enabled column and preserve reads") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("blm").toString
    val df = spark.range(10000)
      .select(col("id").as("ts"),
        pmod(xxhash64(col("id")), lit(10000L)).as("user_id"),
        (col("id") % 7).as("v"))
    Formats.writeParquetBloom(df, s"$dir/t", Seq("user_id"), expectedNdv = 10000)
    // equality-filtered read agrees with the unfiltered truth
    val target = df.select(col("user_id")).head().getLong(0)
    val expect = df.filter(col("user_id") === target).count()
    val got = Formats.readParquet(spark, s"$dir/t")
      .filter(col("user_id") === target).count()
    assert(got == expect && got >= 1)
    // the footer actually carries a bloom filter for user_id and ONLY
    // for user_id (the option is per-column, not blanket)
    val part = new java.io.File(s"$dir/t").listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    val conf = new org.apache.hadoop.conf.Configuration()
    val in = org.apache.parquet.hadoop.util.HadoopInputFile
      .fromPath(new org.apache.hadoop.fs.Path(part.getAbsolutePath), conf)
    val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
    try {
      val cols = reader.getFooter.getBlocks.get(0).getColumns
      val byName = (0 until cols.size).map(i => cols.get(i))
        .map(c => c.getPath.toDotString -> (c.getBloomFilterOffset >= 0))
        .toMap
      assert(byName("user_id"), s"user_id must carry a bloom: $byName")
      assert(!byName("v"), s"v must not: $byName")
    } finally reader.close()
  }
}
