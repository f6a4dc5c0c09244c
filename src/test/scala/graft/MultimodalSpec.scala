package graft

import graft.operators.Multimodal
import graft.operators.Multimodal._
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  private implicit lazy val s: org.apache.spark.sql.SparkSession = spark
  import spark.implicits._
  private lazy val media = Multimodal.synthesize(Tables(spark, sfDir).documents)

  test("synthesized media table has the contract schema and full coverage") {
    assert(media.count() == 500)
    val types = media.toDF().select("media_type").distinct()
      .collect().map(_.getString(0)).toSet
    assert(types == Set("image", "audio", "video"))
    assert(media.filter(m => m.width < 1 || m.width > 1920).count() == 0)
  }

  test("feature extraction is deterministic with stable shape") {
    val f1 = extractFeatures(media, FakeDecoder, dim = 8).collect()
      .map(f => f.media_id -> f.features.toSeq).toMap
    val f2 = extractFeatures(media, FakeDecoder, dim = 8).collect()
      .map(f => f.media_id -> f.features.toSeq).toMap
    assert(f1 == f2)
    assert(f1.values.forall(_.length == 8))
    // features reflect content: two docs with different text differ
    assert(f1(0L) != f1(1L))
  }

  test("frame sampling emits frames only for video, partitioned by record") {
    val frames = sampleFrames(media, FakeDecoder, framesPerVideo = 4)
    val perVideo = frames.groupByKey(_.media_id).count().collect()
    val nVideos = media.filter(_.media_type == "video").count()
    assert(perVideo.length == nVideos)
    assert(perVideo.forall(_._2 <= 4))
    assert(frames.collect().forall(_.frame.nonEmpty))
  }

  test("metadata summary never reads the content column off the wire") {
    val summary = metadataSummary(media)
    assert(summary.count() == 3)
    assert(summary.agg(sum("n")).head().getLong(0) == 500)
  }

  test("codec seam fails loudly, not silently") {
    val one = media.limit(1)
    val e = intercept[org.apache.spark.SparkException] {
      extractFeatures(one, CodecDecoder).collect()
    }
    assert(e.getMessage != null)
  }
}
