package graft

import graft.streaming.StreamingPca
import graft.operators.Pca
import org.apache.spark.sql.functions._

class StreamingPcaSpec extends SparkSpec {
  import spark.implicits._

  // deterministic rank-structured vectors so the spectrum is meaningful:
  // v_i = (a, 2a, b, a+b) with a,b hash-derived — rank 2 plus exact
  // linear dependence the model must discover from MERGED moments
  private def vecs(lo: Int, hi: Int) =
    (lo until hi).map { i =>
      val a = ((i * 2654435761L) % 1000L).toDouble / 100.0
      val b = ((i * 40503L + 7) % 1000L).toDouble / 100.0
      Seq(a, 2 * a, b, a + b)
    }.toDF("vec")

  private def land(root: String, name: String,
                   df: org.apache.spark.sql.DataFrame): Unit = {
    val tmp = s"$root/tmp_$name"
    df.coalesce(1).write.parquet(tmp)
    val part = new java.io.File(tmp).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(s"$root/src"))
    java.nio.file.Files.move(part.toPath,
      java.nio.file.Paths.get(s"$root/src/$name.parquet"))
  }

  test("streamed moments fit the batch model; fence absorbs replay; guards by name") {
    val root = java.nio.file.Files.createTempDirectory("spca").toString
    StreamingPca.drop(spark, "px")
    land(root, "w1", vecs(0, 400))
    land(root, "w2", vecs(400, 900))
    var q = StreamingPca.stream(spark, s"$root/src", "px", s"$root/ckpt")
    q.awaitTermination()
    val streamed = StreamingPca.model(spark, "px", k = 2)
    val batch = Pca.train(vecs(0, 900), col("vec"), k = 2)
    assert(streamed.n == 900 && streamed.dim == 4)
    // moments merged batch-by-batch vs one aggregation: FP addition
    // order differs, so compare to tight tolerance, not bit equality
    assert(streamed.eigenvalues.zip(batch.eigenvalues).forall {
      case (a, b) => math.abs(a - b) <= 1e-9 * math.max(1.0, math.abs(b))
    }, s"${streamed.eigenvalues.toSeq} vs ${batch.eigenvalues.toSeq}")
    assert(streamed.components.flatten.toSeq.zip(batch.components.flatten.toSeq)
      .forall { case (a, b) => math.abs(a - b) <= 1e-9 })
    assert(streamed.gramMaxDeviation <= 1e-9)
    // rank-2 input: the full spectrum has exactly 2 non-trivial values
    assert(streamed.allEigenvalues.count(_ > 1e-9) == 2,
      streamed.allEigenvalues.toSeq.toString)
    // full fresh-checkpoint replay: batch ids restart at 0, the fence
    // absorbs them, and the stored state stays BIT-identical — moments
    // are multiset state, so the fence is the single exactly-once layer
    val before = StreamingPca.current(spark, "px").collect()(0).getSeq[Double](0)
    q = StreamingPca.stream(spark, s"$root/src", "px", s"$root/ckpt2")
    q.awaitTermination()
    val after = StreamingPca.current(spark, "px").collect()(0).getSeq[Double](0)
    assert(before == after, "fenced replay moved the stored moments")
    assert(!StreamingPca.applyBatch(spark, "px", vecs(0, 10), 0L),
      "an already-applied batch id must fence out")
    // and the multiset honesty check: the SAME vectors under a FRESH
    // batch id DO double-weight (documented; the fence is the layer)
    assert(StreamingPca.applyBatch(spark, "px", vecs(0, 400), 99L))
    assert(StreamingPca.model(spark, "px", k = 1).n == 1300)
    // dimension change mid-stream fails by name
    val e = intercept[Exception] {
      StreamingPca.applyBatch(spark, "px",
        Seq(Seq(1.0, 2.0)).toDF("vec"), 100L)
    }
    assert(messageChain(e).contains("dimension changed"), messageChain(e))
    // a vector with null ELEMENTS fails by the applyBatch name, not an
    // opaque encoder NPE (the same in-column poison Pca.train carries)
    val eNull = intercept[Exception] {
      StreamingPca.applyBatch(spark, "px",
        Seq(Seq[java.lang.Double](1.0, null, 3.0)).toDF("vec"), 101L)
    }
    assert(messageChain(eNull).contains("StreamingPca.applyBatch") &&
      messageChain(eNull).contains("null elements"), messageChain(eNull))
    // empty store fails by name
    StreamingPca.drop(spark, "px")
    StreamingPca.provision(spark, "px")
    val e2 = intercept[Exception](StreamingPca.model(spark, "px", 1))
    assert(messageChain(e2).contains("no moments stored"), messageChain(e2))
    StreamingPca.drop(spark, "px")
  }
}
