package graft

import org.apache.spark.sql.functions._

/** End-to-end invariants of the runnable preprocessing pipeline
  * ([[PipelineApp.run]]) on the sf test corpus. */
class PipelineAppSpec extends SparkSpec {
  import spark.implicits._

  test("pipeline app: funnel invariants hold end-to-end") {
    val docs = Tables(spark, sfDir).documents
    val cfg = PipelineApp.Config(nShards = 4, seqLen = 64, salt = "spec")
    val (sharded, packing) = PipelineApp.run(docs, cfg)
    val out = sharded.cache()

    // survivors are a subset of the input, deduplicated
    val nOut = out.count()
    assert(nOut > 0 && nOut <= docs.count())
    assert(out.select("doc_id").distinct().count() == nOut)

    // every surviving text passes the quality gate it was filtered by
    val bad = out.filter(
      graft.operators.TextAnalysis.tokenCount(col("text")) < cfg.minTokens ||
      graft.operators.TextAnalysis.langId(col("text")) =!= cfg.lang).count()
    assert(bad == 0, s"$bad docs violate the gate post-funnel")

    // shards are within range and positions are dense 1..n per shard
    val shards = out.select("shard").distinct().as[Int].collect()
    assert(shards.forall(s => s >= 0 && s < cfg.nShards))
    out.groupBy("shard").agg(count(lit(1)).as("n"), max("pos").as("mx"),
        min("pos").as("mn"))
      .collect().foreach { r =>
        assert(r.getLong(1) == r.getInt(2) && r.getInt(3) == 1,
          s"shard ${r.getInt(0)} positions not dense")
      }

    // the packing map covers exactly the surviving docs (all have >= 1
    // token post-funnel) and tiles each one completely
    val packedDocs = packing.select("doc_id").distinct()
    assert(packedDocs.count() == nOut)
    val mismatch = packing.groupBy("doc_id").agg(sum("n_toks").as("packed"))
      .join(out.select(col("doc_id"),
        graft.operators.TextAnalysis.tokenCount(col("text")).cast("long").as("n")),
        "doc_id")
      .filter(col("packed") =!= col("n")).count()
    assert(mismatch == 0, "packing does not tile some document")
    out.unpersist()
  }
}
