package graft

import graft.operators.Drift
import graft.streaming.StreamingDrift
import org.apache.spark.sql.functions._

/** Streaming drift monitor: stored-model scoring is bit-identical to
  * the batch operator, fences fail by name, and the per-batch log is
  * replay-idempotent. */
class StreamingDriftSpec extends SparkSpec {
  import spark.implicits._

  private val p = "drift_spec_store"

  test("scoreBatch == batch psi bit for bit; model survives sessions " +
       "via the catalog; fences fail by name") {
    val ref = spark.range(2000)
      .select((pmod(xxhash64(col("id")), lit(1000))).cast("double").as("v"))
    val cur = spark.range(500)
      .select((pmod(xxhash64(col("id"), lit(7)), lit(1000)) * 1.3)
        .cast("double").as("v"))
    StreamingDrift.drop(spark, p)
    try {
      StreamingDrift.provision(spark, p, ref, col("v"), nBins = 10)
      val streamed = StreamingDrift.scoreBatch(spark, p, cur, col("v"))
        .collect()(0)
      val batch = Drift.psi(ref, cur, col("v"), nBins = 10).collect()(0)
      assert(streamed == batch,
        s"stored-model scoring diverged: $streamed vs $batch")
      // drifted input reads as drift
      assert(streamed.getDouble(3) > 0.1, streamed.toString)
      // missing store fails by name
      val e = intercept[IllegalArgumentException] {
        StreamingDrift.scoreBatch(spark, "no_such_drift", cur, col("v"))
      }
      assert(e.getMessage.contains("StreamingDrift"), e.getMessage)
      // torn provision (stamp cleared) fails by name
      graft.sources.CatalogProps.setProps(spark,
        StreamingDrift.refTable(p), Map("graft.drift.complete" -> "false"))
      val e2 = intercept[IllegalArgumentException] {
        StreamingDrift.scoreBatch(spark, p, cur, col("v"))
      }
      assert(e2.getMessage.contains("completeness stamp"), e2.getMessage)
    } finally StreamingDrift.drop(spark, p)
  }

  test("token model: stored scoring == batch tokenDrift bit for bit; " +
       "fences by name") {
    val ref = Seq("aa bb aa", "aa cc", "bb dd ee aa").toDF("text")
    val cur = Seq("aa bb zz", "aa cc zz zz").toDF("text")
    StreamingDrift.drop(spark, p)
    try {
      StreamingDrift.provisionTokens(spark, p, ref, col("text"), topK = 3)
      val streamed = StreamingDrift
        .scoreBatchTokens(spark, p, cur, col("text")).collect()
      val batch = Drift.tokenDrift(ref, cur, col("text"), topK = 3).collect()
      assert(streamed.map(_.toString).toSeq == batch.map(_.toString).toSeq,
        s"stored-model token scoring diverged:\n" +
          s"${streamed.mkString("\n")}\nvs\n${batch.mkString("\n")}")
      val e = intercept[IllegalArgumentException] {
        StreamingDrift.scoreBatchTokens(spark, "no_such_tok", cur, col("text"))
      }
      assert(e.getMessage.contains("provisionTokens"), e.getMessage)
    } finally StreamingDrift.drop(spark, p)
  }

  test("stream: per-batch partitions, crash-replay idempotent") {
    val ref = spark.range(1000)
      .select((col("id") % 100).cast("double").as("v"))
    val srcDir = java.nio.file.Files.createTempDirectory("drift-src").toString
    val outDir = java.nio.file.Files.createTempDirectory("drift-out").toString
    StreamingDrift.drop(spark, p)
    try {
      StreamingDrift.provision(spark, p, ref, col("v"), nBins = 5)
      // batch 0: same distribution; batch 1: shifted
      spark.range(400).select((col("id") % 100).cast("double").as("v"))
        .coalesce(1).write.mode("append").parquet(srcDir)
      spark.range(400).select((col("id") % 100 + 60).cast("double").as("v"))
        .coalesce(1).write.mode("append").parquet(srcDir)
      StreamingDrift.stream(spark, srcDir, p, outDir,
        readerOptions = Map("maxFilesPerTrigger" -> "1")).awaitTermination()
      val log = spark.read.parquet(s"$outDir/drift")
        .orderBy(col("batch")).collect()
      assert(log.length == 2, log.mkString("\n"))
      val psis = log.map(r => r.getDouble(r.fieldIndex("psi")))
      assert(psis(0) < 0.01 && psis(1) > 0.25,
        s"batch 0 stable, batch 1 shifted: ${psis.toSeq}")
      // replay from a FRESH checkpoint: partitions overwrite, log
      // row count and values unchanged
      org.apache.commons.io.FileUtils.deleteDirectory(
        new java.io.File(s"$outDir/ckpt"))
      StreamingDrift.stream(spark, srcDir, p, outDir,
        readerOptions = Map("maxFilesPerTrigger" -> "1")).awaitTermination()
      val log2 = spark.read.parquet(s"$outDir/drift")
        .orderBy(col("batch")).collect()
      assert(log2.length == 2 &&
        log2.map(_.toString).toSeq == log.map(_.toString).toSeq,
        "replay must overwrite, not duplicate or change")
    } finally {
      StreamingDrift.drop(spark, p)
      Seq(srcDir, outDir).foreach { d =>
        org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(d))
      }
    }
  }

  test("dsir staleness stream: per-batch unseen fractions from the " +
       "stored model, novel-gram batch trips the verdict, crash-replay " +
       "idempotent, missing store fails by name up front") {
    import graft.sources.DsirStore
    val pfx = "drift_dsir_store"
    val raw = spark.range(80).select(col("id").as("doc_id"),
      concat_ws(" ", org.apache.spark.sql.functions.transform(
        sequence(lit(0), lit(9)), i =>
          concat(lit("w"), pmod(xxhash64(col("id"), i), lit(30))
            .cast("string")))).as("text"))
    val tgt = spark.range(8).select((col("id") + 500).as("doc_id"),
      lit("w1 w2 w3 w4").as("text"))
    val srcDir = java.nio.file.Files.createTempDirectory("dstale-src").toString
    val outDir = java.nio.file.Files.createTempDirectory("dstale-out").toString
    DsirStore.drop(spark, pfx)
    try {
      DsirStore.build(spark, pfx, raw, tgt, col("doc_id"), col("text"),
        ngram = 1, nBuckets = 0)
      // batch 0: in-vocabulary resample of the raw corpus; batch 1:
      // every doc carries two novel grams
      raw.limit(40).coalesce(1).write.mode("append").parquet(srcDir)
      raw.limit(40).select(col("doc_id") + 1000,
          concat(col("text"), lit(" zz9nov zz9weird")).as("text"))
        .toDF("doc_id", "text")
        .coalesce(1).write.mode("append").parquet(srcDir)
      StreamingDrift.dsirStalenessStream(spark, srcDir, pfx, outDir,
          staleFrac = 0.05,
          readerOptions = Map("maxFilesPerTrigger" -> "1"))
        .awaitTermination()
      val log = spark.read.parquet(s"$outDir/dsir_stale")
        .orderBy(col("batch")).collect()
      assert(log.length == 2, log.mkString("\n"))
      def frac(r: org.apache.spark.sql.Row) =
        r.getDouble(r.fieldIndex("unseen_frac"))
      def stale(r: org.apache.spark.sql.Row) =
        r.getBoolean(r.fieldIndex("stale"))
      assert(frac(log(0)) == 0.0 && !stale(log(0)),
        s"in-vocab batch must read 0: ${log(0)}")
      // 2 novel of 12 features per doc → 1/6 > 0.05
      assert(frac(log(1)) > 0.05 && stale(log(1)),
        s"novel-gram batch must trip: ${log(1)}")
      // replay from a fresh checkpoint: partitions overwrite
      org.apache.commons.io.FileUtils.deleteDirectory(
        new java.io.File(s"$outDir/ckpt"))
      StreamingDrift.dsirStalenessStream(spark, srcDir, pfx, outDir,
          staleFrac = 0.05,
          readerOptions = Map("maxFilesPerTrigger" -> "1"))
        .awaitTermination()
      val log2 = spark.read.parquet(s"$outDir/dsir_stale")
        .orderBy(col("batch")).collect()
      assert(log2.length == 2 &&
        log2.map(_.toString).toSeq == log.map(_.toString).toSeq,
        "replay must overwrite, not duplicate or change")
      // a missing store fails by name BEFORE the query starts
      val e = intercept[IllegalArgumentException] {
        StreamingDrift.dsirStalenessStream(spark, srcDir, "dstale_nope",
          outDir, staleFrac = 0.05)
      }
      assert(e.getMessage.contains("DsirStore.build"), e.getMessage)
    } finally {
      DsirStore.drop(spark, pfx)
      Seq(srcDir, outDir).foreach { d =>
        org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(d))
      }
    }
  }

  test("embedding model: stored-basis scoring gives psi 0 per component " +
       "on the reference itself, reads planted drift, fences by name") {
    val pe = "drift_emb_store"
    val vecs = spark.range(600).select(col("id").as("vec_id"),
      transform(sequence(lit(0), lit(5)), i =>
        (pmod(xxhash64(col("id"), i), lit(1000)).cast("double") / 500.0
          - 1.0)).as("embedding"))
    StreamingDrift.drop(spark, pe)
    try {
      StreamingDrift.provisionEmbedding(spark, pe, vecs, col("embedding"),
        k = 3, nBins = 8)
      // the reference scores itself at exactly 0 on every component
      val self = StreamingDrift.scoreBatchEmbedding(spark, pe, vecs,
        col("embedding")).orderBy("component").collect()
      assert(self.length == 3)
      assert(self.forall(r => r.getLong(1) == 8 && r.getDouble(4) == 0.0),
        self.mkString(", "))
      assert(self.forall(r => r.getLong(2) == 600 && r.getLong(3) == 600))
      // a scaled batch drifts on at least one component
      val cur = vecs.select(col("vec_id"),
        transform(col("embedding"), x => x * 2.0).as("embedding"))
      val drifted = StreamingDrift.scoreBatchEmbedding(spark, pe, cur,
        col("embedding")).collect()
      assert(drifted.exists(_.getDouble(4) > 0.05),
        drifted.mkString(", "))
      // missing store fails by name
      val e = intercept[IllegalArgumentException] {
        StreamingDrift.scoreBatchEmbedding(spark, "no_such_emb", vecs,
          col("embedding"))
      }
      assert(e.getMessage.contains("provisionEmbedding"), e.getMessage)
      // torn provision fails by name
      graft.sources.CatalogProps.setProps(spark,
        StreamingDrift.embBinsTable(pe),
        Map("graft.drift.complete" -> "false"))
      val e2 = intercept[IllegalArgumentException] {
        StreamingDrift.scoreBatchEmbedding(spark, pe, vecs,
          col("embedding"))
      }
      assert(e2.getMessage.contains("completeness stamp"), e2.getMessage)
    } finally StreamingDrift.drop(spark, pe)
  }
}
