package graft.streaming

import graft.operators.Drift
import graft.sources.{Bucketing, CatalogProps}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** STREAMING drift monitor — the deployment form of
  * [[graft.operators.Drift.psi]]: the reference distribution is
  * profiled ONCE into a persisted model table (its exact-quantile bin
  * boundaries and bin counts — the monitor's entire state, nBins
  * rows), and every arriving micro-batch is scored against that fixed
  * model with one map-side bin fold + one nBins-sized aggregate — the
  * reference data itself is never rescanned, which is what makes the
  * monitor a constant-cost tap on a 100 TB ingest rather than a
  * recurring reference scan.
  *
  * The per-batch report (batch id, counts, PSI) lands in a
  * `batch=<id>` parquet partition written with OVERWRITE semantics, so
  * a crash-replayed micro-batch rewrites its own partition and the log
  * stays exactly-once without a fence table. Store fences mirror
  * [[graft.sources.TokenizerStore]]: a missing table, a torn build
  * (no completeness stamp), or a bin-count mismatch all fail BY NAME.
  */
object StreamingDrift {

  def refTable(prefix: String): String = s"${prefix}_driftref"

  /** Profile the reference and persist the monitor's model: one row
    * per bin — `(bin, ref_n, ub)` where `ub` is the bin's exclusive
    * upper boundary (null for the last bin; doubles round-trip the
    * catalog exactly). Rebuild semantics (drops any previous model
    * under the prefix). */
  def provision(spark: SparkSession, prefix: String, reference: DataFrame,
                value: Column, nBins: Int = 10): Unit = {
    Bucketing.dropManagedTable(spark, refTable(prefix))
    val bs = Drift.refBoundaries(reference, value, nBins)
    val counts = Drift.binCounts(reference, value, bs, "ref_n")
    val allBins = spark.range(1, nBins + 1)
      .select(col("id").cast("int").as("bin"))
    val ubs = typedLit(bs)
    val model = allBins.join(counts, Seq("bin"), "left")
      .na.fill(0L, Seq("ref_n"))
      .select(col("bin"), col("ref_n"),
        when(col("bin") < nBins, element_at(ubs, col("bin"))).as("ub"))
      .localCheckpoint(true)
    model.write.saveAsTable(refTable(prefix))
    // stamp LAST: a crash before this line leaves a table load rejects
    CatalogProps.setProps(spark, refTable(prefix), Map(
      "graft.drift.nbins" -> nBins.toString,
      "graft.drift.complete" -> "true"))
  }

  private def loadModel(spark: SparkSession,
                        prefix: String): (Seq[Double], DataFrame, Int) = {
    val t = refTable(prefix)
    require(spark.catalog.tableExists(t),
      s"StreamingDrift: no model table $t — provision first")
    require(CatalogProps.propOption(spark, t, "graft.drift.complete")
        .contains("true"),
      s"StreamingDrift: $t lacks its completeness stamp — torn " +
        "provision; re-provision")
    val nBins = CatalogProps.prop(spark, t, "graft.drift.nbins",
      "StreamingDrift").toInt
    val rows = spark.table(t).orderBy(col("bin")).collect()
    require(rows.length == nBins,
      s"StreamingDrift: $t holds ${rows.length} bins but is stamped " +
        s"$nBins — partial data; re-provision")
    val bs = rows.dropRight(1).map(_.getDouble(2)).toSeq
    (bs, spark.table(t).select(col("bin"), col("ref_n")), nBins)
  }

  /** Score one batch against the stored model: the 1-row
    * `(n_bins, ref_n, cur_n, psi)` summary, arithmetic identical to
    * [[graft.operators.Drift.psi]] with the same reference (the spec
    * pins the parity bit for bit). */
  def scoreBatch(spark: SparkSession, prefix: String, batch: DataFrame,
                 value: Column): DataFrame = {
    val (bs, refCounts, nBins) = loadModel(spark, prefix)
    Drift.psiSummary(Drift.psiBinsWith(refCounts,
      Drift.binCounts(batch, value, bs, "cur_n"), nBins, spark))
  }

  /** Expected schema of [[stream]]'s parquet source: one `v` double. */
  val eventSchema: StructType =
    StructType(Seq(StructField("v", DoubleType)))

  /** Drive the monitor from parquet files arriving in `srcDir`: each
    * micro-batch's summary row (plus its batch id) overwrites its own
    * `batch=<id>` partition under `outDir/drift`. */
  def stream(spark: SparkSession, srcDir: String, prefix: String,
             outDir: String,
             trigger: Trigger = Trigger.AvailableNow(),
             readerOptions: Map[String, String] = Map.empty): StreamingQuery = {
    loadModel(spark, prefix) // fail-fast before the query starts
    spark.readStream.options(readerOptions).schema(eventSchema)
      .parquet(srcDir)
      .writeStream.trigger(trigger)
      .option("checkpointLocation", s"$outDir/ckpt")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        scoreBatch(spark, prefix, batch, col("v"))
          .coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/drift/batch=$batchId")
      }
      .start()
  }

  // ---- token-distribution twin ----

  def tokenTable(prefix: String): String = s"${prefix}_drifttok"

  /** Profile the reference's TOKEN distribution: the top-K tokens with
    * their counts plus the stored rest mass and total — K+1 rows, the
    * whole vocabulary model a batch is scored against. */
  def provisionTokens(spark: SparkSession, prefix: String,
                      reference: DataFrame, text: Column,
                      topK: Int = 50): Unit = {
    Bucketing.dropManagedTable(spark, tokenTable(prefix))
    val refTok = reference
      .select(explode(graft.operators.TextAnalysis.tokens(text)).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("ref_n"))
    val top = refTok.orderBy(col("ref_n").desc, col("token")).limit(topK)
      .localCheckpoint(true)
    val total = refTok.agg(coalesce(sum(col("ref_n")), lit(0L)).as("t"))
      .head().getLong(0)
    val named = top.select(col("token").as("bucket"),
      lit(false).as("is_rest"), col("ref_n"))
    val namedSum = top.agg(coalesce(sum(col("ref_n")), lit(0L)))
      .head().getLong(0)
    val model = named.unionByName(
        spark.range(1).select(lit("").as("bucket"), lit(true).as("is_rest"),
          lit(total - namedSum).as("ref_n")))
      .localCheckpoint(true)
    model.write.saveAsTable(tokenTable(prefix))
    CatalogProps.setProps(spark, tokenTable(prefix), Map(
      "graft.drift.topk" -> topK.toString,
      "graft.drift.complete" -> "true"))
  }

  /** Score one batch's token distribution against the stored model:
    * the [[graft.operators.Drift.tokenDrift]] frame shape (bucket,
    * is_rest, ref_n, cur_n, ref_p, cur_p, gap), arithmetic identical
    * to the batch operator with the same reference — the spec pins the
    * parity. One batch scan + a (K+1)-row broadcast join. */
  def scoreBatchTokens(spark: SparkSession, prefix: String,
                       batch: DataFrame, text: Column): DataFrame = {
    val t = tokenTable(prefix)
    require(spark.catalog.tableExists(t),
      s"StreamingDrift: no token model table $t — provisionTokens first")
    require(CatalogProps.propOption(spark, t, "graft.drift.complete")
        .contains("true"),
      s"StreamingDrift: $t lacks its completeness stamp — torn " +
        "provision; re-provision")
    val model = spark.table(t)
    val curTok = batch
      .select(explode(graft.operators.TextAnalysis.tokens(text)).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("cur_n"))
    val named = broadcast(model.filter(!col("is_rest")))
      .join(curTok, col("bucket") === col("token"), "left")
      .na.fill(0L, Seq("cur_n"))
      .select(col("bucket"), col("is_rest"), col("ref_n"), col("cur_n"))
    val curTotal = broadcast(curTok.agg(
      coalesce(sum(col("cur_n")), lit(0L)).as("cur_total")))
    val namedCur = broadcast(named.agg(
      coalesce(sum(col("cur_n")), lit(0L)).as("ncur")))
    val rest = broadcast(model.filter(col("is_rest")))
      .crossJoin(namedCur).crossJoin(curTotal)
      .select(col("bucket"), col("is_rest"), col("ref_n"),
        (col("cur_total") - col("ncur")).as("cur_n"))
    val refTotal = broadcast(model.agg(
      coalesce(sum(col("ref_n")), lit(0L)).as("ref_total")))
    val refP = col("ref_n").cast("double") / col("ref_total")
    val curP = col("cur_n").cast("double") / col("cur_total")
    named.unionByName(rest)
      .crossJoin(refTotal).crossJoin(curTotal)
      .select(col("bucket"), col("is_rest"), col("ref_n"), col("cur_n"),
        graft.operators.TextAnalysis.quant6(refP).as("ref_p"),
        graft.operators.TextAnalysis.quant6(curP).as("cur_p"),
        graft.operators.TextAnalysis.quant6(abs(curP - refP)).as("gap"))
      .orderBy(col("is_rest"), col("bucket"))
  }

  def drop(spark: SparkSession, prefix: String): Unit = {
    Bucketing.dropManagedTable(spark, refTable(prefix))
    Bucketing.dropManagedTable(spark, tokenTable(prefix))
  }
}
