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

  // ---- embedding (PCA-basis) twin ----

  def embBinsTable(prefix: String): String = s"${prefix}_driftembbins"
  def embAxesTable(prefix: String): String = s"${prefix}_driftembaxes"

  /** Profile the reference EMBEDDING distribution: train the PCA basis
    * on the reference ([[graft.operators.Pca.train]]), project it, and
    * persist the monitor's whole model — per-component decile
    * boundaries + reference bin counts (k × nBins rows) and the
    * projection basis itself (axis array + folded mean dot, k rows).
    * Batches are then scored with map-side dot products against the
    * STORED basis; the reference is never rescanned — the same
    * constant-cost-tap property as the numeric and token monitors. */
  def provisionEmbedding(spark: SparkSession, prefix: String,
                         reference: DataFrame, vec: Column, k: Int = 4,
                         nBins: Int = 10): Unit = {
    Bucketing.dropManagedTable(spark, embBinsTable(prefix))
    Bucketing.dropManagedTable(spark, embAxesTable(prefix))
    val model = graft.operators.Pca.train(reference, vec, k)
    val proj = graft.operators.Pca.project(
      reference.select(lit(0L).as("__id"), vec.as("__v")),
      col("__id"), col("__v"), model).localCheckpoint()
    val binRows = (0 until k).map { j =>
      val zc = col(s"z$j")
      val bs = graft.operators.Drift.refBoundaries(proj, zc, nBins)
      val counts = graft.operators.Drift.binCounts(proj, zc, bs, "ref_n")
      val allBins = spark.range(1, nBins + 1)
        .select(col("id").cast("int").as("bin"))
      val ubs = typedLit(bs)
      allBins.join(counts, Seq("bin"), "left")
        .na.fill(0L, Seq("ref_n"))
        .select(lit(j).as("component"), col("bin"), col("ref_n"),
          when(col("bin") < nBins, element_at(ubs, col("bin"))).as("ub"))
    }.reduce(_ unionByName _).localCheckpoint(true)
    binRows.write.saveAsTable(embBinsTable(prefix))
    import spark.implicits._
    val axes = model.components.zipWithIndex.map { case (comp, j) =>
      var md = 0.0
      var t = 0
      while (t < comp.length) { md += comp(t) * model.mean(t); t += 1 }
      (j, comp.toSeq, md)
    }.toSeq.toDF("component", "axis", "mean_dot").localCheckpoint(true)
    axes.write.saveAsTable(embAxesTable(prefix))
    CatalogProps.setProps(spark, embBinsTable(prefix), Map(
      "graft.drift.k" -> k.toString,
      "graft.drift.nbins" -> nBins.toString,
      "graft.drift.complete" -> "true"))
  }

  /** Score one batch's embeddings against the stored basis: k rows
    * `(component, n_bins, ref_n, cur_n, psi)`, arithmetic identical to
    * the reference-side profiling — the spec pins that scoring the
    * reference itself returns psi = 0 on every component. Map-side
    * projection (one codegen'd dot per component), one bin count per
    * component, boundaries broadcast. */
  def scoreBatchEmbedding(spark: SparkSession, prefix: String,
                          batch: DataFrame, vec: Column): DataFrame = {
    val tb = embBinsTable(prefix)
    require(spark.catalog.tableExists(tb),
      s"StreamingDrift: no embedding model table $tb — " +
        "provisionEmbedding first")
    require(CatalogProps.propOption(spark, tb, "graft.drift.complete")
        .contains("true"),
      s"StreamingDrift: $tb lacks its completeness stamp — torn " +
        "provision; re-provision")
    val k = CatalogProps.prop(spark, tb, "graft.drift.k",
      "StreamingDrift").toInt
    val nBins = CatalogProps.prop(spark, tb, "graft.drift.nbins",
      "StreamingDrift").toInt
    val bins = spark.table(tb)
    require(bins.count() == k.toLong * nBins,
      s"StreamingDrift: $tb row count disagrees with its k/nBins " +
        "stamps — partial data; re-provision")
    val axes = spark.table(embAxesTable(prefix))
      .orderBy(col("component")).collect()
    require(axes.length == k,
      s"StreamingDrift: ${embAxesTable(prefix)} holds ${axes.length} " +
        s"axes but the model is stamped k=$k — re-provision")
    import graft.functions.VectorExpressions.dotProduct
    (0 until k).map { j =>
      val axis = axes(j).getSeq[Double](1)
      val meanDot = axes(j).getDouble(2)
      val comp = bins.filter(col("component") === j)
      val bs = comp.filter(col("bin") < nBins).orderBy(col("bin"))
        .collect().map(_.getDouble(3)).toSeq
      val refCounts = comp.select(col("bin"), col("ref_n"))
      val z = dotProduct(vec.cast("array<double>"), typedLit(axis)) -
        lit(meanDot)
      val cur = graft.operators.Drift.binCounts(
        batch.select(z.as("__z")), col("__z"), bs, "cur_n")
      graft.operators.Drift.psiSummary(
        graft.operators.Drift.psiBinsWith(refCounts, cur, nBins, spark))
        .select(lit(j).as("component"), col("n_bins"), col("ref_n"),
          col("cur_n"), col("psi"))
    }.reduce(_ unionByName _)
  }

  def drop(spark: SparkSession, prefix: String): Unit = {
    Bucketing.dropManagedTable(spark, refTable(prefix))
    Bucketing.dropManagedTable(spark, tokenTable(prefix))
    Bucketing.dropManagedTable(spark, embBinsTable(prefix))
    Bucketing.dropManagedTable(spark, embAxesTable(prefix))
  }

  // ---- DSIR staleness twin (the n_unseen retrain signal) ----

  /** Expected schema of [[dsirStalenessStream]]'s parquet source. */
  val docSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType)))

  /** Drive the DSIR STALENESS monitor from parquet docs arriving in
    * `srcDir`: every micro-batch scores against the STORED importance
    * model ([[graft.sources.DsirStore.load]] — catalog tables, stable
    * across batches, loaded ONCE before the query starts so a missing
    * or torn store fails by name up front) and its one-row
    * unseen-fraction report ([[graft.operators.Dsir.stalenessReport]]
    * over the whole batch) overwrites its own `batch=<id>` partition
    * under `outDir/dsir_stale` — the replay-idempotent sink shape of
    * [[stream]]. A RISING `unseen_frac` across batch partitions is the
    * retrain signal the batch monitor (`dsir_staleness`) reads per
    * cohort; here it is read per micro-batch of the live ingest.
    * Per-batch cost: one feature-keyed exchange into the
    * vocabulary-shaped ratio table + a 1-row fold — independent of the
    * training corpus, the [[graft.operators.Dsir.scoreAgainst]]
    * contract. */
  def dsirStalenessStream(spark: SparkSession, srcDir: String,
                          storePrefix: String, outDir: String,
                          staleFrac: Double,
                          trigger: Trigger = Trigger.AvailableNow(),
                          readerOptions: Map[String, String] = Map.empty)
      : StreamingQuery = {
    val m = graft.sources.DsirStore.load(spark, storePrefix)
    spark.readStream.options(readerOptions).schema(docSchema)
      .parquet(srcDir)
      .writeStream.trigger(trigger)
      .option("checkpointLocation", s"$outDir/ckpt")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.operators.Dsir.stalenessReport(batch, m, col("doc_id"),
            col("text"), Seq("cohort" -> lit("batch")), staleFrac)
          .coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/dsir_stale/batch=$batchId")
      }
      .start()
  }
}
