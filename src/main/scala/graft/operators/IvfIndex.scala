package graft.operators

import graft.functions.VectorExpressions.nearestCentroid
import graft.functions.VectorFunctions.dot
import graft.functions.VectorMeanAggregator
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF (inverted-file) ANN index: a k-means coarse quantizer partitions
  * the corpus into `k` lists; a query scores only the `nProbe` nearest
  * lists. The alternative scale path to hyperplane LSH
  * ([[Similarity.lshTopK]]) — better suited to clustered corpora, at the
  * cost of a training pass.
  *
  * Spark-first construction, sized for a 100 TB corpus: each Lloyd
  * iteration is exactly ONE corpus scan — a partial-merged
  * [[VectorMeanAggregator]] groupBy whose k result rows are collected to
  * the driver (k vectors, a few KB) and re-embedded in the plan as a
  * [[graft.functions.VectorExpressions.NearestCentroid]] literal. The
  * assignment step is therefore a pure per-row projection: no
  * corpus×k fan-out, no N×k shuffle, no window. The final `assigned`
  * frame's lineage is one scan + one expression, and `centroids` is a
  * local relation, so downstream consumers ([[probeTopK]]) never
  * re-execute the k-means. This mirrors how Spark MLlib's KMeans
  * broadcasts its (tiny) centroid state rather than joining against it.
  */
object IvfIndex {

  /** corpus: (vec_id, vec, norm) as produced by [[Similarity.prepared]].
    * Returns (assigned, centroids): assigned = corpus + centroid_id;
    * centroids = (centroid_id, cvec, cnorm), a local relation of ≤ k rows.
    * Deterministic: k-means init is xxhash64(vec_id) % k (hashed so a
    * systematic sample cannot alias the init onto few residues);
    * assignment argmin ties break to the lowest centroid_id. Centroid ids
    * are re-numbered to the dense range 0..m-1 after the first
    * aggregation (empty initial lists drop out). */
  def build(corpus: DataFrame, k: Int, iters: Int = 2): (DataFrame, DataFrame) = {
    val spark = corpus.sparkSession
    val vmean = udaf(VectorMeanAggregator)

    def centroidsFor(assign: Column): Seq[Seq[Double]] =
      corpus.withColumn("centroid_id", assign)
        .groupBy("centroid_id").agg(vmean(col("vec")).as("cvec"))
        .collect()
        // a null group collects rows whose vectors failed the argmin
        // (dim mismatch — dirty data); skip it, never dereference it
        .filter(!_.isNullAt(0))
        .map(r => (r.getAs[Number](0).longValue(), r.getSeq[Double](1)))
        .sortBy(_._1)
        .map(_._2)
        .toSeq

    // init hashes the id rather than taking vec_id % k: a caller may feed
    // a SYSTEMATIC sample (vec_id % step == 0 — trainTwoLevel does), and
    // modulo init would then populate only k/gcd(step, k) residues, which
    // build's densification silently collapses into a smaller codebook
    var assign: Column = pmod(xxhash64(col("vec_id")), lit(k)).cast("int")
    var cents: Seq[Seq[Double]] = Nil
    (0 until iters).foreach { _ =>
      cents = centroidsFor(assign) // one corpus scan; ≤ k rows collected
      assign = nearestCentroid(col("vec"), cents)
    }

    // Materialize the assignment behind a Generate (posexplode_outer of a
    // one-element array): probeTopK equi-joins on centroid_id, and with a
    // plain Project the join's inferred isnotnull(centroid_id) constraint
    // gets pushed through the projection as a SECOND evaluation of the
    // k x dim nearest_centroid kernel in the scan Filter. A constraint on
    // a Generate output attribute cannot cross the Generate, so the kernel
    // runs exactly once per corpus row.
    val assigned = corpus
      .select(col("*"), posexplode_outer(array(assign)).as(Seq("__p", "centroid_id")))
      .drop("__p")
    val centroidRows = cents.zipWithIndex.map { case (v, i) =>
      var s = 0.0; var j = 0
      while (j < v.length) { s += v(j) * v(j); j += 1 }
      (i, v, math.sqrt(s))
    }
    import spark.implicits._
    val centroids = centroidRows.toDF("centroid_id", "cvec", "cnorm")
    (assigned, centroids)
  }

  /** Hierarchical (two-level) coarse quantizer — the scale answer to the
    * flat codebook's assignment wall. [[build]]'s per-row cost is
    * O(k·dim) against driver-embedded centroids, which prices a flat
    * k=64000 (the cell count a 16M-vector semantic dedup needs at the
    * ~250-vector cell target) out of reach: the r12 probe measured the
    * O(N·k·dim) curve directly (1M/k=4000 → 77 s, 2M/k=8000 → 237 s).
    * Two levels factor it: k1 top-level cells, then k2 sub-cells per
    * top cell — k1×k2 EFFECTIVE cells at O((k1+k2)·dim) per row, e.g.
    * 256×250 = 64000 cells for 506 dot products/row instead of 64000.
    *
    * Spark-first shape, mirroring [[build]] and [[PqCodec.train]]:
    *  - Both levels train on a ≤`sampleMax` systematic SAMPLE
    *    (published practice — the quantizer must not train at corpus
    *    scale); the full corpus is touched by ONE final assignment
    *    projection.
    *  - Level 2 trains ALL k1 banks in one scan per Lloyd iteration: a
    *    (c1, c2)-keyed partial-merged mean whose k1×k2 result rows
    *    (tens of MB at the 64000-cell config — sized for this driver,
    *    documented) re-embed as the [[graft.functions.VectorExpressions
    *    .NearestCentroidBank]] reference bank.
    *  - The final assignment is a pure two-expression projection
    *    (level-1 argmin behind a Generate, then the bank argmin), so
    *    `assigned`'s lineage is one corpus scan — no join, no shuffle,
    *    no window.
    *
    * Returns (assigned, centroids): `centroid_id = c1 * k2 + c2` (ids
    * are NOT re-densified — empty cells simply never appear in
    * `assigned`), centroids = one row per (c1, c2) pair including
    * never-assigned ones. Deterministic end to end: both inits hash
    * `vec_id`, both argmins tie-break low. */
  def buildTwoLevel(corpus: DataFrame, k1: Int, k2: Int, iters: Int = 2,
                    sampleMax: Long = 1000000L): (DataFrame, DataFrame) = {
    val model = trainTwoLevel(corpus, k1, k2, iters, sampleMax)
    (assignTwoLevel(corpus, model), model.centroids(corpus.sparkSession))
  }

  /** Trained two-level quantizer: level-1 centroids plus one sub-centroid
    * bank per level-1 cell. Carrying the model explicitly (rather than
    * only the assigned frame) is what lets PROBES descend the same
    * hierarchy a build did — a hierarchical assignment is NOT the global
    * argmin over all k1×k2 sub-centroids, so looking a query up in the
    * index must replay the two-step argmin, not a flat nearest-centroid
    * ([[probeTopKTwoLevel]]). */
  final case class TwoLevelModel(cents1: Seq[Seq[Double]],
                                 banks: Seq[Seq[Seq[Double]]]) {
    def k1: Int = banks.length
    def k2: Int = banks.headOption.map(_.length).getOrElse(0)

    /** The hierarchical cell id (c1·k2 + c2) of a vector column. Both
      * argmin kernels run per evaluation; callers assigning a large
      * frame should materialize behind a Generate ([[assignTwoLevel]]),
      * query-sized frames can use this directly. */
    def cellOf(vec: Column): Column = {
      val c1 = nearestCentroid(vec, cents1)
      (c1 * k2 + graft.functions.VectorExpressions
        .nearestCentroidBank(vec, c1, banks)).cast("int")
    }

    /** All k1×k2 (centroid_id, cvec, cnorm) rows as a local relation. */
    def centroids(spark: org.apache.spark.sql.SparkSession): DataFrame = {
      import spark.implicits._
      val rows = for {
        a <- 0 until k1
        b <- 0 until k2
      } yield {
        val v = banks(a)(b)
        var s = 0.0; var i = 0
        while (i < v.length) { s += v(i) * v(i); i += 1 }
        (a * k2 + b, v, math.sqrt(s))
      }
      rows.toDF("centroid_id", "cvec", "cnorm")
    }
  }

  /** Train the two-level quantizer on a ≤`sampleMax` systematic sample of
    * `corpus` (see [[buildTwoLevel]] for the full shape discussion). */
  def trainTwoLevel(corpus: DataFrame, k1: Int, k2: Int, iters: Int = 2,
                    sampleMax: Long = 1000000L): TwoLevelModel = {
    require(k1 >= 1 && k2 >= 1, s"need k1, k2 >= 1, got $k1, $k2")
    val vmean = udaf(VectorMeanAggregator)
    val n = math.max(1L, corpus.count())
    val step = math.max(1L, n / sampleMax)
    val sample = corpus.filter(pmod(col("vec_id"), lit(step)) === 0)

    // Level 1 on the sample: the flat Lloyd loop (k1 is small)
    val (_, cents1Df) = build(sample, k1, iters)
    val cents1: Seq[Seq[Double]] = cents1Df.orderBy(col("centroid_id"))
      .collect().map(_.getSeq[Double](1).toSeq).toSeq
    require(cents1.nonEmpty,
      "trainTwoLevel: level-1 training produced zero centroids — the " +
        "corpus (or its systematic sample) is empty or every sampled " +
        "vector failed assignment (dim-mismatched); a two-level model " +
        "cannot be trained from it")
    val k1e = cents1.length // build densifies: empty initial cells drop
    val c1OfSample = nearestCentroid(col("vec"), cents1)

    // Level 2: one scan per iteration trains every bank at once
    val dim = cents1.head.length
    var banks: Array[Array[Array[Double]]] =
      Array.fill(k1e, k2)(new Array[Double](dim))
    // assign2 is a function of the MATERIALIZED c1 attribute: the level-1
    // argmin kernel is evaluated once per sample row behind a Generate
    // (posexplode_outer of a one-element array — the same double-eval
    // guard build and assignTwoLevel use), and both the grouping key and
    // the bank argmin read that attribute. Inlining c1OfSample in both
    // places would run the k1-way kernel twice per row per iteration.
    var assign2: Column => Column =
      _ => pmod(xxhash64(col("vec_id")), lit(k2)).cast("int")
    (0 until math.max(1, iters)).foreach { _ =>
      val rows = sample
        .select(col("vec"), col("vec_id"),
          posexplode_outer(array(c1OfSample)).as(Seq("__p1", "c1")))
        .select(col("vec"), col("c1"), assign2(col("c1")).as("c2"))
        .groupBy(col("c1"), col("c2")).agg(vmean(col("vec")).as("cvec"))
        .collect()
      val next = Array.fill(k1e, k2)(null: Array[Double])
      rows.foreach { r =>
        // a null c1/c2 group collects dirty rows (dim-mismatched vectors
        // fail both argmins with boxed null) — skip, never dereference
        if (!r.isNullAt(0) && !r.isNullAt(1)) {
        val c1 = r.getAs[Number](0).intValue()
        val c2 = r.getAs[Number](1).intValue()
        if (c1 >= 0 && c1 < k1e && c2 >= 0 && c2 < k2) {
          val v = r.getSeq[Double](2)
          if (v.length == dim) next(c1)(c2) = v.toArray
        }
        }
      }
      // empty cells keep their previous centroid (zeros before the
      // first iteration) — the PqCodec.train convention
      var a = 0
      while (a < k1e) {
        var b = 0
        while (b < k2) {
          if (next(a)(b) == null) next(a)(b) = banks(a)(b)
          b += 1
        }
        a += 1
      }
      banks = next
      val bankSeq = banks.map(_.map(_.toSeq).toSeq).toSeq
      assign2 = c1 => graft.functions.VectorExpressions
        .nearestCentroidBank(col("vec"), c1, bankSeq)
    }
    TwoLevelModel(cents1, banks.map(_.map(_.toSeq).toSeq).toSeq)
  }

  /** Assign a corpus under a trained [[TwoLevelModel]]: level-1 argmin
    * materialized behind a Generate (the [[build]] double-eval guard),
    * then the bank argmin and the global id behind a second Generate —
    * one scan, two expressions, no join/shuffle/window. */
  def assignTwoLevel(corpus: DataFrame, model: TwoLevelModel): DataFrame = {
    val withC1 = corpus
      .select(col("*"),
        posexplode_outer(array(nearestCentroid(col("vec"), model.cents1)))
          .as(Seq("__p1", "__c1")))
      .drop("__p1")
    val globalId = (col("__c1") * model.k2 +
      graft.functions.VectorExpressions.nearestCentroidBank(
        col("vec"), col("__c1"), model.banks)).cast("int")
    withC1
      .select(col("*"), posexplode_outer(array(globalId)).as(Seq("__p2", "centroid_id")))
      .drop("__p2").drop("__c1")
  }

  /** Top-k lookup against a two-level-assigned index: each query DESCENDS
    * THE SAME HIERARCHY the corpus was assigned under (level-1 argmin,
    * then that cell's bank argmin — [[TwoLevelModel.cellOf]]) and scans
    * exactly its own cell. This is the nProbe=1 configuration, and it is
    * the one the planted-twin protocol makes provably exact: a query
    * that IS a corpus vector replays the identical two argmins, so its
    * cell IS its twin's cell. A flat nearest-centroid over all k1×k2
    * sub-centroids would NOT guarantee that (hierarchical assignment is
    * not the global argmin) — which is exactly why the model, not just
    * the centroid table, is the probe input. Multi-probe over neighbor
    * cells remains the flat [[probeTopK]]'s territory; at the cell
    * granularities two levels buy (~250 vectors), scanning one cell is
    * the point.
    *
    * Plan shape: queries (small) assign with two per-row kernels, then
    * broadcast into an equi-join on `centroid_id` against the assigned
    * corpus — corpus-side work is one scan with a codegen'd hash probe,
    * candidates are cell-sized, and the ranking is the bounded partial
    * top-k aggregator. */
  def probeTopKTwoLevel(assigned: DataFrame, model: TwoLevelModel,
                        queries: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("query_id"),
      col("vec").as("query_vec"), col("norm").as("query_norm"),
      model.cellOf(col("vec")).as("centroid_id"))
    val scored = assigned
      .select(col("vec_id").as("cand_id"), col("vec").as("cand_vec"),
        col("norm").as("cand_norm"), col("centroid_id"))
      .join(broadcast(q), "centroid_id")
      .filter(col("cand_id") =!= col("query_id"))
      .withColumn("cosine",
        when(col("cand_norm") * col("query_norm") === 0.0, lit(null).cast("double"))
          .otherwise(dot(col("cand_vec"), col("query_vec"))
            / (col("cand_norm") * col("query_norm"))))
    Ranking.topKPerQuery(scored, k)
  }

  /** Multi-probe lookup against a two-level-assigned index: the query's
    * own DESCENT cell (the [[probeTopKTwoLevel]] top-1 replay) is pinned
    * at probe rank 0, and the remaining `nProbe − 1` slots fill with the
    * nearest sub-cells drawn from the query's `nProbe` nearest level-1
    * banks. Pinning makes the probe set MONOTONE — nProbe = p probes a
    * superset of nProbe = 1 — so the planted-twin exactness guarantee
    * survives at every nProbe (the twin's cell is the descent cell and
    * is always scanned), while the extra cells recover the
    * boundary-straddling neighbors top-1 descent loses: a true neighbor
    * assigned across a level-1 or level-2 Voronoi edge is reachable as
    * soon as its sub-cell ranks within the probe budget. The ranking
    * deliberately pools sub-cells ACROSS the top level-1 banks rather
    * than descending each independently — a second-ranked bank's best
    * sub-cell often beats the primary bank's third sub-cell, which is
    * where top-1-per-bank schemes lose recall.
    *
    * Plan shape: all cell ranking happens on the (small) query side —
    * two broadcast joins against the k1-row and k1×k2-row centroid
    * relations and two bounded window ranks — then the probes broadcast
    * into the same single-scan equi-join on `centroid_id` every IVF
    * probe in this file uses. Corpus-side cost is nProbe cells per query
    * instead of one; nothing about the index changes. */
  def probeTopKTwoLevelMulti(assigned: DataFrame, model: TwoLevelModel,
                             queries: DataFrame, k: Int,
                             nProbe: Int): DataFrame = {
    require(nProbe >= 1, s"need nProbe >= 1, got $nProbe")
    if (nProbe == 1) return probeTopKTwoLevel(assigned, model, queries, k)
    val spark = queries.sparkSession
    import spark.implicits._
    val cents1Df = model.cents1.zipWithIndex.map { case (v, i) =>
      var s = 0.0; var j = 0
      while (j < v.length) { s += v(j) * v(j); j += 1 }
      (i, v, math.sqrt(s))
    }.toDF("c1", "c1vec", "c1norm")
    val cents = model.centroids(spark)
      .withColumn("c1", (col("centroid_id") / lit(model.k2)).cast("int"))
    // descent cell materialized behind a Generate (the standard
    // double-eval guard — it feeds both the pin flag and, via the model,
    // two argmin kernels)
    val q0 = queries.select(col("vec_id").as("query_id"),
      col("vec").as("query_vec"), col("norm").as("query_norm"),
      posexplode_outer(array(model.cellOf(col("vec")))).as(Seq("__p", "cell0")))
    val w1 = Window.partitionBy(col("query_id")).orderBy(col("q1d2"), col("c1"))
    val topBanks = q0.crossJoin(broadcast(cents1Df))
      .withColumn("q1d2",
        col("c1norm") * col("c1norm")
          - lit(2.0) * dot(col("query_vec"), col("c1vec")))
      .withColumn("rn1", row_number().over(w1))
      .filter(col("rn1") <= nProbe)
      .select(col("query_id"), col("query_vec"), col("query_norm"),
        col("cell0"), col("c1"))
    val wq = Window.partitionBy(col("query_id"))
      .orderBy(col("pinned").desc, col("qd2"), col("centroid_id"))
    val probes = topBanks.join(broadcast(cents), "c1")
      .withColumn("qd2",
        col("cnorm") * col("cnorm")
          - lit(2.0) * dot(col("query_vec"), col("cvec")))
      .withColumn("pinned", (col("centroid_id") === col("cell0")).cast("int"))
      .withColumn("rn", row_number().over(wq))
      .filter(col("rn") <= nProbe)
      .select(col("query_id"), col("query_vec"), col("query_norm"),
        col("centroid_id"))
    val scored = assigned
      .select(col("vec_id").as("cand_id"), col("vec").as("cand_vec"),
        col("norm").as("cand_norm"), col("centroid_id"))
      .join(broadcast(probes), "centroid_id")
      .filter(col("cand_id") =!= col("query_id"))
      .withColumn("cosine",
        when(col("cand_norm") * col("query_norm") === 0.0, lit(null).cast("double"))
          .otherwise(dot(col("cand_vec"), col("query_vec"))
            / (col("cand_norm") * col("query_norm"))))
    Ranking.topKPerQuery(scored, k)
  }

  /** Persist the IVF index with one DIRECTORY PER LIST (a parquet table
    * partitioned by `centroid_id`) plus a tiny companion centroid table.
    * This is the PERSISTED form of ANN state — the analogue of the
    * bucketed minhash index for near-dup: build once, then every probe
    * batch reads only its lists. Probing a loaded index is a scan-pruned
    * join: the probe side is broadcast, and Spark's dynamic partition
    * pruning narrows the index scan to the probed `centroid_id`
    * directories — "probe nProbe of k lists" becomes reading nProbe/k of
    * the index BYTES, not a full scan filtered after the fact
    * (plan-guard spec'd: the scan carries a dynamicpruning partition
    * filter). */
  def writeIndex(assigned: DataFrame, centroids: DataFrame, table: String): Unit = {
    assigned.write.mode("overwrite").partitionBy("centroid_id")
      .format("parquet").saveAsTable(table)
    centroids.write.mode("overwrite").format("parquet")
      .saveAsTable(table + "_centroids")
  }

  /** Load a persisted index written by [[writeIndex]]: (assigned,
    * centroids), directly consumable by [[probeTopK]]. */
  def loadIndex(spark: org.apache.spark.sql.SparkSession,
                table: String): (DataFrame, DataFrame) =
    (spark.table(table), spark.table(table + "_centroids"))

  /** Top-k by cosine per query, scanning only the `nProbe` nearest lists.
    * `centroids` is a local relation, so the probe-list selection plans
    * with no corpus access; the corpus is touched by exactly one scan,
    * filtered to probed lists via the broadcast probes join. */
  def probeTopK(assigned: DataFrame, centroids: DataFrame, queries: DataFrame,
                k: Int, nProbe: Int): DataFrame = {
    val wq = Window.partitionBy(col("query_id"))
      .orderBy(col("qd2"), col("centroid_id"))
    val probes = queries
      .select(col("vec_id").as("query_id"), col("vec").as("query_vec"),
        col("norm").as("query_norm"))
      .crossJoin(broadcast(centroids))
      .withColumn("qd2",
        col("query_norm") * col("query_norm") + col("cnorm") * col("cnorm")
          - lit(2.0) * dot(col("query_vec"), col("cvec")))
      .withColumn("rn", row_number().over(wq))
      .filter(col("rn") <= nProbe)
      .select(col("query_id"), col("query_vec"), col("query_norm"), col("centroid_id"))
    val scored = assigned
      .select(col("vec_id").as("cand_id"), col("vec").as("cand_vec"),
        col("norm").as("cand_norm"), col("centroid_id"))
      .join(broadcast(probes), "centroid_id")
      .filter(col("cand_id") =!= col("query_id"))
      .withColumn("cosine",
        when(col("cand_norm") * col("query_norm") === 0.0, lit(null).cast("double"))
          .otherwise(dot(col("cand_vec"), col("query_vec"))
            / (col("cand_norm") * col("query_norm"))))
    Ranking.topKPerQuery(scored, k)
  }
}
