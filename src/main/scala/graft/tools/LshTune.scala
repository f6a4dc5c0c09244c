package graft.tools

import graft.Tables
import graft.operators.Similarity
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Parameter sweep for the multi-table LSH operators against their exact
  * counterparts at a given SF — prints, per (nPlanes, nTables[, maxProbe])
  * combination, recall vs the exact answer and the candidate-pair volume,
  * so the registered-query parameters (which the driver oracle holds to
  * EXACT equality with brute force) are chosen from measurement, not hope.
  *
  * Usage: runMain graft.tools.LshTune /root/testdata/sf0.01
  */
object LshTune {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("graft-lsh-tune")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val base = Tables(spark, dir).embeddings
      .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
    val emb = Similarity.prepared(base, col("vec_id"), col("embedding"))
    val nVec = emb.count()

    // Recall sweeps collect full pair/top-k sets to the driver — fine at
    // sweep scale, quadratic-output hazard beyond it. Refuse rather than
    // OOM: the count-only "time" mode works at any SF.
    val maxSweepVectors = 20000L
    val sweepable = nVec <= maxSweepVectors
    if (!sweepable)
      println(s"[lshtune] corpus=$nVec exceeds $maxSweepVectors vectors: " +
        "recall sweeps (driver-side collects) disabled; use the 'time' mode")

    if (args.length > 1 && args(1) == "time") {
      // wall-time the registered-query configurations only
      def time(label: String)(f: => Long): Unit = {
        val t0 = System.nanoTime(); val n = f
        println(f"[lshtune] TIME $label rows=$n ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
      time("brute_pairs@0.4")(Similarity.cosineNearDupPairs(emb, 0.4).count())
      time("lsh_pairs b=2 t=16")(
        // a sweep tool measures bad configs on purpose — guard opted out
        Similarity.cosineNearDupPairsLsh(emb, 0.4, nPlanes = 2, nTables = 16,
          maxCandidateFactor = Double.PositiveInfinity).count())
      val q10 = emb.filter(col("vec_id") < 10)
      time("brute_topk")(Similarity.bruteForceTopK(emb, q10, 5).count())
      time("lsh_topk b=4 t=8 p=1")(
        Similarity.lshTopK(emb, q10, 5, nPlanes = 4, maxProbe = 1, nTables = 8).count())
      spark.stop(); return
    }
    require(sweepable,
      s"recall sweeps need <= $maxSweepVectors vectors (got $nVec); run 'time' mode")

    // --- planted gapped corpus at threshold 0.8 (the registered
    // dedup_embedding_lsh shape: every 10th vector + a cosine-0.9999 twin,
    // background <= ~0.6) — selective configs must carry recall 1.0 ---
    val planted = Similarity.prepared(
      base.unionByName(base.filter(pmod(col("vec_id"), lit(10)) === 0)
        .select((col("vec_id") + 100000).as("vec_id"),
          zip_with(col("embedding"), reverse(col("embedding")),
            (x, y) => x + y * lit(0.01)).as("embedding"))),
      col("vec_id"), col("embedding"))
    val exactPlanted = Similarity.cosineNearDupPairs(planted, 0.8)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    println(s"[lshtune] planted corpus exact pairs@0.8 = ${exactPlanted.size}")
    // configs past 63 total bits run on split hash columns (LshLayout)
    for (b <- Seq(6, 8, 16); t <- Seq(1, 2, 4)) {
      val got = Similarity.cosineNearDupPairsLsh(planted, 0.8, nPlanes = b, nTables = t,
          maxCandidateFactor = Double.PositiveInfinity)
        .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val recall = (got & exactPlanted).size.toDouble / math.max(1, exactPlanted.size)
      println(f"[lshtune] planted b=$b t=$t recall=$recall%.4f got=${got.size} exact=${exactPlanted.size}")
    }

    // --- near-dup pairs at threshold 0.4 ---
    val exactPairs = Similarity.cosineNearDupPairs(emb, 0.4)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    println(s"[lshtune] corpus=$nVec exact pairs@0.4 = ${exactPairs.size}")
    for (b <- Seq(2, 3, 4); t <- Seq(4, 8, 16, 22)) {
      val got = Similarity.cosineNearDupPairsLsh(emb, 0.4, nPlanes = b, nTables = t,
          maxCandidateFactor = Double.PositiveInfinity)
        .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val recall = (got & exactPairs).size.toDouble / math.max(1, exactPairs.size)
      println(f"[lshtune] pairs b=$b t=$t recall=$recall%.4f got=${got.size} exact=${exactPairs.size}")
    }

    // --- top-k ---
    val queries = emb.filter(col("vec_id") < 10)
    val exactTopk = Similarity.bruteForceTopK(emb, queries, 5)
      .select("query_id", "rk", "cand_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    for (b <- Seq(4, 6, 8); t <- Seq(4, 8, 10); p <- Seq(0, 1)) {
      val got = Similarity.lshTopK(emb, queries, 5, nPlanes = b, maxProbe = p, nTables = t)
        .select("query_id", "rk", "cand_id").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
      val eq = got == exactTopk
      println(f"[lshtune] topk b=$b t=$t probe=$p exact_equal=$eq overlap=${(got & exactTopk).size}/${exactTopk.size}")
    }
    spark.stop()
  }
}
