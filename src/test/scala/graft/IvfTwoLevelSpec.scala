package graft

import graft.operators.{IvfIndex, Similarity}
import graft.functions.{VectorExpressions, VectorFunctions}
import org.apache.spark.sql.functions._

/** The hierarchical (two-level) coarse quantizer must be a real k-means
  * partition — every row assigned to its argmin sub-centroid within its
  * own level-1 cell — deterministic, and it must compose with semantic
  * dedup exactly like the flat assignment does (colocated twins pruned,
  * originals kept). */
class IvfTwoLevelSpec extends SparkSpec {
  import spark.implicits._

  private lazy val prep =
    Similarity.prepared(Tables(spark, sfDir).embeddings, col("vec_id"), col("embedding"))

  test("level-2 assignment is the argmin within the row's own bank") {
    val k1 = 4; val k2 = 3
    val (assigned, centroids) = IvfIndex.buildTwoLevel(prep, k1, k2)
    val cents = centroids.collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1).toArray)).toMap
    val rows = assigned.select(col("vec_id"), col("vec"), col("centroid_id"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val vec = r.getSeq[Double](1).toArray
      val cid = r.getInt(2)
      val c1 = cid / k2
      // within the assigned level-1 cell, the chosen sub-centroid must be
      // the squared-euclidean argmin (ties to the lowest id)
      val scores = (0 until k2).map { c2 =>
        val c = cents(c1 * k2 + c2)
        var dot = 0.0; var n2 = 0.0; var i = 0
        while (i < vec.length) { dot += vec(i) * c(i); n2 += c(i) * c(i); i += 1 }
        (c2, n2 - 2.0 * dot)
      }
      val best = scores.minBy { case (c2, s) => (s, c2) }._1
      assert(cid % k2 == best,
        s"vec ${r.getLong(0)}: assigned sub-cell ${cid % k2}, argmin $best in cell $c1")
    }
  }

  test("empty corpus fails training with a named require, not NoSuchElement") {
    val empty = prep.filter(lit(false))
    val e = intercept[IllegalArgumentException] {
      IvfIndex.trainTwoLevel(empty, 4, 4)
    }
    assert(e.getMessage.contains("zero centroids"), e.getMessage)
  }

  test("deterministic: two builds produce identical assignments") {
    val a1 = IvfIndex.buildTwoLevel(prep, 4, 4)._1
      .select("vec_id", "centroid_id").as[(Long, Int)].collect().toMap
    val a2 = IvfIndex.buildTwoLevel(prep, 4, 4)._1
      .select("vec_id", "centroid_id").as[(Long, Int)].collect().toMap
    assert(a1 == a2, "repeat builds must agree")
  }

  test("level 2 actually splits: more effective cells than k1, bounded by k1*k2") {
    val k1 = 4; val k2 = 4
    val (assigned, _) = IvfIndex.buildTwoLevel(prep, k1, k2)
    val nCells = assigned.select("centroid_id").distinct().count()
    assert(nCells > k1, s"expected more than $k1 effective cells, got $nCells")
    assert(nCells <= k1.toLong * k2)
  }

  test("composes with semantic dedup: colocated twins pruned, originals kept") {
    val base = Tables(spark, sfDir).embeddings
      .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
    val planted = base.unionByName(base.filter(pmod(col("vec_id"), lit(10)) === 0)
      .select((col("vec_id") + 100000).as("vec_id"),
        zip_with(col("embedding"), reverse(col("embedding")),
          (x, y) => x + y * lit(0.01)).as("embedding")))
    val p = Similarity.prepared(planted, col("vec_id"), col("embedding"))
    val (assignedRaw, _) = IvfIndex.buildTwoLevel(p, 4, 4)
    val assigned = assignedRaw.localCheckpoint(true)
    val kept = Similarity.semDedupKeep(assigned, col("vec_id"), col("vec"),
        col("centroid_id"), threshold = 0.8)
      .select("vec_id").as[Long].collect().toSet
    val cells = assigned.select(col("vec_id"), col("centroid_id"))
      .as[(Long, Int)].collect().toMap
    // every original survives (its lower-id cluster-mates are background)
    val originals = cells.keySet.filter(_ < 100000)
    assert(originals.subsetOf(kept), "every original must survive")
    // a twin is pruned exactly when colocated with its original
    val twins = cells.keySet.filter(_ >= 100000)
    twins.foreach { t =>
      val colocated = cells(t) == cells(t - 100000)
      assert(!kept.contains(t) == colocated,
        s"twin $t: colocated=$colocated but pruned=${!kept.contains(t)}")
    }
    // and the partition is semantic: >= 90% of twins share their
    // original's cell (the registered-query floor)
    val nCo = twins.count(t => cells(t) == cells(t - 100000))
    assert(nCo >= twins.size * 0.9,
      s"colocation $nCo/${twins.size} below the 90% floor")
  }

  test("hierarchical probe: twin queries return the exact nearest neighbor") {
    // the probe must descend the SAME hierarchy as the assignment — a
    // query that IS a corpus vector then provably lands in its twin's
    // cell, so top-1 equals exact brute force
    val model = IvfIndex.trainTwoLevel(prep, 4, 4)
    val assigned = IvfIndex.assignTwoLevel(prep, model)
    val queries = prep.filter(col("vec_id") < 10)
      .select((col("vec_id") + 100000).as("vec_id"), col("vec"), col("norm"))
    val got = IvfIndex.probeTopKTwoLevel(assigned, model, queries, k = 1)
      .select("query_id", "cand_id").as[(Long, Long)].collect().toMap
    assert(got.size == 10)
    got.foreach { case (q, c) =>
      assert(c == q - 100000, s"query $q found $c, expected its twin ${q - 100000}")
    }
    // and the probe plan must not contain a Window (bounded top-k)
    val plan = IvfIndex.probeTopKTwoLevel(assigned, model, queries, 1)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), "probe ranking must be the bounded aggregator")
  }

  test("multi-probe: monotone (nProbe=1 is a subset), twins exact at every nProbe") {
    val model = IvfIndex.trainTwoLevel(prep, 4, 4)
    val assigned = IvfIndex.assignTwoLevel(prep, model)
    val queries = prep.filter(col("vec_id") < 10)
      .select((col("vec_id") + 100000).as("vec_id"), col("vec"), col("norm"))
    // pinning the descent cell means every nProbe still finds the twin
    Seq(1, 2, 4).foreach { p =>
      val got = IvfIndex.probeTopKTwoLevelMulti(assigned, model, queries,
        k = 1, nProbe = p)
        .select("query_id", "cand_id").as[(Long, Long)].collect().toMap
      assert(got.size == 10, s"nProbe=$p returned ${got.size} queries")
      got.foreach { case (q, c) =>
        assert(c == q - 100000, s"nProbe=$p: query $q found $c, not its twin")
      }
    }
    // nProbe=1 must be EXACTLY the descent probe (delegation, not a
    // near-copy): same rows as probeTopKTwoLevel
    val a = IvfIndex.probeTopKTwoLevelMulti(assigned, model, queries, 3, 1)
      .select("query_id", "cand_id").collect().toSet
    val b = IvfIndex.probeTopKTwoLevel(assigned, model, queries, 3)
      .select("query_id", "cand_id").collect().toSet
    assert(a == b)
  }

  test("multi-probe: general top-k recall climbs with nProbe and clears the floor") {
    // the sim_ann_lsh recall-floor contract transplanted to the
    // hierarchical index: general (non-planted) queries against the
    // noisy background, recall vs exact brute force. Top-1 descent on a
    // 4x4-cell partition scans ~1/16th of the corpus, so it LOSES
    // boundary-straddling neighbors. The GUARANTEE is only vs the
    // nProbe=1 baseline (the pinned descent cell makes every probe set
    // a superset of it); nProbe=2 vs 4 pool sub-cells from DIFFERENT
    // bank sets and are not nested, so their recalls are asserted
    // against the baseline, not each other.
    val model = IvfIndex.trainTwoLevel(prep, 4, 4)
    val assigned = IvfIndex.assignTwoLevel(prep, model)
    val queries = prep.filter(col("vec_id") < 10)
    val exact = Similarity.bruteForceTopK(prep, queries, k = 5)
      .select("query_id", "cand_id").collect().toSet
    val recalls = Seq(1, 2, 4).map { p =>
      val got = IvfIndex.probeTopKTwoLevelMulti(assigned, model, queries,
        k = 5, nProbe = p)
        .select("query_id", "cand_id").collect().toSet
      p -> (got intersect exact).size.toDouble / exact.size
    }
    info(recalls.map { case (p, r) => f"nProbe=$p recall@5 $r%.3f" }.mkString(", "))
    val base = recalls.head._2
    recalls.tail.foreach { case (p, r) =>
      assert(r >= base, f"nProbe=$p recall $r%.3f fell below the " +
        f"nProbe=1 baseline $base%.3f — the pinned descent cell is broken")
    }
    val r4 = recalls.last._2
    assert(r4 >= 0.5, f"recall@5 at nProbe=4 is $r4%.3f — below the floor")
  }

  test("bank kernel: out-of-range cell is null, never a throw") {
    val banks = Seq(Seq(Seq(1.0, 0.0), Seq(0.0, 1.0)))
    val df = Seq((0, Seq(1.0, 0.0), 0), (1, Seq(1.0, 0.0), 7),
        (2, Seq(1.0, 0.0), -1))
      .toDF("id", "vec", "cell")
      .select(col("id"),
        VectorExpressions.nearestCentroidBank(col("vec"), col("cell"), banks).as("c2"))
      .collect().map(r => r.getInt(0) -> (if (r.isNullAt(1)) null else r.getInt(1)))
      .toMap
    assert(df(0) == 0)
    assert(df(1) == null && df(2) == null)
  }
}
