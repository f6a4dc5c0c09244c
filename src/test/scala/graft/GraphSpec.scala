package graft

import graft.operators.Graph
import org.apache.spark.sql.functions._

class GraphSpec extends SparkSpec {
  import spark.implicits._

  private def r9(x: Double) =
    BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Independent in-memory replay of the exact recurrence (same
    * quantization points, exact decimal sums), for bitwise parity. */
  private def ref(edges: Seq[(Long, Long)], iters: Int,
                  d: Double = 0.85): Map[Long, Double] = {
    val e = edges.distinct
    val deg = e.groupBy(_._1).map { case (k, v) => k -> v.size }
    val nodes = (e.map(_._1) ++ e.map(_._2)).distinct
    val n = nodes.size.toLong
    var pr = nodes.map(v => v -> r9(1.0 / n)).toMap
    for (_ <- 1 to iters) {
      val sums = e.groupBy(_._2).map { case (v, in) =>
        v -> in.map { case (u, _) => BigDecimal(r9(pr(u) / deg(u))) }.sum
      }
      pr = nodes.map { v =>
        v -> r9((1.0 - d) / n
          + d * sums.getOrElse(v, BigDecimal(0)).toDouble)
      }.toMap
    }
    pr
  }

  private def run(edges: Seq[(Long, Long)], iters: Int) =
    Graph.pageRank(edges.toDF("s", "d"), col("s"), col("d"), iters)
      .as[(Long, Double)].collect().toMap

  test("pageRank matches the in-memory recurrence exactly on a seeded random graph") {
    val rnd = new scala.util.Random(42)
    val edges = Seq.fill(120)((rnd.nextInt(30).toLong, rnd.nextInt(30).toLong))
      .filter { case (a, b) => a != b }
    val dir = edges ++ edges.map(_.swap)   // undirected: no dangling mass
    assert(run(dir, 4) == ref(dir, 4))
    // directed (dangling nodes drop mass): still exact parity
    assert(run(edges, 3) == ref(edges, 3))
  }

  test("pageRank: star center outranks leaves; undirected mass is conserved") {
    val star = Seq((1L, 2L), (2L, 1L), (1L, 3L), (3L, 1L), (1L, 4L), (4L, 1L))
    val pr = run(star, 10)
    assert(pr(1L) > pr(2L) && pr(2L) == pr(3L) && pr(3L) == pr(4L), pr.toString)
    assert(math.abs(pr.values.sum - 1.0) < 1e-6,
      s"undirected graph must conserve rank mass: ${pr.values.sum}")
  }

  test("pageRank: multi-edges collapse to one vote") {
    val once = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L))
    val dup = once ++ once ++ once
    assert(run(dup, 5) == run(once, 5))
  }

  /** In-memory replay of the STANDARD recurrence with dangling-mass
    * redistribution — same quantization points as the operator. */
  private def refDangling(edges: Seq[(Long, Long)], iters: Int,
                          d: Double = 0.85): Map[Long, Double] = {
    val e = edges.distinct
    val deg = e.groupBy(_._1).map { case (k, v) => k -> v.size }
    val nodes = (e.map(_._1) ++ e.map(_._2)).distinct
    val dang = nodes.filterNot(deg.contains)
    val n = nodes.size.toLong
    var pr = nodes.map(v => v -> r9(1.0 / n)).toMap
    for (_ <- 1 to iters) {
      val ds = dang.map(v => BigDecimal(pr(v))).sum
      val share = r9(ds.toDouble / n)
      val sums = e.groupBy(_._2).map { case (v, in) =>
        v -> in.map { case (u, _) => BigDecimal(r9(pr(u) / deg(u))) }.sum
      }
      pr = nodes.map { v =>
        v -> r9((1.0 - d) / n
          + d * (sums.getOrElse(v, BigDecimal(0)).toDouble + share))
      }.toMap
    }
    pr
  }

  private def runDangling(edges: Seq[(Long, Long)], iters: Int) =
    Graph.pageRank(edges.toDF("s", "d"), col("s"), col("d"), iters,
        danglingRedistribution = true)
      .as[(Long, Double)].collect().toMap

  test("pageRank dangling mode: exact recurrence parity, mass conserved " +
       "on sink graphs, identical to default when nothing dangles") {
    val rnd = new scala.util.Random(7)
    val directed = Seq.fill(120)(
        (rnd.nextInt(30).toLong, rnd.nextInt(40).toLong))
      .filter { case (a, b) => a != b }   // dst range 30-39 = pure sinks
    // bit parity with the in-memory standard recurrence
    assert(runDangling(directed, 4) == refDangling(directed, 4))
    // the standard definition conserves mass even with sinks...
    val pr = runDangling(directed, 8)
    assert(math.abs(pr.values.sum - 1.0) < 1e-6,
      s"dangling redistribution must conserve rank mass: ${pr.values.sum}")
    // ...where the dropped-mass variant loses it
    val dropped = run(directed, 8)
    assert(dropped.values.sum < 0.95,
      s"fixture must actually lose mass in the default mode: " +
        s"${dropped.values.sum}")
    // no sinks -> both modes identical (the extra agg sums zero)
    val undirected = directed ++ directed.map(_.swap)
    assert(runDangling(undirected, 4) == run(undirected, 4))
  }

  test("labelPropagation: communities form, smallest-label tie-break, " +
       "no-in-edge nodes keep their label, multi-edges collapse") {
    // two triangles {1,2,3} and {10,11,12} joined by a single bridge
    // 3-10; undirected (both directions fed)
    val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (10L, 11L), (11L, 12L), (10L, 12L), (3L, 10L))
    val und = (tri ++ tri.map(_.swap)).toDF("a", "b")
    val labels = Graph.labelPropagation(und, col("a"), col("b"), iters = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // each triangle collapses onto its own minimum label
    assert(labels(1) == 1L && labels(2) == 1L && labels(3) == 1L, labels.toString)
    assert(Set(labels(10), labels(11), labels(12)).size == 1, labels.toString)
    // tie-break: node with two equally-frequent neighbor labels takes
    // the smaller one after round 1
    val tie = Seq((5L, 7L), (6L, 7L)).toDF("a", "b")
    val l1 = Graph.labelPropagation(tie, col("a"), col("b"), iters = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(l1(7L) == 5L, l1.toString)
    // sources have no in-edges on the directed form: they keep themselves
    assert(l1(5L) == 5L && l1(6L) == 6L, l1.toString)
    // multi-edges collapse: duplicating edge 6->7 five times must not
    // outvote the tie-break
    val multi = (Seq((5L, 7L)) ++ Seq.fill(5)((6L, 7L))).toDF("a", "b")
    val lm = Graph.labelPropagation(multi, col("a"), col("b"), iters = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(lm(7L) == 5L, lm.toString)
  }

  test("hits: hand-checked bipartite round, L1 mass 1 per side, " +
       "role separation on a directed graph") {
    // hubs 1,2 -> authorities 10,11,12; 11 is doubly cited
    val e = Seq((1L, 10L), (1L, 11L), (2L, 11L), (2L, 12L)).toDF("a", "b")
    val out = Graph.hits(e, col("a"), col("b"), iters = 1)
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2)))
      .toMap
    // iter 1 by hand: a_raw = (1, 2, 1)/4; h_raw = (.75, .75)/1.5
    assert(out(10L)._2 == 0.25 && out(11L)._2 == 0.5 && out(12L)._2 == 0.25,
      out.toString)
    assert(out(1L)._1 == 0.5 && out(2L)._1 == 0.5, out.toString)
    // role separation: sources have authority 0, sinks hub 0
    assert(out(1L)._2 == 0.0 && out(10L)._1 == 0.0, out.toString)
    // L1 mass 1 on each side, at deeper iterations too
    val deep = Graph.hits(e, col("a"), col("b"), iters = 4).collect()
    val hm = deep.map(_.getDouble(1)).sum
    val am = deep.map(_.getDouble(2)).sum
    assert(math.abs(hm - 1.0) < 1e-6 && math.abs(am - 1.0) < 1e-6,
      s"$hm $am")
    // the doubly-cited authority stays on top
    val dm = deep.map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(dm(11L) > dm(10L) && dm(11L) > dm(12L), dm.toString)
  }

  test("pageRankConverged: tol=0 stops at the exact quantized fixpoint " +
       "and equals the fixed-count output; rounds-run is reported") {
    // a directed 3-cycle is at the fixpoint from round 1 (uniform ranks
    // reproduce themselves exactly at scale 9)
    val cycle = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("s", "d")
    val (ranks, rounds) = Graph.pageRankConverged(cycle, col("s"),
      col("d"), maxIters = 50, tol = 0.0)
    assert(rounds == 1, s"cycle must converge in one round, ran $rounds")
    val early = ranks.as[(Long, Double)].collect().toMap
    val fixed = Graph.pageRank(cycle, col("s"), col("d"), iters = 50)
      .as[(Long, Double)].collect().toMap
    assert(early == fixed, s"$early vs $fixed")
    // a star needs more rounds; with tol=0 it must also land exactly on
    // the fixed-count output once converged, in fewer than maxIters
    val star = Seq((1L, 2L), (2L, 1L), (1L, 3L), (3L, 1L), (1L, 4L),
      (4L, 1L)).toDF("s", "d")
    val (r2, n2) = Graph.pageRankConverged(star, col("s"), col("d"),
      maxIters = 200, tol = 0.0)
    assert(n2 < 200, "star never reached the quantized fixpoint")
    val f2 = Graph.pageRank(star, col("s"), col("d"), iters = 200)
      .as[(Long, Double)].collect().toMap
    assert(r2.as[(Long, Double)].collect().toMap == f2)
    // a loose tolerance stops earlier than the exact fixpoint
    val (_, n3) = Graph.pageRankConverged(star, col("s"), col("d"),
      maxIters = 200, tol = 1e-3)
    assert(n3 <= n2, s"looser tol must not run longer: $n3 vs $n2")
  }

  test("labelPropagationConverged: stops when no label changes and " +
       "equals any larger fixed count") {
    // two triangles joined by one bridge edge, both directions
    val tri = Seq((1L, 2L), (2L, 3L), (3L, 1L), (4L, 5L), (5L, 6L),
      (6L, 4L), (3L, 4L))
    val und = (tri ++ tri.map(_.swap)).toDF("s", "d")
    val (labels, rounds) = Graph.labelPropagationConverged(und, col("s"),
      col("d"), maxIters = 50)
    assert(rounds < 50, "label propagation never stabilized")
    val early = labels.as[(Long, Long)].collect().toMap
    val fixed = Graph.labelPropagation(und, col("s"), col("d"),
      iters = rounds + 7).as[(Long, Long)].collect().toMap
    assert(early == fixed, s"$early vs $fixed")
  }
}
