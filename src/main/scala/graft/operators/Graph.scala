package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Iterative graph analytics on edge lists, Spark-first: each
  * iteration is a declarative join + aggregate the planner shuffles on
  * the graph's own keys, with eager lineage truncation between
  * iterations — the pattern that scales an iterative algorithm to an
  * edge list that does not fit one machine. (Connected components are
  * already covered by [[Dedup.componentsFromPairs]]'s union-find /
  * pointer-jumping pair; this file adds the value-propagation family.)
  */
object Graph {

  /** PageRank with fixed iteration count and damping `d`:
    * `pr₀ = 1/N`, then
    * `prᵢ₊₁(v) = (1−d)/N + d·Σ_{u→v} round(prᵢ(u)/outdeg(u), scale)`.
    * Multi-edges collapse first (one vote per distinct edge). By
    * default dangling mass (nodes with no out-edges) is DROPPED — the
    * standard simplified variant; feed both directions for an
    * undirected graph and no node dangles. With
    * `danglingRedistribution = true` the STANDARD definition applies:
    * each iteration adds one node-sized semi-join scalar aggregate
    * `Dᵢ = Σ_{u dangling} prᵢ(u)` (exact DECIMAL sum) and every node
    * receives `d · round(Dᵢ/N, scale)` — total mass is conserved at 1
    * up to quantization, and ranks match the textbook recurrence on
    * graphs with sinks. Returns `(node, rank)` after `iters`
    * iterations.
    *
    * ENGINE-EXACT, not approximately so: per-edge contributions are
    * quantized to `scale` decimals and summed as DECIMAL — exact and
    * associativity-free, so Spark's partial aggregation and any other
    * engine's sum order agree bit for bit — and every remaining op
    * (the two divisions, the damping multiply, the add, the final
    * round) is IEEE correctly rounded. The registered oracle replays
    * the same recurrence in DuckDB and holds every rank to hash
    * equality at any iteration count.
    *
    * Scale shape: ranks and degrees are NODE-sized, edges EDGE-sized;
    * each iteration shuffles the rank frame to the edge src
    * partitioning (join) and the contributions to dst (aggregate) —
    * the two exchanges inherent to power iteration; nothing is ever
    * all-pairs. Each iteration's rank frame is `localCheckpoint`ed
    * EAGERLY: without truncation the lineage compounds per iteration
    * and the final plan re-executes every round from the scan; with
    * it, each round is one job over a node-sized cached frame. */
  def pageRank(edges: DataFrame, src: Column, dst: Column, iters: Int,
               damping: Double = 0.85, scale: Int = 9,
               danglingRedistribution: Boolean = false): DataFrame =
    pageRankLoop(edges, src, dst, iters, damping, scale,
      danglingRedistribution, tol = None)._1

  /** [[pageRank]] with an ENGINE-EXACT stopping criterion: after each
    * round, `Δᵢ = Σ_v |prᵢ(v) − prᵢ₋₁(v)|` — both rank frames are
    * already quantized to `scale` decimals, so the per-node difference
    * is exact and the sum is an exact DECIMAL (order-free); the loop
    * stops once `Δᵢ ≤ tol` (or at `maxIters`). Returns
    * `(ranks, roundsRun)`. With `tol = 0` the stop fires only at the
    * EXACT quantized fixpoint, where every further round provably
    * returns the identical frame — the spec pins early-stop ==
    * fixed-count there. Cost per round over the fixed-count loop: one
    * node-sized join + one scalar DECIMAL aggregate.
    *
    * 100×-scale rationale: power iteration's round count is a guess;
    * on a billion-node graph every over-provisioned round is two full
    * exchanges. The delta test converts the guess into a measurement
    * at node-sized cost. */
  def pageRankConverged(edges: DataFrame, src: Column, dst: Column,
                        maxIters: Int, tol: Double = 0.0,
                        damping: Double = 0.85, scale: Int = 9,
                        danglingRedistribution: Boolean = false)
      : (DataFrame, Int) = {
    require(tol >= 0.0, s"need tol >= 0, got $tol")
    pageRankLoop(edges, src, dst, maxIters, damping, scale,
      danglingRedistribution, tol = Some(tol))
  }

  private def pageRankLoop(edges: DataFrame, src: Column, dst: Column,
                           iters: Int, damping: Double, scale: Int,
                           danglingRedistribution: Boolean,
                           tol: Option[Double]): (DataFrame, Int) = {
    require(iters >= 1, s"need iters >= 1, got $iters")
    require(damping > 0.0 && damping < 1.0, s"need 0 < damping < 1: $damping")
    val dec = DecimalType(38, scale)
    val e = edges.select(src.as("src"), dst.as("dst")).distinct()
      .localCheckpoint(true)
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val nodes = e.select(col("src").as("node"))
      .unionByName(e.select(col("dst").as("node"))).distinct()
      .localCheckpoint(true)
    val nTotal = broadcast(nodes.agg(count(lit(1)).as("nn")))
    // the (static) sink set — node-sized, computed once
    val dangNodes =
      if (danglingRedistribution)
        nodes.join(e.select(col("src")).distinct(),
            col("node") === col("src"), "left_anti")
          .select(col("node")).localCheckpoint(true)
      else null
    var ranks = nodes.crossJoin(nTotal)
      .select(col("node"), round(lit(1.0) / col("nn"), scale).as("r"))
      .localCheckpoint(true)
    var roundsRun = 0
    var converged = false
    for (_ <- 1 to iters if !converged) {
      val prev = ranks
      val contribs = e
        .join(ranks, e("src") === ranks("node"))
        .join(deg, "src")
        .select(col("dst"),
          round(col("r") / col("deg"), scale).cast(dec).as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("s"))
      // redistributed per-node share: d · round(Dᵢ/N, scale); Dᵢ is an
      // exact DECIMAL sum of already-quantized ranks, the division and
      // the round are IEEE correctly rounded — engine-exact like the
      // contribution path
      val recv = coalesce(col("s"), lit(0).cast(dec)).cast("double")
      val inflow =
        if (danglingRedistribution)
          recv + round(col("ds").cast("double") / col("nn"), scale)
        else recv
      val base = nodes.crossJoin(nTotal)
      val withDang =
        if (danglingRedistribution) {
          val dsum = broadcast(ranks
            .join(dangNodes, Seq("node"), "left_semi")
            .agg(coalesce(sum(col("r").cast(dec)),
              lit(0).cast(dec)).as("ds")))
          base.crossJoin(dsum)
        } else base
      ranks = withDang
        .join(contribs, col("node") === col("dst"), "left")
        .select(col("node"),
          round((lit(1.0) - lit(damping)) / col("nn")
            + lit(damping) * inflow, scale).as("r"))
        .localCheckpoint(true)
      roundsRun += 1
      tol.foreach { t =>
        // exact DECIMAL L1 delta of two already-quantized rank frames
        val delta = ranks
          .join(prev.select(col("node"), col("r").as("__pr")), "node")
          .agg(coalesce(sum(abs(col("r") - col("__pr")).cast(dec)),
            lit(0).cast(dec)).as("d"))
          .head().getDecimal(0)
        if (delta.doubleValue <= t) converged = true
      }
    }
    (ranks.select(col("node"), col("r").as("rank")), roundsRun)
  }

  /** HITS (Kleinberg 1999): hubs point at good authorities, authorities
    * are pointed at by good hubs. Per iteration, on the DIRECTED graph:
    * `a(v) = Σ_{u→v} h(u)` then L1-normalized, `h(u) = Σ_{u→v} a(v)`
    * then L1-normalized. L1 (sum) normalization instead of the
    * textbook L2 — same fixpoint direction, but the normalizer is an
    * EXACT DECIMAL sum of already-quantized scores instead of a
    * sqrt-of-sum-of-squares, which is what keeps every iteration
    * engine-exact under the [[pageRank]] discipline: contributions are
    * `round(score, scale)` cast to DECIMAL and summed exactly, the
    * normalizing division runs in IEEE doubles, and the result is
    * re-quantized. Multi-edges collapse first. Nodes without in-edges
    * score authority 0 (and sources/sinks correspondingly) — on a
    * bipartite src→dst graph authorities live entirely on the dst side,
    * hubs on the src side, which is the classic use. Returns
    * `(node, hub, authority)` after `iters` rounds. Scale shape: two
    * edge-keyed joins + two node-sized aggregates + two 1-row broadcast
    * normalizers per iteration; frames localCheckpoint-pinned. */
  def hits(edges: DataFrame, src: Column, dst: Column, iters: Int,
           scale: Int = 9): DataFrame = {
    require(iters >= 1, s"need iters >= 1, got $iters")
    val dec = s"decimal(38,$scale)"
    val e = edges.select(src.cast("long").as("src"),
      dst.cast("long").as("dst")).distinct().localCheckpoint(true)
    val nodes = e.select(col("src").as("node"))
      .unionByName(e.select(col("dst").as("node")))
      .distinct().localCheckpoint(true)
    var hub = nodes.select(col("node"), lit(1.0).as("h"))
    var auth: DataFrame = null
    for (_ <- 1 to iters) {
      val araw = e
        .join(hub.select(col("node").as("hn"), col("h")),
          e("src") === col("hn"))
        .select(col("dst"), col("h").cast(dec).as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("ar"))
      // pin the un-normalized frame ONCE: the normalizer aggregate and
      // the normalized projection both consume it, and without the pin
      // each re-executed the edge join + aggregate (2x the per-round
      // work at any scale)
      val aFull = nodes
        .join(araw, col("node") === col("dst"), "left")
        .select(col("node"),
          coalesce(col("ar"), lit(0).cast(dec)).as("ar"))
        .localCheckpoint(true)
      val aNorm = broadcast(aFull.agg(sum(col("ar")).as("asum")))
      auth = aFull.crossJoin(aNorm)
        .select(col("node"),
          round(col("ar").cast("double") / col("asum").cast("double"),
            scale).as("a"))
      val hraw = e
        .join(auth.select(col("node").as("an"), col("a")),
          e("dst") === col("an"))
        .select(col("src"), col("a").cast(dec).as("c"))
        .groupBy(col("src")).agg(sum(col("c")).as("hr"))
      val hFull = nodes
        .join(hraw, col("node") === col("src"), "left")
        .select(col("node"),
          coalesce(col("hr"), lit(0).cast(dec)).as("hr"))
        .localCheckpoint(true)
      val hNorm = broadcast(hFull.agg(sum(col("hr")).as("hsum")))
      hub = hFull.crossJoin(hNorm)
        .select(col("node"),
          round(col("hr").cast("double") / col("hsum").cast("double"),
            scale).as("h"))
    }
    hub.join(auth, "node")
      .select(col("node"), col("h").as("hub"), col("a").as("authority"))
  }

  /** SYNCHRONOUS label propagation — the standard cheap community
    * detector (Raghavan et al. 2007, the synchronous variant): every
    * node starts labeled with itself; each iteration every node adopts
    * the MOST FREQUENT label among its in-neighbors, ties broken to the
    * SMALLEST label (the deterministic tie-break that makes the result
    * engine-exact — the published algorithm breaks ties randomly, which
    * no oracle could replay). Nodes with no in-edges keep their label.
    * Feed both edge directions for the undirected form. Multi-edges
    * collapse first (one vote per distinct edge). Returns
    * `(id, label)` after exactly `iters` rounds — fixed iteration
    * count, not convergence detection, both because bipartite-ish
    * graphs oscillate under synchronous updates (documented; the
    * asynchronous variant that avoids it is order-dependent and
    * unreplayable) and because a fixed count is what an oracle can
    * unroll.
    *
    * Scale shape: labels and votes are node-sized, the join is
    * edge-sized — per iteration one labels→src join and one
    * (dst, label) count aggregate, then the argmax via
    * `max(struct(cnt, -label))` INSIDE the same aggregate pattern (no
    * per-node window/sort: the mode is a second small aggregate, not a
    * row_number over the vote table). Each round's label frame is
    * localCheckpoint-pinned like [[pageRank]]'s ranks. */
  def labelPropagation(edges: DataFrame, src: Column, dst: Column,
                       iters: Int): DataFrame =
    labelPropagationLoop(edges, src, dst, iters, stopWhenStable = false)._1

  /** [[labelPropagation]] with the natural stopping criterion: stop as
    * soon as a round changes ZERO labels (an exact integer count over
    * the node-sized frame — once no label moves, every further round is
    * provably a no-op, so early-stop output == any larger fixed count;
    * the spec pins it). Returns `(labels, roundsRun)`. */
  def labelPropagationConverged(edges: DataFrame, src: Column, dst: Column,
                                maxIters: Int): (DataFrame, Int) =
    labelPropagationLoop(edges, src, dst, maxIters, stopWhenStable = true)

  private def labelPropagationLoop(edges: DataFrame, src: Column,
                                   dst: Column, iters: Int,
                                   stopWhenStable: Boolean)
      : (DataFrame, Int) = {
    require(iters >= 1, s"need iters >= 1, got $iters")
    val e = edges.select(src.cast("long").as("src"),
      dst.cast("long").as("dst")).distinct().localCheckpoint(true)
    val nodes = e.select(col("src").as("node"))
      .unionByName(e.select(col("dst").as("node")))
      .distinct().localCheckpoint(true)
    var labels = nodes.select(col("node"), col("node").as("label"))
    var roundsRun = 0
    var converged = false
    for (_ <- 1 to iters if !converged) {
      val prev = labels
      val votes = e
        .join(labels.select(col("node"), col("label")),
          e("src") === col("node"))
        .groupBy(col("dst"), col("label"))
        .agg(count(lit(1)).as("cnt"))
      val mode = votes.groupBy(col("dst"))
        .agg(max(struct(col("cnt"), (-col("label")).as("nl"))).as("m"))
        .select(col("dst"), (-col("m").getField("nl")).as("__new"))
      labels = labels
        .join(mode, labels("node") === mode("dst"), "left")
        .select(col("node"),
          coalesce(col("__new"), col("label")).as("label"))
        .localCheckpoint(true)
      roundsRun += 1
      if (stopWhenStable) {
        val changed = labels
          .join(prev.select(col("node"), col("label").as("__pl")), "node")
          .filter(col("label") =!= col("__pl")).count()
        if (changed == 0L) converged = true
      }
    }
    (labels.select(col("node").as("id"), col("label")), roundsRun)
  }
}
