package graft.operators

import graft.functions.TopKAggregator
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Shared per-query top-k ranking over a scored candidate frame — the
  * partial-aggregated replacement for `row_number().over(Window
  * .partitionBy(query_id).orderBy(score desc, cand_id)) <= k`.
  *
  * Why not the Window: a window must co-locate EVERY scored row of a
  * query before ranking, so the ranking exchange carries the full N×Q
  * candidate volume and its parallelism is capped by the query count —
  * the one non-scan-shaped stage in every ANN plan. The bounded
  * [[TopKAggregator]] runs as a normal partial→final aggregation: each
  * scan task forwards at most k rows per query, the exchange carries
  * (scan partitions)×Q×k rows, and no task ever sorts more than k
  * elements. Output is bit-identical to the Window form (same total
  * order: nulls last, score desc, ties to the lowest cand_id), so every
  * oracle that held the Window plans holds these.
  */
object Ranking {

  /** `scored` must carry `query_id`, `cand_id`, and `scoreCol`; returns
    * `(query_id, rk, cand_id, <scoreCol>)` with rk 1..k per query. */
  def topKPerQuery(scored: DataFrame, k: Int,
                   scoreCol: String = "cosine"): DataFrame = {
    val topk = udaf(new TopKAggregator(k))
    scored.groupBy(col("query_id"))
      .agg(topk(col("cand_id"), col(scoreCol)).as("__tk"))
      .select(col("query_id"), explode(col("__tk")).as("__s"))
      .select(col("query_id"), col("__s.rk").as("rk"),
        col("__s.cand_id").as("cand_id"), col("__s.score").as(scoreCol))
  }

  /** Reciprocal-rank fusion (Cormack et al.) of already-ranked result
    * lists — the standard way to combine retrieval signals whose scores
    * are not comparable (BM25 vs cosine): each list contributes
    * `1/(c + rank)` for the items it ranked, fused score is the fixed
    * left-to-right sum over lists, missing-from-list contributes 0 (and
    * its rank column reads 0 = "absent"). Inputs are top-k-SIZED frames
    * (the expensive ranking already happened), so the full-outer joins
    * here broadcast — RRF itself costs nothing at any corpus scale.
    * Output: `(rk, id, <rankCol per list…>, rrf)`, top `k` by
    * (rrf DESC, id). Every arithmetic step is a correctly-rounded IEEE
    * op in a fixed order, so the fused ranking is engine-exact. */
  def rrfFuse(lists: Seq[(String, DataFrame)], idCol: String,
              rankCol: String, k: Int, c: Int = 60): DataFrame = {
    require(lists.size >= 2, s"fusion needs >= 2 lists, got ${lists.size}")
    require(lists.map(_._1).distinct.size == lists.size,
      s"duplicate list names: ${lists.map(_._1)}")
    import org.apache.spark.sql.expressions.Window
    // the arithmetic assumes each list ranks an id ONCE with 1-based
    // INTEGRAL ranks (0 is the output's "absent" sentinel) and is
    // silently wrong otherwise (a duplicated id fans the join out, a
    // 0-based rank inflates the top hit AND collides with the sentinel,
    // a fractional rank would truncate). The guards are per-row
    // raise_error poisons INSIDE the rank column — one composed plan, no
    // pre-pass action re-executing the (corpus-scale BM25/ANN) ranking
    // lineage, zero cost on clean data; the id-count window runs on a
    // top-k-sized frame. A null rank still reads "absent", unpoisoned.
    val renamed = lists.map { case (name, df) =>
      val dupes = count(lit(1)).over(Window.partitionBy(col(idCol)))
      val rkRaw = col(rankCol)
      val rkL = rkRaw.cast("long")
      val guarded = when(dupes > 1, raise_error(lit(
          s"rrfFuse: list '$name' ranks an id more than once — dedup or " +
            "re-rank it first")).cast("long"))
        .when(rkRaw < 1, raise_error(lit(
          s"rrfFuse: list '$name' has a rank < 1 — ranks must be 1-based " +
            "(0 is the output's absent sentinel)")).cast("long"))
        .when(rkL.cast("double") =!= rkRaw.cast("double"), raise_error(lit(
          s"rrfFuse: list '$name' has a non-integral rank — 1/(c+rank) " +
            "assumes integer positions")).cast("long"))
        .otherwise(rkL)
      name -> df.select(col(idCol).as("id"), guarded.as(s"rk_$name"))
    }
    val joined = renamed.map(_._2)
      .reduce((a, b) => a.join(b, Seq("id"), "full_outer"))
    val score = renamed.map { case (name, _) =>
      coalesce(lit(1.0) / (lit(c.toDouble) + col(s"rk_$name")), lit(0.0))
    }.reduce(_ + _)
    val rankCols = renamed.map { case (name, _) =>
      coalesce(col(s"rk_$name"), lit(0L)).as(s"rk_$name")
    }
    joined.select((col("id") +: rankCols :+ round(score, 6).as("rrf")): _*)
      .orderBy(col("rrf").desc, col("id"))
      .limit(k)
      .select((row_number().over(Window.orderBy(col("rrf").desc, col("id")))
        .as("rk") +: (col("id") +: renamed.map(p => col(s"rk_${p._1}")))
        :+ col("rrf")): _*)
      .orderBy(col("rk"))
  }
}
