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
}
