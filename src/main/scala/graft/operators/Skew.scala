package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation: two-phase salted aggregation. When one grouping key
  * carries a disproportionate share of rows (a hot user, an empty-string
  * dedup key), the single shuffle of a plain `groupBy` sends that key's
  * entire volume to one reducer. Salting splits each key into `buckets`
  * sub-groups aggregated in parallel, then merges the partials with a
  * second (tiny) aggregation — the standard pattern when AQE's runtime
  * skew-join handling doesn't apply (it covers joins, not aggregations).
  *
  * The salt is a per-row round-robin counter
  * (`monotonically_increasing_id % buckets`), NOT a row hash: a hot key in
  * real data is typically N near- or byte-identical rows, and a
  * whole-row hash sends all of them to ONE bucket — recreating exactly
  * the hotspot salting exists to break (it also fails outright on
  * map-typed columns, which hash functions reject). The counter is
  * nondeterministic across task retries, which is harmless by
  * construction: the merged aggregate and the join output are invariant
  * to WHICH bucket a row lands in — the salt only spreads work.
  */
object Skew {

  /** One aggregate in two phases: `partial` computes within (key, salt);
    * `merge(partialCol)` combines partials per key. For algebraic
    * aggregates: sum→sum, count→sum, min→min, max→max. */
  final case class TwoPhaseAgg(name: String, partial: Column,
                               merge: Column => Column)

  def sum2(name: String, c: Column): TwoPhaseAgg =
    TwoPhaseAgg(name, sum(c), sum)
  def count2(name: String): TwoPhaseAgg =
    TwoPhaseAgg(name, count(lit(1)), sum)
  def min2(name: String, c: Column): TwoPhaseAgg =
    TwoPhaseAgg(name, min(c), min)
  def max2(name: String, c: Column): TwoPhaseAgg =
    TwoPhaseAgg(name, max(c), max)

  def saltedAgg(df: DataFrame, keys: Seq[Column], buckets: Int,
                aggs: Seq[TwoPhaseAgg]): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(buckets.toLong)))
    val partialCols = aggs.map(a => a.partial.as(s"__p_${a.name}"))
    val phase1 = salted
      .groupBy(keys :+ col("__salt"): _*)
      .agg(partialCols.head, partialCols.tail: _*)
    val mergeCols = aggs.map(a => a.merge(col(s"__p_${a.name}")).as(a.name))
    phase1.groupBy(keys: _*).agg(mergeCols.head, mergeCols.tail: _*)
  }

  /** Skew-safe fact-to-dimension shuffle join: the fact side is salted
    * (round-robin counter mod `saltFactor` — see the object scaladoc for
    * why not a row hash) and the dim side is replicated `saltFactor`×
    * with every salt value, so each hot key's volume — including N
    * byte-identical copies of one row — spreads over `saltFactor`
    * reducers instead of one. Result is exactly the plain inner join.
    * For when the dim is too big to broadcast and AQE's skew split
    * doesn't engage (it needs the skew visible in map statistics; a
    * pre-shuffled or bucketed layout hides it). Replication cost is
    * `saltFactor × |dim|` — pick the smallest factor that levels the hot
    * keys. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, joinKey: String,
                 saltFactor: Int): DataFrame = {
    // pmod(x, 0) is null (non-ANSI): without this a zero factor would make
    // every fact row's salt null and silently return an EMPTY join
    require(saltFactor >= 1, s"saltFactor must be >= 1, got $saltFactor")
    val salted = fact.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(saltFactor.toLong)).cast("int"))
    val replicated = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    salted.join(replicated, Seq(joinKey, "__salt")).drop("__salt")
  }
}
