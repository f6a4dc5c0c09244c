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
  * Salt derivation is a REQUIRED, visible decision at every call site
  * ([[SaltMode]]) — two modes, in preference order:
  *
  *  1. [[SaltMode.FromId]] (a unique row id): salt =
  *     `pmod(xxhash64(id), buckets)`. DETERMINISTIC under task retry —
  *     a recomputed map task re-salts every row identically, so a fetch
  *     failure needs no stage rollback — and it still spreads a hot key's
  *     N byte-identical payload rows across buckets, because their ids
  *     differ even when every other column agrees. This is the mode to
  *     use whenever any unique column exists.
  *  2. [[SaltMode.RoundRobinUnsafe]]: salt =
  *     `monotonically_increasing_id() % buckets`, a round-robin counter.
  *     A whole-row hash is NOT a usable fallback
  *     (N byte-identical hot rows all hash to ONE bucket, recreating
  *     exactly the hotspot salting exists to break, and hash functions
  *     reject map-typed columns), so the counter is the only spread that
  *     needs no unique column — but it is NONDETERMINISTIC across task
  *     retries. The merged result is invariant to which bucket a row
  *     lands in, so the algebra is safe, but the SCHEDULER is not: if the
  *     input sits downstream of a shuffle, a lost map output recomputed
  *     after some reducers already fetched re-salts rows differently, and
  *     Spark's only safe response to an indeterminate stage is a
  *     full-stage rollback (the SPARK-23207 class). Precondition for this
  *     mode, stated as the operator contract: the input must be
  *     deterministically ordered per partition (scan-level, not
  *     post-shuffle), or the job must tolerate stage rollback on fetch
  *     failure. The name carries the warning: there is no silent default
  *     that picks this mode.
  */
object Skew {

  /** How each row's salt bucket is derived — see the object scaladoc for
    * the determinism contract of each mode. */
  sealed trait SaltMode
  object SaltMode {
    /** Deterministic, retry-safe: hash of a unique id column. */
    final case class FromId(id: Column) extends SaltMode
    /** Round-robin counter: spreads without a unique column, but is an
      * indeterminate shuffle key across task retries (SPARK-23207) —
      * opting in is deliberately spelled "Unsafe" at the call site. */
    case object RoundRobinUnsafe extends SaltMode
  }

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

  /** Salt column for `buckets` sub-groups — see the object scaladoc for
    * the determinism contract of each mode. */
  private def saltExpr(mode: SaltMode, buckets: Int): Column =
    mode match {
      case SaltMode.FromId(id) => pmod(xxhash64(id), lit(buckets.toLong))
      case SaltMode.RoundRobinUnsafe =>
        pmod(monotonically_increasing_id(), lit(buckets.toLong))
    }

  def saltedAgg(df: DataFrame, keys: Seq[Column], buckets: Int,
                aggs: Seq[TwoPhaseAgg],
                saltMode: SaltMode): DataFrame = {
    val salted = df.withColumn("__salt", saltExpr(saltMode, buckets))
    val partialCols = aggs.map(a => a.partial.as(s"__p_${a.name}"))
    val phase1 = salted
      .groupBy(keys :+ col("__salt"): _*)
      .agg(partialCols.head, partialCols.tail: _*)
    val mergeCols = aggs.map(a => a.merge(col(s"__p_${a.name}")).as(a.name))
    phase1.groupBy(keys: _*).agg(mergeCols.head, mergeCols.tail: _*)
  }

  /** Skew-safe fact-to-dimension shuffle join: the fact side is salted
    * (per the required `saltMode` — see the object scaladoc) and the dim
    * side is replicated `saltFactor`× with every
    * salt value, so each hot key's volume — including N byte-identical
    * copies of one row — spreads over `saltFactor` reducers instead of
    * one. Result is exactly the plain inner join. For when the dim is too
    * big to broadcast and AQE's skew split doesn't engage (it needs the
    * skew visible in map statistics; a pre-shuffled or bucketed layout
    * hides it). Replication cost is `saltFactor × |dim|` — pick the
    * smallest factor that levels the hot keys. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, joinKey: String,
                 saltFactor: Int,
                 saltMode: SaltMode): DataFrame = {
    // pmod(x, 0) is null (non-ANSI): without this a zero factor would make
    // every fact row's salt null and silently return an EMPTY join
    require(saltFactor >= 1, s"saltFactor must be >= 1, got $saltFactor")
    val salted = fact.withColumn("__salt",
      saltExpr(saltMode, saltFactor).cast("int"))
    val replicated = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    salted.join(replicated, Seq(joinKey, "__salt")).drop("__salt")
  }
}
