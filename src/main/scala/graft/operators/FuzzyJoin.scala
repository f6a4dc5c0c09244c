package graft.operators

import graft.functions.TextHashExpressions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate string-key matching at scale: all pairs of distinct key
  * VALUES within edit (Levenshtein) distance `maxDist`, without an
  * all-pairs comparison. The large-pipeline use is entity/key resolution —
  * near-identical titles, product names, normalized URLs — where the naive
  * N² cross join is impossible and sorted-neighborhood misses transpositions.
  *
  * Method (SymSpell-style deletion banding): two strings within edit
  * distance d always share a member of their d-deletion neighborhoods
  * (align the edit script, delete the substituted/inserted characters from
  * each side), so the neighborhood is an LSH-style band key with recall 1
  * — candidates are an equi-join on a 64-bit hash of the variant, then
  * exact `levenshtein` verification drops the false candidates (including
  * 64-bit variant-hash collisions, which are harmless here). No quadratic
  * stage anywhere: candidate volume is bounded by bucket occupancy, like
  * the MinHash and hyperplane-LSH operators.
  *
  * Scale notes (100 TB): the operator works on DISTINCT key values —
  * identical keys collapse in ONE partial-aggregated exchange (map-side
  * combine makes the shuffle distinct-sized, and a hot duplicate key
  * cannot explode any later stage; expanding value pairs back to row pairs
  * is [[Dedup.exactGroups]]' composition, exactly as minhashLshPairs
  * documents). Banded rows are fixed-width `(kf, vh)` longs — neighborhood
  * strings are hashed in-scan and never shuffled. Verification fetches key
  * strings for the candidate-sized pair set only, broadcast behind the
  * same measured-count guard + shuffle fallback as the other incremental
  * operators. Neighborhood size is O(L^maxDist) per key: fine for keys,
  * wrong for documents — `maxKeyLength` fails fast on misuse (a single
  * 10 KB "key" at d=2 would band into ~10⁸ rows).
  */
object FuzzyJoin {

  /** (key_a, key_b, dist) for every unordered pair of distinct non-null
    * key values with `levenshtein(key_a, key_b) <= maxDist`, key_a < key_b
    * lexicographically. `maxDist` ∈ {1, 2}. */
  def editDistancePairs(df: DataFrame, key: Column, maxDist: Int = 1,
                        maxKeyLength: Int = 256,
                        maxBroadcastCandidates: Long = 10L * 1000 * 1000): DataFrame = {
    require(maxDist >= 1 && maxDist <= 2,
      s"maxDist must be 1 or 2 (got $maxDist); deletion banding is " +
        "O(L^maxDist) per key and loses selectivity beyond that")
    val overLong = df.select(key.as("key"))
      .filter(col("key").isNotNull && length(col("key")) > maxKeyLength)
      .limit(1).count()
    require(overLong == 0L,
      s"editDistancePairs: keys longer than $maxKeyLength chars present — " +
        "this operator bands KEYS (names, titles, URLs), not documents; " +
        "raise maxKeyLength only if the length is intentional")
    // One partial-aggregated exchange collapses duplicate keys — grouped on
    // the KEY STRING itself (bounded by maxKeyLength, so the exchange is no
    // wider than the min(key) payload it used to carry), so no 64-bit
    // collision can merge two distinct key values and silently drop one.
    // kf is the fixed-width stand-in from here on; the residual collision
    // class is benign in the other direction: two distinct keys sharing kf
    // cannot candidate-pair with EACH OTHER (`kf_a < kf_b` never holds), an
    // expected n²/2⁶⁵ missed pairs — they still pair correctly with every
    // other key, and verification joins expand both and levenshtein-verify.
    val keys = df.select(key.as("key")).filter(col("key").isNotNull)
      .distinct()
      .select(xxhash64(col("key")).as("kf"), col("key"))
    val banded = keys.select(col("kf"),
        explode(TextHashExpressions.deletionNeighborhood(col("key"), maxDist))
          .as("v"))
      .select(col("kf"), xxhash64(col("v")).as("vh"))
    val cand = banded.as("a")
      .join(banded.as("b"),
        col("a.vh") === col("b.vh") && col("a.kf") < col("b.kf"))
      .select(col("a.kf").as("kf_a"), col("b.kf").as("kf_b"))
      .distinct()
    val broadcastSafe = cand.count() <= maxBroadcastCandidates
    def hinted(d: DataFrame): DataFrame = if (broadcastSafe) broadcast(d) else d
    if (!broadcastSafe)
      System.err.println(
        s"[graft] editDistancePairs: candidate set exceeds " +
          s"$maxBroadcastCandidates pairs — falling back to shuffle joins " +
          "for verification (keys barely distinct, or maxDist too loose?)")
    val withA = keys.select(col("kf").as("kf_a"), col("key").as("ka"))
      .join(hinted(cand), "kf_a")
    keys.select(col("kf").as("kf_b"), col("key").as("kb"))
      .join(hinted(withA), "kf_b")
      .withColumn("dist", levenshtein(col("ka"), col("kb")).cast("long"))
      .filter(col("dist") <= maxDist)
      .select(least(col("ka"), col("kb")).as("key_a"),
        greatest(col("ka"), col("kb")).as("key_b"), col("dist"))
  }
}
