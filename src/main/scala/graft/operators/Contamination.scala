package graft.operators

import graft.functions.TextHashExpressions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Benchmark-contamination scan: which training documents share word
  * n-grams with a test/benchmark corpus (the GPT-3/PaLM-style n-gram
  * overlap check run before training).
  *
  * Shape at 100 TB: the train side is ONE scan with its distinct shingles
  * exploded (fixed small multiplier of the text size); the test side — a
  * benchmark, thousands of documents — is broadcast, so there is no
  * corpus shuffle at all. If the test side ever outgrows broadcast, the
  * same plan degrades gracefully to a hash join keyed on the shingle.
  * Shingles join as strings for exactness against the SQL oracle; switch
  * the join key to xxhash64(sh) to make shuffle rows fixed-width when
  * exactness against string semantics is not required.
  */
object Contamination {

  /** (doc_id, test_id, n_shared) for every train/test pair sharing at
    * least `minShared` distinct word `ngram`-grams. */
  def ngramOverlap(train: DataFrame, trainId: Column, trainText: Column,
                   test: DataFrame, testId: Column, testText: Column,
                   ngram: Int = 3, minShared: Long = 1): DataFrame = {
    // explode_outer: the non-outer generator would make Catalyst infer
    // isnotnull(shingles(text)) and inline a second kernel evaluation into
    // the scan filter; null shingle arrays simply never join.
    val tr = train.select(trainId.as("doc_id"),
      explode_outer(TextHashExpressions.shingles(trainText, ngram)).as("sh"))
    val te = test.select(testId.as("test_id"),
      explode_outer(TextHashExpressions.shingles(testText, ngram)).as("sh"))
    tr.join(broadcast(te), "sh")
      .groupBy(col("doc_id"), col("test_id"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** Exact-substring contamination: (doc_id, test_id) for every training
    * document containing a test fragment VERBATIM — the strict form of
    * the scan, catching the copy [[ngramOverlap]]'s distinct-shingle
    * counting can understate (a fragment repeated once vs pasted whole).
    *
    * Shape at 100 TB: fragments (a benchmark — thousands of strings) are
    * broadcast and the train side is ONE scan with a per-row contains
    * check; no shuffle touches the corpus, and output is match-sized. The
    * per-row cost is |frags| substring searches; if the fragment set ever
    * outgrows that, run [[ngramOverlap]] first and exact-check only its
    * survivors (candidate-sized). */
  def exactSubstring(train: DataFrame, trainId: Column, trainText: Column,
                     frags: DataFrame, fragId: Column, fragText: Column): DataFrame =
    train.select(trainId.as("doc_id"), trainText.as("__text"))
      // blank fragments are dropped, not matched: instr(text, '') is 1
      // for EVERY document, so one empty benchmark row would otherwise
      // flag the whole corpus and blow the match-sized-output contract
      .crossJoin(broadcast(frags.select(fragId.as("test_id"), fragText.as("frag"))
        .filter(col("frag").isNotNull && length(col("frag")) > 0)))
      .filter(instr(col("__text"), col("frag")) > 0)
      .select(col("doc_id"), col("test_id"))

  /** The multi-pattern scale form of [[exactSubstring]], for fragment
    * sets too large to probe per row: each `k`-token fragment's single
    * window hash equi-joins the corpus's per-position `k`-token window
    * hashes ([[graft.functions.TextHashExpressions.spanHashes]] — one
    * kernel pass per document, 64-bit keys), so cost is one corpus scan
    * plus a hash join instead of |frags| substring searches per row.
    * Semantics are TOKEN-ALIGNED containment (the fragment equals some
    * k-token window), the natural unit for training-data checks;
    * [[exactSubstring]] is the byte-level form. Fragments that are not
    * exactly `k` tokens are ignored — group a mixed benchmark by token
    * count and run once per length.
    *
    * Hash candidates are then STRING-verified: a 64-bit window-hash
    * collision must not report a false 'exact' contamination pair (this
    * output gates training data), so the match-sized survivor set is
    * broadcast back onto one more corpus scan and re-checked against the
    * actual strings. The window hash covers the RAW BYTES between two
    * single-space token boundaries ([[TextKernels.spanHashes]]), so the
    * exact string form of "fragment equals some k-token window" is
    * space-padded byte containment: `' '||doc||' '` contains
    * `' '||frag||' '`. Corpus text never shuffles; the extra scan's
    * join side is match-sized. */
  def exactSubstringIndexed(train: DataFrame, trainId: Column, trainText: Column,
                            frags: DataFrame, fragId: Column, fragText: Column,
                            k: Int = 8): DataFrame = {
    val fw = frags.select(fragId.as("test_id"), fragText.as("__frag"),
        TextHashExpressions.spanHashes(fragText, k).as("__whs"))
      .filter(size(col("__whs")) === 1)
      .select(col("test_id"), col("__frag"), element_at(col("__whs"), 1).as("wh"))
    val w = train.select(trainId.as("doc_id"),
      explode_outer(TextHashExpressions.spanHashes(trainText, k)).as("wh"))
    val cand = w.join(broadcast(fw), "wh")
      .select(col("doc_id"), col("test_id"), col("__frag"))
      .distinct()
    // Collision re-verification against the actual strings. A true hash
    // match means the fragment's bytes equal a window's bytes, and every
    // window is bounded by ' ' (or a string edge) — the space sentinels
    // make instr accept exactly those positions, so a real match always
    // survives and a collision cannot.
    def padded(c: Column): Column = concat(lit(" "), c, lit(" "))
    train.select(trainId.as("doc_id"), padded(trainText).as("__padded"))
      .join(broadcast(cand), "doc_id")
      .filter(instr(col("__padded"), padded(col("__frag"))) > 0)
      .select(col("doc_id"), col("test_id"))
  }
}
