package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** DSIR — Data Selection with Importance Resampling (Xie et al. 2023,
  * "Data Selection for Language Models via Importance Resampling"):
  * score every raw document by how much more likely its features are
  * under a TARGET-domain distribution than under the raw-corpus
  * distribution, then keep the top of the raw corpus by that importance
  * weight — the standard way a pretraining team skews a web crawl
  * toward a quality/domain sample without training a classifier.
  *
  * Features are the document's 1..n-gram token multiset (the paper uses
  * hashed n-grams; the hermetic form here keys features by the grams
  * themselves, which any engine replays exactly — at 100 TB the
  * feature table is vocabulary-shaped either way, and [[Dedup]]-style
  * hashing composes upstream when the gram space must be bounded).
  * Both distributions are Laplace-smoothed over the SHARED feature
  * vocabulary V (every feature seen in either corpus):
  * `p(f) = (n_f + 1) / (N + |V|)` — no zero anywhere, so the
  * log-ratio is total.
  *
  * ENGINE-EXACT: each feature's log importance ratio
  * `ln(p_tgt(f) / p_raw(f))` is rounded ONCE to 6 dp, and a document's
  * log-weight is the occurrence-weighted DECIMAL sum of those rounded
  * ratios — exact, associativity-free, bit-equal on any engine (the
  * n-gram-LM contract).
  *
  * Scale shape: two counting aggregates (one scan per corpus), one
  * vocabulary-sized join to build the ratio table, then the raw docs'
  * exploded features join the ratios on the feature key (shuffle on
  * the feature — the same exchange the LM scorers pay) and fold back
  * to one row per document. Selection is a rank-limited top-k
  * (TakeOrderedAndProject), never a global sort. Nothing is ever
  * corpus-×-corpus.
  */
object Dsir {

  private val dec = DecimalType(38, 6)

  /** The 1..n-gram feature multiset of a text column, exploded:
    * one row per occurrence. */
  private def features(df: DataFrame, id: Column, text: Column,
                       ngram: Int, nBuckets: Int): DataFrame = {
    val toks = TextAnalysis.tokens(text)
    // k-grams built from (k-1)-grams: pair gram i with token i+k-1 —
    // grams stay contiguous (never skip or cross token boundaries)
    val byLen = (2 to ngram).scanLeft(toks) { (prev, k) =>
      zip_with(
        slice(prev, lit(1), greatest(size(toks) - (k - 1), lit(0))),
        slice(toks, lit(k), greatest(size(toks) - (k - 1), lit(0))),
        (a, b) => concat(a, lit(" "), b))
    }
    val exploded = df.select(id.as("doc_id"),
      explode(byLen.reduce(concat(_, _))).as("__g"))
    // the paper's HASHED feature space: md5-bucket the gram (the
    // portable-hash convention — both engines re-derive the identical
    // bucket), so the long tail POOLS into well-estimated buckets
    // instead of each rare gram meeting Laplace smoothing alone
    val f =
      if (nBuckets > 0)
        pmod(conv(substring(md5(col("__g")), 1, 8), 16, 10).cast("long"),
          lit(nBuckets.toLong)).cast("string")
      else col("__g")
    exploded.select(col("doc_id"), f.as("f"))
  }

  /** Per-feature importance log-ratio table:
    * `(f, tgt_n, raw_n, logr)` where `logr = round(ln(p_tgt/p_raw), 6)`
    * under Laplace smoothing over the shared vocabulary. Vocabulary-
    * sized. For n-gram features of k > 2 the second slice shifts by
    * k−1 — grams never cross token boundaries. */
  def ratioTable(raw: DataFrame, target: DataFrame, id: Column,
                 text: Column, ngram: Int = 2,
                 nBuckets: Int = 0): DataFrame = {
    require(ngram >= 1 && ngram <= 3, s"need 1 <= ngram <= 3: $ngram")
    require(nBuckets >= 0, s"need nBuckets >= 0: $nBuckets")
    val rawCnt = features(raw, id, text, ngram, nBuckets)
      .groupBy(col("f")).agg(count(lit(1)).as("raw_n"))
    val tgtCnt = features(target, id, text, ngram, nBuckets)
      .groupBy(col("f")).agg(count(lit(1)).as("tgt_n"))
    val joined = rawCnt.join(tgtCnt, Seq("f"), "full_outer")
      .na.fill(0L, Seq("raw_n", "tgt_n"))
      .localCheckpoint()
    val stats = broadcast(joined.agg(
      count(lit(1)).as("__V"),
      sum(col("raw_n")).as("__NR"),
      sum(col("tgt_n")).as("__NT")))
    joined.crossJoin(stats)
      .select(col("f"), col("tgt_n"), col("raw_n"),
        round(
          log((col("tgt_n") + 1).cast("double") /
              (col("__NT") + col("__V")).cast("double")) -
          log((col("raw_n") + 1).cast("double") /
              (col("__NR") + col("__V")).cast("double")), 6).as("logr"))
  }

  /** Per-document importance log-weights over the raw corpus:
    * `(doc_id, n_feats, logw)` — the DECIMAL-summed rounded ratios.
    * Documents with no features (blank) score 0 with 0 features —
    * faithfully the paper's importance ratio of 1 for an empty feature
    * vector, which typically OUTRANKS out-of-domain text; a real
    * pipeline filters empties upstream (the quality gate owns them).
    * The TARGET sample must be large enough that Laplace smoothing
    * doesn't flatten p_tgt toward uniform (a handful of target tokens
    * over a web-scale vocabulary scores everything near zero —
    * estimate-quality is the caller's dial, per the paper). */
  def weights(raw: DataFrame, target: DataFrame, id: Column,
              text: Column, ngram: Int = 2,
              nBuckets: Int = 0): DataFrame = {
    val ratios = ratioTable(raw, target, id, text, ngram, nBuckets)
      .select(col("f"), col("logr"))
    val docF = features(raw, id, text, ngram, nBuckets)
    val scored = docF.join(ratios, Seq("f"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_feats"),
        sum(col("logr").cast(dec)).cast("double").as("logw"))
    raw.select(id.as("doc_id"))
      .join(scored, Seq("doc_id"), "left")
      .na.fill(0L, Seq("n_feats")).na.fill(0.0, Seq("logw"))
  }

  /** The selection: top-`k` raw documents by `(logw DESC, doc_id)` —
    * deterministic, rank-limited. This is the EXPECTATION-shaped form
    * of the paper's Gumbel resampling (greedy top-k by weight); for the
    * sampled form compose `logw` with [[Sampling.weightedTopK]]'s
    * seeded-priority machinery. */
  def select(raw: DataFrame, target: DataFrame, id: Column, text: Column,
             k: Int, ngram: Int = 2, nBuckets: Int = 0): DataFrame = {
    require(k >= 1, s"need k >= 1: $k")
    weights(raw, target, id, text, ngram, nBuckets)
      .orderBy(col("logw").desc, col("doc_id"))
      .limit(k)
  }
}
