package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling and data-mixing for training-data pipelines.
  *
  * `df.sample()` is neither exact (binomial per partition) nor stable
  * across partitionings, which makes experiment reproduction and oracle
  * checking impossible. Here rows are ordered WITHIN each stratum by the
  * md5 of their id — a fixed, content-independent pseudo-random order any
  * engine reproduces bit-identically — and the first
  * `ceil(fraction × stratum_size)` survive. Exact counts, one shuffle
  * (the stratum window), same result on 1 or 1000 executors.
  *
  * Scale note: the exact-count forms window per stratum, so a giant
  * stratum funnels through one task in the window sort. [[hashSample]] /
  * [[mixtureHash]] are the corpus-scale forms — per-row hash-threshold
  * filters, shuffle-free at any stratum size, approximate in count but
  * just as deterministic.
  */
object Sampling {

  private def hashOrder(id: Column): Seq[Column] =
    Seq(md5(id.cast("string")), id)

  /** Exact-fraction stratified sample with an optional per-stratum cap. */
  def stratified(df: DataFrame, strata: Seq[Column], id: Column,
                 fraction: Double, cap: Long = Long.MaxValue): DataFrame = {
    val w = Window.partitionBy(strata: _*).orderBy(hashOrder(id): _*)
    val cw = Window.partitionBy(strata: _*)
    df.withColumn("__rn", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(cw))
      .filter(col("__rn") <= least(ceil(col("__n") * fraction), lit(cap)))
      .drop("__rn", "__n")
  }

  /** 8-hex-digit threshold for `fraction` of the md5 keyspace: fixed-width
    * lowercase hex compares lexicographically in numeric order, so
    * `substr(md5(id),1,8) < threshold` keeps ≈`fraction` of rows — the
    * same rows in every engine, every partitioning, every run. "g" sorts
    * above every hex digit and means keep-all. */
  private[graft] def hexThreshold(fraction: Double): String = {
    val t = math.min(math.max(fraction, 0.0), 1.0)
    val v = math.round(t * (1L << 32))
    if (v >= (1L << 32)) "g" else f"$v%08x"
  }

  private def hashKey(id: Column): Column =
    substring(md5(id.cast("string")), 1, 8)

  /** The corpus-scale sampler: per-row hash-threshold filter — no window,
    * no shuffle, no per-stratum funnel; a giant stratum costs nothing
    * extra. Fractions are approximate (binomial around the target, exact
    * in expectation) where [[stratified]]/[[mixture]] are exact-count;
    * both are deterministic and partition-invariant. This is the form
    * that survives a 100 TB stratum. */
  def hashSample(df: DataFrame, id: Column, fraction: Double): DataFrame =
    df.filter(hashKey(id) < lit(hexThreshold(fraction)))

  /** Scale path of [[mixture]]: per-stratum weights applied as per-row
    * hash thresholds. Map-only — the weight lookup and the filter are
    * plain expressions on each row. */
  def mixtureHash(df: DataFrame, stratum: Column, id: Column,
                  weights: Map[String, Double],
                  defaultWeight: Double = 0.0): DataFrame = {
    val thrs = typedLit(weights.map { case (k, v) => k -> hexThreshold(v) })
    df.filter(hashKey(id) <
      coalesce(element_at(thrs, stratum.cast("string")),
        lit(hexThreshold(defaultWeight))))
  }

  /** LEAKAGE-SAFE split assignment: every row of a GROUP lands in the
    * same split, so near-duplicates (or any other unit that must not
    * straddle train/eval — a dedup cluster, a domain, a user) can never
    * leak evaluation content into training. Pass the group column (e.g.
    * `cluster_id` from [[Dedup.minhashClusters]]) and ordered
    * `(name, fraction)` splits summing to ≤ 1 (any remainder falls to
    * the LAST split — fractions over groups are approximate, binomial
    * around the target, exactly like [[hashSample]]).
    *
    * Map-only: the split is a pure expression of the group key (md5
    * threshold ladder), no shuffle, no state — on 100 TB the split
    * column costs the same as any projection, and re-running on a grown
    * corpus never reassigns an existing group (assignment depends only
    * on the group key), which is what makes the split stable across
    * corpus versions. Output: input columns + `split`. */
  def splitByGroup(df: DataFrame, group: Column,
                   splits: Seq[(String, Double)]): DataFrame = {
    require(splits.size >= 2, s"need at least 2 splits, got ${splits.size}")
    require(splits.forall(_._2 > 0.0), s"split fractions must be > 0: $splits")
    require(splits.map(_._2).sum <= 1.0 + 1e-9,
      s"split fractions sum over 1: $splits")
    // a NULL group key would fall through every threshold rung into the
    // LAST split — silently flooding the eval split is the one failure a
    // leakage-safety API must not have. The guard is a per-row
    // raise_error poison on the null branch (NOT a pre-pass filter
    // probe: the input here is typically an expensive clustering
    // lineage, and a construction-time scan would execute it twice) —
    // zero cost unless violated, fails by name at first null. It lives
    // IN the split column, so it fires exactly when that column is
    // consumed — a query that prunes the column away never reads the
    // corrupt value either.
    val h = hashKey(when(group.isNull,
      raise_error(lit("splitByGroup: the group column contains nulls — " +
        "every null-keyed row would land in the last split; fix the " +
        "upstream join or coalesce the key first")).cast("string"))
      .otherwise(group.cast("string")))
    // cumulative thresholds: [f1, f1+f2, ...); the last split is the
    // unconditional remainder, so the ladder never drops a row
    val cum = splits.init.scanLeft(0.0)(_ + _._2).tail
    val ladder = splits.init.zip(cum).foldLeft(Option.empty[Column]) {
      case (acc, ((name, _), c)) =>
        val cond = h < lit(hexThreshold(c))
        Some(acc.fold(when(cond, lit(name)))(_.when(cond, lit(name))))
    }
    df.withColumn("split", ladder.get.otherwise(lit(splits.last._1)))
  }

  /** CURRICULUM BINNING: assign each row a difficulty bin (1 = easiest
    * … nBins = hardest by ascending `score`) by comparing against the
    * corpus's exact interpolated quantile boundaries — the data-side
    * half of curriculum learning (order/stage training data by a
    * difficulty proxy).
    *
    * Deliberately NOT an ntile window: a global rank window needs a
    * total order (single-partition sort at corpus scale); threshold
    * binning is ONE boundary aggregate (nBins−1 values, broadcast) plus
    * a map-only comparison, so it scales like a projection. The
    * difference to ntile is the documented tie behavior: equal scores
    * always land in the same bin (bins are value intervals, not
    * equal-count slices). Exact `percentile` holds a value histogram
    * per aggregate — at extreme value cardinality swap the boundary
    * expression for `approx_percentile` (same plan shape).
    * Output: input columns + `bin`. */
  def curriculumBins(df: DataFrame, score: Column, nBins: Int): DataFrame = {
    require(nBins >= 2, s"need nBins >= 2, got $nBins")
    val qs = (1 until nBins).map(i => i.toDouble / nBins)
    val bounds = df.select(score.as("__s"))
      .agg(expr(s"percentile(__s, array(${qs.mkString(", ")}))").as("__b"))
    // a NULL score compares false against every boundary and would land
    // silently in bin 1 — training on unknown-difficulty rows first, as
    // if verified-easiest. A per-row raise_error poison on the null
    // branch fails by name at first null with zero cost otherwise (a
    // construction-time filter probe would re-execute the input lineage).
    df.crossJoin(broadcast(bounds))
      .withColumn("bin",
        when(score.isNull,
          raise_error(lit("curriculumBins: the score column contains " +
            "nulls — every null row would silently land in bin 1 " +
            "(easiest); filter them out or fix the upstream difficulty " +
            "proxy first")).cast("int"))
          .otherwise((lit(1) + aggregate(col("__b"), lit(0),
            (acc, b) => acc + when(score > b, 1).otherwise(0))).cast("int")))
      .drop("__b")
  }

  /** [[curriculumBins]] with PER-STRATUM boundaries — the CCNet shape:
    * head/middle/tail perplexity buckets are computed per language, not
    * globally, because perplexity scales differ across languages and a
    * global split would put whole languages in one bucket. One
    * stratum-keyed exact-percentile aggregate (|strata| rows, broadcast
    * back), then the same map-only indicator-sum bin — no window, no
    * per-stratum sort funnel. Null scores poison by name like the
    * global form; a null stratum key (which the equality join cannot
    * match) poisons by name too. */
  def curriculumBinsBy(df: DataFrame, strata: Seq[String], score: Column,
                       nBins: Int): DataFrame = {
    require(nBins >= 2, s"need nBins >= 2, got $nBins")
    require(strata.nonEmpty, "curriculumBinsBy: need at least one stratum " +
      "column (use curriculumBins for a global split)")
    val qs = (1 until nBins).map(i => i.toDouble / nBins)
    val scored = df.withColumn("__s", score)
    val bounds = scored.groupBy(strata.map(col): _*)
      .agg(expr(s"percentile(__s, array(${qs.mkString(", ")}))").as("__b"))
    scored.join(broadcast(bounds), strata, "left")
      .withColumn("bin",
        when(col("__s").isNull,
          raise_error(lit("curriculumBinsBy: the score column contains " +
            "nulls — every null row would silently land in bin 1 " +
            "(easiest); filter them out or fix the upstream difficulty " +
            "proxy first")).cast("int"))
          .when(col("__b").isNull,
            raise_error(lit("curriculumBinsBy: a stratum key is null — " +
              "its rows cannot join their boundaries and would bin " +
              "arbitrarily; fill or filter the stratum column first"))
              .cast("int"))
          .otherwise((lit(1) + aggregate(col("__b"), lit(0),
            (acc, b) => acc + when(col("__s") > b, 1).otherwise(0))).cast("int")))
      .drop("__b").drop("__s")
  }

  /** Temperature-flattened mixture — the published multilingual/source
    * sampling rule (target share q_g ∝ p_g^α for observed share p_g;
    * α = 1 natural, α → 0 uniform): derive per-stratum KEEP fractions
    * that reshape the corpus toward q, DOWNSAMPLE-ONLY (a filter cannot
    * create rows, so the most-upweighted stratum — the smallest — keeps
    * fraction 1.0 and everything else scales relative to it:
    * w_g = (n_min/n_g)^(1−α), giving post-filter shares ∝ p_g^α in
    * expectation), then apply through [[mixtureHash]]'s map-only
    * per-row hash-threshold filter. Cost at scale: ONE stratum-keyed
    * partial-merged count (|strata| rows collected — a mixture has few
    * strata by construction) and a scan filter; no window, no
    * per-stratum funnel, giant strata cost nothing extra.
    *
    * Cross-engine exactness: at α = 0.5 the weight is an IEEE `sqrt` of
    * a correctly-rounded division — both bit-exact on any IEEE-754
    * engine, so the kept ROW SET is reproducible (the registered oracle
    * runs there). Other α use `pow` (1-ulp accuracy, not
    * correctly-rounded) — semantics identical, bit-reproducibility of
    * the threshold not guaranteed across engines. */
  def temperatureMixture(df: DataFrame, stratum: Column, id: Column,
                         alpha: Double): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, s"need 0 < alpha <= 1, got $alpha")
    // a NULL stratum (e.g. undetected language) cannot be a weight-map
    // key; such rows take mixtureHash's defaultWeight = 0 and are
    // DROPPED — the defined dirty-data behavior, not a plan-build crash
    val counts = df.groupBy(stratum.cast("string").as("s")).count()
      .collect().filter(!_.isNullAt(0))
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    require(counts.nonEmpty,
      "temperatureMixture on an empty corpus (or all-null strata)")
    val nMin = counts.values.min
    val e = 1.0 - alpha
    val weights = counts.map { case (k, n) =>
      val r = nMin.toDouble / n
      k -> (if (e == 0.5) math.sqrt(r) else math.pow(r, e))
    }
    mixtureHash(df, stratum, id, weights)
  }

  /** Deterministic corpus shuffle — the standard step before training:
    * each row gets a `shard` (which output file / data-loader worker
    * consumes it) and a within-shard `pos`, both derived from
    * `md5(id || salt)`, so the global reading order is id-decorrelated,
    * bit-reproducible in any engine, and re-seedable by changing `salt`.
    *
    * Scale: shard assignment is a per-row projection; the within-shard
    * rank is ONE shard-keyed window — there is never a global sort or a
    * single-partition window. Writing `partitionBy(shard)` with a sort on
    * `pos` then yields shuffled training files in one pass, the same
    * shape as Spark's own repartition + sortWithinPartitions. */
  def shuffleShards(df: DataFrame, id: Column, nShards: Int,
                    salt: String = ""): DataFrame = {
    require(nShards >= 1, s"nShards must be >= 1, got $nShards")
    // first 8 hex digits of the md5 as an integer: portable (conv here,
    // '0x' cast in DuckDB), uniform over 2^32, so pmod spreads evenly
    val h = md5(concat(id.cast("string"), lit(salt)))
    val w = Window.partitionBy(col("shard")).orderBy(col("__h"), id)
    df.withColumn("__h", h)
      .withColumn("shard",
        pmod(conv(substring(col("__h"), 1, 8), 16, 10).cast("long"),
          lit(nShards.toLong)).cast("int"))
      .withColumn("pos", row_number().over(w))
      .drop("__h")
  }

  /** Uniform in (0, 1] from the row id: the first 13 hex digits (52
    * bits) of md5(id) plus one, over 2^52 — every intermediate is
    * exactly representable in a double and the one division is IEEE
    * correctly rounded, so ANY engine derives the identical u from the
    * identical id (DuckDB re-derives it with per-digit arithmetic; same
    * integer, same double). */
  private def uniformFromId(id: Column): Column =
    (conv(substring(md5(id.cast("string")), 1, 13), 16, 10).cast("double")
      + lit(1.0)) / lit(4503599627370496.0)

  /** [[uniformFromId]] clamped strictly below 1 for the GUMBEL
    * transform: u can be exactly 1.0 (an all-f 13-hex md5 prefix,
    * p = 2^-52 per row), where −ln(u) = 0 and the outer ln diverges —
    * Spark evaluates log(0) to NULL (silently excluding the row from
    * the draw) while DuckDB's ln(0) raises, an engine divergence the
    * 6-dp rounding contract doesn't cover. `least(u, 1.0 − 1e-16)`
    * pins that one value to the largest double below 1 (1 − 2^-53 —
    * both engines constant-fold the literal subtraction to the same
    * IEEE double) and leaves every other u untouched; the oracles
    * state the same LEAST verbatim. `ln(u)` itself is total at u = 1
    * (priority 0), so the linear-space forms keep the unclamped u. */
  private def gumbelUniform(id: Column): Column =
    least(uniformFromId(id), lit(1.0 - 1e-16))

  /** THE cross-engine draw contract, stated exactly once: the A-Res
    * priority `round(ln(u)/w, 6)` (linear space) and the Gumbel-top-k
    * priority `round(logw − ln(−ln(u)), 6)` (log space). The two
    * rankings coincide where the weights correspond (w = exp(logw)):
    * each orders by a monotone transform of `−ln(u)/w` — pinned by
    * SamplingSpec. The 6-dp rounding is load-bearing (it is what lets
    * another engine replay the draw bit-exactly past libm's 1-ulp ln
    * slack), so the formula lives here and nowhere else. */
  private def weightedPriority(id: Column, weight: Column): Column =
    round(log(uniformFromId(id)) / weight.cast("double"), 6)

  private def gumbelPriority(id: Column, logWeight: Column): Column =
    round(logWeight.cast("double") - log(-log(gumbelUniform(id))), 6)

  /** Weighted sampling WITHOUT replacement (Efraimidis–Spirakis A-Res):
    * each row draws its deterministic uniform u = u(id) and gets
    * priority `ln(u)/w` — distributionally equivalent to ranking by
    * u^(1/w) — and the k highest-priority rows are the sample. A row
    * with twice the weight has exactly twice the chance to be drawn
    * first; the id-derived u makes the draw reproducible across
    * engines, partitionings, and runs (the registered oracle holds the
    * selected SET to hash equality). Priorities are rounded to 6
    * decimals before ranking (ties then break on id) so libm's 1-ulp
    * `ln` slack can never reorder engines.
    *
    * Rows with non-positive weight are EXCLUDED (a zero weight means
    * "never sample"; a negative one is meaningless and would otherwise
    * outrank every positive row through the negative logarithm).
    *
    * Scale: the priority is a per-row projection and the top-k is a
    * rank-limited sort (TakeOrderedAndProject — map-side partial top-k,
    * never a global sort), so the operator is one scan at any corpus
    * size. */
  def weightedTopK(df: DataFrame, id: Column, weight: Column,
                   k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    df.filter(weight > 0)
      .withColumn("priority", weightedPriority(id, weight))
      .orderBy(col("priority").desc, id)
      .limit(k)
  }

  /** [[weightedTopK]] in LOG space — the Gumbel-top-k draw: each row's
    * priority is `logWeight + Gumbel(u(id))` with
    * `Gumbel(u) = −ln(−ln(u))`, and the k highest priorities are a
    * sample WITHOUT replacement proportional to `exp(logWeight)` (the
    * Gumbel-max trick; distributionally the same draw as
    * [[weightedTopK]] at `weight = exp(logWeight)`, but total for any
    * logWeight — importance log-weights at web scale overflow the
    * linear form long before they trouble this one). Same determinism
    * contract: u is id-derived, priorities round to 6 decimals before
    * ranking (libm's 1-ulp `ln` slack cannot reorder engines), ties
    * break on id, and the top-k is rank-limited
    * (TakeOrderedAndProject — map-side partial top-k, one scan at any
    * corpus size). Null logWeight rows are EXCLUDED (no weight, no
    * ticket — the weightedTopK non-positive-weight convention). */
  def gumbelTopK(df: DataFrame, id: Column, logWeight: Column,
                 k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    df.filter(logWeight.isNotNull)
      .withColumn("priority", gumbelPriority(id, logWeight))
      .orderBy(col("priority").desc, id)
      .limit(k)
  }

  /** Per-stratum [[gumbelTopK]]: each stratum draws its own k-sample
    * without replacement proportional to `exp(logWeight)` — the
    * per-domain budget form of importance resampling
    * ([[Dsir.sampled]]'s stratified twin). Same window shape as
    * [[weightedStratifiedTopK]]: the rank filter prunes to k rows per
    * stratum before any downstream sort (WindowGroupLimit). */
  def gumbelStratifiedTopK(df: DataFrame, strata: Seq[Column], id: Column,
                           logWeight: Column, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val w = Window.partitionBy(strata: _*)
      .orderBy(col("priority").desc, id)
    df.filter(logWeight.isNotNull)
      .withColumn("priority", gumbelPriority(id, logWeight))
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= k)
      .drop("__rk")
  }

  /** Per-stratum [[weightedTopK]]: the k highest-priority rows of EACH
    * stratum. One stratum-keyed window whose rank filter prunes to k
    * rows per stratum before any downstream sort (WindowGroupLimit), so
    * a giant stratum pays its sort but never materializes more than k
    * survivors. */
  def weightedStratifiedTopK(df: DataFrame, strata: Seq[Column], id: Column,
                             weight: Column, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val w = Window.partitionBy(strata: _*)
      .orderBy(col("priority").desc, id)
    df.filter(weight > 0)
      .withColumn("priority", weightedPriority(id, weight))
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= k)
      .drop("__rk")
  }

  /** Token-budget sampling — the "fill each source's token budget" step
    * of training-mix construction: keep documents, in the deterministic
    * md5(id) order, while the stratum's running token total BEFORE the
    * document is under `budget`. The first overshooting document is kept
    * (the budget is a floor on coverage, not a cap), everything after it
    * is dropped — so every engine selects the identical prefix whatever
    * the document sizes.
    *
    * Scale: one stratum-keyed window, the same caveat as [[stratified]] —
    * a giant stratum funnels its sort through one task. The corpus-scale
    * form shards each stratum by a hash prefix and gives every shard
    * `budget / nShards`: same coverage in expectation, fully parallel
    * (compose [[shuffleShards]] + this with the shard in `strata`). */
  def tokenBudget(df: DataFrame, strata: Seq[Column], id: Column,
                  tokens: Column, budget: Long): DataFrame = {
    val w = Window.partitionBy(strata: _*).orderBy(hashOrder(id): _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("__cum", coalesce(sum(tokens).over(w), lit(0L)))
      .filter(col("__cum") < budget)
      .drop("__cum")
  }

  /** Concat-and-chunk sequence packing — the last step before a training
    * loader: within each shard (deterministic `md5(id || salt)` order,
    * same derivation as [[shuffleShards]]), documents are conceptually
    * concatenated and cut into fixed `seqLen`-token training sequences;
    * a document straddling a cut contributes a piece to each side. The
    * output is the PACKING MAP — (shard, seq_id, doc_id, tok_start,
    * n_toks) — which is what a loader needs to assemble sequences
    * without the engine ever materializing them; every sequence is
    * exactly `seqLen` tokens except each shard's last.
    *
    * Scale: one shard-keyed window (the running token offset — shards
    * bound the sort, never a global one), then a map-only bin explode;
    * a document emits one row per sequence it touches, ≤ 1 + n/seqLen.
    * Deterministic and partitioning-invariant, so the same corpus packs
    * identically on any cluster — reproducible training order. */
  def packSequences(docs: DataFrame, id: Column, text: Column,
                    nShards: Int, seqLen: Int,
                    salt: String = ""): DataFrame =
    packSequencesBy(docs, id, TextAnalysis.tokenCount(text).cast("long"),
      nShards, seqLen, salt)

  /** [[packSequences]] with an EXPLICIT per-document token count — the
    * real-tokenizer form: pass [[TextAnalysis.bpeEncodeCount]] (or any
    * trained tokenizer's length) so sequences are cut on the token
    * budget the training loader will actually see, not the whitespace
    * proxy. Same packing map contract and determinism. */
  def packSequencesBy(docs: DataFrame, id: Column, nTokens: Column,
                      nShards: Int, seqLen: Int,
                      salt: String = ""): DataFrame =
    packSequencesPosBy(docs, id, nTokens, nShards, seqLen, salt)
      .drop("seq_pos")

  /** [[packSequencesBy]] plus `seq_pos` — the piece's 0-based token
    * position WITHIN its sequence. That's the coordinate a loader needs
    * to place per-document metadata into the packed sequence: document
    * boundaries for block-diagonal attention masks, or loss-mask spans
    * shifted into sequence space
    * ([[graft.operators.ChatPrep.packedAssistantMasks]]). Same plan
    * (the window already carries the running offset; the extra column
    * is free), same determinism and partitioning invariance. */
  def packSequencesPosBy(docs: DataFrame, id: Column, nTokens: Column,
                         nShards: Int, seqLen: Int,
                         salt: String = ""): DataFrame = {
    require(seqLen >= 1, s"seqLen must be >= 1, got $seqLen")
    val n = nTokens.cast("long")
    val sharded = shuffleShards(
      docs.select(id.as("doc_id"), n.as("__n")).filter(col("__n") > 0),
      col("doc_id"), nShards, salt)
    val w = Window.partitionBy(col("shard")).orderBy(col("pos"))
      .rowsBetween(Window.unboundedPreceding, -1)
    sharded
      .withColumn("__start", coalesce(sum(col("__n")).over(w), lit(0L)))
      .withColumn("seq_id",
        explode(sequence(floor(col("__start") / seqLen),
          floor((col("__start") + col("__n") - 1) / seqLen))))
      .select(col("shard"), col("seq_id"),
        col("doc_id"),
        greatest(lit(0L), col("seq_id") * seqLen - col("__start"))
          .as("tok_start"),
        (least(col("__n"), (col("seq_id") + 1) * seqLen - col("__start")) -
          greatest(lit(0L), col("seq_id") * seqLen - col("__start")))
          .as("n_toks"),
        greatest(lit(0L), col("__start") - col("seq_id") * seqLen)
          .as("seq_pos"))
  }

  /** WHOLE-document BEST-FIT-DECREASING packing — the no-split
    * regime: every document lands intact in exactly one sequence
    * (padding fills the tails), for loaders that refuse cross-document
    * attention rather than masking it. Within each shard, documents
    * sort by `(tokens DESC, doc_id)` and best-fit-decreasing assigns
    * each to the open sequence with the SMALLEST remaining capacity
    * that still fits (ties → lowest seq_id), opening a new sequence
    * when none fits — the classic BFD bin-packing heuristic
    * (≤ 11/9·OPT + 1 sequences), deterministic and
    * partitioning-invariant by construction. Output schema matches
    * [[packSequencesPosBy]] (`tok_start` is always 0 — documents are
    * whole), so [[packReport]] and
    * [[graft.operators.ChatPrep.packedAssistantMasks]] compose
    * unchanged; in the report, `tail_waste`/`fill_frac` price the
    * PADDING this regime trades for clean attention boundaries.
    *
    * Execution: one shard-keyed exchange + in-partition sort, then a
    * single sequential pass per shard (`mapPartitions`) carrying the
    * open-bin state — a TreeMap of remaining capacities, O(log bins)
    * per document. The state is bins-per-shard-sized; `nShards` is the
    * lever that bounds it (more shards = smaller per-shard state and
    * more parallelism, the standard trade). A document longer than
    * `seqLen` cannot pack whole and fails BY NAME. */
  def packSequencesWholeBy(docs: DataFrame, id: Column, nTokens: Column,
                           nShards: Int, seqLen: Int,
                           salt: String = ""): DataFrame = {
    require(seqLen >= 1, s"seqLen must be >= 1, got $seqLen")
    val base = shuffleShards(
      docs.select(id.as("doc_id"), nTokens.cast("long").as("__n"))
        .filter(col("__n") > 0),
      col("doc_id"), nShards, salt)
      .select(col("shard"), col("doc_id"), col("__n"))
    val outSchema = org.apache.spark.sql.types.StructType(Seq(
      base.schema("shard"),
      org.apache.spark.sql.types.StructField("seq_id",
        org.apache.spark.sql.types.LongType, nullable = false),
      base.schema("doc_id").copy(name = "doc_id"),
      org.apache.spark.sql.types.StructField("tok_start",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("n_toks",
        org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("seq_pos",
        org.apache.spark.sql.types.LongType, nullable = false)))
    val sorted = base.repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col("__n").desc, col("doc_id"))
    sorted.mapPartitions { rows =>
      var curShard: Any = null
      var started = false
      // remaining capacity -> seq ids at that remaining (lowest first)
      var byRem: java.util.TreeMap[Long, java.util.TreeSet[Long]] = null
      var fills: scala.collection.mutable.ArrayBuffer[Long] = null
      def reset(): Unit = {
        byRem = new java.util.TreeMap[Long, java.util.TreeSet[Long]]()
        fills = new scala.collection.mutable.ArrayBuffer[Long]()
      }
      rows.map { r =>
        val shard = r.get(0)
        if (!started || shard != curShard) {
          reset(); curShard = shard; started = true
        }
        val n = r.getLong(2)
        if (n > seqLen) throw new IllegalArgumentException(
          s"packSequencesWholeBy: document ${r.get(1)} has $n tokens — " +
            s"longer than seqLen=$seqLen, it cannot pack whole. Split " +
            "or chunk oversized documents upstream, or use the " +
            "splitting packer (packSequencesPosBy)")
        val fit = byRem.ceilingEntry(n)
        val seqId =
          if (fit == null) {
            fills += 0L
            (fills.length - 1).toLong
          } else {
            val set = fit.getValue
            val sid = set.first()
            set.remove(sid)
            if (set.isEmpty) byRem.remove(fit.getKey)
            sid
          }
        val pos = fills(seqId.toInt)
        fills(seqId.toInt) = pos + n
        val rem = seqLen - (pos + n)
        if (rem > 0) {
          var set = byRem.get(rem)
          if (set == null) {
            set = new java.util.TreeSet[Long]()
            byRem.put(rem, set)
          }
          set.add(seqId)
        }
        org.apache.spark.sql.Row(shard, seqId, r.get(1), 0L, n, pos)
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
  }

  /** Packing-efficiency report over a [[packSequencesBy]] map — the
    * numbers a loader team tracks per shard: sequence count, document
    * and piece counts, split incidence, total tokens, tail waste, and
    * fill fraction. Waste is ONLY the final sequence's unfilled tail —
    * every non-last sequence is exactly seqLen by construction — so
    * `fill_frac` doubles as a packing-correctness check (anything
    * below (n_seqs−1)·seqLen/total would mean a mid-stream hole).
    *
    * Two grouped aggregates: per-(shard, doc) then per-shard — the
    * first exchange is the map's own key, the second is shard-sized.
    * 6-dp fill via the engine-exact quantizer
    * ([[TextAnalysis.quant6]]). */
  def packReport(packMap: DataFrame, seqLen: Int): DataFrame = {
    require(seqLen >= 1, s"seqLen must be >= 1, got $seqLen")
    packMap
      .groupBy(col("shard"), col("doc_id"))
      .agg(count(lit(1)).as("__pieces"), sum(col("n_toks")).as("__dtoks"),
        max(col("seq_id")).as("__mseq"))
      .groupBy(col("shard"))
      .agg(
        (max(col("__mseq")) + 1L).as("n_seqs"),
        count(lit(1)).as("n_docs"),
        sum(col("__pieces")).as("n_pieces"),
        sum(when(col("__pieces") > 1, 1L).otherwise(0L)).as("n_split_docs"),
        sum(col("__dtoks")).as("total_tokens"))
      .select(col("shard"), col("n_seqs"), col("n_docs"), col("n_pieces"),
        col("n_split_docs"), col("total_tokens"),
        (col("n_seqs") * seqLen - col("total_tokens")).as("tail_waste"),
        TextAnalysis.quant6(col("total_tokens").cast("double")
          / (col("n_seqs") * seqLen)).as("fill_frac"))
  }

  /** Data mixing: per-stratum sampling weights (e.g. by source). Strata
    * absent from `weights` get `defaultWeight`; weights above 1.0 keep the
    * whole stratum (upsampling is the caller's union). */
  def mixture(df: DataFrame, stratum: Column, id: Column,
              weights: Map[String, Double],
              defaultWeight: Double = 0.0): DataFrame = {
    val wmap = typedLit(weights)
    val w = Window.partitionBy(stratum).orderBy(hashOrder(id): _*)
    val cw = Window.partitionBy(stratum)
    df.withColumn("__w",
        coalesce(element_at(wmap, stratum.cast("string")), lit(defaultWeight)))
      .withColumn("__rn", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(cw))
      .filter(col("__rn") <= ceil(col("__n") * col("__w")))
      .drop("__w", "__rn", "__n")
  }
}
