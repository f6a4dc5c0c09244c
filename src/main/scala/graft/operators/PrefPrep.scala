package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Preference-pair (RLHF / DPO) data prep — the other half of what an
  * SFT loader feeds: given `(pair_id, prompt_turns, chosen, rejected)`
  * where `prompt_turns` is a conversation prefix ending in a user turn
  * and chosen/rejected are two candidate assistant responses, prepare
  * the paired training sequences a DPO loss consumes.
  *
  *  1. [[render]]        — both branches templated with the SAME
  *     [[ChatPrep]] chat template (prompt + appended assistant turn)
  *  2. [[validate]]      — both branches through the SAME
  *     [[ChatPrep.reasonCol]] structural verdict (cannot drift from the
  *     SFT gate), plus the pair-level `identical_branches` check
  *  3. [[dedupByPrompt]] — exact dedup on the rendered PROMPT (the
  *     standard DPO hygiene: one pair per prompt, or the loss
  *     double-counts a prompt's gradient)
  *  4. [[branchTotals]] / [[responseSpans]] — per-branch token totals
  *     and the response-token loss span, under the same
  *     atomic-special-token contract as [[ChatPrep.assistantTokenSpans]]
  *     — feed them to [[graft.operators.Sampling.packSequencesPosBy]]
  *     and [[ChatPrep.packedAssistantMasks]] for paired packed
  *     sequences with per-branch masks.
  *
  * Branch keying: chosen packs as `pair_id · 2`, rejected as
  * `pair_id · 2 + 1` — even/odd keys keep the pairing recoverable from
  * any packed map row without a join back.
  *
  * Execution contract mirrors [[ChatPrep]]: render/validate/spans are
  * PURE PROJECTIONS (one fold per branch); the dedup is one keyed
  * exchange carrying `(xxhash64, length)` of the rendered prompt, never
  * the text.
  */
object PrefPrep {

  /** A branch's full turn list: the prompt with the candidate response
    * appended as one assistant turn. */
  def branchTurns(promptTurns: Column, response: Column): Column =
    concat(promptTurns,
      array(struct(lit("assistant").as("role"), response.as("content"))))

  /** `(pair_id, chosen_rendered, rejected_rendered, n_chars_chosen,
    * n_chars_rejected)` — both branches through the chat template. */
  def render(df: DataFrame, pairId: Column, promptTurns: Column,
             chosen: Column, rejected: Column): DataFrame =
    df.select(pairId.as("pair_id"),
        ChatPrep.renderCol(branchTurns(promptTurns, chosen))
          .as("chosen_rendered"),
        ChatPrep.renderCol(branchTurns(promptTurns, rejected))
          .as("rejected_rendered"))
      .withColumn("n_chars_chosen",
        length(col("chosen_rendered")).cast("long"))
      .withColumn("n_chars_rejected",
        length(col("rejected_rendered")).cast("long"))

  /** The pair verdict as a bare Column — null when valid, else the
    * first failing reason in precedence order: the CHOSEN branch's
    * [[ChatPrep.reasonCol]] verdict (prefixed `chosen_`), then the
    * REJECTED branch's (prefixed `rejected_`), then
    * `identical_branches` (a pair whose two responses are equal
    * carries no preference signal). */
  def reasonCol(promptTurns: Column, chosen: Column,
                rejected: Column): Column = {
    val cr = ChatPrep.reasonCol(branchTurns(promptTurns, chosen))
    val rr = ChatPrep.reasonCol(branchTurns(promptTurns, rejected))
    when(cr.isNotNull, concat(lit("chosen_"), cr))
      .when(rr.isNotNull, concat(lit("rejected_"), rr))
      .when(chosen === rejected, lit("identical_branches"))
      .otherwise(lit(null).cast("string"))
  }

  /** `(pair_id, valid, reason)` — [[reasonCol]] as a frame. */
  def validate(df: DataFrame, pairId: Column, promptTurns: Column,
               chosen: Column, rejected: Column): DataFrame =
    df.select(pairId.as("pair_id"),
        reasonCol(promptTurns, chosen, rejected).as("reason"))
      .select(col("pair_id"), col("reason").isNull.as("valid"),
        col("reason"))

  /** Exact pair dedup on the rendered PROMPT:
    * `(pair_id, canonical_id, is_dup)`, canonical = min pair_id sharing
    * the prompt. The exchange carries `(xxhash64, length)` of the
    * rendered prompt — never the text. Pairs with an EMPTY prompt
    * (possible on unvalidated input) are each their own cluster
    * (pair_id-salted key), mirroring
    * [[ChatPrep.dedupByAssistant]]'s contract — including its
    * sort-free AGG + JOIN canonical derivation (no Window in the
    * lineage; see that scaladoc for why).
    *
    * EAGER: the narrow fingerprint projection is pinned with
    * `localCheckpoint(true)` at call time (one Spark job runs here),
    * or the corpus scan + render fold would execute twice. Batch
    * relations only — a streaming frame cannot be checkpointed this
    * way (the [[graft.streaming.StreamingPref]] path owns streams). */
  def dedupByPrompt(df: DataFrame, pairId: Column,
                    promptTurns: Column): DataFrame = {
    // a NULL-rendering prompt (non-empty turns with a null role or
    // content: the concat fold nulls out) takes the salted own-cluster
    // branch — a null __len key would otherwise be dropped by the
    // null-rejecting equi-join below and the pair would VANISH from
    // the verdict frame (the Window form it replaced kept it)
    val base = df
      .select(pairId.as("pair_id"),
        ChatPrep.renderCol(promptTurns).as("__p"),
        (size(promptTurns) > 0).as("__has"))
      .select(col("pair_id"),
        when(col("__has") && col("__p").isNotNull, xxhash64(col("__p")))
          .otherwise(xxhash64(lit("__no_prompt"), col("pair_id")))
          .as("__fp"),
        when(col("__has") && col("__p").isNotNull,
          length(col("__p")).cast("long"))
          .otherwise(lit(-1L)).as("__len"))
      // pinned once: both the agg and the join probe consume it — see
      // ChatPrep.dedupByAssistant (partial agg defeats ReusedExchange)
      .localCheckpoint(true)
    val canon = base.groupBy(col("__fp"), col("__len"))
      .agg(min(col("pair_id")).as("canonical_id"))
    base.join(canon, Seq("__fp", "__len"))
      .select(col("pair_id"), col("canonical_id"))
      .withColumn("is_dup", col("pair_id") =!= col("canonical_id"))
  }

  /** Per-branch packable totals: `(pair_id, branch, branch_key,
    * total_toks)` with branch in {chosen, rejected}, branch_key =
    * pair_id·2 (+1 for rejected), and total under the
    * atomic-special-token contract (2 template tokens per turn, content
    * tokenized standalone by `countTokens`). Two rows per pair — one
    * projection, no explode. */
  def branchTotals(df: DataFrame, pairId: Column, promptTurns: Column,
                   chosen: Column, rejected: Column,
                   countTokens: Column => Column): DataFrame = {
    val promptToks = aggregate(promptTurns, lit(0L),
      (acc, t) => acc + lit(2L) + countTokens(t.getField("content")))
    df.select(pairId.as("pair_id"), promptToks.as("__pt"),
        countTokens(chosen).cast("long").as("__cc"),
        countTokens(rejected).cast("long").as("__cr"))
      .select(col("pair_id"),
        explode(array(
          struct(lit("chosen").as("branch"),
            (col("pair_id") * 2).as("branch_key"),
            (col("__pt") + lit(2L) + col("__cc")).as("total_toks")),
          struct(lit("rejected").as("branch"),
            (col("pair_id") * 2 + 1).as("branch_key"),
            (col("__pt") + lit(2L) + col("__cr")).as("total_toks"))))
          .as("__b"))
      .select(col("pair_id"), col("__b.branch").as("branch"),
        col("__b.branch_key").as("branch_key"),
        col("__b.total_toks").as("total_toks"))
  }

  /** The DPO loss span per branch — the RESPONSE tokens only:
    * `(conv_id = branch_key, turn_idx, start_tok, end_tok)`, directly
    * consumable by [[ChatPrep.packedAssistantMasks]] against a pack map
    * built over [[branchTotals]] keyed by branch_key. `turn_idx` is the
    * appended assistant turn's index (= size(prompt)). */
  def responseSpans(df: DataFrame, pairId: Column, promptTurns: Column,
                    chosen: Column, rejected: Column,
                    countTokens: Column => Column): DataFrame = {
    val promptToks = aggregate(promptTurns, lit(0L),
      (acc, t) => acc + lit(2L) + countTokens(t.getField("content")))
    df.select(pairId.as("pair_id"), promptToks.as("__pt"),
        size(promptTurns).cast("long").as("__ti"),
        countTokens(chosen).cast("long").as("__cc"),
        countTokens(rejected).cast("long").as("__cr"))
      .select(col("pair_id"), col("__ti"),
        explode(array(
          struct((col("pair_id") * 2).as("conv_id"),
            (col("__pt") + lit(1L)).as("start_tok"),
            (col("__pt") + lit(1L) + col("__cc")).as("end_tok")),
          struct((col("pair_id") * 2 + 1).as("conv_id"),
            (col("__pt") + lit(1L)).as("start_tok"),
            (col("__pt") + lit(1L) + col("__cr")).as("end_tok"))))
          .as("__s"))
      .select(col("__s.conv_id").as("conv_id"),
        col("__ti").as("turn_idx"),
        col("__s.start_tok").as("start_tok"),
        col("__s.end_tok").as("end_tok"))
  }
}
