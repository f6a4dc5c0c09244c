package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SFT / instruction-tuning conversation prep — the four operations a
  * chat-data loader runs between a raw conversation store and a
  * training batch:
  *
  *  1. [[render]]   — template a turn list into the model-input string
  *  2. [[validate]] — structural admission (roles, alternation, empties)
  *  3. [[assistantSpans]] — loss-mask character spans of assistant turns
  *     WITHIN the rendered string (the supervised-loss mask a loader
  *     materializes next to each packed sequence)
  *  4. [[dedupByAssistant]] — exact dedup keyed on the concatenated
  *     assistant content (the part of a conversation that actually
  *     trains; prompt-side boilerplate is expected to repeat)
  *
  * Input shape everywhere: a conversation id column plus a
  * `array<struct<role: string, content: string>>` turns column — the
  * portable wire shape of every public chat dataset (role strings in
  * [[Roles]]).
  *
  * Execution contract: 1–3 are PURE PROJECTIONS — one higher-order
  * `aggregate`/`exists`/`zip_with` fold per conversation, no exchange,
  * no per-turn explode-then-window (that shape would re-shuffle the
  * whole token stream on conv_id just to recover an ordering the array
  * already has). At 100 TB the cost is one scan. [[dedupByAssistant]]
  * is the one keyed exchange, and it shuffles a 64-bit fingerprint +
  * length — never the text (the [[TextAnalysis.stripBoilerplate]]
  * contract: a false merge needs a same-length 64-bit collision).
  *
  * The template is fixed and self-delimiting:
  * `<|role|>content<|end|>` per turn, concatenated in order — 4 chars
  * of prefix around the role, 7 of suffix, [[TurnOverhead]] = 11 total,
  * which is what makes the span arithmetic closed-form on any engine.
  * Offsets are 0-based half-open `[start_char, end_char)` in Spark
  * `length` units (Unicode code points — documented so a byte-offset
  * consumer converts deliberately).
  */
object ChatPrep {

  /** The admissible role vocabulary, in template order. */
  val Roles: Seq[String] = Seq("system", "user", "assistant")

  /** Per-turn template overhead: `"<|" + "|>" + "<|end|>"`. */
  val TurnOverhead: Int = 11

  private def role(t: Column): Column = t.getField("role")
  private def content(t: Column): Column = t.getField("content")

  /** One turn rendered: `<|role|>content<|end|>`. */
  def renderTurn(t: Column): Column =
    concat(lit("<|"), role(t), lit("|>"), content(t), lit("<|end|>"))

  /** A whole turns array rendered in order — a single string fold. */
  def renderCol(turns: Column): Column =
    aggregate(turns, lit(""), (acc, t) => concat(acc, renderTurn(t)))

  /** Concatenated assistant content, space-joined in turn order — the
    * dedup key material of [[dedupByAssistant]]. */
  def assistantText(turns: Column): Column =
    array_join(
      transform(filter(turns, t => role(t) === "assistant"), t => content(t)),
      " ")

  /** `(conv_id, n_turns, n_assistant, rendered, n_chars)` — the
    * model-input string per conversation. Pure projection. */
  def render(df: DataFrame, convId: Column, turns: Column): DataFrame =
    df.select(convId.as("conv_id"), turns.as("__t"))
      .select(col("conv_id"),
        size(col("__t")).cast("long").as("n_turns"),
        size(filter(col("__t"), t => role(t) === "assistant"))
          .cast("long").as("n_assistant"),
        renderCol(col("__t")).as("rendered"))
      .withColumn("n_chars", length(col("rendered")).cast("long"))

  /** Structural admission verdict per conversation:
    * `(conv_id, n_turns, valid, reason)` with `reason` null when valid.
    *
    * Checks, in precedence order (first failure names the row):
    *  - `no_turns`           — empty turn list
    *  - `bad_role`           — a role outside [[Roles]]
    *  - `system_position`    — a system turn anywhere but index 0
    *  - `no_core_turns`      — nothing but a system prompt
    *  - `first_not_user`     — the dialogue must open with the user
    *  - `role_alternation`   — two consecutive core turns share a role
    *    (strict user/assistant alternation is implied by this plus the
    *    open/close checks, since core roles are binary once `bad_role`
    *    and `system_position` pass)
    *  - `last_not_assistant` — no trailing unanswered user turn
    *  - `empty_content`      — any turn with empty or null content
    *
    * The precedence is part of the contract (an oracle replaying the
    * verdict must order its CASE the same way). All checks are array
    * folds over the turns column — pure projection. */
  def validate(df: DataFrame, convId: Column, turns: Column): DataFrame =
    df.select(convId.as("conv_id"), turns.as("__t"))
      .select(col("conv_id"), size(col("__t")).cast("long").as("n_turns"),
        reasonCol(col("__t")).as("reason"))
      .select(col("conv_id"), col("n_turns"),
        col("reason").isNull.as("valid"), col("reason"))

  /** [[validate]]'s verdict as a bare Column — null when valid, else the
    * first failing reason in the documented precedence. Shared by the
    * batch verdict frame and the streaming admission gate
    * ([[graft.streaming.StreamingChat]]), so the two can never drift. */
  def reasonCol(t: Column): Column = {
    // turns after the optional leading system prompt
    val core = when(role(element_at(t, 1)) === "system",
      slice(t, lit(2), greatest(size(t) - 1, lit(0)))).otherwise(t)
    val tail = slice(t, lit(2), greatest(size(t) - 1, lit(0)))
    // isNull first: isin(null-role) is SQL-null, which exists() would
    // treat as false and let null-role turns slip past every later
    // role comparison (they all null out and skip).
    val badRole =
      exists(t, x => role(x).isNull || !role(x).isin(Roles: _*))
    val sysInside = exists(tail, x => role(x) === "system")
    val emptyContent =
      exists(t, x => content(x).isNull || length(content(x)) === 0)
    val altBroken = exists(
      zip_with(
        slice(core, lit(1), greatest(size(core) - 1, lit(0))),
        slice(core, lit(2), greatest(size(core) - 1, lit(0))),
        (a, b) => role(a) === role(b)),
      x => x)
    when(size(t) === 0, lit("no_turns"))
      .when(badRole, lit("bad_role"))
      .when(sysInside, lit("system_position"))
      .when(size(core) === 0, lit("no_core_turns"))
      .when(role(element_at(core, 1)) =!= "user", lit("first_not_user"))
      .when(altBroken, lit("role_alternation"))
      .when(role(element_at(core, -1)) =!= "assistant",
        lit("last_not_assistant"))
      .when(emptyContent, lit("empty_content"))
      .otherwise(lit(null).cast("string"))
  }

  private val SpanArrayType =
    "array<struct<turn_idx: INT, start_char: BIGINT, end_char: BIGINT>>"

  /** Loss-mask spans: one row per ASSISTANT turn,
    * `(conv_id, turn_idx, start_char, end_char)` — 0-based half-open
    * content offsets within [[render]]'s `rendered` string (turn_idx
    * counts ALL turns, so the mask aligns with the turn list, not the
    * filtered one).
    *
    * Implemented as a single `aggregate` fold carrying
    * `(offset, index, spans)` — the running rendered length advances by
    * `length(role) + length(content) + TurnOverhead` per turn, and
    * assistant turns append `[offset + 4 + length(role),  + content)`.
    * No explode-then-window: the fold keeps the whole operation a
    * projection, and the explode at the end is output-sized. */
  def assistantSpans(df: DataFrame, convId: Column,
                     turns: Column): DataFrame = {
    val zero = struct(
      lit(0L).as("off"), lit(0).as("idx"),
      expr(s"CAST(array() AS $SpanArrayType)").as("spans"))
    val folded = aggregate(
      turns, zero,
      (acc, t) => {
        val start = acc.getField("off") + lit(4L) +
          length(role(t)).cast("long")
        val end = start + length(content(t)).cast("long")
        val span = struct(
          acc.getField("idx").as("turn_idx"),
          start.as("start_char"), end.as("end_char"))
        struct(
          (end + lit(7L)).as("off"),
          (acc.getField("idx") + lit(1)).as("idx"),
          when(role(t) === "assistant",
            concat(acc.getField("spans"), array(span)))
            .otherwise(acc.getField("spans")).as("spans"))
      },
      acc => acc.getField("spans"))
    df.select(convId.as("conv_id"), explode(folded).as("__s"))
      .select(col("conv_id"),
        col("__s").getField("turn_idx").cast("long").as("turn_idx"),
        col("__s").getField("start_char").as("start_char"),
        col("__s").getField("end_char").as("end_char"))
  }

  private val TokSpanArrayType =
    "array<struct<turn_idx: INT, start_tok: BIGINT, end_tok: BIGINT>>"

  /** TOKEN-space loss-mask spans: one row per assistant turn,
    * `(conv_id, turn_idx, start_tok, end_tok)` — 0-based half-open
    * offsets into the tokenized sequence, under the standard
    * chat-template tokenization contract: SPECIAL TOKENS ARE ATOMIC
    * (the `<|role|>` marker is one token, `<|end|>` one token) and each
    * turn's content tokenizes standalone, so a turn occupies
    * `2 + countTokens(content)` positions. This is the mask a training
    * loader materializes next to each packed sequence — the character
    * twin ([[assistantSpans]]) serves byte/char-offset consumers.
    *
    * `countTokens` maps a content column to its token count — pass the
    * trained tokenizer's counter
    * (e.g. [[TextAnalysis.bpeEncodeCount]] over a trained merge table)
    * so the offsets are REAL loader offsets, or a whitespace counter
    * for a cheap approximation. Same single-fold execution contract as
    * [[assistantSpans]]: pure projection, the tokenizer kernel runs
    * once per turn. */
  def assistantTokenSpans(df: DataFrame, convId: Column, turns: Column,
                          countTokens: Column => Column): DataFrame = {
    val zero = struct(
      lit(0L).as("off"), lit(0).as("idx"),
      expr(s"CAST(array() AS $TokSpanArrayType)").as("spans"))
    val folded = aggregate(
      turns, zero,
      (acc, t) => {
        val c = countTokens(content(t)).cast("long")
        val start = acc.getField("off") + lit(1L)
        val end = start + c
        val span = struct(
          acc.getField("idx").as("turn_idx"),
          start.as("start_tok"), end.as("end_tok"))
        struct(
          (end + lit(1L)).as("off"),
          (acc.getField("idx") + lit(1)).as("idx"),
          when(role(t) === "assistant",
            concat(acc.getField("spans"), array(span)))
            .otherwise(acc.getField("spans")).as("spans"))
      },
      acc => acc.getField("spans"))
    df.select(convId.as("conv_id"), explode(folded).as("__s"))
      .select(col("conv_id"),
        col("__s").getField("turn_idx").cast("long").as("turn_idx"),
        col("__s").getField("start_tok").as("start_tok"),
        col("__s").getField("end_tok").as("end_tok"))
  }

  /** The full SFT loader map: loss-mask spans SHIFTED INTO PACKED-
    * SEQUENCE COORDINATES. Joins a packing map that carries `seq_pos`
    * ([[graft.operators.Sampling.packSequencesPosBy]] over per-
    * conversation TOTAL token counts) with [[assistantTokenSpans]]
    * output, intersects each span with each piece of its conversation,
    * and emits `(shard, seq_id, conv_id, turn_idx, mask_start,
    * mask_end)` — 0-based half-open token offsets WITHIN the packed
    * sequence. A span straddling a sequence cut emits one row per
    * side; concatenating a sequence's rows yields exactly the
    * supervised positions of that sequence.
    *
    * Execution: one equi-join on the conversation id (both sides are
    * conversation-keyed — co-partitioned after one exchange each, or
    * broadcast when the span side is small), then pure arithmetic.
    * Nothing rescans text or re-runs the tokenizer. */
  def packedAssistantMasks(packMap: DataFrame,
                           spans: DataFrame): DataFrame = {
    val p = packMap.select(col("shard"), col("seq_id"),
      col("doc_id").as("__pid"), col("tok_start"), col("n_toks"),
      col("seq_pos"))
    val s = spans.select(col("conv_id"), col("turn_idx"),
      col("start_tok"), col("end_tok"))
    p.join(s, p("__pid") === s("conv_id"))
      .where(col("start_tok") < col("tok_start") + col("n_toks") &&
        col("end_tok") > col("tok_start"))
      .select(col("shard"), col("seq_id"), col("conv_id"), col("turn_idx"),
        (col("seq_pos") +
          greatest(lit(0L), col("start_tok") - col("tok_start")))
          .as("mask_start"),
        (col("seq_pos") +
          least(col("n_toks"), col("end_tok") - col("tok_start")))
          .as("mask_end"))
  }

  /** Exact conversation dedup on assistant content:
    * `(conv_id, canonical_id, is_dup)` — canonical is the min conv_id
    * sharing the same [[assistantText]]. The exchange carries
    * `(xxhash64, length)` of the assistant text, never the text — the
    * same collision contract as boilerplate stripping: a false merge
    * needs a same-length 64-bit collision.
    *
    * Conversations with ZERO assistant turns (possible on unvalidated
    * input — [[validate]] rejects them) are each their own cluster:
    * their key is salted with the conv_id, so the shared
    * empty-assistant-text fingerprint can never merge them.
    *
    * Canonical derivation is AGG + JOIN on the fingerprint key (the
    * dedup_canonical shape), not `min().over(partitionBy(fp))` — a
    * window would force a per-partition SORT of every row just to
    * propagate one group minimum; the partial-aggregating hash agg +
    * key-colocated join does the same work sort-free and AQE can
    * broadcast the cluster-sized agg side.
    *
    * EAGER: the narrow `(fp, len)` projection is pinned with
    * `localCheckpoint(true)` at call time (one Spark job runs here),
    * or the corpus scan + render fold would execute twice — measured
    * 2x on chat_dedup. Batch relations only — a streaming frame cannot
    * be checkpointed this way (the
    * [[graft.streaming.StreamingChat]]/[[graft.streaming.StreamingDedup]]
    * paths own streams). */
  def dedupByAssistant(df: DataFrame, convId: Column,
                       turns: Column): DataFrame = {
    // a null-rendering conversation (null turns array, or — were the
    // array_join contract ever to change — null content leaking
    // through) must take the SALTED branch: a null __len key would be
    // silently dropped by the null-rejecting equi-join below, losing
    // the row from the verdict frame entirely
    val base = df
      .select(convId.as("conv_id"), assistantText(turns).as("__a"),
        exists(turns, t => role(t) === "assistant").as("__has"))
      .select(col("conv_id"),
        when(col("__has") && col("__a").isNotNull, xxhash64(col("__a")))
          .otherwise(xxhash64(lit("__no_assistant"), col("conv_id")))
          .as("__fp"),
        when(col("__has") && col("__a").isNotNull,
          length(col("__a")).cast("long"))
          .otherwise(lit(-1L)).as("__len"))
      // both the agg side and the join probe consume this frame; pin
      // the NARROW projection (24 bytes/row) once, or the corpus scan
      // + render fold runs twice (the partial agg before the exchange
      // defeats ReusedExchange) — measured 2x on chat_dedup
      .localCheckpoint(true)
    val canon = base.groupBy(col("__fp"), col("__len"))
      .agg(min(col("conv_id")).as("canonical_id"))
    base.join(canon, Seq("__fp", "__len"))
      .select(col("conv_id"), col("canonical_id"))
      .withColumn("is_dup", col("conv_id") =!= col("canonical_id"))
  }
}
