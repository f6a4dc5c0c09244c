package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.operators.ChatPrep

/** The SFT chat-data family on an UNBOUNDED conversation stream — the
  * admission gate a conversation collector runs before anything lands
  * in the training store.
  *
  * Composition, not re-implementation: every [[ChatPrep]] operation
  * except the dedup canonical is a pure projection (higher-order folds
  * over the turns array), so it runs on a streaming DataFrame verbatim
  * — render, validation, and both span forms need no state, no
  * watermark, no output-mode gymnastics. The ONLY stateful piece is
  * duplicate admission, and that reuses [[StreamingDedup]]'s
  * bounded-state watermark dedup keyed on the ASSISTANT content
  * fingerprint ([[ChatPrep.assistantText]]) — same rationale as batch
  * [[ChatPrep.dedupByAssistant]] (the assistant side is what trains;
  * prompt boilerplate repeats legitimately), same bounded-state
  * rationale as every other streaming ingest member: duplicates arrive
  * close together, state is (window × rate), never corpus-sized.
  *
  * [[gate]] = structural admission (the shared [[ChatPrep.reasonCol]]
  * verdict — the batch and streaming gates can never drift) then
  * watermark dedup. Rejected rows are FILTERED, not routed: a
  * deployment that wants a reject audit log splits the stream with the
  * same `reasonCol` (one extra projection) or runs the gate inside
  * `foreachBatch` like [[StreamingIngest]] — both shapes are
  * spec-covered.
  */
object StreamingChat {

  /** Structurally-valid conversations only: rows where
    * [[ChatPrep.reasonCol]] is null. Pure projection — safe on any
    * stream, adds no state. */
  def validOnly(stream: DataFrame, turns: Column): DataFrame =
    stream.filter(ChatPrep.reasonCol(turns).isNull)

  /** Rejected conversations with their named reason — the audit-log
    * side of [[validOnly]] (same verdict expression, opposite
    * filter). */
  def rejects(stream: DataFrame, convId: Column, turns: Column): DataFrame =
    stream.select(convId.as("conv_id"),
        ChatPrep.reasonCol(turns).as("reason"))
      .filter(col("reason").isNotNull)

  /** The full admission gate: structural validation, then bounded-state
    * duplicate admission on the assistant-content fingerprint within
    * the watermark window. Emits the input rows that passed both.
    * `tsCol`/`delay` follow [[StreamingDedup.dropDupesWithinWatermark]]
    * — a duplicate arriving after the watermark passed its twin is a
    * reprocessing problem, not a streaming one (documented contract). */
  def gate(stream: DataFrame, turns: Column, tsCol: String,
           delay: String): DataFrame =
    StreamingDedup.dropDupesWithinWatermark(
      validOnly(stream, turns), ChatPrep.assistantText(turns),
      tsCol, delay)

  /** Rendered model-input strings for gated conversations — chain after
    * [[gate]]; pure projection. */
  def rendered(stream: DataFrame, convId: Column, turns: Column): DataFrame =
    ChatPrep.render(stream, convId, turns)
}
