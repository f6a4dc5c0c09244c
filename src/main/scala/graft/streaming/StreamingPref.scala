package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.operators.{ChatPrep, PrefPrep}

/** Preference-pair (RLHF / DPO) admission on an UNBOUNDED pair stream
  * — [[StreamingChat]]'s twin for the other half of the chat-data
  * family. Same composition argument: [[PrefPrep]]'s verdict and
  * renders are pure projections (both branches fold the SAME
  * [[ChatPrep.reasonCol]] expression, so the batch and streaming gates
  * can never drift), and the ONLY stateful piece — one-pair-per-prompt
  * admission — reuses [[StreamingDedup]]'s bounded-state watermark
  * dedup keyed on the rendered-PROMPT fingerprint, the batch
  * [[PrefPrep.dedupByPrompt]] key. Duplicate prompts arrive close
  * together (a collector fans one prompt out to annotators and the
  * answers come back in a burst), so state is (window × rate), never
  * corpus-sized.
  */
object StreamingPref {

  /** Structurally-valid pairs only ([[PrefPrep.reasonCol]] null):
    * both branches well-formed and the responses actually differ.
    * Pure projection — safe on any stream, adds no state. */
  def validOnly(stream: DataFrame, promptTurns: Column, chosen: Column,
                rejected: Column): DataFrame =
    stream.filter(
      PrefPrep.reasonCol(promptTurns, chosen, rejected).isNull)

  /** Rejected pairs with their named reason — the audit-log side. */
  def rejects(stream: DataFrame, pairId: Column, promptTurns: Column,
              chosen: Column, rejected: Column): DataFrame =
    stream.select(pairId.as("pair_id"),
        PrefPrep.reasonCol(promptTurns, chosen, rejected).as("reason"))
      .filter(col("reason").isNotNull)

  /** The full admission gate: structural validation, then
    * bounded-state one-pair-per-prompt admission on the rendered-prompt
    * string within the watermark window. Emits the input rows that
    * passed both. */
  def gate(stream: DataFrame, promptTurns: Column, chosen: Column,
           rejected: Column, tsCol: String, delay: String): DataFrame =
    StreamingDedup.dropDupesWithinWatermark(
      validOnly(stream, promptTurns, chosen, rejected),
      ChatPrep.renderCol(promptTurns), tsCol, delay)
}
