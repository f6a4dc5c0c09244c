package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.operators.{ChatPrep, PrefPrep, Sampling}

/** PrefPrep: branch render exactness, pair-verdict precedence,
  * prompt dedup (incl. the empty-prompt self-cluster), branch
  * totals/spans arithmetic, and the packed-mask preservation invariant
  * end-to-end. */
class PrefPrepSpec extends SparkSpec {
  import spark.implicits._

  private def pairs(rows: (Long, Seq[(String, String)], String, String)*)
      : DataFrame =
    rows.toDF("pair_id", "prompt", "chosen", "rejected")
      .select(col("pair_id"),
        transform(col("prompt"), t => struct(t.getField("_1").as("role"),
          t.getField("_2").as("content"))).as("prompt"),
        col("chosen"), col("rejected"))

  private val wsCount: Column => Column =
    c => when(length(c) === 0, lit(0L))
      .otherwise(size(split(c, "\\s+")).cast("long"))

  test("render: both branches through the exact chat template") {
    val p = pairs((1L, Seq("user" -> "pick a number"), "seven", "four"))
    val out = PrefPrep.render(p, col("pair_id"), col("prompt"),
      col("chosen"), col("rejected")).head()
    assert(out.getString(1) ==
      "<|user|>pick a number<|end|><|assistant|>seven<|end|>")
    assert(out.getString(2) ==
      "<|user|>pick a number<|end|><|assistant|>four<|end|>")
    assert(out.getLong(3) == out.getString(1).length.toLong)
    assert(out.getLong(4) == out.getString(2).length.toLong)
  }

  test("validate: chosen-branch reason first, then rejected, then " +
       "identical_branches; a clean pair is valid") {
    val p = pairs(
      (1L, Seq("user" -> "q"), "a", "b"), // valid
      // chosen branch breaks alternation (prompt ends assistant)
      (2L, Seq("user" -> "q", "assistant" -> "x"), "a", "b"),
      (3L, Seq("user" -> "q"), "a", ""), // rejected empty
      (4L, Seq("user" -> "q"), "same", "same"), // identical
      // chosen defect wins over rejected defect
      (5L, Seq("user" -> "q"), "", "x"),
      (6L, Seq.empty, "a", "b")) // no prompt turns at all
    val out = PrefPrep.validate(p, col("pair_id"), col("prompt"),
        col("chosen"), col("rejected"))
      .orderBy("pair_id").collect()
      .map(r => (r.getLong(0), r.getBoolean(1), Option(r.getString(2))))
    assert(out.toSeq == Seq(
      (1L, true, None),
      (2L, false, Some("chosen_role_alternation")),
      (3L, false, Some("rejected_empty_content")),
      (4L, false, Some("identical_branches")),
      (5L, false, Some("chosen_empty_content")),
      // prompt-free: branch = [assistant] alone -> first_not_user
      (6L, false, Some("chosen_first_not_user"))))
  }

  test("dedupByPrompt: shared prompts collapse to min pair_id; " +
       "empty prompts never merge with each other") {
    val p = pairs(
      (10L, Seq("user" -> "same prompt"), "a", "b"),
      (11L, Seq("user" -> "same prompt"), "c", "d"),
      (12L, Seq("user" -> "other"), "a", "b"),
      (13L, Seq.empty, "a", "b"),
      (14L, Seq.empty, "c", "d"))
    val out = PrefPrep.dedupByPrompt(p, col("pair_id"), col("prompt"))
      .orderBy("pair_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(out.toSeq == Seq((10L, 10L, false), (11L, 10L, true),
      (12L, 12L, false), (13L, 13L, false), (14L, 14L, false)))
  }

  test("dedupByPrompt: a NULL-rendering prompt (null content in a " +
       "non-empty turn list) is retained as its own cluster — the " +
       "null-key join can never silently drop the pair") {
    val p = pairs(
      (20L, Seq("user" -> "clean prompt"), "a", "b"),
      (21L, Seq("user" -> null), "a", "b"),
      (22L, Seq("user" -> null), "c", "d"))
    val out = PrefPrep.dedupByPrompt(p, col("pair_id"), col("prompt"))
      .orderBy("pair_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    // all three rows PRESENT; the two null-render pairs never merge
    assert(out.toSeq == Seq((20L, 20L, false), (21L, 21L, false),
      (22L, 22L, false)), out.toSeq.toString)
  }

  test("branchTotals + responseSpans: even/odd branch keys, atomic " +
       "special-token arithmetic, span width == response token count") {
    val p = pairs(
      (7L, Seq("system" -> "be brief", "user" -> "count to three"),
        "one two three", "no"))
    val totals = PrefPrep.branchTotals(p, col("pair_id"), col("prompt"),
        col("chosen"), col("rejected"), wsCount)
      .orderBy("branch_key").collect()
      .map(r => (r.getString(1), r.getLong(2), r.getLong(3)))
    // prompt: (2+2) + (2+3) = 9; chosen 9+2+3 = 14; rejected 9+2+1 = 12
    assert(totals.toSeq == Seq(("chosen", 14L, 14L), ("rejected", 15L, 12L)))
    val spans = PrefPrep.responseSpans(p, col("pair_id"), col("prompt"),
        col("chosen"), col("rejected"), wsCount)
      .orderBy("conv_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // response starts after prompt(9) + the assistant marker(1) = 10
    assert(spans.toSeq == Seq((14L, 2L, 10L, 13L), (15L, 2L, 10L, 11L)))
  }

  test("end-to-end: packed masks preserve the response token totals " +
       "exactly, across sequence cuts") {
    val p = pairs((1 to 40).map { i =>
      (i.toLong, Seq("user" -> ("question number " + i)),
        Seq.fill(1 + i % 5)("answer").mkString(" "),
        Seq.fill(1 + (i * 3) % 7)("other").mkString(" "))
    }: _*)
    val totals = PrefPrep.branchTotals(p, col("pair_id"), col("prompt"),
      col("chosen"), col("rejected"), wsCount)
    val packMap = Sampling.packSequencesPosBy(totals, col("branch_key"),
      col("total_toks"), nShards = 2, seqLen = 16, salt = "t")
    val spans = PrefPrep.responseSpans(p, col("pair_id"), col("prompt"),
      col("chosen"), col("rejected"), wsCount)
    val masks = ChatPrep.packedAssistantMasks(packMap, spans)
    val masked = masks.agg(sum(col("mask_end") - col("mask_start")))
      .head().getLong(0)
    val expected = spans.agg(sum(col("end_tok") - col("start_tok")))
      .head().getLong(0)
    assert(masked == expected,
      s"packing changed the supervised token count: $masked != $expected")
    // every branch key present in the pack map, pairing recoverable
    val keys = packMap.select("doc_id").distinct().collect()
      .map(_.getLong(0)).toSet
    assert(keys == (1 to 40).flatMap(i => Seq(i * 2L, i * 2L + 1)).toSet)
  }

  test("plan guards: render and validate are pure projections — no " +
       "Exchange; dedup exchanges the fingerprint, not the prompt") {
    def planOf(df: DataFrame): String =
      df.queryExecution.executedPlan.toString
    val p = pairs((1L, Seq("user" -> "q"), "a", "b"))
    val pr = planOf(PrefPrep.render(p, col("pair_id"), col("prompt"),
      col("chosen"), col("rejected")))
    assert(!pr.contains("Exchange"), s"render shuffled:\n$pr")
    val pv = planOf(PrefPrep.validate(p, col("pair_id"), col("prompt"),
      col("chosen"), col("rejected")))
    assert(!pv.contains("Exchange"), s"validate shuffled:\n$pv")
    val pd = planOf(PrefPrep.dedupByPrompt(p, col("pair_id"),
      col("prompt")))
    assert(pd.contains("Exchange hashpartitioning(__fp"),
      s"dedup must shuffle on the fingerprint:\n$pd")
    assert(!pd.contains("Exchange hashpartitioning(__p"),
      s"dedup exchange keyed on the rendered prompt:\n$pd")
    // canonical via AGG + JOIN (the dedup_canonical shape), never
    // min().over(fp) — a window sorts every partition for a group min
    assert(!pd.contains("Window"),
      s"dedup lineage contains a Window (sorting) operator:\n$pd")
  }
}
