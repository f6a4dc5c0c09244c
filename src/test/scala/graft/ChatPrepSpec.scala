package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.operators.ChatPrep

/** ChatPrep: render exactness, span self-consistency (every span cut
  * out of the rendered string IS the turn content), validation
  * precedence on hand-built defect fixtures, and dedup canonicals. */
class ChatPrepSpec extends SparkSpec {
  import spark.implicits._

  private def conv(id: Long, turns: (String, String)*) =
    (id, turns.map { case (r, c) => (r, c) })

  private def df(rows: (Long, Seq[(String, String)])*) =
    rows.toDF("conv_id", "turns")
      .select(col("conv_id"),
        transform(col("turns"), t => struct(t.getField("_1").as("role"),
          t.getField("_2").as("content"))).as("turns"))

  private val good = df(
    conv(1L, "user" -> "hi there", "assistant" -> "hello"),
    conv(2L, "system" -> "be brief", "user" -> "what is 2+2",
      "assistant" -> "4", "user" -> "and 3+3", "assistant" -> "6"))

  test("render: exact template, counts, and lengths") {
    val out = ChatPrep.render(good, col("conv_id"), col("turns"))
      .orderBy("conv_id").collect()
    assert(out(0) == Row(1L, 2L, 1L,
      "<|user|>hi there<|end|><|assistant|>hello<|end|>", 48L))
    assert(out(1).getString(3) ==
      "<|system|>be brief<|end|><|user|>what is 2+2<|end|>" +
        "<|assistant|>4<|end|><|user|>and 3+3<|end|><|assistant|>6<|end|>")
    assert(out(1) == Row(2L, 5L, 2L, out(1).getString(3),
      out(1).getString(3).length.toLong))
  }

  test("assistantSpans: substring(rendered, start, end) == turn content, " +
       "for every assistant turn, including multi-turn and system convs") {
    val rendered = ChatPrep.render(good, col("conv_id"), col("turns"))
      .select(col("conv_id"), col("rendered"))
    val spans = ChatPrep.assistantSpans(good, col("conv_id"), col("turns"))
    val cut = spans.join(rendered, "conv_id")
      .select(col("conv_id"), col("turn_idx"),
        expr("substring(rendered, CAST(start_char + 1 AS INT), " +
          "CAST(end_char - start_char AS INT))").as("cut"))
      .orderBy("conv_id", "turn_idx").collect()
    assert(cut.map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq ==
      Seq((1L, 1L, "hello"), (2L, 2L, "4"), (2L, 4L, "6")))
    // a conversation with no assistant turn emits no rows
    val none = df(conv(9L, "user" -> "hi"))
    assert(ChatPrep.assistantSpans(none, col("conv_id"), col("turns"))
      .count() == 0L)
  }

  test("assistantTokenSpans: atomic special tokens, per-turn counts " +
       "compose — offsets match the hand summation") {
    // whitespace counter: content token count = word count
    val wc: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
      c => size(graft.operators.TextAnalysis.tokens(c)).cast("long")
    val out = ChatPrep.assistantTokenSpans(good, col("conv_id"),
        col("turns"), wc)
      .orderBy("conv_id", "turn_idx").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // conv 1: [user "hi there"(2), assistant "hello"(1)]
    //   user turn: positions 0..3 (<|user|> hi there <|end|>) -> off 4
    //   assistant content starts at 5 = 4 + 1 marker, ends 6
    assert(out(0) == (1L, 1L, 5L, 6L))
    // conv 2: sys "be brief"(2): 4 tok; user "what is 2+2"(3): 5 tok;
    //   assistant "4"(1): starts 4+5+1=10, ends 11; turn ends off=12
    //   user "and 3+3"(2): 4 tok -> off 16; assistant "6": 17..18
    assert(out(1) == (2L, 2L, 10L, 11L))
    assert(out(2) == (2L, 4L, 17L, 18L))
  }

  test("packedAssistantMasks: masked token totals survive packing, " +
       "offsets stay inside the sequence, straddling spans split") {
    import org.apache.spark.sql.Column
    val wc: Column => Column =
      c => size(graft.operators.TextAnalysis.tokens(c)).cast("long")
    // long-ish convs against seqLen=8 so spans straddle sequence cuts
    val convs = df(
      conv(1L, "user" -> "a b c", "assistant" -> "d e f g h"),
      conv(2L, "user" -> "one two", "assistant" -> "three four five six"),
      conv(3L, "system" -> "s p", "user" -> "q r", "assistant" -> "t u v w x y z"))
    val totals = convs.select(col("conv_id"),
      aggregate(col("turns"), lit(0L),
        (acc, t) => acc + lit(2L) + wc(t.getField("content"))).as("__tot"))
    val packMap = graft.operators.Sampling.packSequencesPosBy(
      totals, col("conv_id"), col("__tot"), nShards = 1, seqLen = 8,
      salt = "spec")
    val spans = ChatPrep.assistantTokenSpans(convs, col("conv_id"),
      col("turns"), wc)
    val masks = ChatPrep.packedAssistantMasks(packMap, spans)
    val rows = masks.collect()
    // every mask is inside [0, seqLen) and non-empty
    assert(rows.forall { r =>
      val s = r.getAs[Long]("mask_start"); val e = r.getAs[Long]("mask_end")
      s >= 0 && s < e && e <= 8
    }, rows.mkString("; "))
    // total supervised tokens per conversation are preserved exactly
    val perConvMask = masks.groupBy("conv_id")
      .agg(sum(col("mask_end") - col("mask_start")).as("m"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val perConvSpan = spans.groupBy("conv_id")
      .agg(sum(col("end_tok") - col("start_tok")).as("m"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(perConvMask == perConvSpan, s"$perConvMask vs $perConvSpan")
    // with 3 spans over 8-token sequences at these lengths, at least
    // one span must have split across a cut
    assert(rows.length > spans.count(),
      s"expected a straddling span to split: ${rows.length} rows")
  }

  test("validate: reason precedence on hand-built defects") {
    val fixtures = df(
      conv(1L, "user" -> "q", "assistant" -> "a"), // valid
      conv(2L, "system" -> "s", "user" -> "q", "assistant" -> "a"), // valid
      conv(3L), // no_turns
      conv(4L, "user" -> "q", "tool" -> "x"), // bad_role
      conv(5L, "user" -> "q", "system" -> "s"), // system_position
      conv(6L, "system" -> "s"), // no_core_turns
      conv(7L, "assistant" -> "a"), // first_not_user
      conv(8L, "user" -> "q", "assistant" -> "a", "assistant" -> "b"),
      conv(9L, "user" -> "q", "assistant" -> "a", "user" -> "q2"),
      conv(10L, "user" -> "", "assistant" -> "a"), // empty_content
      // precedence: alternation break AND empty content -> alternation
      conv(11L, "user" -> "q", "user" -> "", "assistant" -> "a"))
    val out = ChatPrep.validate(fixtures, col("conv_id"), col("turns"))
      .orderBy("conv_id").collect()
      .map(r => (r.getLong(0), r.getBoolean(2), Option(r.getString(3))))
    assert(out.toSeq == Seq(
      (1L, true, None), (2L, true, None),
      (3L, false, Some("no_turns")), (4L, false, Some("bad_role")),
      (5L, false, Some("system_position")),
      (6L, false, Some("no_core_turns")),
      (7L, false, Some("first_not_user")),
      (8L, false, Some("role_alternation")),
      (9L, false, Some("last_not_assistant")),
      (10L, false, Some("empty_content")),
      (11L, false, Some("role_alternation"))))
  }

  test("validate: NULL role fails as bad_role (isin(null) is SQL-null, " +
       "which must not read as pass)") {
    val fixtures = df(
      conv(1L, "user" -> "q", (null: String) -> "a"),
      conv(2L, (null: String) -> "q", "assistant" -> "a"),
      // null role alongside a defect later in precedence: bad_role wins
      conv(3L, (null: String) -> "", "user" -> "q"))
    val out = ChatPrep.validate(fixtures, col("conv_id"), col("turns"))
      .orderBy("conv_id").collect()
      .map(r => (r.getLong(0), r.getBoolean(2), Option(r.getString(3))))
    assert(out.toSeq == Seq(
      (1L, false, Some("bad_role")),
      (2L, false, Some("bad_role")),
      (3L, false, Some("bad_role"))))
  }

  test("plan guards: render, validate, and both span forms are pure " +
       "projections (no Exchange); dedup exchanges the fingerprint, " +
       "never the turns") {
    import org.apache.spark.sql.Column
    val wc: Column => Column =
      c => size(graft.operators.TextAnalysis.tokens(c)).cast("long")
    def planOf(df: org.apache.spark.sql.DataFrame): String =
      df.queryExecution.executedPlan.toString
    val pr = planOf(ChatPrep.render(good, col("conv_id"), col("turns")))
    assert(!pr.contains("Exchange"), s"render shuffled:\n$pr")
    val pv = planOf(ChatPrep.validate(good, col("conv_id"), col("turns")))
    assert(!pv.contains("Exchange"), s"validate shuffled:\n$pv")
    val ps = planOf(ChatPrep.assistantSpans(good, col("conv_id"),
      col("turns")))
    assert(!ps.contains("Exchange"), s"char spans shuffled:\n$ps")
    val pt = planOf(ChatPrep.assistantTokenSpans(good, col("conv_id"),
      col("turns"), wc))
    assert(!pt.contains("Exchange"), s"token spans shuffled:\n$pt")
    // dedup's one exchange partitions on the fingerprint, and the
    // assistant text itself is projected away before the shuffle
    val pd = planOf(ChatPrep.dedupByAssistant(good, col("conv_id"),
      col("turns")))
    assert(pd.contains("Exchange hashpartitioning(__fp"),
      s"dedup must shuffle on the fingerprint:\n$pd")
    assert(!pd.contains("Exchange hashpartitioning(__a"),
      s"dedup exchange keyed on the text:\n$pd")
    // the canonical comes from AGG + JOIN, never min().over(fp): a
    // window would sort every partition just to spread a group min
    assert(!pd.contains("Window"),
      s"dedup lineage contains a Window (sorting) operator:\n$pd")
  }

  test("dedupByAssistant: same assistant content collapses to the min " +
       "conv_id; prompt-side differences do not split the group") {
    val convs = df(
      conv(10L, "user" -> "q one", "assistant" -> "same answer"),
      conv(11L, "user" -> "entirely different prompt",
        "assistant" -> "same answer"),
      conv(12L, "user" -> "q one", "assistant" -> "other answer"),
      conv(13L, "system" -> "s", "user" -> "q", "assistant" -> "same",
        "user" -> "more", "assistant" -> "answer"))
    val out = ChatPrep.dedupByAssistant(convs, col("conv_id"), col("turns"))
      .orderBy("conv_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    // conv 13's assistant text is "same answer" too (space-joined)
    assert(out.toSeq == Seq((10L, 10L, false), (11L, 10L, true),
      (12L, 12L, false), (13L, 10L, true)))
  }

  test("dedupByAssistant: assistant-free conversations are each their " +
       "own cluster, never merged on the shared empty assistant text") {
    val convs = df(
      conv(20L, "user" -> "unanswered one"),
      conv(21L, "user" -> "unanswered two"),
      conv(22L, "user" -> "q", "assistant" -> "a"),
      conv(23L, "user" -> "q2", "assistant" -> "a"))
    val out = ChatPrep.dedupByAssistant(convs, col("conv_id"), col("turns"))
      .orderBy("conv_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(out.toSeq == Seq((20L, 20L, false), (21L, 21L, false),
      (22L, 22L, false), (23L, 22L, true)))
  }
}
