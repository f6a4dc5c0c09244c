package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst expressions for the hash-heavy text-dedup kernels.
  *
  * The declarative higher-order-function formulation (transform/aggregate
  * lambdas) is interpreted row-at-a-time in Spark — no whole-stage codegen,
  * no common-subexpression elimination — which made MinHash/SimHash the
  * dominant cost of the dedup pipeline. The kernels live in [[TextKernels]]
  * (one tight JVM pass per document, shingles as byte-range views over one
  * copy of the text, Kirsch–Mitzenmacher double hashing for the k-hash
  * family) and are called from both interpreted `eval` and `doGenCode` —
  * the expressions are NOT CodegenFallback, so surrounding operators stay
  * inside whole-stage codegen.
  *
  * All are deterministic pure functions of their input, null on documents
  * with fewer than `ngram` tokens.
  */
object TextHashExpressions {

  /** `array<long>` MinHash signature of the word-`ngram` shingle set. */
  case class ShingleMinHash(child: Expression, ngram: Int, numHashes: Int)
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullable: Boolean = true
    override def prettyName: String = "shingle_minhash"

    override def nullSafeEval(input: Any): Any =
      TextKernels.shingleMinhash(input.asInstanceOf[UTF8String], ngram, numHashes)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => s"""
        |${ev.value} = graft.functions.TextKernels.shingleMinhash($c, $ngram, $numHashes);
        |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin)

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** 64-bit SimHash of the word-`ngram` shingle multiset. */
  case class SimHash(child: Expression, ngram: Int)
      extends UnaryExpression {
    override def dataType: DataType = LongType
    override def nullable: Boolean = true
    override def prettyName: String = "simhash64"

    override def nullSafeEval(input: Any): Any =
      TextKernels.simhash64(input.asInstanceOf[UTF8String], ngram)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => {
        val tmp = ctx.freshName("sh")
        s"""
           |java.lang.Long $tmp = graft.functions.TextKernels.simhash64($c, $ngram);
           |if ($tmp == null) { ${ev.isNull} = true; }
           |else { ${ev.value} = $tmp.longValue(); }
         """.stripMargin
      })

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Distinct word-`ngram` shingle strings, built in one pass (byte-range
    * views over a single copy of the text, LinkedHashSet dedup) — the fast
    * path for exact-Jaccard verification when shingle sets must actually
    * materialize. Null when fewer than `ngram` tokens. */
  case class Shingles(child: Expression, ngram: Int)
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def nullable: Boolean = true
    override def prettyName: String = "shingles"

    override def nullSafeEval(input: Any): Any =
      TextKernels.shingles(input.asInstanceOf[UTF8String], ngram)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => s"""
        |${ev.value} = graft.functions.TextKernels.shingles($c, $ngram);
        |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin)

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Distinct strings reachable from the key by at most `maxDist`
    * character deletions (the key itself included) — the SymSpell-style
    * band key for edit-distance joins; see
    * [[TextKernels.deletionNeighborhood]]. Null only on null input: the
    * empty string's neighborhood is `[""]`. */
  case class DeletionNeighborhood(child: Expression, maxDist: Int)
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def nullable: Boolean = child.nullable
    override def prettyName: String = "deletion_neighborhood"

    override def nullSafeEval(input: Any): Any =
      TextKernels.deletionNeighborhood(input.asInstanceOf[UTF8String], maxDist)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.TextKernels.deletionNeighborhood($c, $maxDist);")

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** XXH64 of the word-`ngram` window at every token position
    * (non-distinct, document order) — see [[TextKernels.spanHashes]]. */
  case class SpanHashes(child: Expression, ngram: Int)
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullable: Boolean = true
    override def prettyName: String = "span_hashes"

    override def nullSafeEval(input: Any): Any =
      TextKernels.spanHashes(input.asInstanceOf[UTF8String], ngram)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => s"""
        |${ev.value} = graft.functions.TextKernels.spanHashes($c, $ngram);
        |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin)

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Exact Jaccard similarity of the distinct word-`ngram` shingle sets of
    * two texts, in one pass — identical to `|A∩B| / |A∪B|` over
    * [[Shingles]] arrays, without materializing either array in the plan.
    * Null when either side has fewer than `ngram` tokens. One expression
    * instead of size(array_intersect(shingles(a), shingles(b))) / … matters
    * because Catalyst inlines verification predicates into join conditions,
    * multiplying every sub-expression evaluation. */
  case class ShingleJaccard(left: Expression, right: Expression, ngram: Int)
      extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true
    override def prettyName: String = "shingle_jaccard"

    override def nullSafeEval(l: Any, r: Any): Any =
      TextKernels.shingleJaccard(
        l.asInstanceOf[UTF8String], r.asInstanceOf[UTF8String], ngram)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val tmp = ctx.freshName("jac")
        s"""
           |java.lang.Double $tmp =
           |  graft.functions.TextKernels.shingleJaccard($a, $b, $ngram);
           |if ($tmp == null) { ${ev.isNull} = true; }
           |else { ${ev.value} = $tmp.doubleValue(); }
         """.stripMargin
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** One-pass repetition statistics:
    * `struct<n_tokens:int, n_distinct:int, top_token:int, top_bigram:int>`.
    * The Gopher-style corpus repetition signals (duplicate-token ratio,
    * top-token/top-bigram fraction) are declarative ratios over these four
    * counts; computing the counts per row keeps the operator shuffle-free —
    * the explode+groupBy formulation re-keys the whole token stream. Null
    * text → zeros (a blank document has no repetition), never null. */
  case class RepetitionStats(child: Expression) extends UnaryExpression {
    override def dataType: DataType = StructType(Seq(
      StructField("n_tokens", IntegerType, nullable = false),
      StructField("n_distinct", IntegerType, nullable = false),
      StructField("top_token", IntegerType, nullable = false),
      StructField("top_bigram", IntegerType, nullable = false)))
    override def nullable: Boolean = false
    override def prettyName: String = "repetition_stats"

    @transient private lazy val zeros: InternalRow =
      TextKernels.repetitionStats(UTF8String.fromString(""))

    override def eval(input: InternalRow): Any = {
      val v = child.eval(input)
      if (v == null) zeros
      else TextKernels.repetitionStats(v.asInstanceOf[UTF8String])
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val zerosRef = ctx.addReferenceObj("repZeros", zeros,
        "org.apache.spark.sql.catalyst.InternalRow")
      val c = child.genCode(ctx)
      ev.copy(code = code"""
        ${c.code}
        org.apache.spark.sql.catalyst.InternalRow ${ev.value} = ${c.isNull} ?
          $zerosRef :
          graft.functions.TextKernels.repetitionStats(${c.value});
      """, isNull = FalseLiteral)
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Profile language id ([[TextKernels.langIdProfile]]): char-trigram
    * profile hits (weight 1000) + stopword token hits (the built-in
    * tie-break), argmax with first-declared-wins ties, "und" when
    * nothing scores. The child is the NORMALIZED text column (lowered,
    * ws-collapsed, trimmed — built declaratively by the caller so the
    * SQL oracle replays the identical normalization). Never null: null
    * text is "und". */
  case class LangIdProfile(child: Expression,
                           langs: Seq[(String, Seq[String], Seq[String])])
      extends UnaryExpression {
    override def dataType: DataType = StringType
    override def nullable: Boolean = false
    override def prettyName: String = "lang_id_profile"

    @transient private lazy val tgTable: TrigramTable =
      TrigramTable.build(
        langs.map { case (_, tgs, _) => tgs.toArray }.toArray)
    @transient private lazy val swSets: Array[java.util.HashSet[UTF8String]] =
      langs.map { case (_, _, ws) =>
        val s = new java.util.HashSet[UTF8String]()
        ws.foreach(w => s.add(UTF8String.fromString(w)))
        s
      }.toArray
    @transient private lazy val names: Array[UTF8String] =
      langs.map(l => UTF8String.fromString(l._1)).toArray
    @transient private lazy val undS: UTF8String = UTF8String.fromString("und")

    override def eval(input: InternalRow): Any = {
      val v = child.eval(input)
      if (v == null) undS
      else TextKernels.langIdProfile(
        v.asInstanceOf[UTF8String], tgTable, swSets, names, undS)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val tgRef = ctx.addReferenceObj("langTgTable", tgTable,
        "graft.functions.TrigramTable")
      val swRef = ctx.addReferenceObj("langSwSets", swSets, "java.util.HashSet[]")
      val namesRef = ctx.addReferenceObj("langNames", names,
        "org.apache.spark.unsafe.types.UTF8String[]")
      val undRef = ctx.addReferenceObj("langUnd", undS,
        "org.apache.spark.unsafe.types.UTF8String")
      val c = child.genCode(ctx)
      ev.copy(code = code"""
        ${c.code}
        org.apache.spark.unsafe.types.UTF8String ${ev.value} = ${c.isNull} ?
          $undRef :
          graft.functions.TextKernels.langIdProfile(${c.value}, $tgRef, $swRef, $namesRef, $undRef);
      """, isNull = FalseLiteral)
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** BPE merge application ([[TextKernels.bpeEncode]]): the flat subword
    * sequence of one document under a trained merge list (rank order =
    * sequence order). The pair→rank table builds once per expression
    * instance (`@transient lazy`, rebuilt per executor after plan
    * serialization — the broadcast-model shape), and per-row cost is
    * independent of table size. Null text → null. */
  case class BpeEncode(child: Expression, merges: Seq[(String, String)],
                       marked: Boolean = false, byteLevel: Boolean = false)
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def nullable: Boolean = true
    override def prettyName: String =
      if (byteLevel) "bpe_encode_bytes" else "bpe_encode"

    @transient private lazy val table: java.util.HashMap[String, Integer] =
      if (byteLevel) TextKernels.bpeTableBytes(merges)
      else TextKernels.bpeTable(merges)

    override def nullSafeEval(input: Any): Any =
      if (byteLevel)
        TextKernels.bpeEncodeBytes(input.asInstanceOf[UTF8String], table, marked)
      else
        TextKernels.bpeEncode(input.asInstanceOf[UTF8String], table, marked)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val tableRef = ctx.addReferenceObj("bpeTable", table, "java.util.HashMap")
      val kernel = if (byteLevel) "bpeEncodeBytes" else "bpeEncode"
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.TextKernels.$kernel($c, $tableRef, $marked);")
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** [[TextKernels.bpeEncodeIds]]: merge application straight to token
    * ids — the merge table AND the symbol→id vocabulary both build once
    * per expression instance as O(1) hash tables (the loader-path
    * replacement for transforming the symbol array through a plan-
    * literal map, whose `element_at` scans linearly per symbol). */
  case class BpeEncodeIds(child: Expression, merges: Seq[(String, String)],
                          byteLevel: Boolean) extends UnaryExpression {
    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
    override def nullable: Boolean = true
    override def prettyName: String =
      if (byteLevel) "bpe_encode_ids_bytes" else "bpe_encode_ids"

    @transient private lazy val table: java.util.HashMap[String, Integer] =
      if (byteLevel) TextKernels.bpeTableBytes(merges)
      else TextKernels.bpeTable(merges)
    @transient private lazy val ids: java.util.HashMap[String, Integer] =
      TextKernels.bpeIdTable(merges, byteLevel)

    override def nullSafeEval(input: Any): Any =
      TextKernels.bpeEncodeIds(input.asInstanceOf[UTF8String], table, ids,
        byteLevel)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val tableRef = ctx.addReferenceObj("bpeTable", table, "java.util.HashMap")
      val idsRef = ctx.addReferenceObj("bpeIds", ids, "java.util.HashMap")
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.TextKernels.bpeEncodeIds(" +
          s"$c, $tableRef, $idsRef, $byteLevel);")
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  def bpeEncodeIds(text: Column, merges: Seq[(String, String)],
                   byteLevel: Boolean): Column =
    ColumnBridge.column(
      BpeEncodeIds(ColumnBridge.expression(text), merges, byteLevel))

  def bpeEncode(text: Column, merges: Seq[(String, String)],
                marked: Boolean = false): Column =
    ColumnBridge.column(
      BpeEncode(ColumnBridge.expression(text), merges, marked))

  def bpeEncodeBytes(text: Column, merges: Seq[(String, String)],
                     marked: Boolean = false): Column =
    ColumnBridge.column(
      BpeEncode(ColumnBridge.expression(text), merges, marked,
        byteLevel = true))

  def langIdProfile(norm: Column,
                    langs: Seq[(String, Seq[String], Seq[String])]): Column =
    ColumnBridge.column(LangIdProfile(ColumnBridge.expression(norm), langs))

  /** One-pass codepoint-distribution statistics:
    * `struct<n_cp:bigint, n_distinct_cp:bigint, entropy:double>` —
    * Shannon entropy of the codepoint histogram ([[TextKernels
    * .charEntropy]]): the two-tailed corpus-quality signal (degenerate
    * repetition vs random junk). Null text → zeros, never null. */
  case class CharEntropy(child: Expression) extends UnaryExpression {
    override def dataType: DataType = StructType(Seq(
      StructField("n_cp", LongType, nullable = false),
      StructField("n_distinct_cp", LongType, nullable = false),
      StructField("entropy", DoubleType, nullable = false)))
    override def nullable: Boolean = false
    override def prettyName: String = "char_entropy"

    @transient private lazy val zeros: InternalRow =
      TextKernels.charEntropy(UTF8String.fromString(""))

    override def eval(input: InternalRow): Any = {
      val v = child.eval(input)
      if (v == null) zeros
      else TextKernels.charEntropy(v.asInstanceOf[UTF8String])
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val zerosRef = ctx.addReferenceObj("entZeros", zeros,
        "org.apache.spark.sql.catalyst.InternalRow")
      val c = child.genCode(ctx)
      ev.copy(code = code"""
        ${c.code}
        org.apache.spark.sql.catalyst.InternalRow ${ev.value} = ${c.isNull} ?
          $zerosRef :
          graft.functions.TextKernels.charEntropy(${c.value});
      """, isNull = FalseLiteral)
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Unicode normalization to `form` ([[TextKernels.normalize]]) — the
    * UAX #15 canonical/compatibility forms; unknown forms fail at
    * construction, not per row. Null text → null. */
  case class UnicodeNormalize(child: Expression, form: String)
      extends UnaryExpression {
    require(Set("NFC", "NFD", "NFKC", "NFKD").contains(form),
      s"UnicodeNormalize: unknown Unicode form '$form' (NFC|NFD|NFKC|NFKD)")
    override def dataType: DataType = StringType
    override def nullable: Boolean = true
    override def prettyName: String = "unicode_normalize"

    override def nullSafeEval(input: Any): Any =
      TextKernels.normalize(input.asInstanceOf[UTF8String], form)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"""${ev.value} = graft.functions.TextKernels.normalize($c, "$form");""")

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  def unicodeNormalize(text: Column, form: String): Column =
    ColumnBridge.column(UnicodeNormalize(ColumnBridge.expression(text), form))

  def charEntropy(text: Column): Column =
    ColumnBridge.column(CharEntropy(ColumnBridge.expression(text)))

  def repetitionStats(text: Column): Column =
    ColumnBridge.column(RepetitionStats(ColumnBridge.expression(text)))

  def shingles(text: Column, ngram: Int = 3): Column =
    ColumnBridge.column(Shingles(ColumnBridge.expression(text), ngram))

  def deletionNeighborhood(key: Column, maxDist: Int = 1): Column =
    ColumnBridge.column(
      DeletionNeighborhood(ColumnBridge.expression(key), maxDist))

  def spanHashes(text: Column, ngram: Int): Column =
    ColumnBridge.column(SpanHashes(ColumnBridge.expression(text), ngram))

  def shingleMinhash(text: Column, ngram: Int = 3, numHashes: Int = 64): Column =
    ColumnBridge.column(
      ShingleMinHash(ColumnBridge.expression(text), ngram, numHashes))

  def simhash64(text: Column, ngram: Int = 3): Column =
    ColumnBridge.column(SimHash(ColumnBridge.expression(text), ngram))

  def shingleJaccard(a: Column, b: Column, ngram: Int = 3): Column =
    ColumnBridge.column(
      ShingleJaccard(ColumnBridge.expression(a), ColumnBridge.expression(b), ngram))

  /** [[TextKernels.unigramSegment]]: SentencePiece-unigram Viterbi
    * segmentation to `struct<logp_micro: bigint, n_pieces: bigint>` —
    * exact Long DP over pre-quantized micro-nat piece scores, the
    * engine-exact form of unigram-LM tokenization. */
  case class UnigramSegment(child: Expression, pieces: Seq[(String, Long)],
                            maxLen: Int) extends UnaryExpression {
    require(maxLen >= 1,
      s"$prettyName: maxLen must be >= 1, got $maxLen — a zero window " +
        "would leave every DP cell at Long.MinValue and wrap the totals")
    override def dataType: DataType = StructType(Seq(
      StructField("logp_micro", LongType, nullable = false),
      StructField("n_pieces", LongType, nullable = false)))
    override def nullable: Boolean = true
    override def prettyName: String = "unigram_segment"

    @transient private lazy val table: java.util.HashMap[String, java.lang.Long] = {
      val m = new java.util.HashMap[String, java.lang.Long](pieces.size * 2)
      pieces.foreach { case (p, v) => m.put(p, java.lang.Long.valueOf(v)) }
      m
    }

    override def nullSafeEval(input: Any): Any =
      TextKernels.unigramSegment(input.asInstanceOf[UTF8String], table, maxLen)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val tableRef = ctx.addReferenceObj("uniTable", table, "java.util.HashMap")
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.TextKernels.unigramSegment(" +
          s"$c, $tableRef, $maxLen);")
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  def unigramSegment(text: Column, pieces: Seq[(String, Long)],
                     maxLen: Int): Column =
    ColumnBridge.column(
      UnigramSegment(ColumnBridge.expression(text), pieces, maxLen))

  /** [[TextKernels.unigramSegmentPieces]]: the best segmentation's
    * piece array — the hard-EM E-step hand-off. */
  case class UnigramSegmentPieces(child: Expression,
                                  pieces: Seq[(String, Long)],
                                  maxLen: Int) extends UnaryExpression {
    require(maxLen >= 1,
      s"$prettyName: maxLen must be >= 1, got $maxLen — a zero window " +
        "would leave every DP cell at Long.MinValue and wrap the totals")
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def nullable: Boolean = true
    override def prettyName: String = "unigram_segment_pieces"

    @transient private lazy val table: java.util.HashMap[String, java.lang.Long] = {
      val m = new java.util.HashMap[String, java.lang.Long](pieces.size * 2)
      pieces.foreach { case (p, v) => m.put(p, java.lang.Long.valueOf(v)) }
      m
    }

    override def nullSafeEval(input: Any): Any =
      TextKernels.unigramSegmentPieces(input.asInstanceOf[UTF8String], table,
        maxLen)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val tableRef = ctx.addReferenceObj("uniTable", table, "java.util.HashMap")
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.TextKernels.unigramSegmentPieces(" +
          s"$c, $tableRef, $maxLen);")
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  def unigramSegmentPieces(text: Column, pieces: Seq[(String, Long)],
                           maxLen: Int): Column =
    ColumnBridge.column(
      UnigramSegmentPieces(ColumnBridge.expression(text), pieces, maxLen))

  /** [[TextKernels.unigramSegmentIds]]: best-path pieces straight to
    * vocabulary ids (both hash tables build once per expression). */
  case class UnigramSegmentIds(child: Expression,
                               pieces: Seq[(String, Long)],
                               vocab: Seq[(String, Int)],
                               maxLen: Int) extends UnaryExpression {
    require(maxLen >= 1,
      s"unigram_segment_ids: maxLen must be >= 1, got $maxLen")
    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
    override def nullable: Boolean = true
    override def prettyName: String = "unigram_segment_ids"

    @transient private lazy val table: java.util.HashMap[String, java.lang.Long] = {
      val m = new java.util.HashMap[String, java.lang.Long](pieces.size * 2)
      pieces.foreach { case (p, v) => m.put(p, java.lang.Long.valueOf(v)) }
      m
    }
    @transient private lazy val ids: java.util.HashMap[String, Integer] = {
      val m = new java.util.HashMap[String, Integer](vocab.size * 2)
      vocab.foreach { case (p, i) => m.put(p, Integer.valueOf(i)) }
      m
    }

    override def nullSafeEval(input: Any): Any =
      TextKernels.unigramSegmentIds(input.asInstanceOf[UTF8String], table,
        ids, maxLen)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val tableRef = ctx.addReferenceObj("uniTable", table, "java.util.HashMap")
      val idsRef = ctx.addReferenceObj("uniIds", ids, "java.util.HashMap")
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.TextKernels.unigramSegmentIds(" +
          s"$c, $tableRef, $idsRef, $maxLen);")
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  def unigramSegmentIds(text: Column, pieces: Seq[(String, Long)],
                        vocab: Seq[(String, Int)], maxLen: Int): Column =
    ColumnBridge.column(
      UnigramSegmentIds(ColumnBridge.expression(text), pieces, vocab, maxLen))

  /** [[TextKernels.unigramSegmentBytes]]: BYTE-level unigram Viterbi
    * segmentation — the production-alphabet twin of [[UnigramSegment]]:
    * every whitespace token of any script segments through the exact
    * Long DP over its UTF-8 bytes; pieces are lowercase-hex strings
    * from [[graft.operators.TextAnalysis.unigramTrainBytes]]. */
  case class UnigramSegmentBytes(child: Expression,
                                 pieces: Seq[(String, Long)], maxLen: Int)
      extends UnaryExpression {
    require(maxLen >= 1,
      s"$prettyName: maxLen must be >= 1, got $maxLen")
    override def dataType: DataType = StructType(Seq(
      StructField("logp_micro", LongType, nullable = false),
      StructField("n_pieces", LongType, nullable = false)))
    override def nullable: Boolean = true
    override def prettyName: String = "unigram_segment_bytes"

    @transient private lazy val table =
      new UnigramByteTable(pieces, maxLen)

    override def nullSafeEval(input: Any): Any =
      TextKernels.unigramSegmentBytes(input.asInstanceOf[UTF8String], table)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val tableRef = ctx.addReferenceObj("uniByteTable", table,
        "graft.functions.UnigramByteTable")
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.TextKernels.unigramSegmentBytes(" +
          s"$c, $tableRef);")
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  def unigramSegmentBytes(text: Column, pieces: Seq[(String, Long)],
                          maxLen: Int): Column =
    ColumnBridge.column(
      UnigramSegmentBytes(ColumnBridge.expression(text), pieces, maxLen))

  /** [[TextKernels.unigramSegmentBytesPieces]]: the byte-level best
    * path as lowercase-hex piece strings — the hard-EM hand-off. */
  case class UnigramSegmentBytesPieces(child: Expression,
                                       pieces: Seq[(String, Long)],
                                       maxLen: Int)
      extends UnaryExpression {
    require(maxLen >= 1,
      s"$prettyName: maxLen must be >= 1, got $maxLen")
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def nullable: Boolean = true
    override def prettyName: String = "unigram_segment_bytes_pieces"

    @transient private lazy val table =
      new UnigramByteTable(pieces, maxLen)

    override def nullSafeEval(input: Any): Any =
      TextKernels.unigramSegmentBytesPieces(input.asInstanceOf[UTF8String],
        table)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val tableRef = ctx.addReferenceObj("uniByteTable", table,
        "graft.functions.UnigramByteTable")
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.TextKernels.unigramSegmentBytesPieces(" +
          s"$c, $tableRef);")
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  def unigramSegmentBytesPieces(text: Column, pieces: Seq[(String, Long)],
                                maxLen: Int): Column =
    ColumnBridge.column(
      UnigramSegmentBytesPieces(ColumnBridge.expression(text), pieces, maxLen))

  /** [[TextKernels.unigramSegmentBytesPiecesMarked]]: the byte-level
    * best path with token-start markers — the invertible form. */
  case class UnigramSegmentBytesPiecesMarked(child: Expression,
                                             pieces: Seq[(String, Long)],
                                             maxLen: Int)
      extends UnaryExpression {
    require(maxLen >= 1,
      s"$prettyName: maxLen must be >= 1, got $maxLen")
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def nullable: Boolean = true
    override def prettyName: String = "unigram_segment_bytes_marked"

    @transient private lazy val table =
      new UnigramByteTable(pieces, maxLen)

    override def nullSafeEval(input: Any): Any =
      TextKernels.unigramSegmentBytesPiecesMarked(
        input.asInstanceOf[UTF8String], table)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val tableRef = ctx.addReferenceObj("uniByteTable", table,
        "graft.functions.UnigramByteTable")
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.TextKernels" +
          s".unigramSegmentBytesPiecesMarked($c, $tableRef);")
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  def unigramSegmentBytesPiecesMarked(text: Column,
                                      pieces: Seq[(String, Long)],
                                      maxLen: Int): Column =
    ColumnBridge.column(UnigramSegmentBytesPiecesMarked(
      ColumnBridge.expression(text), pieces, maxLen))

  /** [[TextKernels.unigramDetokBytes]]: marked hex pieces back to the
    * whitespace-normalized text. */
  case class UnigramDetokBytes(child: Expression) extends UnaryExpression {
    override def dataType: DataType = StringType
    override def nullable: Boolean = true
    override def prettyName: String = "unigram_detok_bytes"

    override def nullSafeEval(input: Any): Any =
      TextKernels.unigramDetokBytes(
        input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.TextKernels.unigramDetokBytes($c);")

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  def unigramDetokBytes(pieces: Column): Column =
    ColumnBridge.column(UnigramDetokBytes(ColumnBridge.expression(pieces)))

  /** [[TextKernels.unigramSegmentBytesIds]]: byte-level best path
    * straight to vocabulary ids. */
  case class UnigramSegmentBytesIds(child: Expression,
                                    pieces: Seq[(String, Long)],
                                    vocab: Seq[(String, Int)], maxLen: Int)
      extends UnaryExpression {
    require(maxLen >= 1,
      s"unigram_segment_bytes_ids: maxLen must be >= 1, got $maxLen")
    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
    override def nullable: Boolean = true
    override def prettyName: String = "unigram_segment_bytes_ids"

    @transient private lazy val table =
      new UnigramByteTable(pieces, maxLen)
    @transient private lazy val ids: java.util.HashMap[String, Integer] = {
      val m = new java.util.HashMap[String, Integer](vocab.size * 2)
      vocab.foreach { case (p, i) => m.put(p, Integer.valueOf(i)) }
      m
    }

    override def nullSafeEval(input: Any): Any =
      TextKernels.unigramSegmentBytesIds(input.asInstanceOf[UTF8String],
        table, ids)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val tableRef = ctx.addReferenceObj("uniByteTable", table,
        "graft.functions.UnigramByteTable")
      val idsRef = ctx.addReferenceObj("uniByteIds", ids, "java.util.HashMap")
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.TextKernels.unigramSegmentBytesIds(" +
          s"$c, $tableRef, $idsRef);")
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  def unigramSegmentBytesIds(text: Column, pieces: Seq[(String, Long)],
                             vocab: Seq[(String, Int)], maxLen: Int): Column =
    ColumnBridge.column(
      UnigramSegmentBytesIds(ColumnBridge.expression(text), pieces, vocab,
        maxLen))
}
