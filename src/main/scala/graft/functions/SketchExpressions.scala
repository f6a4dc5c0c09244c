package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Catalyst expressions over probabilistic sketches.
  *
  * The membership test against a Bloom filter of a multi-billion-row
  * fingerprint index is the hot inner loop of ingest-time admission
  * ([[graft.operators.Dedup.bloomAdmit]]): it runs once per incoming
  * document, so it must stay inside whole-stage codegen. A Scala UDF
  * closing over the filter would break the codegen span AND re-serialize
  * the filter per task; this expression instead references an explicit
  * `Broadcast[BloomFilter]` (shipped to each executor once, torrent-style)
  * and resolves it to a plain field in the generated class constructor, so
  * the per-row cost is a single virtual call on a local reference.
  */
object SketchExpressions {

  /** True iff the Bloom filter might contain the LONG child value.
    * One-sided error: `false` is definitive (the value was never inserted),
    * `true` is wrong with probability `fpp`. Not CodegenFallback —
    * surrounding operators stay in whole-stage codegen. */
  case class BloomMightContainLong(child: Expression, bloom: Broadcast[BloomFilter])
      extends UnaryExpression with ExpectsInputTypes {
    override def dataType: DataType = BooleanType
    // Analysis-time type check: the filter stores 64-bit fingerprints, so a
    // non-long child (a raw string column, say) must fail with a typed
    // analysis error, not a ClassCastException inside generated code.
    // (Seq[DataType], not Seq[AbstractDataType]: the latter is private[sql]
    // in Spark 4 and unreferencable here; the covariant override is legal.)
    override def inputTypes: Seq[DataType] = Seq(LongType)
    override def prettyName: String = "bloom_might_contain"

    override def nullSafeEval(input: Any): Any =
      bloom.value.mightContainLong(input.asInstanceOf[Long])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val bcRef = ctx.addReferenceObj("graftBloomBc", bloom,
        classOf[Broadcast[BloomFilter]].getName)
      // Resolve the broadcast once per generated-class instance, not per row.
      val filterVar = ctx.addMutableState(
        classOf[BloomFilter].getName, "graftBloom",
        v => s"$v = (${classOf[BloomFilter].getName}) $bcRef.value();")
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $filterVar.mightContainLong($c);")
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Column form of [[BloomMightContainLong]]. */
  def bloomMightContain(fp: Column, bloom: Broadcast[BloomFilter]): Column =
    ColumnBridge.column(BloomMightContainLong(ColumnBridge.expression(fp), bloom))
}
