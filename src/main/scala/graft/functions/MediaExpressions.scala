package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, QuaternaryExpression, UnaryExpression}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Catalyst expressions over the pure-JVM media codecs in
  * [[MediaKernels]] — the real (container/header-level) implementation
  * behind the multimodal decode seam. All are deterministic, codegen'd
  * via static kernel calls (not CodegenFallback), and null-safe: corrupt
  * or unrecognized payloads yield null, never an exception, so a poison
  * record can't kill a 100-TB stage.
  *
  * `image_header` / `wav_header` are the decode path: binary in, typed
  * header struct out, running at scan speed inside whole-stage codegen —
  * the shape a metadata-extraction pass over petabytes of media wants
  * (parse travels to the data; only small structs ever reach a shuffle).
  * `image_encode` / `wav_encode` exist so tests and synthetic pipelines
  * exercise the parsers against honest spec-conformant byte streams.
  */
object MediaExpressions {

  private val imageHeaderType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("bit_depth", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false)))

  private val wavHeaderType = StructType(Seq(
    StructField("channels", IntegerType, nullable = false),
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("bits_per_sample", IntegerType, nullable = false),
    StructField("n_frames", LongType, nullable = false),
    StructField("duration_ms", LongType, nullable = false)))

  /** `struct<format,width,height,bit_depth,channels>` from PNG/JPEG/GIF
    * bytes; null when unparseable. */
  case class ImageHeader(child: Expression) extends UnaryExpression {
    override def dataType: DataType = imageHeaderType
    override def nullable: Boolean = true
    override def prettyName: String = "image_header"

    override def nullSafeEval(input: Any): Any =
      MediaKernels.imageHeader(input.asInstanceOf[Array[Byte]])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => s"""
        |${ev.value} = graft.functions.MediaKernels.imageHeader($c);
        |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin)

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** `struct<channels,sample_rate,bits_per_sample,n_frames,duration_ms>`
    * from RIFF-WAVE bytes; null when unparseable. */
  case class WavHeader(child: Expression) extends UnaryExpression {
    override def dataType: DataType = wavHeaderType
    override def nullable: Boolean = true
    override def prettyName: String = "wav_header"

    override def nullSafeEval(input: Any): Any =
      MediaKernels.wavHeader(input.asInstanceOf[Array[Byte]])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => s"""
        |${ev.value} = graft.functions.MediaKernels.wavHeader($c);
        |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin)

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Spec-conformant PNG/JPEG/GIF bytes for (format, width, height,
    * channels); null on unknown format / invalid dims. */
  case class ImageEncode(first: Expression, second: Expression,
                         third: Expression, fourth: Expression)
      extends QuaternaryExpression {
    override def dataType: DataType = BinaryType
    override def nullable: Boolean = true
    override def prettyName: String = "image_encode"

    override def nullSafeEval(fmt: Any, w: Any, h: Any, c: Any): Any =
      MediaKernels.imageEncode(fmt.asInstanceOf[UTF8String],
        w.asInstanceOf[Int], h.asInstanceOf[Int], c.asInstanceOf[Int])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (fmt, w, h, c) => s"""
        |${ev.value} = graft.functions.MediaKernels.imageEncode($fmt, $w, $h, $c);
        |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin)

    override def withNewChildrenInternal(
        a: Expression, b: Expression, c: Expression, d: Expression): Expression =
      copy(first = a, second = b, third = c, fourth = d)
  }

  /** Canonical PCM WAV bytes for (channels, sampleRate, bitsPerSample,
    * nFrames); null on invalid parameters. */
  case class WavEncode(first: Expression, second: Expression,
                       third: Expression, fourth: Expression)
      extends QuaternaryExpression {
    override def dataType: DataType = BinaryType
    override def nullable: Boolean = true
    override def prettyName: String = "wav_encode"

    override def nullSafeEval(ch: Any, rate: Any, bits: Any, n: Any): Any =
      MediaKernels.wavEncode(ch.asInstanceOf[Int], rate.asInstanceOf[Int],
        bits.asInstanceOf[Int], n.asInstanceOf[Int])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (ch, rate, bits, n) => s"""
        |${ev.value} = graft.functions.MediaKernels.wavEncode($ch, $rate, $bits, $n);
        |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin)

    override def withNewChildrenInternal(
        a: Expression, b: Expression, c: Expression, d: Expression): Expression =
      copy(first = a, second = b, third = c, fourth = d)
  }

  def imageHeader(content: Column): Column =
    ColumnBridge.column(ImageHeader(ColumnBridge.expression(content)))

  def wavHeader(content: Column): Column =
    ColumnBridge.column(WavHeader(ColumnBridge.expression(content)))

  def imageEncode(format: Column, width: Column, height: Column, channels: Column): Column =
    ColumnBridge.column(ImageEncode(
      ColumnBridge.expression(format), ColumnBridge.expression(width),
      ColumnBridge.expression(height), ColumnBridge.expression(channels)))

  def wavEncode(channels: Column, sampleRate: Column, bitsPerSample: Column,
                nFrames: Column): Column =
    ColumnBridge.column(WavEncode(
      ColumnBridge.expression(channels), ColumnBridge.expression(sampleRate),
      ColumnBridge.expression(bitsPerSample), ColumnBridge.expression(nFrames)))
}
