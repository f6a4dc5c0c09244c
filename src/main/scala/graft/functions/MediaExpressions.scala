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

  private val pngStatsType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("px_sum", LongType, nullable = false)))

  private val wavStatsType = StructType(Seq(
    StructField("channels", IntegerType, nullable = false),
    StructField("sample_rate", IntegerType, nullable = false),
    StructField("n_frames", LongType, nullable = false),
    StructField("amp_sum", LongType, nullable = false)))

  private val gifStatsType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("n_colors", IntegerType, nullable = false),
    StructField("idx_sum", LongType, nullable = false)))

  private val jpegRoundTripType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("max_err", IntegerType, nullable = false),
    StructField("trunc_rejected", BooleanType, nullable = false)))

  /** Real PNG bytes carrying [[MediaKernels.synthPixels]] pixel data for
    * (seed, width, height, channels) — deflated IDAT, per-row filter
    * cycle, real CRCs. */
  case class PngEncodeSynth(first: Expression, second: Expression,
                            third: Expression, fourth: Expression)
      extends QuaternaryExpression {
    override def dataType: DataType = BinaryType
    override def nullable: Boolean = true
    override def prettyName: String = "png_encode_synth"

    override def nullSafeEval(seed: Any, w: Any, h: Any, c: Any): Any =
      MediaKernels.pngEncodeSynth(seed.asInstanceOf[Long],
        w.asInstanceOf[Int], h.asInstanceOf[Int], c.asInstanceOf[Int])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (seed, w, h, c) => s"""
        |${ev.value} = graft.functions.MediaKernels.pngEncodeSynth($seed, $w, $h, $c);
        |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin)

    override def withNewChildrenInternal(
        a: Expression, b: Expression, c: Expression, d: Expression): Expression =
      copy(first = a, second = b, third = c, fourth = d)
  }

  /** Full pixel decode + reduce: `struct<width,height,channels,px_sum>`
    * via inflate + defilter; null when the payload isn't a decodable
    * PNG (truncation, CRC mismatch, unsupported shape). */
  case class PngDecodeStats(child: Expression) extends UnaryExpression {
    override def dataType: DataType = pngStatsType
    override def nullable: Boolean = true
    override def prettyName: String = "png_decode_stats"

    override def nullSafeEval(input: Any): Any =
      MediaKernels.pngDecodeStats(input.asInstanceOf[Array[Byte]])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => s"""
        |${ev.value} = graft.functions.MediaKernels.pngDecodeStats($c);
        |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin)

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Nearest-neighbor PNG resize (decode → resample → re-encode). */
  case class PngResize(first: Expression, second: Expression, third: Expression)
      extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {
    override def dataType: DataType = BinaryType
    override def nullable: Boolean = true
    override def prettyName: String = "png_resize"

    override def nullSafeEval(b: Any, w: Any, h: Any): Any =
      MediaKernels.pngResize(b.asInstanceOf[Array[Byte]],
        w.asInstanceOf[Int], h.asInstanceOf[Int])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (b, w, h) => s"""
        |${ev.value} = graft.functions.MediaKernels.pngResize($b, $w, $h);
        |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin)

    override protected def withNewChildrenInternal(
        a: Expression, b: Expression, c: Expression): Expression =
      copy(first = a, second = b, third = c)
  }

  /** 16-bit PCM WAV with real [[MediaKernels.wavEncodePcm]] sample data
    * for (channels, sampleRate, nFrames, seed). */
  case class WavEncodePcm(first: Expression, second: Expression,
                          third: Expression, fourth: Expression)
      extends QuaternaryExpression {
    override def dataType: DataType = BinaryType
    override def nullable: Boolean = true
    override def prettyName: String = "wav_encode_pcm"

    override def nullSafeEval(ch: Any, rate: Any, n: Any, seed: Any): Any =
      MediaKernels.wavEncodePcm(ch.asInstanceOf[Int], rate.asInstanceOf[Int],
        n.asInstanceOf[Int], seed.asInstanceOf[Long])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (ch, rate, n, seed) => s"""
        |${ev.value} = graft.functions.MediaKernels.wavEncodePcm($ch, $rate, $n, $seed);
        |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin)

    override def withNewChildrenInternal(
        a: Expression, b: Expression, c: Expression, d: Expression): Expression =
      copy(first = a, second = b, third = c, fourth = d)
  }

  /** Sample decode + reduce for 16-bit PCM WAV:
    * `struct<channels,sample_rate,n_frames,amp_sum>`. */
  case class WavDecodeStats(child: Expression) extends UnaryExpression {
    override def dataType: DataType = wavStatsType
    override def nullable: Boolean = true
    override def prettyName: String = "wav_decode_stats"

    override def nullSafeEval(input: Any): Any =
      MediaKernels.wavDecodeStats(input.asInstanceOf[Array[Byte]])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => s"""
        |${ev.value} = graft.functions.MediaKernels.wavDecodeStats($c);
        |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin)

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Real GIF89a bytes carrying LZW-compressed [[MediaKernels
    * .synthPixels]] palette indices for (seed, width, height). */
  case class GifEncodeSynth(first: Expression, second: Expression,
                            third: Expression)
      extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {
    override def dataType: DataType = BinaryType
    override def nullable: Boolean = true
    override def prettyName: String = "gif_encode_synth"

    override def nullSafeEval(seed: Any, w: Any, h: Any): Any =
      MediaKernels.gifEncodeSynth(seed.asInstanceOf[Long],
        w.asInstanceOf[Int], h.asInstanceOf[Int])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (seed, w, h) => s"""
        |${ev.value} = graft.functions.MediaKernels.gifEncodeSynth($seed, $w, $h);
        |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin)

    override protected def withNewChildrenInternal(
        a: Expression, b: Expression, c: Expression): Expression =
      copy(first = a, second = b, third = c)
  }

  /** Full LZW pixel decode + reduce:
    * `struct<width,height,n_colors,idx_sum>`; null when the payload
    * isn't a decodable GIF of the supported shape. */
  case class GifDecodeStats(child: Expression) extends UnaryExpression {
    override def dataType: DataType = gifStatsType
    override def nullable: Boolean = true
    override def prettyName: String = "gif_decode_stats"

    override def nullSafeEval(input: Any): Any =
      MediaKernels.gifDecodeStats(input.asInstanceOf[Array[Byte]])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => s"""
        |${ev.value} = graft.functions.MediaKernels.gifDecodeStats($c);
        |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin)

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Full baseline-JPEG round trip (synthesize → DCT/Huffman encode →
    * entropy decode → certify): `struct<width,height,channels,max_err,
    * trunc_rejected>`. JPEG is lossy, so the certification contract is
    * dims + quantization error bound + truncation rejection — see
    * [[graft.functions.JpegKernels.jpegRoundTripStats]]. */
  case class JpegRoundTrip(first: Expression, second: Expression,
                           third: Expression, fourth: Expression)
      extends QuaternaryExpression {
    override def dataType: DataType = jpegRoundTripType
    override def nullable: Boolean = true
    override def prettyName: String = "jpeg_round_trip"

    override def nullSafeEval(seed: Any, w: Any, h: Any, c: Any): Any =
      JpegKernels.jpegRoundTripStats(seed.asInstanceOf[Long],
        w.asInstanceOf[Int], h.asInstanceOf[Int], c.asInstanceOf[Int])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (seed, w, h, c) => s"""
        |${ev.value} = graft.functions.JpegKernels.jpegRoundTripStats($seed, $w, $h, $c);
        |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin)

    override def withNewChildrenInternal(
        a: Expression, b: Expression, c: Expression, d: Expression): Expression =
      copy(first = a, second = b, third = c, fourth = d)
  }

  private val jpegProgRoundTripType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("prog_equals_seq", BooleanType, nullable = false),
    StructField("trunc_rejected", BooleanType, nullable = false)))

  /** Progressive-JPEG certification (synthesize → encode sequentially AND
    * progressively → decode both → compare): `struct<width,height,
    * channels,prog_equals_seq,trunc_rejected>`. Progressive re-orders the
    * SAME coefficients, so the contract is BIT EQUALITY of the two
    * decodes — stronger than the baseline's lossy bound. See
    * [[graft.functions.JpegKernels.jpegProgRoundTripStats]]. */
  case class JpegProgRoundTrip(first: Expression, second: Expression,
                               third: Expression, fourth: Expression)
      extends QuaternaryExpression {
    override def dataType: DataType = jpegProgRoundTripType
    override def nullable: Boolean = true
    override def prettyName: String = "jpeg_prog_round_trip"

    override def nullSafeEval(seed: Any, w: Any, h: Any, c: Any): Any =
      JpegKernels.jpegProgRoundTripStats(seed.asInstanceOf[Long],
        w.asInstanceOf[Int], h.asInstanceOf[Int], c.asInstanceOf[Int])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (seed, w, h, c) => s"""
        |${ev.value} = graft.functions.JpegKernels.jpegProgRoundTripStats($seed, $w, $h, $c);
        |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin)

    override def withNewChildrenInternal(
        a: Expression, b: Expression, c: Expression, d: Expression): Expression =
      copy(first = a, second = b, third = c, fourth = d)
  }

  private val jpegArithRoundTripType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("channels", IntegerType, nullable = false),
    StructField("arith_equals_seq", BooleanType, nullable = false),
    StructField("arith_smaller", BooleanType, nullable = false),
    StructField("trunc_rejected", BooleanType, nullable = false)))

  /** Arithmetic-JPEG certification (synthesize → encode with Huffman AND
    * the T.81 QM arithmetic coder → decode both → compare): entropy
    * coding is lossless over the same quantized coefficients, so the
    * contract is BIT EQUALITY of the decoded pixels, plus the adaptive
    * coder beating the fixed Annex-K tables on stream size. See
    * [[graft.functions.JpegArith.jpegArithRoundTripStats]]. */
  case class JpegArithRoundTrip(first: Expression, second: Expression,
                                third: Expression, fourth: Expression)
      extends QuaternaryExpression {
    override def dataType: DataType = jpegArithRoundTripType
    override def nullable: Boolean = true
    override def prettyName: String = "jpeg_arith_round_trip"

    override def nullSafeEval(seed: Any, w: Any, h: Any, c: Any): Any =
      JpegArith.jpegArithRoundTripStats(seed.asInstanceOf[Long],
        w.asInstanceOf[Int], h.asInstanceOf[Int], c.asInstanceOf[Int])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (seed, w, h, c) => s"""
        |${ev.value} = graft.functions.JpegArith.jpegArithRoundTripStats($seed, $w, $h, $c);
        |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin)

    override def withNewChildrenInternal(
        a: Expression, b: Expression, c: Expression, d: Expression): Expression =
      copy(first = a, second = b, third = c, fourth = d)
  }

  private val aviRoundTripType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("fps", IntegerType, nullable = false),
    StructField("n_frames", IntegerType, nullable = false),
    StructField("max_err", IntegerType, nullable = false),
    StructField("trunc_rejected", BooleanType, nullable = false)))

  /** Full MJPEG-AVI round trip (synthesize frames → JPEG-encode → RIFF
    * container → container walk → per-frame entropy decode → certify):
    * `struct<width,height,fps,n_frames,max_err,trunc_rejected>`. `fps`
    * is a static parameter (like the LSH plane counts), not a child. */
  case class AviRoundTrip(first: Expression, second: Expression,
                          third: Expression, fourth: Expression, fps: Int)
      extends QuaternaryExpression {
    override def dataType: DataType = aviRoundTripType
    override def nullable: Boolean = true
    override def prettyName: String = "avi_round_trip"

    override def nullSafeEval(seed: Any, w: Any, h: Any, n: Any): Any =
      AviKernels.aviRoundTripStats(seed.asInstanceOf[Long],
        w.asInstanceOf[Int], h.asInstanceOf[Int], n.asInstanceOf[Int], fps)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (seed, w, h, n) => s"""
        |${ev.value} = graft.functions.AviKernels.aviRoundTripStats($seed, $w, $h, $n, $fps);
        |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin)

    override def withNewChildrenInternal(
        a: Expression, b: Expression, c: Expression, d: Expression): Expression =
      copy(first = a, second = b, third = c, fourth = d)
  }

  private val rleRoundTripType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("fps", IntegerType, nullable = false),
    StructField("n_frames", IntegerType, nullable = false),
    StructField("exact", BooleanType, nullable = false),
    StructField("inter_saves", BooleanType, nullable = false),
    StructField("trunc_rejected", BooleanType, nullable = false)))

  /** Full MS-RLE8 AVI round trip with PLANTED MOTION (synthesize frames
    * where only a moving rectangle changes → delta-encode → 'MRLE'
    * container → walk → chain-decode over the carried canvas → certify):
    * `struct<width,height,fps,n_frames,exact,inter_saves,trunc_rejected>`.
    * RLE8 is lossless so `exact` demands bit equality, and `inter_saves`
    * attests the delta frames beat re-keyframing — the inter-frame
    * machinery demonstrably does its job per row. */
  case class RleVideoRoundTrip(first: Expression, second: Expression,
                               third: Expression, fourth: Expression, fps: Int)
      extends QuaternaryExpression {
    override def dataType: DataType = rleRoundTripType
    override def nullable: Boolean = true
    override def prettyName: String = "rle_video_round_trip"

    override def nullSafeEval(seed: Any, w: Any, h: Any, n: Any): Any =
      RleVideoKernels.rleRoundTripStats(seed.asInstanceOf[Long],
        w.asInstanceOf[Int], h.asInstanceOf[Int], n.asInstanceOf[Int], fps)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (seed, w, h, n) => s"""
        |${ev.value} = graft.functions.RleVideoKernels.rleRoundTripStats($seed, $w, $h, $n, $fps);
        |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin)

    override def withNewChildrenInternal(
        a: Expression, b: Expression, c: Expression, d: Expression): Expression =
      copy(first = a, second = b, third = c, fourth = d)
  }

  private val mcRoundTripType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("fps", IntegerType, nullable = false),
    StructField("n_frames", IntegerType, nullable = false),
    StructField("err_in_bound", BooleanType, nullable = false),
    StructField("recon_exact", BooleanType, nullable = false),
    StructField("mv_engaged", BooleanType, nullable = false),
    StructField("inter_saves", BooleanType, nullable = false),
    StructField("trunc_rejected", BooleanType, nullable = false)))

  /** Motion-compensated transform codec round trip with PLANTED GLOBAL
    * MOTION (translate the whole scene per frame → I/P encode with
    * motion search → 'GMC1' container → walk → chain-decode → certify):
    * `struct<width,height,fps,n_frames,err_in_bound,recon_exact,
    * mv_engaged,inter_saves,trunc_rejected>`. The decode must be
    * bit-equal to the encoder's own reconstruction (exact arithmetic),
    * within the quantization bound of the source (lossy path), with
    * nonzero motion vectors demonstrably chosen and P-frames
    * demonstrably beating intra coding. */
  case class McVideoRoundTrip(first: Expression, second: Expression,
                              third: Expression, fourth: Expression, fps: Int)
      extends QuaternaryExpression {
    override def dataType: DataType = mcRoundTripType
    override def nullable: Boolean = true
    override def prettyName: String = "mc_video_round_trip"

    override def nullSafeEval(seed: Any, w: Any, h: Any, n: Any): Any =
      McVideoKernels.mcRoundTripStats(seed.asInstanceOf[Long],
        w.asInstanceOf[Int], h.asInstanceOf[Int], n.asInstanceOf[Int], fps)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (seed, w, h, n) => s"""
        |${ev.value} = graft.functions.McVideoKernels.mcRoundTripStats($seed, $w, $h, $n, $fps);
        |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin)

    override def withNewChildrenInternal(
        a: Expression, b: Expression, c: Expression, d: Expression): Expression =
      copy(first = a, second = b, third = c, fourth = d)
  }

  def mcVideoRoundTrip(seed: Column, width: Column, height: Column,
                       nFrames: Column, fps: Int): Column =
    ColumnBridge.column(McVideoRoundTrip(
      ColumnBridge.expression(seed), ColumnBridge.expression(width),
      ColumnBridge.expression(height), ColumnBridge.expression(nFrames), fps))

  private val mcVlcRoundTripType = StructType(
    mcRoundTripType.fields ++ Seq(
      StructField("vlc_smaller", BooleanType, nullable = false),
      StructField("es_roundtrip", BooleanType, nullable = false)))

  /** [[McVideoRoundTrip]]'s VLC twin ([[McVlcKernels
    * .mcVlcRoundTripStats]]): same planted motion, same frame plans,
    * Annex-B-shaped entropy coding into a 'GMV1' AVI — two extra
    * attestations: `vlc_smaller` (the VLC stream beats the byte coder
    * on the identical plans) and `es_roundtrip` (the MPEG-1-shaped
    * elementary stream decodes to the same reconstructions with no
    * start-code emulation). */
  case class McVlcVideoRoundTrip(first: Expression, second: Expression,
                                 third: Expression, fourth: Expression, fps: Int)
      extends QuaternaryExpression {
    override def dataType: DataType = mcVlcRoundTripType
    override def nullable: Boolean = true
    override def prettyName: String = "mc_vlc_video_round_trip"

    override def nullSafeEval(seed: Any, w: Any, h: Any, n: Any): Any =
      McVlcKernels.mcVlcRoundTripStats(seed.asInstanceOf[Long],
        w.asInstanceOf[Int], h.asInstanceOf[Int], n.asInstanceOf[Int], fps)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (seed, w, h, n) => s"""
        |${ev.value} = graft.functions.McVlcKernels.mcVlcRoundTripStats($seed, $w, $h, $n, $fps);
        |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin)

    override def withNewChildrenInternal(
        a: Expression, b: Expression, c: Expression, d: Expression): Expression =
      copy(first = a, second = b, third = c, fourth = d)
  }

  def mcVlcVideoRoundTrip(seed: Column, width: Column, height: Column,
                          nFrames: Column, fps: Int): Column =
    ColumnBridge.column(McVlcVideoRoundTrip(
      ColumnBridge.expression(seed), ColumnBridge.expression(width),
      ColumnBridge.expression(height), ColumnBridge.expression(nFrames), fps))

  private val mpeg1RoundTripType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("n_frames", IntegerType, nullable = false),
    StructField("err_in_bound", BooleanType, nullable = false),
    StructField("recon_exact", BooleanType, nullable = false),
    StructField("mv_engaged", BooleanType, nullable = false),
    StructField("trunc_rejected", BooleanType, nullable = false),
    StructField("census_ok", BooleanType, nullable = false),
    StructField("cbp_partial", BooleanType, nullable = false),
    StructField("skip_used", BooleanType, nullable = false),
    StructField("intra_p_used", BooleanType, nullable = false),
    StructField("mc_only_used", BooleanType, nullable = false)))

  /** The CONFORMANT sibling ([[Mpeg1Kernels.mpeg1RoundTripStats]]):
    * 16×16 4:2:0 macroblocks, Table B.2/B.3 types and coded block
    * patterns, differential full-pel motion, the spec's §2.4.4
    * reconstruction arithmetic — certified end to end through one
    * elementary stream. The last four flags report which grammar paths
    * the clip exercised (content-dependent; spec-pinned, not
    * oracle-asserted). */
  case class Mpeg1VideoRoundTrip(first: Expression, second: Expression,
                                 third: Expression, fourth: Expression,
                                 fps: Int)
      extends QuaternaryExpression {
    override def dataType: DataType = mpeg1RoundTripType
    override def nullable: Boolean = true
    override def prettyName: String = "mpeg1_video_round_trip"

    override def nullSafeEval(seed: Any, w: Any, h: Any, n: Any): Any =
      Mpeg1Kernels.mpeg1RoundTripStats(seed.asInstanceOf[Long],
        w.asInstanceOf[Int], h.asInstanceOf[Int], n.asInstanceOf[Int], fps)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (seed, w, h, n) => s"""
        |${ev.value} = graft.functions.Mpeg1Kernels.mpeg1RoundTripStats($seed, $w, $h, $n, $fps);
        |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin)

    override def withNewChildrenInternal(
        a: Expression, b: Expression, c: Expression, d: Expression): Expression =
      copy(first = a, second = b, third = c, fourth = d)
  }

  def mpeg1VideoRoundTrip(seed: Column, width: Column, height: Column,
                          nFrames: Column, fps: Int): Column =
    ColumnBridge.column(Mpeg1VideoRoundTrip(
      ColumnBridge.expression(seed), ColumnBridge.expression(width),
      ColumnBridge.expression(height), ColumnBridge.expression(nFrames), fps))

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

  def pngEncodeSynth(seed: Column, width: Column, height: Column,
                     channels: Column): Column =
    ColumnBridge.column(PngEncodeSynth(
      ColumnBridge.expression(seed), ColumnBridge.expression(width),
      ColumnBridge.expression(height), ColumnBridge.expression(channels)))

  def pngDecodeStats(content: Column): Column =
    ColumnBridge.column(PngDecodeStats(ColumnBridge.expression(content)))

  def pngResize(content: Column, width: Column, height: Column): Column =
    ColumnBridge.column(PngResize(
      ColumnBridge.expression(content), ColumnBridge.expression(width),
      ColumnBridge.expression(height)))

  def wavEncodePcm(channels: Column, sampleRate: Column, nFrames: Column,
                   seed: Column): Column =
    ColumnBridge.column(WavEncodePcm(
      ColumnBridge.expression(channels), ColumnBridge.expression(sampleRate),
      ColumnBridge.expression(nFrames), ColumnBridge.expression(seed)))

  def wavDecodeStats(content: Column): Column =
    ColumnBridge.column(WavDecodeStats(ColumnBridge.expression(content)))

  def gifEncodeSynth(seed: Column, width: Column, height: Column): Column =
    ColumnBridge.column(GifEncodeSynth(
      ColumnBridge.expression(seed), ColumnBridge.expression(width),
      ColumnBridge.expression(height)))

  def gifDecodeStats(content: Column): Column =
    ColumnBridge.column(GifDecodeStats(ColumnBridge.expression(content)))

  def jpegRoundTrip(seed: Column, width: Column, height: Column,
                    channels: Column): Column =
    ColumnBridge.column(JpegRoundTrip(
      ColumnBridge.expression(seed), ColumnBridge.expression(width),
      ColumnBridge.expression(height), ColumnBridge.expression(channels)))

  def jpegProgRoundTrip(seed: Column, width: Column, height: Column,
                        channels: Column): Column =
    ColumnBridge.column(JpegProgRoundTrip(
      ColumnBridge.expression(seed), ColumnBridge.expression(width),
      ColumnBridge.expression(height), ColumnBridge.expression(channels)))

  def jpegArithRoundTrip(seed: Column, width: Column, height: Column,
                         channels: Column): Column =
    ColumnBridge.column(JpegArithRoundTrip(
      ColumnBridge.expression(seed), ColumnBridge.expression(width),
      ColumnBridge.expression(height), ColumnBridge.expression(channels)))

  def aviRoundTrip(seed: Column, width: Column, height: Column,
                   nFrames: Column, fps: Int): Column =
    ColumnBridge.column(AviRoundTrip(
      ColumnBridge.expression(seed), ColumnBridge.expression(width),
      ColumnBridge.expression(height), ColumnBridge.expression(nFrames), fps))

  def rleVideoRoundTrip(seed: Column, width: Column, height: Column,
                        nFrames: Column, fps: Int): Column =
    ColumnBridge.column(RleVideoRoundTrip(
      ColumnBridge.expression(seed), ColumnBridge.expression(width),
      ColumnBridge.expression(height), ColumnBridge.expression(nFrames), fps))
}
