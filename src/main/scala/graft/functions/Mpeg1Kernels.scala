package graft.functions

import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.InternalRow

/** MPEG-1 Video (ISO/IEC 11172-2) CONFORMANT macroblock layer — the
  * step [[McVlcKernels]]'s honest scope note left open: where that
  * coder runs the Annex-B VLC tables over this codec's self-specified
  * 8×8 luma-only blocks, THIS one encodes the spec's own picture
  * structure, so the elementary stream parses AND reconstructs under
  * §2.4's grammar end to end:
  *  - 16×16 macroblocks over a 4:2:0 YCbCr frame (four 8×8 luma
  *    blocks + one Cb + one Cr per macroblock, the standard block
  *    order), dimensions padded to macroblock multiples with the
  *    header carrying the display size;
  *  - I-picture macroblock_type per Table B.2a, P-picture types per
  *    Table B.2b (the non-quant rows), macroblock_address_increment
  *    per Table B.1 with skip runs, and coded_block_pattern per
  *    Table B.3 on pattern macroblocks;
  *  - intra DC per Table B.5a — SEPARATE luminance and chrominance
  *    size tables — with the three DC predictors (Y, Cb, Cr) reset to
  *    1024/8 at slice start and after every non-intra macroblock,
  *    run-level AC per Table B.5b/c with the 6-bit escape (shared
  *    tables, [[McVlcKernels]]);
  *  - DIFFERENTIAL motion vectors (full_pel, forward_f_code = 1):
  *    code = vector − predictor wrapped into [−16, 15], predictor
  *    reset at slice start, after intra, after skipped, and after
  *    no-MC macroblocks — Table B.4 codes with the sign bit;
  *  - the spec's reconstruction arithmetic (§2.4.4): intra
  *    dequantization against the DEFAULT intra quantizer matrix
  *    (§2.4.2.3, raster layout below) scaled by quantizer_scale, DC
  *    reconstructed as dct_zz[0]×8, non-intra against the flat-16
  *    default with the (2·QF + Sign)·qs dead-zone form, and the
  *    ODDIFICATION (mismatch control) step on every non-DC
  *    coefficient — integer division truncating toward zero
  *    throughout, exactly the published pseudocode.
  *
  * Encoder restrictions (all conformant — a restriction on what is
  * EMITTED, not a grammar deviation): motion vectors are EVEN
  * integers in ±4, so the derived chrominance vector (half the luma
  * vector) is integer-pel and no half-pel interpolation path is
  * needed; one slice per picture; one GOP; quantizer_scale fixed at
  * [[QScale]]. Honest remaining scope: no B-frames, no rate control,
  * no half-pel motion — grammar features this encoder never emits.
  *
  * RECONSTRUCTION IS THE CONTRACT, as everywhere in this codec
  * family: encoder and decoder run the identical dequantize + IDCT +
  * round + clamp arithmetic, so the decoded planes are BIT-EQUAL to
  * the encoder's own reconstructions (`recon_exact`), the
  * reconstruction sits within [[JpegKernels.ErrBound]] of the source
  * on all three planes (`err_in_bound`), truncation rejects, and the
  * start-code census proves the payload never emulates a start code.
  * Decoders return null on ANY malformation, never throw.
  */
object Mpeg1Kernels {

  import McVlcKernels.{BitReader, BitWriter, VlcDecoder, parse,
    requirePrefixFree}

  /** quantizer_scale (1..31), stamped per slice. I-pictures code at 1
    * (every intra step stays at matrix/8 — comfortably inside the
    * certified [[JpegKernels.ErrBound]]); P-pictures at 2, whose wider
    * non-intra dead zone lets exactly-predicted macroblocks genuinely
    * SKIP or go MC-only instead of coding quantization-noise
    * residuals. The decoder honors whatever legal scale the slice
    * stamps. */
  final val QScaleI = 1
  final val QScaleP = 2

  /** Motion search range (integer pel, EVEN vectors only — see the
    * object scaladoc's chroma argument). */
  final val SearchRange = 4

  @inline private[functions] def pad16(v: Int): Int = (v + 15) & ~15

  // ---- Table B.3: coded_block_pattern -----------------------------------

  /** Table B.3 — coded_block_pattern VLC, all 63 nonzero patterns.
    * Block numbering per §2.4.3.6: bit 5..0 = (Y0, Y1, Y2, Y3, Cb, Cr),
    * cbp = Σ 2^(5−blockIndex) over coded blocks. The canonical
    * substructure (single-luma patterns 32/16/8/4 at the ascending
    * 4-bit codes, the (n, n+60) adjacency at 5 bits, the
    * one-luma+one-chroma ladder at 7 bits) is spec-pinned in
    * Mpeg1KernelsSpec; prefix-freeness and Kraft completeness are
    * machine-checked at class load. */
  private val CbpEntries: Seq[(Int, String)] = Seq(
    60 -> "111",
    4 -> "1101", 8 -> "1100", 16 -> "1011", 32 -> "1010",
    12 -> "10011", 48 -> "10010", 20 -> "10001", 40 -> "10000",
    28 -> "01111", 44 -> "01110", 52 -> "01101", 56 -> "01100",
    1 -> "01011", 61 -> "01010", 2 -> "01001", 62 -> "01000",
    24 -> "001111", 36 -> "001110", 3 -> "001101", 63 -> "001100",
    5 -> "0010111", 9 -> "0010110", 17 -> "0010101", 33 -> "0010100",
    6 -> "0010011", 10 -> "0010010", 18 -> "0010001", 34 -> "0010000",
    7 -> "00011111", 11 -> "00011110", 19 -> "00011101",
    35 -> "00011100", 13 -> "00011011", 49 -> "00011010",
    21 -> "00011001", 41 -> "00011000", 14 -> "00010111",
    50 -> "00010110", 22 -> "00010101", 42 -> "00010100",
    15 -> "00010011", 51 -> "00010010", 23 -> "00010001",
    43 -> "00010000", 25 -> "00001111", 37 -> "00001110",
    26 -> "00001101", 38 -> "00001100", 29 -> "00001011",
    45 -> "00001010", 53 -> "00001001", 57 -> "00001000",
    30 -> "00000111", 46 -> "00000110", 54 -> "00000101",
    58 -> "00000100",
    31 -> "000000111", 47 -> "000000110", 55 -> "000000101",
    59 -> "000000100", 27 -> "000000011", 39 -> "000000010")
  require(CbpEntries.size == 63 &&
    CbpEntries.map(_._1).sorted == (1 to 63),
    "Mpeg1Kernels: Table B.3 must assign every nonzero cbp exactly once")
  requirePrefixFree("cbp", CbpEntries.map(_._2))
  // Kraft completeness: the published table fills all but two 9-bit
  // slots (the '0000 0000 x' space a start-code-safe stream must keep
  // clear) — a transposed or garbled entry would break this sum
  require(CbpEntries.map(e => math.pow(2.0, -e._2.length)).sum ==
    1.0 - 2.0 * math.pow(2.0, -9),
    "Mpeg1Kernels: Table B.3 Kraft sum must leave exactly two 9-bit slots")
  private val CbpCodes: Map[Int, (Int, Int)] =
    CbpEntries.map { case (v, s) => v -> parse(s) }.toMap
  private val CbpDecoder = new VlcDecoder(CbpEntries)

  // ---- Table B.5a: dct_dc_size_chrominance -------------------------------

  private val DcSizeChromaEntries: Seq[(Int, String)] = Seq(
    0 -> "00", 1 -> "01", 2 -> "10", 3 -> "110", 4 -> "1110",
    5 -> "11110", 6 -> "111110", 7 -> "1111110", 8 -> "11111110")
  requirePrefixFree("dcsize-chroma", DcSizeChromaEntries.map(_._2))
  private val DcSizeChromaCodes: Map[Int, (Int, Int)] =
    DcSizeChromaEntries.map { case (v, s) => v -> parse(s) }.toMap
  private val DcSizeChromaDecoder = new VlcDecoder(DcSizeChromaEntries)

  // ---- Table B.2a: I-picture macroblock_type ----------------------------

  private val ITypeIntra = parse("1") // intra (no quant escape emitted)
  private val ITypeDecoder = new VlcDecoder(Seq(1 -> "1", 2 -> "01"))

  // ---- quantizer matrices (§2.4.2.3 defaults, raster u-major layout) ----

  /** The default intra quantizer matrix, natural (raster) order. */
  private[functions] val IntraQ: Array[Int] = Array(
    8, 16, 19, 22, 26, 27, 29, 34,
    16, 16, 22, 24, 27, 29, 34, 37,
    19, 22, 26, 27, 29, 34, 34, 38,
    22, 22, 26, 27, 29, 34, 37, 40,
    22, 26, 27, 29, 32, 35, 40, 48,
    26, 27, 29, 32, 35, 40, 48, 58,
    26, 27, 29, 34, 38, 46, 56, 69,
    27, 29, 35, 38, 46, 56, 69, 83)
  require(IntraQ(0) == 8 && IntraQ(63) == 83 && IntraQ.length == 64)

  // ---- DCT (same exact-double basis as the JPEG family) ------------------

  private val CosTab: Array[Array[Double]] =
    Array.tabulate(8, 8)((u, x) =>
      math.cos((2 * x + 1) * u * math.Pi / 16.0))
  private val Cn: Array[Double] =
    Array.tabulate(8)(u => if (u == 0) 1.0 / math.sqrt(2.0) else 1.0)

  /** Raw forward DCT-II (no quantization), natural-order output —
    * SEPARABLE row-column form (1024 multiplies, not 4096: this kernel
    * transforms six blocks per macroblock, so the direct form was the
    * measured hot spot). Encoder and decoder share [[idct]], so the
    * bit-exact reconstruction contract is untouched. */
  private def fdct(in: Array[Double], out: Array[Double]): Unit = {
    val tmp = new Array[Double](64) // tmp(u*8+x) = Σ_y in(y,x)·cos_u(y)
    var u = 0
    while (u < 8) {
      var x = 0
      while (x < 8) {
        var acc = 0.0
        var y = 0
        while (y < 8) { acc += in(y * 8 + x) * CosTab(u)(y); y += 1 }
        tmp(u * 8 + x) = acc
        x += 1
      }
      u += 1
    }
    var u2 = 0
    while (u2 < 8) {
      var v = 0
      while (v < 8) {
        var acc = 0.0
        var x = 0
        while (x < 8) { acc += tmp(u2 * 8 + x) * CosTab(v)(x); x += 1 }
        out(u2 * 8 + v) = 0.25 * Cn(u2) * Cn(v) * acc
        v += 1
      }
      u2 += 1
    }
  }

  /** Separable inverse DCT of dequantized levels (natural order). */
  private def idct(f: Array[Int], out: Array[Double]): Unit = {
    val tmp = new Array[Double](64) // tmp(y*8+v) = Σ_u Cu·F(u,v)·cos_u(y)
    var y = 0
    while (y < 8) {
      var v = 0
      while (v < 8) {
        var acc = 0.0
        var u = 0
        while (u < 8) { acc += Cn(u) * f(u * 8 + v) * CosTab(u)(y); u += 1 }
        tmp(y * 8 + v) = acc
        v += 1
      }
      y += 1
    }
    var y2 = 0
    while (y2 < 8) {
      var x = 0
      while (x < 8) {
        var acc = 0.0
        var v = 0
        while (v < 8) { acc += Cn(v) * tmp(y2 * 8 + v) * CosTab(v)(x); v += 1 }
        out(y2 * 8 + x) = 0.25 * acc
        x += 1
      }
      y2 += 1
    }
  }

  // ---- §2.4.4 quantization arithmetic ------------------------------------

  @inline private def sgn(v: Int): Int = if (v > 0) 1 else if (v < 0) -1 else 0

  /** Encoder-side intra quantization: DC = round(F/8) (clamped to the
    * 0..255 the size-8 differential can carry), AC inverted against
    * the §2.4.4.1 reconstruction. */
  private def quantIntra(f: Array[Double], qs: Int,
                         out: Array[Int]): Unit = {
    out(0) = math.max(0, math.min(255, math.round(f(0) / 8.0).toInt))
    var i = 1
    while (i < 64) {
      out(i) = math.max(-255, math.min(255,
        math.round(8.0 * f(i) / (qs * IntraQ(i))).toInt))
      i += 1
    }
  }

  /** Encoder-side non-intra quantization: the dead-zone inverse of the
    * (2·QF + Sign)·qs form (flat default matrix). */
  private def quantInter(f: Array[Double], qs: Int,
                         out: Array[Int]): Unit = {
    var i = 0
    while (i < 64) {
      out(i) = math.max(-255, math.min(255,
        (f(i) / (2.0 * qs)).toInt))
      i += 1
    }
  }

  /** §2.4.4.1 intra dequantization: dct_recon = (2·QF·qs·W)/16,
    * oddified, clamped; DC = QF×8 verbatim. Integer division truncates
    * toward zero (Scala's `/` — the spec's convention). */
  private[graft] def dequantIntra(qf: Array[Int], qs: Int,
                                  out: Array[Int]): Unit = {
    out(0) = qf(0) * 8
    var i = 1
    while (i < 64) {
      var v = (2 * qf(i) * qs * IntraQ(i)) / 16
      if (v != 0 && (v & 1) == 0) v -= sgn(v)
      out(i) = math.max(-2048, math.min(2047, v))
      i += 1
    }
  }

  /** §2.4.4.2 non-intra dequantization: ((2·QF + Sign(QF))·qs·W)/16
    * with W = 16, oddified, zero stays zero, clamped. */
  private[graft] def dequantInter(qf: Array[Int], qs: Int,
                                  out: Array[Int]): Unit = {
    var i = 0
    while (i < 64) {
      var v = if (qf(i) == 0) 0 else (2 * qf(i) + sgn(qf(i))) * qs
      if (v != 0 && (v & 1) == 0) v -= sgn(v)
      out(i) = math.max(-2048, math.min(2047, v))
      i += 1
    }
  }

  /** Dequantize (intra or non-intra), IDCT, add the prediction, round,
    * clamp — THE shared reconstruction (encoder and decoder both call
    * exactly this). */
  private def reconBlock(qf: Array[Int], intra: Boolean, qs: Int,
                         pred: (Int, Int) => Double,
                         plane: Array[Byte], stride: Int,
                         bx: Int, by: Int): Unit = {
    val dq = new Array[Int](64)
    if (intra) dequantIntra(qf, qs, dq) else dequantInter(qf, qs, dq)
    val res = new Array[Double](64)
    idct(dq, res)
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        val v = math.round(pred(x, y) + res(y * 8 + x)).toInt
        plane((by + y) * stride + bx + x) =
          math.max(0, math.min(255, v)).toByte
        x += 1
      }
      y += 1
    }
  }

  // ---- block-layer bit coding --------------------------------------------

  /** Intra block: DC size (component-matched table) + differential
    * bits, AC run-level, EOB. `qf` natural order, DC in QF units.
    * Returns the new DC predictor. */
  private def writeIntraBlock(bw: BitWriter, qf: Array[Int], dcPred: Int,
                              chroma: Boolean): Int = {
    val diff = qf(0) - dcPred
    var size = 0
    var m = math.abs(diff)
    while (m > 0) { size += 1; m >>= 1 }
    require(size <= 8,
      s"Mpeg1Kernels: intra DC differential $diff exceeds size 8")
    bw.putCode(if (chroma) DcSizeChromaCodes(size)
               else McVlcKernels.DcSizeCodes(size))
    if (size > 0)
      bw.putBits(if (diff >= 0) diff else diff + (1 << size) - 1, size)
    var run = 0
    var z = 1
    while (z < 64) {
      val v = qf(JpegKernels.Zig(z))
      if (v == 0) run += 1
      else {
        McVlcKernels.writeRunLevel(bw, run, v, first = false); run = 0
      }
      z += 1
    }
    bw.putCode(McVlcKernels.EobCode)
    qf(0)
  }

  private def readIntraBlock(br: BitReader, qf: Array[Int], dcPred: Int,
                             chroma: Boolean): Int = {
    java.util.Arrays.fill(qf, 0)
    val size = (if (chroma) DcSizeChromaDecoder
                else McVlcKernels.DcSizeDecoder).read(br)
    if (br.bad) return 0
    val diff =
      if (size == 0) 0
      else {
        val v = br.bits(size)
        if (v < (1 << (size - 1))) v - (1 << size) + 1 else v
      }
    val dc = dcPred + diff
    qf(0) = dc
    val out = new Array[Int](2)
    var z = 0
    var done = false
    while (!done && !br.bad) {
      if (McVlcKernels.readRunLevel(br, first = false, out)) {
        z += out(1) + 1
        if (z > 63) { br.bad = true; done = true }
        else qf(JpegKernels.Zig(z)) = out(0)
      } else done = true
    }
    dc
  }

  /** Non-intra (pattern) block: first-coefficient convention, EOB; the
    * plan guarantees ≥ 1 nonzero coefficient (a cbp bit is only set for
    * blocks that code something). */
  private def writeInterBlock(bw: BitWriter, qf: Array[Int]): Unit = {
    var run = 0
    var z = 0
    var first = true
    while (z < 64) {
      val v = qf(JpegKernels.Zig(z))
      if (v == 0) run += 1
      else {
        McVlcKernels.writeRunLevel(bw, run, v, first); first = false
        run = 0
      }
      z += 1
    }
    require(!first, "Mpeg1Kernels: a pattern block must have >= 1 coeff")
    bw.putCode(McVlcKernels.EobCode)
  }

  private def readInterBlock(br: BitReader, qf: Array[Int]): Unit = {
    java.util.Arrays.fill(qf, 0)
    val out = new Array[Int](2)
    if (!McVlcKernels.readRunLevel(br, first = true, out)) {
      br.bad = true; return
    }
    var z = out(1)
    if (z > 63) { br.bad = true; return }
    qf(JpegKernels.Zig(z)) = out(0)
    var done = false
    while (!done && !br.bad) {
      if (McVlcKernels.readRunLevel(br, first = false, out)) {
        z += out(1) + 1
        if (z > 63) { br.bad = true; done = true }
        else qf(JpegKernels.Zig(z)) = out(0)
      } else done = true
    }
  }

  /** §2.4.4.2 differential motion coding at forward_f_code = 1:
    * code = vector − predictor wrapped into [−16, 15]. */
  private def mvCode(v: Int, pred: Int): Int = {
    var d = v - pred
    if (d > 15) d -= 32
    if (d < -16) d += 32
    d
  }

  private def mvRecon(code: Int, pred: Int): Int = {
    var v = pred + code
    if (v > 15) v -= 32
    if (v < -16) v += 32
    v
  }

  // ---- frame planning ------------------------------------------------------

  /** One macroblock's coding decision. `mode`: -1 I-intra, 0 skip,
    * 1 MC only, 2 MC+pattern, 3 zero-MV pattern, 4 P-intra.
    * `blocks(6)` holds natural-order QF arrays — all six for intra
    * modes, the cbp-set ones (others null) for pattern modes. */
  private[functions] final class MbPlan(val mode: Int, val mx: Int,
                                        val my: Int, val cbp: Int,
                                        val blocks: Array[Array[Int]])

  private def sad16(cur: Array[Byte], ref: Array[Byte], W: Int,
                    bx: Int, by: Int, mx: Int, my: Int): Int = {
    var s = 0
    var y = 0
    while (y < 16) {
      var x = 0
      while (x < 16) {
        s += math.abs((cur((by + y) * W + bx + x) & 0xff) -
          (ref((by + y + my) * W + bx + x + mx) & 0xff))
        x += 1
      }
      y += 1
    }
    s
  }

  /** The six source/prediction block origins of a macroblock:
    * (plane selector 0=Y 1=Cb 2=Cr, x, y). */
  @inline private def blockOrigin(b: Int, bx: Int,
                                  by: Int): (Int, Int, Int) = b match {
    case 0 => (0, bx, by)
    case 1 => (0, bx + 8, by)
    case 2 => (0, bx, by + 8)
    case 3 => (0, bx + 8, by + 8)
    case 4 => (1, bx / 2, by / 2)
    case 5 => (2, bx / 2, by / 2)
  }

  /** Plan one picture over padded planes. Returns the plans plus the
    * encoder-side reconstruction (the decoder must reproduce it
    * bit-exactly). `flags`: 0 mvUsed, 1 cbpPartial, 2 skipUsed,
    * 3 intraPUsed, 4 mcOnlyUsed (OR-ed). */
  private[functions] def planPicture(curY: Array[Byte], curCb: Array[Byte],
      curCr: Array[Byte], prevY: Array[Byte], prevCb: Array[Byte],
      prevCr: Array[Byte], W: Int, H: Int, qs: Int,
      flags: Array[Boolean])
      : (Array[MbPlan], Array[Byte], Array[Byte], Array[Byte]) = {
    val isI = prevY == null
    val cw = W / 2
    val mbW = W / 16
    val nMb = mbW * (H / 16)
    val reconY = new Array[Byte](W * H)
    val reconCb = new Array[Byte](cw * (H / 2))
    val reconCr = new Array[Byte](cw * (H / 2))
    val plans = new Array[MbPlan](nMb)
    val fIn = new Array[Double](64)
    val fOut = new Array[Double](64)
    def plane(cur: Boolean, sel: Int): Array[Byte] = sel match {
      case 0 => if (cur) curY else prevY
      case 1 => if (cur) curCb else prevCb
      case 2 => if (cur) curCr else prevCr
    }
    def reconPlane(sel: Int): Array[Byte] = sel match {
      case 0 => reconY
      case 1 => reconCb
      case 2 => reconCr
    }
    @inline def strideOf(sel: Int): Int = if (sel == 0) W else cw
    // intra-code the 6 blocks of the MB at (bx, by) from the CURRENT
    // planes (no level shift — the DC carries the mean)
    def intraBlocks(bx: Int, by: Int): Array[Array[Int]] =
      Array.tabulate(6) { b =>
        val (sel, ox, oy) = blockOrigin(b, bx, by)
        val src = plane(cur = true, sel)
        val stride = strideOf(sel)
        var i = 0
        while (i < 64) {
          fIn(i) = (src((oy + (i >> 3)) * stride + ox + (i & 7)) & 0xff)
            .toDouble
          i += 1
        }
        fdct(fIn, fOut)
        val qf = new Array[Int](64)
        quantIntra(fOut, qs, qf)
        qf
      }
    // entropy cost of a block set under the SAME coder that will emit
    // it (counting writer) — the mode decision's currency is real bits
    def intraBits(blocks: Array[Array[Int]]): Int = {
      val bw = new BitWriter
      var p = 0
      var b = 0
      while (b < 6) {
        p = writeIntraBlock(bw, blocks(b), if (b < 4) p else 128,
          chroma = b >= 4)
        b += 1
      }
      bw.size * 8
    }
    var mb = 0
    var by = 0
    while (by < H) {
      var bx = 0
      while (bx < W) {
        if (isI) {
          val blocks = intraBlocks(bx, by)
          plans(mb) = new MbPlan(-1, 0, 0, 63, blocks)
        } else {
          // EVEN-vector full search on the 16x16 luma, (0,0) seeded
          var bestSad = sad16(curY, prevY, W, bx, by, 0, 0)
          var bmx = 0; var bmy = 0
          var my = -SearchRange
          while (my <= SearchRange) {
            var mx = -SearchRange
            while (mx <= SearchRange) {
              if ((mx != 0 || my != 0) &&
                  bx + mx >= 0 && bx + mx + 16 <= W &&
                  by + my >= 0 && by + my + 16 <= H) {
                val s = sad16(curY, prevY, W, bx, by, mx, my)
                if (s < bestSad) { bestSad = s; bmx = mx; bmy = my }
              }
              mx += 2
            }
            my += 2
          }
          // residual-code the 6 blocks after MC; cbp from nonzeros
          val interBlocks = new Array[Array[Int]](6)
          var cbp = 0
          var b = 0
          while (b < 6) {
            val (sel, ox, oy) = blockOrigin(b, bx, by)
            val src = plane(cur = true, sel)
            val ref = plane(cur = false, sel)
            val stride = strideOf(sel)
            val (dx, dy) = if (sel == 0) (bmx, bmy) else (bmx / 2, bmy / 2)
            var i = 0
            while (i < 64) {
              val x = i & 7; val y = i >> 3
              fIn(i) = (src((oy + y) * stride + ox + x) & 0xff).toDouble -
                (ref((oy + y + dy) * stride + ox + x + dx) & 0xff).toDouble
              i += 1
            }
            fdct(fIn, fOut)
            val qf = new Array[Int](64)
            quantInter(fOut, qs, qf)
            if (qf.exists(_ != 0)) {
              interBlocks(b) = qf
              cbp |= 1 << (5 - b)
            }
            b += 1
          }
          // inter cost in real bits (type + mv + cbp + blocks; the MBA
          // and predictor context are position-dependent — close
          // enough for a mode decision, exact at serialization)
          val interBits = {
            val bw = new BitWriter
            if (cbp == 0) {
              if (bmx != 0 || bmy != 0) {
                bw.putCode(McVlcKernels.TypeCodes(3))
                McVlcKernels.writeMv(bw, bmx); McVlcKernels.writeMv(bw, bmy)
              } else bw.putBits(1, 1) // skip costs ~an MBA increment
            } else {
              bw.putCode(McVlcKernels.TypeCodes(
                if (bmx == 0 && bmy == 0) 2 else 1))
              if (bmx != 0 || bmy != 0) {
                McVlcKernels.writeMv(bw, bmx); McVlcKernels.writeMv(bw, bmy)
              }
              bw.putCode(CbpCodes(cbp))
              var bb = 0
              while (bb < 6) {
                if (interBlocks(bb) != null) writeInterBlock(bw, interBlocks(bb))
                bb += 1
              }
            }
            bw.size * 8
          }
          // a zero-cbp macroblock (skip or MC-only) costs a handful of
          // bits — an intra macroblock can never undercut it, so the
          // intra candidate (6 FDCTs + a trial serialization) is only
          // priced when there is a residual to beat
          val chooseInter = cbp == 0 || {
            val intraCand = intraBlocks(bx, by)
            val inter = interBits <= 5 + intraBits(intraCand)
            if (!inter) {
              flags(3) = true
              plans(mb) = new MbPlan(4, 0, 0, 63, intraCand)
            }
            inter
          }
          if (chooseInter) {
            if (bmx != 0 || bmy != 0) flags(0) = true
            if (cbp != 0 && cbp != 63) flags(1) = true
            plans(mb) =
              if (cbp == 0 && bmx == 0 && bmy == 0)
                new MbPlan(0, 0, 0, 0, null)
              else if (cbp == 0) new MbPlan(1, bmx, bmy, 0, null)
              else if (bmx == 0 && bmy == 0)
                new MbPlan(3, 0, 0, cbp, interBlocks)
              else new MbPlan(2, bmx, bmy, cbp, interBlocks)
          }
        }
        mb += 1
        bx += 16
      }
      by += 16
    }
    // P-frame slice rules: the FIRST and LAST macroblock of a slice
    // cannot be skipped — promote to MC-only with vector (0,0)
    // (reconstruction-identical)
    if (!isI) {
      Seq(0, nMb - 1).foreach { i =>
        if (plans(i).mode == 0) plans(i) = new MbPlan(1, 0, 0, 0, null)
      }
      if (plans.exists(_.mode == 0)) flags(2) = true
      if (plans.exists(_.mode == 1)) flags(4) = true
    }
    // encoder-side reconstruction (closed loop): exactly what the
    // decoder will compute, per block
    val zero = new Array[Int](64)
    mb = 0
    while (mb < nMb) {
      val p = plans(mb)
      val bx = (mb % mbW) * 16
      val by2 = (mb / mbW) * 16
      var b = 0
      while (b < 6) {
        val (sel, ox, oy) = blockOrigin(b, bx, by2)
        val stride = strideOf(sel)
        val out = reconPlane(sel)
        p.mode match {
          case -1 | 4 =>
            reconBlock(p.blocks(b), intra = true, qs, (_, _) => 0.0,
              out, stride, ox, oy)
          case m =>
            val ref = plane(cur = false, sel)
            val (dx, dy) =
              if (sel == 0) (p.mx, p.my) else (p.mx / 2, p.my / 2)
            val qf =
              if (m == 0 || m == 1 || p.blocks(b) == null) zero
              else p.blocks(b)
            reconBlock(qf, intra = false, qs,
              (x, y) => (ref((oy + y + dy) * stride + ox + x + dx) & 0xff)
                .toDouble,
              out, stride, ox, oy)
        }
        b += 1
      }
      mb += 1
    }
    (plans, reconY, reconCb, reconCr)
  }

  // ---- macroblock-layer serialization --------------------------------------

  /** Write one picture's macroblock layer (one slice's worth — the
    * caller wraps it in the slice header). */
  private def writeMbLayer(bw: BitWriter, isI: Boolean,
                           plans: Array[MbPlan]): Unit = {
    var dcY = 128; var dcCb = 128; var dcCr = 128
    var pmx = 0; var pmy = 0
    @inline def resetDc(): Unit = { dcY = 128; dcCb = 128; dcCr = 128 }
    def writeIntraMb(p: MbPlan): Unit = {
      dcY = writeIntraBlock(bw, p.blocks(0), dcY, chroma = false)
      dcY = writeIntraBlock(bw, p.blocks(1), dcY, chroma = false)
      dcY = writeIntraBlock(bw, p.blocks(2), dcY, chroma = false)
      dcY = writeIntraBlock(bw, p.blocks(3), dcY, chroma = false)
      dcCb = writeIntraBlock(bw, p.blocks(4), dcCb, chroma = true)
      dcCr = writeIntraBlock(bw, p.blocks(5), dcCr, chroma = true)
    }
    if (isI) {
      plans.foreach { p =>
        McVlcKernels.writeMba(bw, 1)
        bw.putCode(ITypeIntra)
        writeIntraMb(p)
      }
    } else {
      var gap = 0
      var i = 0
      while (i < plans.length) {
        val p = plans(i)
        if (p.mode == 0) { // skipped: MV predictor and DC predictors reset
          gap += 1; pmx = 0; pmy = 0; resetDc()
        } else {
          McVlcKernels.writeMba(bw, gap + 1)
          gap = 0
          p.mode match {
            case 1 =>
              bw.putCode(McVlcKernels.TypeCodes(3))
              McVlcKernels.writeMv(bw, mvCode(p.mx, pmx))
              McVlcKernels.writeMv(bw, mvCode(p.my, pmy))
              pmx = p.mx; pmy = p.my
              resetDc()
            case 2 =>
              bw.putCode(McVlcKernels.TypeCodes(1))
              McVlcKernels.writeMv(bw, mvCode(p.mx, pmx))
              McVlcKernels.writeMv(bw, mvCode(p.my, pmy))
              pmx = p.mx; pmy = p.my
              bw.putCode(CbpCodes(p.cbp))
              var b = 0
              while (b < 6) {
                if (p.blocks(b) != null) writeInterBlock(bw, p.blocks(b))
                b += 1
              }
              resetDc()
            case 3 =>
              bw.putCode(McVlcKernels.TypeCodes(2))
              pmx = 0; pmy = 0 // no forward vector: predictor resets
              bw.putCode(CbpCodes(p.cbp))
              var b = 0
              while (b < 6) {
                if (p.blocks(b) != null) writeInterBlock(bw, p.blocks(b))
                b += 1
              }
              resetDc()
            case 4 =>
              bw.putCode(McVlcKernels.TypeCodes(4))
              pmx = 0; pmy = 0
              writeIntraMb(p)
          }
        }
        i += 1
      }
    }
  }

  /** Parse one picture's macroblock layer and reconstruct all three
    * planes over the previous reconstruction. Null on malformation. */
  private def readMbLayer(br: BitReader, isI: Boolean, qs: Int,
      prevY: Array[Byte], prevCb: Array[Byte], prevCr: Array[Byte],
      W: Int, H: Int)
      : (Array[Byte], Array[Byte], Array[Byte]) = {
    val cw = W / 2
    val mbW = W / 16
    val nMb = mbW * (H / 16)
    val reconY = new Array[Byte](W * H)
    val reconCb = new Array[Byte](cw * (H / 2))
    val reconCr = new Array[Byte](cw * (H / 2))
    val qf = new Array[Int](64)
    val zero = new Array[Int](64)
    var dcY = 128; var dcCb = 128; var dcCr = 128
    var pmx = 0; var pmy = 0
    @inline def resetDc(): Unit = { dcY = 128; dcCb = 128; dcCr = 128 }
    def reconPlane(sel: Int): Array[Byte] = sel match {
      case 0 => reconY
      case 1 => reconCb
      case 2 => reconCr
    }
    def prevPlane(sel: Int): Array[Byte] = sel match {
      case 0 => prevY
      case 1 => prevCb
      case 2 => prevCr
    }
    @inline def strideOf(sel: Int): Int = if (sel == 0) W else cw
    def copyMb(mb: Int): Unit = {
      val bx = (mb % mbW) * 16
      val by = (mb / mbW) * 16
      var b = 0
      while (b < 6) {
        val (sel, ox, oy) = blockOrigin(b, bx, by)
        val stride = strideOf(sel)
        val ref = prevPlane(sel)
        reconBlock(zero, intra = false, qs,
          (x, y) => (ref((oy + y) * stride + ox + x) & 0xff).toDouble,
          reconPlane(sel), stride, ox, oy)
        b += 1
      }
    }
    def readIntraMb(mb: Int): Boolean = {
      val bx = (mb % mbW) * 16
      val by = (mb / mbW) * 16
      var b = 0
      while (b < 6) {
        val (sel, ox, oy) = blockOrigin(b, bx, by)
        val pred = b match {
          case 0 | 1 | 2 | 3 => dcY
          case 4 => dcCb
          case 5 => dcCr
        }
        val dc = readIntraBlock(br, qf, pred, chroma = b >= 4)
        if (br.bad || dc < 0 || dc > 255) return false
        b match {
          case 0 | 1 | 2 | 3 => dcY = dc
          case 4 => dcCb = dc
          case 5 => dcCr = dc
        }
        reconBlock(qf, intra = true, qs, (_, _) => 0.0,
          reconPlane(sel), strideOf(sel), ox, oy)
        b += 1
      }
      true
    }
    def readPatternBlocks(mb: Int, mx: Int, my: Int, cbp: Int): Boolean = {
      val bx = (mb % mbW) * 16
      val by = (mb / mbW) * 16
      if (bx + mx < 0 || bx + mx + 16 > W ||
          by + my < 0 || by + my + 16 > H) return false
      var b = 0
      while (b < 6) {
        val (sel, ox, oy) = blockOrigin(b, bx, by)
        val stride = strideOf(sel)
        val ref = prevPlane(sel)
        val (dx, dy) = if (sel == 0) (mx, my) else (mx / 2, my / 2)
        val coded = (cbp & (1 << (5 - b))) != 0
        if (coded) {
          readInterBlock(br, qf)
          if (br.bad) return false
        }
        reconBlock(if (coded) qf else zero, intra = false, qs,
          (x, y) => (ref((oy + y + dy) * stride + ox + x + dx) & 0xff)
            .toDouble,
          reconPlane(sel), stride, ox, oy)
        b += 1
      }
      true
    }
    if (isI) {
      var mb = 0
      while (mb < nMb) {
        if (McVlcKernels.readMba(br) != 1 || br.bad) return null
        val t = ITypeDecoder.read(br)
        if (br.bad || t != 1) return null // intra+quant never emitted
        if (!readIntraMb(mb)) return null
        mb += 1
      }
    } else {
      var mb = -1
      while (mb < nMb - 1) {
        val incr = McVlcKernels.readMba(br)
        if (br.bad || incr < 1 || mb + incr >= nMb + 1) return null
        var s = mb + 1
        while (s < mb + incr) { // skipped macroblocks: copy-previous
          copyMb(s)
          pmx = 0; pmy = 0; resetDc()
          s += 1
        }
        mb += incr
        if (mb >= nMb) return null
        val t = McVlcKernels.TypeDecoder.read(br)
        if (br.bad) return null
        t match {
          case 3 => // MC only
            val mx = mvRecon(McVlcKernels.readMv(br), pmx)
            val my = mvRecon(McVlcKernels.readMv(br), pmy)
            if (br.bad || (mx & 1) != 0 || (my & 1) != 0) return null
            pmx = mx; pmy = my
            resetDc()
            if (!readPatternBlocks(mb, mx, my, 0)) return null
          case 1 => // MC + pattern
            val mx = mvRecon(McVlcKernels.readMv(br), pmx)
            val my = mvRecon(McVlcKernels.readMv(br), pmy)
            if (br.bad || (mx & 1) != 0 || (my & 1) != 0) return null
            pmx = mx; pmy = my
            resetDc()
            val cbp = CbpDecoder.read(br)
            if (br.bad) return null
            if (!readPatternBlocks(mb, mx, my, cbp)) return null
          case 2 => // pattern, zero MV; predictor resets
            pmx = 0; pmy = 0
            resetDc()
            val cbp = CbpDecoder.read(br)
            if (br.bad) return null
            if (!readPatternBlocks(mb, 0, 0, cbp)) return null
          case 4 => // intra
            pmx = 0; pmy = 0
            if (!readIntraMb(mb)) return null
          case _ => return null
        }
      }
    }
    (reconY, reconCb, reconCr)
  }

  // ---- elementary-stream framing (§2.4 headers, the McVlc layout) ----------

  private val PictureRates =
    Array(23.976, 24.0, 25.0, 29.97, 30.0, 50.0, 59.94, 60.0)
  private def rateCode(fps: Int): Int = {
    var best = 1
    var bd = Double.MaxValue
    var i = 0
    while (i < PictureRates.length) {
      val d = math.abs(PictureRates(i) - fps)
      if (d < bd) { bd = d; best = i + 1 }
      i += 1
    }
    best
  }

  private[graft] final case class Mpeg1Video(width: Int, height: Int,
      reconsY: Array[Array[Byte]], reconsCb: Array[Array[Byte]],
      reconsCr: Array[Array[Byte]])

  /** Encode YCbCr 4:2:0 frames (Y at padded W×H, chroma at W/2×H/2) as
    * one conformant elementary stream: sequence header (default
    * quantizer matrices — the §2.4.2.3 defaults this coder quantizes
    * with), GOP header, and per picture a picture header (full_pel
    * forward, f_code 1) + ONE slice (vertical position 1,
    * quantizer_scale = [[QScale]]) carrying the macroblock layer.
    * Returns (stream, per-frame encoder reconstructions, flags). */
  private[graft] def encodeEs(width: Int, height: Int, fps: Int,
      ys: Array[Array[Byte]], cbs: Array[Array[Byte]],
      crs: Array[Array[Byte]], flags: Array[Boolean])
      : (Array[Byte], Mpeg1Video) = {
    require(width >= 1 && width < 4096 && height >= 1 && height < 4096,
      s"Mpeg1Kernels: dims ${width}x$height outside the 12-bit fields")
    val W = pad16(width); val H = pad16(height)
    val bw = new BitWriter
    def startCode(code: Int): Unit = {
      bw.alignZero(); bw.putBits(0, 16); bw.putBits(1, 8)
      bw.putBits(code, 8)
    }
    startCode(0xB3)
    bw.putBits(width, 12); bw.putBits(height, 12)
    bw.putBits(1, 4) // pel_aspect_ratio '0001'
    bw.putBits(rateCode(fps), 4)
    bw.putBits(0x3FFFF, 18) // variable bit_rate
    bw.putBits(1, 1) // marker
    bw.putBits(0, 10) // vbv_buffer_size
    bw.putBits(0, 3) // constrained + both load-matrix flags (defaults)
    startCode(0xB8)
    bw.putBits(0, 12); bw.putBits(1, 1); bw.putBits(0, 12) // time_code
    bw.putBits(1, 1) // closed_gop
    bw.putBits(0, 1) // broken_link
    val n = ys.length
    val recY = new Array[Array[Byte]](n)
    val recCb = new Array[Array[Byte]](n)
    val recCr = new Array[Array[Byte]](n)
    var f = 0
    while (f < n) {
      val qsPic = if (f == 0) QScaleI else QScaleP
      val (plans, ry, rcb, rcr) = planPicture(ys(f), cbs(f), crs(f),
        if (f == 0) null else recY(f - 1),
        if (f == 0) null else recCb(f - 1),
        if (f == 0) null else recCr(f - 1), W, H, qsPic, flags)
      recY(f) = ry; recCb(f) = rcb; recCr(f) = rcr
      startCode(0x00)
      bw.putBits(f % 1024, 10)
      bw.putBits(if (f == 0) 1 else 2, 3)
      bw.putBits(0xFFFF, 16) // vbv_delay: variable
      if (f > 0) {
        bw.putBits(1, 1) // full_pel_forward_vector
        bw.putBits(1, 3) // forward_f_code = 1
      }
      startCode(0x01) // slice, vertical position 1
      bw.putBits(qsPic, 5)
      bw.putBits(0, 1) // extra_bit_slice
      writeMbLayer(bw, f == 0, plans)
      f += 1
    }
    startCode(0xB7)
    bw.alignZero()
    (bw.toByteArray, Mpeg1Video(width, height, recY, recCb, recCr))
  }

  /** Parse an [[encodeEs]] stream: every header field validated, each
    * picture's macroblock layer chain-decoded over the reconstruction
    * chain. Null on ANY malformation (unknown codes, odd vectors — this
    * encoder never emits them — vectors off canvas, coefficient or
    * address overruns, bad padding, trailing bytes, missing
    * sequence_end). */
  def decodeEs(data: Array[Byte]): Mpeg1Video = {
    if (data == null || data.length < 16) return null
    val br = new BitReader(data, 0)
    def align(): Boolean = {
      while (br.bitPos % 8 != 0) if (br.bit() != 0 || br.bad) return false
      true
    }
    def expectStart(code: Int): Boolean =
      align() && br.bits(24) == 1 && br.bits(8) == code && !br.bad
    if (!expectStart(0xB3)) return null
    val width = br.bits(12); val height = br.bits(12)
    if (br.bad || width < 1 || height < 1) return null
    if (br.bits(4) != 1) return null
    val rc = br.bits(4)
    if (br.bad || rc < 1 || rc > 8) return null
    br.bits(18)
    if (br.bits(1) != 1) return null
    br.bits(10)
    if (br.bits(3) != 0 || br.bad) return null
    if (!expectStart(0xB8)) return null
    br.bits(12)
    if (br.bits(1) != 1) return null
    br.bits(12)
    br.bits(2)
    if (br.bad) return null
    val W = pad16(width); val H = pad16(height)
    val outY = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    val outCb = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    val outCr = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    var done = false
    var f = 0
    while (!done) {
      if (!align()) return null
      if (br.bits(24) != 1 || br.bad) return null
      br.bits(8) match {
        case 0xB7 => done = true
        case 0x00 =>
          if (br.bits(10) != f % 1024) return null
          val ptype = br.bits(3)
          if (br.bad || (ptype != 1 && ptype != 2)) return null
          if (ptype == 2 && outY.isEmpty) return null
          br.bits(16)
          if (ptype == 2 &&
              (br.bits(1) != 1 || br.bits(3) != 1)) return null
          if (br.bad) return null
          if (!expectStart(0x01)) return null
          val q = br.bits(5)
          if (br.bad || q < 1 || q > 31) return null
          if (br.bits(1) != 0) return null
          val r = readMbLayer(br, ptype == 1, q,
            if (outY.isEmpty) null else outY.last,
            if (outCb.isEmpty) null else outCb.last,
            if (outCr.isEmpty) null else outCr.last, W, H)
          if (r == null) return null
          outY += r._1; outCb += r._2; outCr += r._3
          f += 1
        case _ => return null
      }
    }
    if (!align()) return null
    if (br.bitPos != br.bitEnd || outY.isEmpty) return null
    Mpeg1Video(width, height, outY.toArray, outCb.toArray, outCr.toArray)
  }

  // ---- planted YCbCr synthesis ---------------------------------------------

  /** Planted MOVE/HOLD global motion in YCbCr 4:2:0: every plane is a
    * window into its own static smooth scene, displaced by
    * d(f) = 2·⌈f/2⌉ — frames alternate a (2, 2) luma slide (the
    * even-vector search's one correct interior answer, chroma sliding
    * the derived (1, 1)) with an exact HOLD (zero displacement — the
    * skip path's honest trigger), leaving the leading edges to
    * pattern/intra coding. Planes are generated at PADDED canvas size
    * (content everywhere; the header still stamps the display dims). */
  private[graft] def synthYuv(seed: Long, width: Int, height: Int,
      nFrames: Int)
      : (Array[Array[Byte]], Array[Array[Byte]], Array[Array[Byte]]) = {
    val W = pad16(width); val H = pad16(height)
    val cw = W / 2; val ch = H / 2
    val a = (seed % 97).toDouble * 0.07
    def clampB(v: Double): Byte =
      math.max(0, math.min(255, math.round(v).toInt)).toByte
    def sceneY(x: Int, y: Int): Byte = clampB(128.0 +
      55.0 * StrictMath.sin(0.31 * x + a) * StrictMath.cos(0.23 * y - a) +
      40.0 * StrictMath.sin(0.11 * (x + 2 * y) + 0.5 * a) +
      25.0 * StrictMath.sin(0.9 * x - 0.7 * y + a))
    def sceneCb(x: Int, y: Int): Byte = clampB(128.0 +
      45.0 * StrictMath.sin(0.27 * x - a) * StrictMath.cos(0.19 * y + a) +
      30.0 * StrictMath.sin(0.55 * x + 0.4 * y - a))
    def sceneCr(x: Int, y: Int): Byte = clampB(128.0 +
      40.0 * StrictMath.cos(0.23 * x + 0.7 * a) *
        StrictMath.sin(0.29 * y - 0.3 * a) +
      32.0 * StrictMath.sin(0.48 * x - 0.52 * y + a))
    @inline def disp(f: Int): Int = ((f + 1) / 2) * 2
    val ys = Array.tabulate(nFrames) { f =>
      val d = disp(f)
      val px = new Array[Byte](W * H)
      var y = 0
      while (y < H) {
        var x = 0
        while (x < W) { px(y * W + x) = sceneY(x + d, y + d); x += 1 }
        y += 1
      }
      px
    }
    val cbs = Array.tabulate(nFrames) { f =>
      val d = disp(f) / 2
      val px = new Array[Byte](cw * ch)
      var y = 0
      while (y < ch) {
        var x = 0
        while (x < cw) { px(y * cw + x) = sceneCb(x + d, y + d); x += 1 }
        y += 1
      }
      px
    }
    val crs = Array.tabulate(nFrames) { f =>
      val d = disp(f) / 2
      val px = new Array[Byte](cw * ch)
      var y = 0
      while (y < ch) {
        var x = 0
        while (x < cw) { px(y * cw + x) = sceneCr(x + d, y + d); x += 1 }
        y += 1
      }
      px
    }
    (ys, cbs, crs)
  }

  // ---- certification --------------------------------------------------------

  /** Encode planted-motion YCbCr frames as one conformant elementary
    * stream, decode it back, and certify —
    * `struct<width, height, n_frames, err_in_bound, recon_exact,
    * mv_engaged, trunc_rejected, census_ok, cbp_partial, skip_used,
    * intra_p_used, mc_only_used>`:
    *  - `err_in_bound`: every decoded pixel of every PLANE within
    *    [[JpegKernels.ErrBound]] of its source (closed-loop prediction:
    *    P-frame error does not accumulate),
    *  - `recon_exact`: decoder planes BIT-EQUAL to the encoder's own
    *    reconstructions on every frame,
    *  - `mv_engaged`: some P macroblock chose a nonzero vector (the
    *    planted (2, 2) translation makes anything else a defect at the
    *    registered dims),
    *  - `trunc_rejected`: a mid-stream cut AND a last-byte cut both
    *    decode to null,
    *  - `census_ok`: byte-aligned 0x000001 occurrences == the emitted
    *    start codes (3 + 2·frames) — the payload never emulates one,
    *  - the four engagement flags report which grammar paths the clip
    *    exercised (spec-pinned on fixtures; content-dependent, so the
    *    registered oracle does not assert them).
    * Null if anything fails to encode/decode. */
  def mpeg1RoundTripStats(seed: Long, width: Int, height: Int,
                          nFrames: Int, fps: Int): InternalRow =
    try mpeg1RoundTripStatsImpl(seed, width, height, nFrames, fps)
    catch { case _: IllegalArgumentException => null }

  private def mpeg1RoundTripStatsImpl(seed: Long, width: Int, height: Int,
                                      nFrames: Int,
                                      fps: Int): InternalRow = {
    if (nFrames <= 1 || nFrames > 256 || width <= 0 || height <= 0 ||
        width.toLong * height * nFrames > (1 << 24)) return null
    val (ys, cbs, crs) = synthYuv(seed, width, height, nFrames)
    val flags = new Array[Boolean](5)
    val (es, enc) = encodeEs(width, height, fps, ys, cbs, crs, flags)
    val dec = decodeEs(es)
    if (dec == null || dec.width != width || dec.height != height ||
        dec.reconsY.length != nFrames) return null
    var reconExact = true
    var errInBound = true
    def check(a: Array[Array[Byte]], b: Array[Array[Byte]],
              src: Array[Array[Byte]]): Unit = {
      var f = 0
      while (f < nFrames) {
        if (!java.util.Arrays.equals(a(f), b(f))) reconExact = false
        var i = 0
        while (i < a(f).length) {
          if (math.abs((a(f)(i) & 0xff) - (src(f)(i) & 0xff)) >
              JpegKernels.ErrBound) errInBound = false
          i += 1
        }
        f += 1
      }
    }
    check(dec.reconsY, enc.reconsY, ys)
    check(dec.reconsCb, enc.reconsCb, cbs)
    check(dec.reconsCr, enc.reconsCr, crs)
    val truncRejected =
      decodeEs(java.util.Arrays.copyOf(es, es.length / 2)) == null &&
        decodeEs(java.util.Arrays.copyOf(es, es.length - 1)) == null
    val censusOk =
      McVlcKernels.startCodeCensus(es) == 3 + 2 * nFrames
    val r = new GenericInternalRow(12)
    r.setInt(0, dec.width); r.setInt(1, dec.height)
    r.setInt(2, dec.reconsY.length)
    r.setBoolean(3, errInBound)
    r.setBoolean(4, reconExact)
    r.setBoolean(5, flags(0))
    r.setBoolean(6, truncRejected)
    r.setBoolean(7, censusOk)
    r.setBoolean(8, flags(1))
    r.setBoolean(9, flags(2))
    r.setBoolean(10, flags(3))
    r.setBoolean(11, flags(4))
    r
  }
}
