package graft.functions

import org.apache.spark.sql.catalyst.expressions.GenericInternalRow

/** Arithmetic-coded JPEG (ITU T.81 Annexes D/E/F): the QM binary
  * arithmetic coder — Table D.3's 113-state probability estimation
  * machine with conditional MPS/LPS exchange, carry-over byte stacking,
  * and JFIF 0xFF→0x00 byte stuffing — under the sequential-DCT DC/AC
  * statistical models of §F.1.4.4 (per-component DC conditioning
  * categories from the previous diff via the (L,U) bounds, per-position
  * AC EOB/run/magnitude contexts split at Kx). This closes the
  * "arithmetic JPEG" half of the remaining multimodal codec seam
  * ([[JpegKernels]] scaladoc): SOF9 streams now DECODE, and an SOF9
  * encoder exists so the decode is certifiable end-to-end in-container.
  *
  * Entropy coding is LOSSLESS over the same quantized coefficients
  * [[JpegKernels.jpegEncodePixels]] produces, so the certification
  * contract is BIT EQUALITY of decoded pixels against the Huffman
  * baseline path — same pixels in, same pixels out — plus the
  * truncation-rejection null contract every codec here carries.
  *
  * Register conventions follow the standard's software implementation
  * (the same layout libjpeg's public jcarith/jdarith use): A scaled so
  * 0x10000 is unity, renormalization below 0x8000, encoder bytes
  * extracted at C bits 19–26 with the carry rippling through stacked
  * 0xFF bytes, decoder feeding zero bytes once the trailing marker is
  * reached (the encoder's flush discards trailing zeros to match).
  * Same defensive contract as [[MediaKernels]]: the decoder returns
  * null on anything malformed — never throws.
  */
object JpegArith {

  // ITU T.81 Table D.3: Qe value, Next_Index_LPS, Next_Index_MPS,
  // Switch_MPS, for states 0..112; state 113 is the non-adapting
  // fixed-probability state (used for AC sign bits).
  private val QmTable: Array[(Int, Int, Int, Int)] = Array(
    (0x5A1D, 1, 1, 1), (0x2586, 14, 2, 0), (0x1114, 16, 3, 0),
    (0x080B, 18, 4, 0), (0x03D8, 20, 5, 0), (0x01DA, 23, 6, 0),
    (0x00E5, 25, 7, 0), (0x006F, 28, 8, 0), (0x0036, 30, 9, 0),
    (0x001A, 33, 10, 0), (0x000D, 35, 11, 0), (0x0006, 9, 12, 0),
    (0x0003, 10, 13, 0), (0x0001, 12, 13, 0), (0x5A7F, 15, 15, 1),
    (0x3F25, 36, 16, 0), (0x2CF2, 38, 17, 0), (0x207C, 39, 18, 0),
    (0x17B9, 40, 19, 0), (0x1182, 42, 20, 0), (0x0CEF, 43, 21, 0),
    (0x09A1, 45, 22, 0), (0x072F, 46, 23, 0), (0x055C, 48, 24, 0),
    (0x0406, 49, 25, 0), (0x0303, 51, 26, 0), (0x0240, 52, 27, 0),
    (0x01B1, 54, 28, 0), (0x0144, 56, 29, 0), (0x00F5, 57, 30, 0),
    (0x00B7, 59, 31, 0), (0x008A, 60, 32, 0), (0x0068, 62, 33, 0),
    (0x004E, 63, 34, 0), (0x003B, 32, 35, 0), (0x002C, 33, 9, 0),
    (0x5AE1, 37, 37, 1), (0x484C, 64, 38, 0), (0x3A0D, 65, 39, 0),
    (0x2EF1, 67, 40, 0), (0x261F, 68, 41, 0), (0x1F33, 69, 42, 0),
    (0x19A8, 70, 43, 0), (0x1518, 72, 44, 0), (0x1177, 73, 45, 0),
    (0x0E74, 74, 46, 0), (0x0BFB, 75, 47, 0), (0x09F8, 77, 48, 0),
    (0x0861, 78, 49, 0), (0x0706, 79, 50, 0), (0x05CD, 48, 51, 0),
    (0x04DE, 50, 52, 0), (0x040F, 50, 53, 0), (0x0363, 51, 54, 0),
    (0x02D4, 52, 55, 0), (0x025C, 53, 56, 0), (0x01F8, 54, 57, 0),
    (0x01A4, 55, 58, 0), (0x0160, 56, 59, 0), (0x0125, 57, 60, 0),
    (0x00F6, 58, 61, 0), (0x00CB, 59, 62, 0), (0x00AB, 61, 63, 0),
    (0x008F, 61, 32, 0), (0x5B12, 65, 65, 1), (0x4D04, 80, 66, 0),
    (0x412C, 81, 67, 0), (0x37D8, 82, 68, 0), (0x2FE8, 83, 69, 0),
    (0x293C, 84, 70, 0), (0x2379, 86, 71, 0), (0x1EDF, 87, 72, 0),
    (0x1AA9, 87, 73, 0), (0x174E, 72, 74, 0), (0x1424, 72, 75, 0),
    (0x119C, 74, 76, 0), (0x0F6B, 74, 77, 0), (0x0D51, 75, 78, 0),
    (0x0BB6, 77, 79, 0), (0x0A40, 77, 48, 0), (0x5832, 80, 81, 1),
    (0x4D1C, 88, 82, 0), (0x438E, 89, 83, 0), (0x3BDD, 90, 84, 0),
    (0x34EE, 91, 85, 0), (0x2EAE, 92, 86, 0), (0x299A, 93, 87, 0),
    (0x2516, 86, 71, 0), (0x5570, 88, 89, 1), (0x4CA9, 95, 90, 0),
    (0x44D9, 96, 91, 0), (0x3E22, 97, 92, 0), (0x3824, 99, 93, 0),
    (0x32B4, 99, 94, 0), (0x2E17, 93, 86, 0), (0x56A8, 95, 96, 1),
    (0x4F46, 101, 97, 0), (0x47E5, 102, 98, 0), (0x41CF, 103, 99, 0),
    (0x3C3D, 104, 100, 0), (0x375E, 99, 93, 0), (0x5231, 105, 102, 0),
    (0x4C0F, 106, 103, 0), (0x4639, 107, 104, 0), (0x415E, 103, 99, 0),
    (0x5627, 105, 106, 1), (0x50E7, 108, 107, 0), (0x4B85, 109, 103, 0),
    (0x5597, 110, 109, 0), (0x504F, 111, 107, 0), (0x5A10, 110, 111, 1),
    (0x5522, 112, 109, 0), (0x59EB, 112, 111, 1),
    (0x5A1D, 113, 113, 0)) // 113: fixed ~0.5, never adapts

  private val QE = QmTable.map(_._1)
  private val NLPS = QmTable.map(_._2)
  private val NMPS = QmTable.map(_._3)
  private val SW = QmTable.map(_._4)

  /** The fixed-probability context index (AC sign bits). */
  private val FixedState = 113

  // default conditioning bounds (T.81 tables F.1/F.2 defaults; a DAC
  // marker overrides them)
  private val DefaultDcL = 0
  private val DefaultDcU = 1
  private val DefaultAcKx = 5

  /** QM encoder (T.81 §D.1): context state bytes live in the caller's
    * stats arrays as (MPS << 7) | index. */
  private[functions] final class ArithEncoder(
      bos: java.io.ByteArrayOutputStream) {
    private var c: Long = 0L
    private var a: Long = 0x10000L
    private var ct: Int = 11
    private var buffer: Int = -1 // pending output byte; -1 = none yet
    private var sc: Long = 0L    // stacked 0xFF bytes (may carry over)
    private var zc: Long = 0L    // pending 0x00 bytes (maybe trailing)

    private def flushZc(): Unit =
      while (zc > 0) { bos.write(0x00); zc -= 1 }

    /** T.81 Figure D.8 BYTEOUT with carry-over and 0xFF stacking. */
    private def byteOut(): Unit = {
      val t = (c >> 19).toInt
      if (t > 0xFF) {
        // carry ripples into the buffered byte; stacked 0xFFs wrap to 0x00
        if (buffer >= 0) {
          flushZc()
          bos.write(buffer + 1)
          if (buffer + 1 == 0xFF) bos.write(0x00)
        }
        zc += sc; sc = 0
        buffer = t & 0xFF
      } else if (t == 0xFF) {
        sc += 1
      } else {
        if (buffer == 0) zc += 1 // defer zeros: trailing ones are dropped
        else if (buffer > 0) { flushZc(); bos.write(buffer) }
        if (sc > 0) {
          flushZc()
          while (sc > 0) { bos.write(0xFF); bos.write(0x00); sc -= 1 }
        }
        buffer = t
      }
      c &= 0x7FFFFL
    }

    private def renorm(): Unit = {
      while (a < 0x8000L) {
        a <<= 1; c <<= 1; ct -= 1
        if (ct == 0) { byteOut(); ct = 8 }
      }
    }

    /** Encode one decision in context `bin` of `stats` (D.1.4/D.1.5,
      * conditional exchange + state transition). */
    def encode(stats: Array[Byte], bin: Int, bit: Int): Unit = {
      val sv = stats(bin) & 0xFF
      val idx = sv & 0x7F
      val mps = sv >>> 7
      val qe = QE(idx).toLong
      a -= qe
      if (bit == mps) {
        if (a >= 0x8000L) return
        if (a < qe) { c += a; a = qe } // exchange: MPS takes the top slot
        stats(bin) = ((mps << 7) | NMPS(idx)).toByte
        renorm()
      } else {
        if (a >= qe) { c += a; a = qe } // usual: LPS is the top slot
        val nm = if (SW(idx) == 1) 1 - mps else mps
        stats(bin) = ((nm << 7) | NLPS(idx)).toByte
        renorm()
      }
    }

    /** T.81 §D.1.8 flush: clear low bits, push the final C bytes
      * (carry-aware, stuffed), discard trailing zeros. */
    def flush(): Unit = {
      val t = (c + a - 1) & 0xFFFF0000L
      c = if (t < c) t + 0x8000L else t
      c <<= ct
      if ((c & 0xF8000000L) != 0) {
        // one final carry into the buffered byte
        if (buffer >= 0) {
          flushZc()
          bos.write(buffer + 1)
          if (buffer + 1 == 0xFF) bos.write(0x00)
        }
        zc += sc; sc = 0
      } else {
        if (buffer > 0) { flushZc(); bos.write(buffer) }
        else if (buffer == 0) zc += 1
        if (sc > 0) {
          flushZc()
          while (sc > 0) { bos.write(0xFF); bos.write(0x00); sc -= 1 }
        }
      }
      // the (at most two) remaining code bytes, only if nonzero —
      // the decoder regenerates trailing zeros by feeding zeros
      if ((c & 0x7FFF800L) != 0) {
        flushZc()
        val b1 = ((c >> 19) & 0xFF).toInt
        bos.write(b1)
        if (b1 == 0xFF) bos.write(0x00)
        if ((c & 0x7F800L) != 0) {
          val b2 = ((c >> 11) & 0xFF).toInt
          bos.write(b2)
          if (b2 == 0xFF) bos.write(0x00)
        }
      }
    }
  }

  /** QM decoder (T.81 §F.2), the encoder's exact inverse. Reads from
    * `b` starting at `start`; a marker (0xFF followed by non-zero) ends
    * the data legally — zero bytes are fed from then on. `markerAt` is
    * the offset of that 0xFF, -1 while none seen. */
  private[functions] final class ArithDecoder(b: Array[Byte], start: Int) {
    private var pos = start
    private var c: Long = 0L
    private var a: Long = 0x10000L
    private var ct = 0
    var markerAt: Int = -1
    /** latched on streams the QM layer itself proves corrupt
      * (magnitude overflow etc. are the caller's checks) */
    var exhausted: Boolean = false

    private def nextByte(): Int = {
      if (markerAt >= 0) return 0
      if (pos >= b.length) { exhausted = true; return 0 }
      val d = b(pos) & 0xFF
      if (d != 0xFF) { pos += 1; return d }
      // 0xFF: stuffed zero means a data 0xFF; anything else is a marker
      if (pos + 1 >= b.length) { exhausted = true; return 0 }
      if ((b(pos + 1) & 0xFF) == 0x00) { pos += 2; 0xFF }
      else { markerAt = pos; 0 }
    }

    // init: first two code bytes fill C's high half; the third stages
    // at bits 8..15 with 8 shifts until the next is needed
    locally {
      c = (nextByte().toLong << 24) | (nextByte().toLong << 16) |
        (nextByte().toLong << 8)
      ct = 8
    }

    private def renorm(): Unit = {
      while (a < 0x8000L) {
        if (ct == 0) { c |= nextByte().toLong << 8; ct = 8 }
        a <<= 1
        c = (c << 1) & 0xFFFFFFFFL
        ct -= 1
      }
    }

    def decode(stats: Array[Byte], bin: Int): Int = {
      val sv = stats(bin) & 0xFF
      val idx = sv & 0x7F
      var mps = sv >>> 7
      val qe = QE(idx).toLong
      a -= qe
      var bit = 0
      if (((c >>> 16) & 0xFFFF) < a) {
        // bottom slot: MPS unless exchanged
        if (a >= 0x8000L) return mps
        if (a < qe) {
          bit = 1 - mps
          if (SW(idx) == 1) mps = 1 - mps
          stats(bin) = ((mps << 7) | NLPS(idx)).toByte
        } else {
          bit = mps
          stats(bin) = ((mps << 7) | NMPS(idx)).toByte
        }
        renorm()
      } else {
        // top slot (width qe): LPS unless exchanged
        c -= a << 16
        if (a < qe) {
          bit = mps
          stats(bin) = ((mps << 7) | NMPS(idx)).toByte
        } else {
          bit = 1 - mps
          if (SW(idx) == 1) mps = 1 - mps
          stats(bin) = ((mps << 7) | NLPS(idx)).toByte
        }
        a = qe
        renorm()
      }
      bit
    }
  }

  private def freshStats(n: Int): Array[Byte] = new Array[Byte](n)
  private def fixedStats(): Array[Byte] = Array(FixedState.toByte)

  /** DC statistical model, encode side (§F.1.4.4.1). Returns the new
    * conditioning context for the component. */
  private def encodeDc(enc: ArithEncoder, st: Array[Byte], ctx: Int,
                       diff0: Int, dcL: Int, dcU: Int): Int = {
    if (diff0 == 0) { enc.encode(st, ctx, 0); return 0 }
    enc.encode(st, ctx, 1)
    var diff = diff0
    val sign = if (diff < 0) { diff = -diff; 1 } else 0
    enc.encode(st, ctx + 1, sign)
    val v = diff - 1
    var m = 0
    var bin = ctx + 2 + sign
    if (v == 0) enc.encode(st, bin, 0)
    else {
      enc.encode(st, bin, 1)
      m = 1
      bin = 20
      while ((m << 1) <= v) { enc.encode(st, bin, 1); m <<= 1; bin += 1 }
      enc.encode(st, bin, 0)
    }
    val mant = bin + 14
    var bp = m >> 1
    while (bp != 0) {
      enc.encode(st, mant, if ((v & bp) != 0) 1 else 0)
      bp >>= 1
    }
    if (m < ((1 << dcL) >> 1)) 0
    else if (m > ((1 << dcU) >> 1)) 12 + sign * 4
    else 4 + sign * 4
  }

  /** DC decode (§F.2.4.1 shape): returns the diff, updates `ctxOut`.
    * Returns Int.MinValue on a corrupt magnitude. */
  private def decodeDc(dec: ArithDecoder, st: Array[Byte], ctx: Int,
                       dcL: Int, dcU: Int, ctxOut: Array[Int],
                       comp: Int): Int = {
    if (dec.decode(st, ctx) == 0) { ctxOut(comp) = 0; return 0 }
    val sign = dec.decode(st, ctx + 1)
    var bin = ctx + 2 + sign
    var m = dec.decode(st, bin)
    if (m != 0) {
      bin = 20
      while (dec.decode(st, bin) == 1) {
        m <<= 1
        if (m == 0x8000) return Int.MinValue
        bin += 1
      }
    }
    ctxOut(comp) =
      if (m < ((1 << dcL) >> 1)) 0
      else if (m > ((1 << dcU) >> 1)) 12 + sign * 4
      else 4 + sign * 4
    var v = m
    val mant = bin + 14
    var mm = m >> 1
    while (mm != 0) {
      if (dec.decode(st, mant) == 1) v |= mm
      mm >>= 1
    }
    v += 1
    if (sign == 1) -v else v
  }

  /** AC statistical model, encode side (§F.1.4.4.2): one block's 63 AC
    * coefficients in zigzag order (`zz(1..63)`). */
  private def encodeAc(enc: ArithEncoder, st: Array[Byte],
                       fixed: Array[Byte], zz: Array[Int],
                       kx: Int): Unit = {
    var ke = 63
    while (ke >= 1 && zz(ke) == 0) ke -= 1
    var k = 1
    while (k <= ke) {
      var bin = 3 * (k - 1)
      enc.encode(st, bin, 0) // not end-of-block yet
      while (zz(k) == 0) { enc.encode(st, bin + 1, 0); bin += 3; k += 1 }
      enc.encode(st, bin + 1, 1)
      val v0 = zz(k)
      val sign = if (v0 < 0) 1 else 0
      enc.encode(fixed, 0, sign)
      val v = math.abs(v0) - 1
      var m = 0
      var mbin = bin + 2
      if (v == 0) enc.encode(st, mbin, 0)
      else {
        enc.encode(st, mbin, 1)
        m = 1
        if ((m << 1) <= v) {
          enc.encode(st, mbin, 1) // second magnitude bit, same bin
          m = 2
          mbin = if (k <= kx) 189 else 217
          while ((m << 1) <= v) { enc.encode(st, mbin, 1); m <<= 1; mbin += 1 }
          enc.encode(st, mbin, 0)
        } else enc.encode(st, mbin, 0)
      }
      val mant = mbin + 14
      var bp = m >> 1
      while (bp != 0) {
        enc.encode(st, mant, if ((v & bp) != 0) 1 else 0)
        bp >>= 1
      }
      k += 1
    }
    if (ke < 63) enc.encode(st, 3 * (ke + 1 - 1), 1) // EOB decision
  }

  /** AC decode (§F.2.4.2 shape) into `zz(1..63)`; false on corruption. */
  private def decodeAc(dec: ArithDecoder, st: Array[Byte],
                       fixed: Array[Byte], zz: Array[Int],
                       kx: Int): Boolean = {
    var k = 1
    while (k <= 63) {
      var bin = 3 * (k - 1)
      if (dec.decode(st, bin) == 1) return true // EOB
      while (dec.decode(st, bin + 1) == 0) {
        bin += 3; k += 1
        if (k > 63) return false
      }
      val sign = dec.decode(fixed, 0)
      var mbin = bin + 2
      var m = dec.decode(st, mbin)
      if (m != 0) {
        if (dec.decode(st, mbin) == 1) {
          m = 2
          mbin = if (k <= kx) 189 else 217
          while (dec.decode(st, mbin) == 1) {
            m <<= 1
            if (m == 0x8000) return false
            mbin += 1
          }
        }
      }
      var v = m
      val mant = mbin + 14
      var mm = m >> 1
      while (mm != 0) {
        if (dec.decode(st, mant) == 1) v |= mm
        mm >>= 1
      }
      v += 1
      zz(k) = if (sign == 1) -v else v
      k += 1
    }
    true
  }

  /** Encode 8-bit pixels as an ARITHMETIC-coded sequential JPEG (SOF9):
    * the exact quantized coefficients [[JpegKernels.jpegEncodePixels]]
    * would emit, entropy-coded with the QM coder instead of Huffman.
    * Same headers otherwise (DQT with uniform Q, 4:4:4 interleave,
    * default conditioning — no DAC segment). Null on invalid input. */
  def jpegEncodeArithPixels(width: Int, height: Int, channels: Int,
                            pixels: Array[Byte]): Array[Byte] = {
    if (width <= 0 || height <= 0 || width > 0xffff || height > 0xffff) return null
    if (channels != 1 && channels != 3) return null
    if ((width.toLong + 7) / 8 * 8 * ((height.toLong + 7) / 8 * 8) * channels > (1 << 25))
      return null
    if (pixels == null || pixels.length.toLong != width.toLong * height * channels)
      return null
    val nc = channels
    val planes = Array.ofDim[Double](nc, width * height)
    var i = 0
    while (i < width * height) {
      if (nc == 1) planes(0)(i) = (pixels(i) & 0xff).toDouble
      else {
        val r = pixels(3 * i) & 0xff
        val g = pixels(3 * i + 1) & 0xff
        val bl = pixels(3 * i + 2) & 0xff
        planes(0)(i) = 0.299 * r + 0.587 * g + 0.114 * bl
        planes(1)(i) = -0.168736 * r - 0.331264 * g + 0.5 * bl + 128.0
        planes(2)(i) = 0.5 * r - 0.418688 * g - 0.081312 * bl + 128.0
      }
      i += 1
    }
    val bos = new java.io.ByteArrayOutputStream(width * height / 2 + 1024)
    import JpegKernels.{be16, fdctQuant, Zig, Q}
    bos.write(0xff); bos.write(0xd8)
    bos.write(0xff); bos.write(0xe0); be16(bos, 16)
    bos.write('J'); bos.write('F'); bos.write('I'); bos.write('F'); bos.write(0)
    bos.write(1); bos.write(1); bos.write(0); be16(bos, 1); be16(bos, 1)
    bos.write(0); bos.write(0)
    bos.write(0xff); bos.write(0xdb); be16(bos, 67); bos.write(0x00)
    i = 0; while (i < 64) { bos.write(Q); i += 1 }
    // SOF9: extended sequential DCT, arithmetic coding
    bos.write(0xff); bos.write(0xc9); be16(bos, 8 + 3 * nc)
    bos.write(8); be16(bos, height); be16(bos, width); bos.write(nc)
    var c = 0
    while (c < nc) { bos.write(c + 1); bos.write(0x11); bos.write(0); c += 1 }
    // SOS: Tc/Ta select arithmetic conditioning table 0 (defaults apply)
    bos.write(0xff); bos.write(0xda); be16(bos, 6 + 2 * nc); bos.write(nc)
    c = 0
    while (c < nc) { bos.write(c + 1); bos.write(0x00); c += 1 }
    bos.write(0); bos.write(63); bos.write(0)
    val enc = new ArithEncoder(bos)
    val dcStats = freshStats(64)
    val acStats = freshStats(256)
    val fixed = fixedStats()
    val dcCtx = new Array[Int](nc)
    val dcPred = new Array[Int](nc)
    val mcuW = (width + 7) / 8; val mcuH = (height + 7) / 8
    val block = new Array[Double](64)
    val coef = new Array[Int](64)
    val zz = new Array[Int](64)
    var my = 0
    while (my < mcuH) {
      var mx = 0
      while (mx < mcuW) {
        c = 0
        while (c < nc) {
          var y = 0
          while (y < 8) {
            val sy = math.min(my * 8 + y, height - 1)
            var x = 0
            while (x < 8) {
              val sx = math.min(mx * 8 + x, width - 1)
              block(y * 8 + x) = planes(c)(sy * width + sx) - 128.0
              x += 1
            }
            y += 1
          }
          fdctQuant(block, coef)
          var k = 0
          while (k < 64) { zz(k) = coef(Zig(k)); k += 1 }
          val diff = coef(0) - dcPred(c); dcPred(c) = coef(0)
          dcCtx(c) = encodeDc(enc, dcStats, dcCtx(c), diff,
            DefaultDcL, DefaultDcU)
          encodeAc(enc, acStats, fixed, zz, DefaultAcKx)
          c += 1
        }
        mx += 1
      }
      my += 1
    }
    enc.flush()
    bos.write(0xff); bos.write(0xd9)
    bos.toByteArray
  }

  /** Decode an arithmetic-coded sequential JPEG (SOF9) of the 4:4:4 /
    * grayscale single-table shape this library emits — marker walk,
    * optional DAC conditioning, QM entropy decode under the §F.2.4
    * models, dequant, IDCT, color convert, crop. Null on anything
    * malformed (truncation is detected by the missing end-of-image
    * marker: within entropy data 0xFF is always stuffed, so a surviving
    * EOI cannot be a coincidence). Never throws. */
  def jpegDecodeArith(b: Array[Byte]): JpegKernels.JpegImage = {
    if (b == null || b.length < 4) return null
    if ((b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8) return null
    var p = 2
    var width = 0; var height = 0; var nc = 0
    var quant: Array[Int] = null
    var dcL = DefaultDcL; var dcU = DefaultDcU; var acKx = DefaultAcKx
    var sosAt = -1
    while (sosAt < 0) {
      if (p + 4 > b.length) return null
      if ((b(p) & 0xff) != 0xff) return null
      while (p + 2 <= b.length && (b(p + 1) & 0xff) == 0xff) p += 1
      if (p + 4 > b.length) return null
      val marker = b(p + 1) & 0xff
      val len = ((b(p + 2) & 0xff) << 8) | (b(p + 3) & 0xff)
      if (p + 2 + len > b.length) return null
      marker match {
        case 0xdb =>
          if (len < 67 || (b(p + 4) & 0xf0) != 0) return null
          quant = new Array[Int](64)
          var i = 0
          while (i < 64) { quant(i) = b(p + 5 + i) & 0xff; i += 1 }
        case 0xc9 =>
          if (len < 8) return null
          if ((b(p + 4) & 0xff) != 8) return null
          height = ((b(p + 5) & 0xff) << 8) | (b(p + 6) & 0xff)
          width = ((b(p + 7) & 0xff) << 8) | (b(p + 8) & 0xff)
          nc = b(p + 9) & 0xff
          if (width <= 0 || height <= 0 || (nc != 1 && nc != 3)) return null
          if ((width.toLong + 7) / 8 * 8 * ((height.toLong + 7) / 8 * 8) * nc > (1 << 25))
            return null
          if (len < 8 + 3 * nc) return null
          var c = 0
          while (c < nc) {
            if ((b(p + 11 + 3 * c) & 0xff) != 0x11) return null
            c += 1
          }
        case 0xcc => // DAC: conditioning overrides, (class/id, value) pairs
          var q = p + 4
          val end = p + 2 + len
          while (q + 1 < end) {
            val tc = (b(q) & 0xf0) >> 4
            val th = b(q) & 0x0f
            val cs = b(q + 1) & 0xff
            if (th != 0) return null // single-table shape
            if (tc == 0) {
              dcL = cs & 0x0f; dcU = (cs >> 4) & 0x0f
              if (dcU < dcL || dcU > 15) return null
            } else if (tc == 1) {
              acKx = cs
              if (acKx < 1 || acKx > 63) return null
            } else return null
            q += 2
          }
          if (q != end) return null
        case 0xda =>
          if (nc == 0 || quant == null) return null
          sosAt = p + 2 + len
        case 0xc0 | 0xc1 | 0xc2 | 0xc3 | 0xc5 | 0xc6 | 0xc7 | 0xca | 0xcb |
             0xcd | 0xce | 0xcf =>
          return null // not an arithmetic sequential frame
        case _ => () // APPn / COM / DHT in a mixed stream: skip
      }
      p += 2 + len
    }
    // truncation gate: a well-formed scan must still carry its EOI —
    // inside entropy data every 0xFF is followed by a stuffed 0x00, so
    // walking the stuffing finds the first true marker
    var w = sosAt
    var eoiOk = false
    var scanning = true
    while (scanning) {
      if (w + 1 >= b.length) { scanning = false }
      else if ((b(w) & 0xff) != 0xff) w += 1
      else if ((b(w + 1) & 0xff) == 0x00) w += 2
      else { eoiOk = (b(w + 1) & 0xff) == 0xd9; scanning = false }
    }
    if (!eoiOk) return null
    val dec = new ArithDecoder(b, sosAt)
    val dcStats = freshStats(64)
    val acStats = freshStats(256)
    val fixed = fixedStats()
    val dcCtx = new Array[Int](nc)
    val dcPred = new Array[Int](nc)
    val mcuW = (width + 7) / 8; val mcuH = (height + 7) / 8
    val planes = Array.ofDim[Double](nc, mcuW * 8 * mcuH * 8)
    val coef = new Array[Int](64)
    val zz = new Array[Int](64)
    val block = new Array[Double](64)
    val stride = mcuW * 8
    import JpegKernels.{idctDequantWith, Zig}
    var my = 0
    while (my < mcuH) {
      var mx = 0
      while (mx < mcuW) {
        var c = 0
        while (c < nc) {
          val diff = decodeDc(dec, dcStats, dcCtx(c), dcL, dcU, dcCtx, c)
          if (diff == Int.MinValue) return null
          dcPred(c) += diff
          java.util.Arrays.fill(zz, 0)
          if (!decodeAc(dec, acStats, fixed, zz, acKx)) return null
          if (dec.exhausted) return null // ran off the buffer, no marker
          java.util.Arrays.fill(coef, 0)
          coef(0) = dcPred(c)
          var k = 1
          while (k < 64) { coef(Zig(k)) = zz(k); k += 1 }
          idctDequantWith(coef, quant, block)
          var y = 0
          while (y < 8) {
            var x = 0
            while (x < 8) {
              planes(c)((my * 8 + y) * stride + mx * 8 + x) =
                block(y * 8 + x) + 128.0
              x += 1
            }
            y += 1
          }
          c += 1
        }
        mx += 1
      }
      my += 1
    }
    val out = new Array[Byte](width * height * nc)
    def clamp(v: Double): Int = math.max(0, math.min(255, math.round(v).toInt))
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val pi = y * stride + x
        if (nc == 1) out(y * width + x) = clamp(planes(0)(pi)).toByte
        else {
          val yv = planes(0)(pi)
          val cb = planes(1)(pi) - 128.0
          val cr = planes(2)(pi) - 128.0
          val o = (y * width + x) * 3
          out(o) = clamp(yv + 1.402 * cr).toByte
          out(o + 1) = clamp(yv - 0.344136 * cb - 0.714136 * cr).toByte
          out(o + 2) = clamp(yv + 1.772 * cb).toByte
        }
        x += 1
      }
      y += 1
    }
    new JpegKernels.JpegImage(width, height, nc, out)
  }

  /** Spec probe for the bare QM coder: encode `bits(i)` in adaptive
    * context `ctxs(i)`, flush, decode the stream back with fresh
    * contexts. Returns (wire bytes, decoded bits) so specs can pin both
    * the stuffing discipline and exact mutual inversion — the property
    * that catches any drift between the D.1 encoder and F.2 decoder
    * state machines (renorm alignment, carry chains, flush). */
  def coderProbe(bits: Array[Int], ctxs: Array[Int],
                 nBins: Int): (Array[Byte], Array[Int]) = {
    val bos = new java.io.ByteArrayOutputStream()
    val enc = new ArithEncoder(bos)
    val st = freshStats(nBins)
    var i = 0
    while (i < bits.length) { enc.encode(st, ctxs(i), bits(i)); i += 1 }
    enc.flush()
    val bytes = bos.toByteArray
    val dec = new ArithDecoder(bytes, 0)
    val st2 = freshStats(nBins)
    val out = new Array[Int](bits.length)
    i = 0
    while (i < bits.length) { out(i) = dec.decode(st2, ctxs(i)); i += 1 }
    (bytes, out)
  }

  /** Arithmetic-JPEG self-certification: synthesize pixels, encode them
    * BOTH ways (Huffman baseline and QM arithmetic), decode both, and
    * certify what losslessness of entropy coding promises — BIT EQUALITY
    * of the decoded pixels (the two streams carry the same quantized
    * coefficients): `struct<width,height,channels,arith_equals_seq,
    * arith_smaller,trunc_rejected>`. `arith_smaller` attests the QM
    * stream is no larger than the Huffman one on these inputs (the
    * adaptive coder's entire selling point); trunc_rejected attests the
    * half-stream decodes to null, not fabricated pixels. */
  def jpegArithRoundTripStats(seed: Long, width: Int, height: Int,
                              channels: Int): org.apache.spark.sql.catalyst.InternalRow = {
    if (width <= 0 || height <= 0 ||
        width.toLong * height * channels > (1 << 24)) return null
    val px = MediaKernels.synthPixels(seed, width * height * channels)
    val seq = JpegKernels.jpegEncodePixels(width, height, channels, px)
    val ari = jpegEncodeArithPixels(width, height, channels, px)
    if (seq == null || ari == null) return null
    val decSeq = JpegKernels.jpegDecodeRaw(seq)
    val decAri = jpegDecodeArith(ari)
    if (decSeq == null || decAri == null ||
        decAri.width != width || decAri.height != height ||
        decAri.channels != channels) return null
    val r = new GenericInternalRow(6)
    r.setInt(0, decAri.width); r.setInt(1, decAri.height)
    r.setInt(2, decAri.channels)
    r.setBoolean(3, java.util.Arrays.equals(decSeq.pixels, decAri.pixels))
    r.setBoolean(4, ari.length <= seq.length)
    r.setBoolean(5,
      jpegDecodeArith(java.util.Arrays.copyOf(ari, ari.length / 2)) == null)
    r
  }
}
