package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow

/** Pure-JVM BASELINE JPEG codec (ITU T.81 sequential DCT): forward/inverse
  * 8×8 DCT, uniform quantization, the Annex-K luminance Huffman tables
  * (canonical code construction), JFIF byte stuffing, 4:4:4 interleave or
  * grayscale, edge-replicated block padding with decode-side crop, and
  * BT.601 RGB↔YCbCr. This closes the former "JPEG entropy decode" half of
  * the multimodal codec seam: entropy decode — marker walk, DHT/DQT
  * parsing, variable-length Huffman with the EOB/ZRL run-length forms,
  * DC prediction, dequant, IDCT — is all integer/table/trig work, in
  * reach of the bare JVM like PNG's deflate and GIF's LZW.
  *
  * JPEG is LOSSY, so unlike PNG/GIF the round trip is certified by a
  * QUANTIZATION ERROR BOUND rather than bit equality: with the uniform
  * quant step Q below, |decode(encode(px)) − px| stays under [[ErrBound]]
  * on the synthetic inputs the registered query sweeps (coefficient
  * rounding ≤ Q/2 per coefficient; the IDCT concentrates it). The bound
  * is CERTIFIED FOR THOSE INPUTS, not proved worst-case for arbitrary
  * pixels — adversarial 3-channel content can push chroma rounding
  * through the ~1.4–1.8× RGB-conversion amplification past 16 — and the
  * registered query certifies dims + bound + truncation rejection per
  * document on exactly the swept inputs.
  *
  * Same defensive contract as [[MediaKernels]]: parsers return null on
  * anything malformed — truncation, bad markers, invalid Huffman codes —
  * never throw; at 100 TB some records WILL be garbage.
  */
object JpegKernels {

  /** Uniform quantization step for every coefficient (emitted in DQT, so
    * any conformant decoder agrees). */
  final val Q = 4

  /** Certified per-pixel reconstruction bound for [[Q]] (empirically ≤ ~6
    * on synthetic sweeps; margin for the color-convert rounding). */
  final val ErrBound = 16

  private[functions] val Zig: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  // Annex K luminance tables (ITU T.81); used for every component — we
  // emit the DHT ourselves, so one table id serves all.
  private val DcBits = Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val DcVals = Array.tabulate(12)(identity)
  private val AcBits = Array(0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125)
  private val AcVals: Array[Int] = Array(
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xa1, 0x08, 0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0a, 0x16, 0x17, 0x18, 0x19, 0x1a, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79, 0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5, 0xa6, 0xa7,
    0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6, 0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5,
    0xc6, 0xc7, 0xc8, 0xc9, 0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1, 0xe2,
    0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf1, 0xf2, 0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8,
    0xf9, 0xfa)

  /** Canonical Huffman ENCODE table: code/size per symbol value. */
  private final class HuffEnc(bits: Array[Int], vals: Array[Int]) {
    val sizes = new Array[Int](256)
    val codes = new Array[Int](256)
    locally {
      var code = 0; var k = 0
      var l = 1
      while (l <= 16) {
        var i = 0
        while (i < bits(l - 1)) {
          sizes(vals(k)) = l; codes(vals(k)) = code
          code += 1; k += 1; i += 1
        }
        code <<= 1; l += 1
      }
    }
  }

  /** Canonical Huffman DECODE table (T.81 F.2.2.3 mincode/maxcode/valptr). */
  private final class HuffDec(bits: Array[Int], vals: Array[Int]) {
    val minCode = new Array[Int](17)
    val maxCode = new Array[Int](17)
    val valPtr = new Array[Int](17)
    val values: Array[Int] = vals
    locally {
      var code = 0; var k = 0
      var l = 1
      while (l <= 16) {
        if (bits(l - 1) == 0) { maxCode(l) = -1 }
        else {
          valPtr(l) = k; minCode(l) = code
          k += bits(l - 1); code += bits(l - 1)
          maxCode(l) = code - 1
        }
        code <<= 1; l += 1
      }
    }
  }

  private val DcEnc = new HuffEnc(DcBits, DcVals)
  private val AcEnc = new HuffEnc(AcBits, AcVals)
  private val DcDec = new HuffDec(DcBits, DcVals)
  private val AcDec = new HuffDec(AcBits, AcVals)

  // 8×8 DCT basis: cosTab(u)(x) = cos((2x+1)uπ/16), scale Cu = 1/√2 for u=0
  private val CosTab: Array[Array[Double]] =
    Array.tabulate(8, 8)((u, x) => math.cos((2 * x + 1) * u * math.Pi / 16.0))
  private val C: Array[Double] =
    Array.tabulate(8)(u => if (u == 0) 1.0 / math.sqrt(2.0) else 1.0)

  /** Forward DCT-II + uniform quantization of one level-shifted 8×8 block
    * (`in` holds f(x,y) − 128). Output in natural (row-major) order.
    * SEPARABLE row-column form (1024 multiplies, not 4096) — the media
    * family's measured hot spot; the matching [[idctDequantWith]] is
    * separable too, so every encoder/decoder pair stays arithmetically
    * self-consistent (the recon_exact contract compares outputs of the
    * SAME transform code on both sides). */
  private[functions] def fdctQuant(in: Array[Double], out: Array[Int]): Unit = {
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
    u = 0
    while (u < 8) {
      var v = 0
      while (v < 8) {
        var acc = 0.0
        var x = 0
        while (x < 8) { acc += tmp(u * 8 + x) * CosTab(v)(x); x += 1 }
        out(u * 8 + v) = math.round(0.25 * C(u) * C(v) * acc / Q).toInt
        v += 1
      }
      u += 1
    }
  }

  /** MSB-first bit writer with JFIF 0xFF byte stuffing. */
  private final class BitWriter(bos: java.io.ByteArrayOutputStream) {
    private var acc = 0; private var n = 0
    def put(code: Int, size: Int): Unit = {
      var i = size - 1
      while (i >= 0) {
        acc = (acc << 1) | ((code >>> i) & 1); n += 1
        if (n == 8) {
          bos.write(acc)
          if (acc == 0xff) bos.write(0x00)
          acc = 0; n = 0
        }
        i -= 1
      }
    }
    def flush(): Unit = if (n > 0) { // pad with 1s per T.81
      acc = (acc << (8 - n)) | ((1 << (8 - n)) - 1)
      bos.write(acc)
      if (acc == 0xff) bos.write(0x00)
      acc = 0; n = 0
    }
  }

  /** MSB-first bit reader with unstuffing; `fail` latches on marker or
    * exhaustion and every read thereafter returns 0. */
  private final class BitReader(b: Array[Byte], var p: Int) {
    private var acc = 0; private var n = 0
    var fail = false
    def bit(): Int = {
      if (n == 0) {
        if (p >= b.length) { fail = true; return 0 }
        var by = b(p) & 0xff; p += 1
        if (by == 0xff) {
          if (p >= b.length) { fail = true; return 0 }
          val m = b(p) & 0xff
          if (m == 0x00) p += 1
          else { fail = true; return 0 } // a real marker ends the scan
          by = 0xff
        }
        acc = by; n = 8
      }
      n -= 1
      (acc >>> n) & 1
    }
    def bits(k: Int): Int = {
      var v = 0; var i = 0
      while (i < k) { v = (v << 1) | bit(); i += 1 }
      v
    }
    def decode(t: HuffDec): Int = {
      var code = bit()
      var l = 1
      while (l <= 16) {
        if (t.maxCode(l) >= 0 && code <= t.maxCode(l))
          return t.values(t.valPtr(l) + code - t.minCode(l))
        code = (code << 1) | bit()
        l += 1
      }
      fail = true; 0
    }
  }

  private def extend(raw: Int, size: Int): Int =
    if (size == 0) 0
    else if (raw < (1 << (size - 1))) raw - (1 << size) + 1
    else raw

  private def magSize(v: Int): Int = {
    var a = math.abs(v); var s = 0
    while (a != 0) { a >>= 1; s += 1 }
    s
  }

  private[functions] def be16(out: java.io.ByteArrayOutputStream, v: Int): Unit = {
    out.write((v >>> 8) & 0xff); out.write(v & 0xff)
  }

  /** Encode 8-bit pixels (row-major, `width*height*channels`, channels 1
    * or 3 as RGB) as a baseline JFIF JPEG: DQT (uniform [[Q]]), SOF0,
    * DHT (Annex-K tables), SOS, entropy-coded 4:4:4 MCUs with edge-
    * replicated padding. Null on invalid dims / channels / buffer. */
  def jpegEncodePixels(width: Int, height: Int, channels: Int,
                       pixels: Array[Byte]): Array[Byte] = {
    if (width <= 0 || height <= 0 || width > 0xffff || height > 0xffff) return null
    if (channels != 1 && channels != 3) return null
    // the codec's pixel budget, mirrored on BOTH sides so encode→decode
    // stays closed: the decoder rejects padded sample counts past 1<<25
    // (untrusted-dims guard), so the encoder must not emit streams its
    // own decoder would refuse
    if ((width.toLong + 7) / 8 * 8 * ((height.toLong + 7) / 8 * 8) * channels > (1 << 25))
      return null
    if (pixels == null || pixels.length.toLong != width.toLong * height * channels)
      return null
    // color convert to per-component planes (Y or Y/Cb/Cr)
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
    // SOI, APP0/JFIF
    bos.write(0xff); bos.write(0xd8)
    bos.write(0xff); bos.write(0xe0); be16(bos, 16)
    bos.write('J'); bos.write('F'); bos.write('I'); bos.write('F'); bos.write(0)
    bos.write(1); bos.write(1); bos.write(0); be16(bos, 1); be16(bos, 1)
    bos.write(0); bos.write(0)
    // DQT: table 0, zigzag order, uniform Q
    bos.write(0xff); bos.write(0xdb); be16(bos, 67); bos.write(0x00)
    i = 0; while (i < 64) { bos.write(Q); i += 1 }
    // SOF0
    bos.write(0xff); bos.write(0xc0); be16(bos, 8 + 3 * nc)
    bos.write(8); be16(bos, height); be16(bos, width); bos.write(nc)
    var c = 0
    while (c < nc) { bos.write(c + 1); bos.write(0x11); bos.write(0); c += 1 }
    // DHT: DC table 0 then AC table 0
    val dhtLen = 2 + (1 + 16 + DcVals.length) + (1 + 16 + AcVals.length)
    bos.write(0xff); bos.write(0xc4); be16(bos, dhtLen)
    bos.write(0x00); DcBits.foreach(bos.write); DcVals.foreach(bos.write)
    bos.write(0x10); AcBits.foreach(bos.write); AcVals.foreach(bos.write)
    // SOS
    bos.write(0xff); bos.write(0xda); be16(bos, 6 + 2 * nc); bos.write(nc)
    c = 0
    while (c < nc) { bos.write(c + 1); bos.write(0x00); c += 1 }
    bos.write(0); bos.write(63); bos.write(0)
    // entropy-coded data
    val bw = new BitWriter(bos)
    val mcuW = (width + 7) / 8; val mcuH = (height + 7) / 8
    val block = new Array[Double](64)
    val coef = new Array[Int](64)
    val dcPred = new Array[Int](nc)
    var my = 0
    while (my < mcuH) {
      var mx = 0
      while (mx < mcuW) {
        c = 0
        while (c < nc) {
          // load level-shifted block with edge replication
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
          // DC
          val diff = coef(0) - dcPred(c); dcPred(c) = coef(0)
          val ds = magSize(diff)
          bw.put(DcEnc.codes(ds), DcEnc.sizes(ds))
          if (ds > 0)
            bw.put(if (diff < 0) diff + (1 << ds) - 1 else diff, ds)
          // AC in zigzag with run-lengths
          var run = 0
          var k = 1
          while (k < 64) {
            val v = coef(Zig(k))
            if (v == 0) run += 1
            else {
              while (run > 15) { bw.put(AcEnc.codes(0xf0), AcEnc.sizes(0xf0)); run -= 16 }
              val s = magSize(v)
              val sym = (run << 4) | s
              bw.put(AcEnc.codes(sym), AcEnc.sizes(sym))
              bw.put(if (v < 0) v + (1 << s) - 1 else v, s)
              run = 0
            }
            k += 1
          }
          if (run > 0) bw.put(AcEnc.codes(0x00), AcEnc.sizes(0x00)) // EOB
          c += 1
        }
        mx += 1
      }
      my += 1
    }
    bw.flush()
    bos.write(0xff); bos.write(0xd9) // EOI
    bos.toByteArray
  }

  /** Encode as a PROGRESSIVE JFIF JPEG (SOF2) carrying the exact same
    * quantized coefficients as [[jpegEncodePixels]] would, re-ordered
    * into 8 scans that exercise every Annex-G decode path: DC first at
    * Al=1 (interleaved), per-component AC first passes over two spectral
    * bands (1–5, 6–63) at Al=1, then DC refinement and per-component AC
    * refinement scans down to Al=0. Because successive approximation
    * transmits exactly the dropped bit per refinement, the decoded
    * coefficients — and therefore the pixels — are BIT-IDENTICAL to the
    * sequential stream's: `jpegDecodeRaw(progressive) ==
    * jpegDecodeRaw(sequential)` byte-for-byte, which is the oracle the
    * spec and registered query hold. Annex-K tables are reused; the
    * refinement emitter therefore only uses EOB0 (the table carries no
    * EOBn runs) — valid, marginally less compressed. */
  def jpegEncodeProgressivePixels(width: Int, height: Int, channels: Int,
                                  pixels: Array[Byte]): Array[Byte] = {
    if (width <= 0 || height <= 0 || width > 0xffff || height > 0xffff) return null
    if (channels != 1 && channels != 3) return null
    // same both-sides pixel budget as [[jpegEncodePixels]]
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
    // all quantized coefficients up front (the sequential encoder's exact
    // math), per component in block raster order, natural order in-block
    val mcuW = (width + 7) / 8; val mcuH = (height + 7) / 8
    val nBlocks = mcuW * mcuH
    val coefs = Array.fill(nc)(new Array[Int](nBlocks * 64))
    val blk = new Array[Double](64)
    val out64 = new Array[Int](64)
    var my = 0
    while (my < mcuH) {
      var mx = 0
      while (mx < mcuW) {
        var c = 0
        while (c < nc) {
          var y = 0
          while (y < 8) {
            val sy = math.min(my * 8 + y, height - 1)
            var x = 0
            while (x < 8) {
              val sx = math.min(mx * 8 + x, width - 1)
              blk(y * 8 + x) = planes(c)(sy * width + sx) - 128.0
              x += 1
            }
            y += 1
          }
          fdctQuant(blk, out64)
          System.arraycopy(out64, 0, coefs(c), (my * mcuW + mx) * 64, 64)
          c += 1
        }
        mx += 1
      }
      my += 1
    }
    val bos = new java.io.ByteArrayOutputStream(width * height / 2 + 2048)
    bos.write(0xff); bos.write(0xd8)
    bos.write(0xff); bos.write(0xe0); be16(bos, 16)
    bos.write('J'); bos.write('F'); bos.write('I'); bos.write('F'); bos.write(0)
    bos.write(1); bos.write(1); bos.write(0); be16(bos, 1); be16(bos, 1)
    bos.write(0); bos.write(0)
    bos.write(0xff); bos.write(0xdb); be16(bos, 67); bos.write(0x00)
    i = 0; while (i < 64) { bos.write(Q); i += 1 }
    bos.write(0xff); bos.write(0xc2); be16(bos, 8 + 3 * nc) // SOF2
    bos.write(8); be16(bos, height); be16(bos, width); bos.write(nc)
    var c = 0
    while (c < nc) { bos.write(c + 1); bos.write(0x11); bos.write(0); c += 1 }
    val dhtLen = 2 + (1 + 16 + DcVals.length) + (1 + 16 + AcVals.length)
    bos.write(0xff); bos.write(0xc4); be16(bos, dhtLen)
    bos.write(0x00); DcBits.foreach(bos.write); DcVals.foreach(bos.write)
    bos.write(0x10); AcBits.foreach(bos.write); AcVals.foreach(bos.write)

    def sosHeader(comps: Seq[Int], ss: Int, se: Int, ah: Int, al: Int): Unit = {
      bos.write(0xff); bos.write(0xda); be16(bos, 6 + 2 * comps.length)
      bos.write(comps.length)
      comps.foreach { ci =>
        bos.write(ci + 1)
        bos.write(0x00) // DC table 0, AC table 0
      }
      bos.write(ss); bos.write(se); bos.write((ah << 4) | al)
    }

    // Scan 1: DC first, all components interleaved, Al = 1 (arithmetic
    // shift — (v>>1)<<1 | (v&1) == v in two's complement, so the later
    // refinement restores the value exactly)
    sosHeader(0 until nc, 0, 0, 0, 1)
    locally {
      val bw = new BitWriter(bos)
      val pred = new Array[Int](nc)
      var bi = 0
      while (bi < nBlocks) {
        var ci = 0
        while (ci < nc) {
          val v = coefs(ci)(bi * 64) >> 1
          val diff = v - pred(ci); pred(ci) = v
          val ds = magSize(diff)
          bw.put(DcEnc.codes(ds), DcEnc.sizes(ds))
          if (ds > 0)
            bw.put(if (diff < 0) diff + (1 << ds) - 1 else diff, ds)
          ci += 1
        }
        bi += 1
      }
      bw.flush()
    }
    // Scans 2..: AC first passes, two spectral bands per component, Al = 1
    def acFirst(ci: Int, ss: Int, se: Int, al: Int): Unit = {
      sosHeader(Seq(ci), ss, se, 0, al)
      val bw = new BitWriter(bos)
      val cf = coefs(ci)
      var bi = 0
      while (bi < nBlocks) {
        val base = bi * 64
        var run = 0
        var k = ss
        while (k <= se) {
          val v = cf(base + Zig(k))
          val t = if (v >= 0) v >> al else -((-v) >> al)
          if (t == 0) run += 1
          else {
            while (run > 15) { bw.put(AcEnc.codes(0xf0), AcEnc.sizes(0xf0)); run -= 16 }
            val s = magSize(t)
            bw.put(AcEnc.codes((run << 4) | s), AcEnc.sizes((run << 4) | s))
            bw.put(if (t < 0) t + (1 << s) - 1 else t, s)
            run = 0
          }
          k += 1
        }
        if (run > 0) bw.put(AcEnc.codes(0x00), AcEnc.sizes(0x00)) // EOB0
        bi += 1
      }
      bw.flush()
    }
    c = 0
    while (c < nc) { acFirst(c, 1, 5, 1); acFirst(c, 6, 63, 1); c += 1 }
    // DC refinement: bit 0 of every DC coefficient, interleaved
    sosHeader(0 until nc, 0, 0, 1, 0)
    locally {
      val bw = new BitWriter(bos)
      var bi = 0
      while (bi < nBlocks) {
        var ci = 0
        while (ci < nc) { bw.put(coefs(ci)(bi * 64) & 1, 1); ci += 1 }
        bi += 1
      }
      bw.flush()
    }
    // AC refinement (G.1.2.3 encoder): r counts zero-history positions,
    // correction bits for already-nonzero positions buffer until the next
    // emitted symbol (the decoder reads them during that symbol's walk),
    // ZRLs are checked at EVERY nonzero position so the buffer never
    // holds a bit beyond the 16-zero boundary an emitted ZRL covers.
    def acRefine(ci: Int, ss: Int, se: Int, al: Int): Unit = {
      sosHeader(Seq(ci), ss, se, al + 1, al)
      val bw = new BitWriter(bos)
      val cf = coefs(ci)
      val br = new Array[Int](64)
      var bi = 0
      while (bi < nBlocks) {
        val base = bi * 64
        var r = 0
        var nBr = 0
        var k = ss
        while (k <= se) {
          val v = cf(base + Zig(k))
          val t = math.abs(v) >> al // magnitude at THIS precision
          if (t == 0) r += 1
          else {
            while (r > 15) {
              bw.put(AcEnc.codes(0xf0), AcEnc.sizes(0xf0))
              r -= 16
              var j = 0
              while (j < nBr) { bw.put(br(j), 1); j += 1 }
              nBr = 0
            }
            if ((t >> 1) != 0) { // nonzero at the previous precision
              br(nBr) = t & 1; nBr += 1
            } else { // newly nonzero: magnitude is exactly 1 at this Al
              bw.put(AcEnc.codes((r << 4) | 1), AcEnc.sizes((r << 4) | 1))
              bw.put(if (v < 0) 0 else 1, 1)
              var j = 0
              while (j < nBr) { bw.put(br(j), 1); j += 1 }
              nBr = 0
              r = 0
            }
          }
          k += 1
        }
        if (r > 0 || nBr > 0) {
          bw.put(AcEnc.codes(0x00), AcEnc.sizes(0x00)) // EOB0
          var j = 0
          while (j < nBr) { bw.put(br(j), 1); j += 1 }
        }
        bi += 1
      }
      bw.flush()
    }
    c = 0
    while (c < nc) { acRefine(c, 1, 5, 0); acRefine(c, 6, 63, 0); c += 1 }
    bos.write(0xff); bos.write(0xd9)
    bos.toByteArray
  }

  /** Decoded baseline JPEG, same holder shape as
    * [[MediaKernels.PngImage]]. */
  final class JpegImage(val width: Int, val height: Int, val channels: Int,
                        val pixels: Array[Byte])

  /** Decode a baseline JFIF JPEG of the shape [[jpegEncodePixels]] emits
    * (baseline sequential, 8-bit, 4:4:4 or grayscale, no restart
    * intervals, one quant + one DC + one AC table): marker walk, DQT/DHT
    * parse with canonical table reconstruction, Huffman entropy decode
    * with DC prediction and EOB/ZRL, dequant, IDCT, color convert, crop.
    * Null on anything malformed or outside that shape — never throws. */
  def jpegDecodeRaw(b: Array[Byte]): JpegImage = {
    if (b == null || b.length < 4) return null
    if ((b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8) return null
    var p = 2
    var width = 0; var height = 0; var nc = 0
    var quant: Array[Int] = null
    var dcDec: HuffDec = null
    var acDec: HuffDec = null
    var sosAt = -1
    while (sosAt < 0) {
      if (p + 4 > b.length) return null
      if ((b(p) & 0xff) != 0xff) return null
      // T.81 B.1.1.2: any run of 0xFF fill bytes may pad before the
      // marker code — the code is the first non-0xFF after the run
      while (p + 2 <= b.length && (b(p + 1) & 0xff) == 0xff) p += 1
      if (p + 4 > b.length) return null
      val marker = b(p + 1) & 0xff
      val len = ((b(p + 2) & 0xff) << 8) | (b(p + 3) & 0xff)
      if (p + 2 + len > b.length) return null
      marker match {
        case 0xdb => // DQT (one 8-bit table supported)
          if (len < 67 || (b(p + 4) & 0xf0) != 0) return null
          quant = new Array[Int](64)
          var i = 0
          while (i < 64) { quant(i) = b(p + 5 + i) & 0xff; i += 1 }
        case 0xc0 => // SOF0
          if (len < 8) return null
          if ((b(p + 4) & 0xff) != 8) return null
          height = ((b(p + 5) & 0xff) << 8) | (b(p + 6) & 0xff)
          width = ((b(p + 7) & 0xff) << 8) | (b(p + 8) & 0xff)
          nc = b(p + 9) & 0xff
          if (width <= 0 || height <= 0 || (nc != 1 && nc != 3)) return null
          // Cap declared dims before any allocation sized from them: a
          // crafted SOF0 can declare up to 65535×65535, and the MCU-padded
          // plane size (mcuW*8*mcuH*8) would overflow Int — or, just under
          // the wrap point, demand multi-GB buffers. Budget is the encode
          // side's 1<<24-pixel limit with 2× headroom so MCU padding never
          // rejects a stream whose RAW pixel count was within budget;
          // untrusted input past it is rejected, never thrown on.
          if ((width.toLong + 7) / 8 * 8 * ((height.toLong + 7) / 8 * 8) * nc > (1 << 25))
            return null
          if (len < 8 + 3 * nc) return null
          var c = 0
          while (c < nc) {
            if ((b(p + 11 + 3 * c) & 0xff) != 0x11) return null // 4:4:4 only
            c += 1
          }
        case 0xc4 => // DHT (possibly several tables in one segment)
          var q = p + 4
          val end = p + 2 + len
          while (q < end) {
            val tc = (b(q) & 0xf0) >> 4
            val th = b(q) & 0x0f
            if (th != 0 || q + 17 > end) return null
            val bits = new Array[Int](16)
            var total = 0
            var i = 0
            while (i < 16) { bits(i) = b(q + 1 + i) & 0xff; total += bits(i); i += 1 }
            if (q + 17 + total > end) return null
            val vals = new Array[Int](total)
            i = 0
            while (i < total) { vals(i) = b(q + 17 + i) & 0xff; i += 1 }
            val t = new HuffDec(bits, vals)
            if (tc == 0) dcDec = t else acDec = t
            q += 17 + total
          }
        case 0xda => // SOS
          if (nc == 0 || quant == null || dcDec == null || acDec == null) return null
          sosAt = p + 2 + len
        case 0xc2 => // progressive DCT: the Annex-G decoder takes over
          return jpegDecodeProgressive(b)
        case 0xc9 => // arithmetic sequential: the Annex-E decoder takes over
          return JpegArith.jpegDecodeArith(b)
        case 0xc1 | 0xc3 | 0xc5 | 0xc6 | 0xc7 | 0xca | 0xcb |
             0xcd | 0xce | 0xcf =>
          return null // other frame types (arith-progressive, lossless) unsupported
        case _ => () // APPn / COM / others: skip
      }
      p += 2 + len
    }
    val br = new BitReader(b, sosAt)
    val mcuW = (width + 7) / 8; val mcuH = (height + 7) / 8
    val planes = Array.ofDim[Double](nc, mcuW * 8 * mcuH * 8)
    val coef = new Array[Int](64)
    val block = new Array[Double](64)
    val dcPred = new Array[Int](nc)
    val stride = mcuW * 8
    var my = 0
    while (my < mcuH) {
      var mx = 0
      while (mx < mcuW) {
        var c = 0
        while (c < nc) {
          java.util.Arrays.fill(coef, 0)
          val ds = br.decode(dcDec)
          if (ds > 11 || br.fail) return null
          dcPred(c) += extend(br.bits(ds), ds)
          coef(0) = dcPred(c)
          var k = 1
          var eob = false
          while (k < 64 && !eob) {
            val sym = br.decode(acDec)
            if (br.fail) return null
            val run = sym >> 4; val s = sym & 0x0f
            if (s == 0) {
              if (sym == 0x00) eob = true
              else if (sym == 0xf0) k += 16
              else return null
            } else {
              k += run
              if (k > 63) return null
              coef(Zig(k)) = extend(br.bits(s), s)
              k += 1
            }
          }
          if (br.fail) return null
          idctDequantWith(coef, quant, block)
          var y = 0
          while (y < 8) {
            var x = 0
            while (x < 8) {
              planes(c)((my * 8 + y) * stride + mx * 8 + x) = block(y * 8 + x) + 128.0
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
    // color convert + crop
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
    new JpegImage(width, height, nc, out)
  }

  /** IDCT with the stream's own quant table (zigzag order) — separable
    * row-column form, see [[fdctQuant]]. */
  private[functions] def idctDequantWith(coefNat: Array[Int], quantZig: Array[Int],
                              out: Array[Double]): Unit = {
    val dq = new Array[Double](64)
    var z = 0
    while (z < 64) { dq(Zig(z)) = coefNat(Zig(z)).toDouble * quantZig(z); z += 1 }
    val tmp = new Array[Double](64) // tmp(y*8+v) = Σ_u Cu·dq(u,v)·cos_u(y)
    var y = 0
    while (y < 8) {
      var v = 0
      while (v < 8) {
        var acc = 0.0
        var u = 0
        while (u < 8) { acc += C(u) * dq(u * 8 + v) * CosTab(u)(y); u += 1 }
        tmp(y * 8 + v) = acc
        v += 1
      }
      y += 1
    }
    y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        var acc = 0.0
        var v = 0
        while (v < 8) { acc += C(v) * tmp(y * 8 + v) * CosTab(v)(x); v += 1 }
        out(y * 8 + x) = 0.25 * acc
        x += 1
      }
      y += 1
    }
  }

  // -------------------------------------------------------------------
  // Progressive DCT (ITU T.81 Annex G, Huffman coding)
  // -------------------------------------------------------------------
  // A progressive frame transmits the SAME quantized coefficients as a
  // sequential one, re-ordered across multiple scans: spectral selection
  // (each AC scan carries one Ss..Se zigzag band of one component) and
  // successive approximation (Ah/Al bit-plane refinement — a first pass
  // at reduced precision, then one correction bit per coefficient per
  // later scan). Because the re-ordering is LOSSLESS, a progressive
  // stream of the same coefficients decodes to BIT-IDENTICAL pixels as
  // the sequential stream — the oracle the spec and registered query
  // hold the codec to. Decoding accumulates coefficients per block
  // across scans (DC first/refine, AC first with EOB-run coding, AC
  // refinement with interleaved correction bits per G.1.2.3) and runs
  // dequant + IDCT once, after the marker walk ends.
  //
  // Supported shape mirrors the baseline decoder: 8-bit, 4:4:4 or
  // grayscale, up to 4 quant/Huffman tables (progressive scans select
  // tables per scan), no restart intervals, no arithmetic coding. Same
  // defensive contract: null on anything malformed, never throw.

  /** One progressive scan's entropy data: decodes from `start` into
    * `coefs` (per component, blocks×64, natural order within a block),
    * returns the offset of the next marker's 0xFF, or −1 on any
    * malformation. `comps` holds component INDICES in scan order. */
  private def decodeProgScan(b: Array[Byte], start: Int,
                             coefs: Array[Array[Int]], nBlocks: Int,
                             comps: Array[Int], dcSel: Array[Int],
                             acSel: Array[Int], dcTabs: Array[HuffDec],
                             acTabs: Array[HuffDec], ss: Int, se: Int,
                             ah: Int, al: Int, nc: Int): Int = {
    val br = new BitReader(b, start)
    val ns = comps.length
    var eobrun = 0
    if (ss == 0) {
      if (se != 0) return -1 // DC scans carry only coefficient 0
      val dcPred = new Array[Int](nc)
      var bi = 0
      while (bi < nBlocks) {
        var ci = 0
        while (ci < ns) {
          val c = comps(ci)
          val base = bi * 64
          if (ah == 0) {
            val t = dcTabs(dcSel(ci)); if (t == null) return -1
            val dsz = br.decode(t)
            if (dsz > 11 || br.fail) return -1
            dcPred(c) += extend(br.bits(dsz), dsz)
            if (br.fail) return -1
            coefs(c)(base) = dcPred(c) << al
          } else {
            // refinement: one bit per block; OR-ing bit Al is exact for
            // the arithmetic-shift DC point transform in two's complement
            if (br.bit() == 1) coefs(c)(base) |= (1 << al)
            if (br.fail) return -1
          }
          ci += 1
        }
        bi += 1
      }
    } else {
      if (ns != 1) return -1 // T.81: progressive AC scans are single-component
      val c = comps(0)
      val t = acTabs(acSel(0)); if (t == null) return -1
      val cf = coefs(c)
      val p1 = 1 << al
      var bi = 0
      while (bi < nBlocks) {
        val base = bi * 64
        if (ah == 0) {
          // FIRST pass for this band/bit-plane (G.1.2.2)
          if (eobrun > 0) eobrun -= 1
          else {
            var k = ss
            var ended = false
            while (k <= se && !ended) {
              val sym = br.decode(t)
              if (br.fail) return -1
              val r = sym >> 4; val s = sym & 15
              if (s == 0) {
                if (r < 15) {
                  eobrun = (1 << r) - 1
                  if (r > 0) { eobrun += br.bits(r); if (br.fail) return -1 }
                  ended = true
                } else k += 16 // ZRL
              } else {
                k += r
                if (k > se) return -1
                val mag = br.bits(s)
                if (br.fail) return -1
                cf(base + Zig(k)) = extend(mag, s) << al
                k += 1
              }
            }
          }
        } else {
          // REFINEMENT pass (G.1.2.3): each Huffman symbol's "skip" walks
          // the band consuming one correction bit per already-nonzero
          // coefficient passed; r counts only zero-history positions.
          var k = ss
          if (eobrun > 0) {
            while (k <= se) {
              val idx = base + Zig(k)
              if (cf(idx) != 0) {
                if (br.bit() == 1 && (cf(idx) & p1) == 0) {
                  if (cf(idx) >= 0) cf(idx) += p1 else cf(idx) -= p1
                }
                if (br.fail) return -1
              }
              k += 1
            }
            eobrun -= 1
          } else {
            while (k <= se) {
              val sym = br.decode(t)
              if (br.fail) return -1
              var r = sym >> 4; val s = sym & 15
              var newval = 0
              var isEob = false
              if (s == 0) {
                if (r < 15) {
                  eobrun = 1 << r
                  if (r > 0) { eobrun += br.bits(r); if (br.fail) return -1 }
                  isEob = true
                }
                // r == 15: ZRL — pass 16 zero-history positions
              } else if (s == 1) {
                newval = if (br.bit() == 1) p1 else -p1
                if (br.fail) return -1
              } else return -1 // refinement admits only s ∈ {0, 1}
              if (isEob) {
                // the rest of this block joins the EOB run: correction
                // bits only
                while (k <= se) {
                  val idx = base + Zig(k)
                  if (cf(idx) != 0) {
                    if (br.bit() == 1 && (cf(idx) & p1) == 0) {
                      if (cf(idx) >= 0) cf(idx) += p1 else cf(idx) -= p1
                    }
                    if (br.fail) return -1
                  }
                  k += 1
                }
                eobrun -= 1
              } else {
                var placed = false
                while (k <= se && !placed) {
                  val idx = base + Zig(k)
                  if (cf(idx) != 0) {
                    if (br.bit() == 1 && (cf(idx) & p1) == 0) {
                      if (cf(idx) >= 0) cf(idx) += p1 else cf(idx) -= p1
                    }
                    if (br.fail) return -1
                  } else {
                    if (r == 0) {
                      if (s == 1) cf(idx) = newval
                      placed = true // ZRL's 16th zero / the new coefficient
                    } else r -= 1
                  }
                  k += 1
                }
                if (s == 1 && !placed) return -1 // ran off the band
              }
            }
          }
        }
        bi += 1
      }
    }
    if (br.fail) return -1
    // entropy data ends at the next marker (0xFF followed by a non-stuffing,
    // non-restart byte); restart markers are unsupported (rejected at DRI)
    var q = br.p
    while (q + 1 < b.length &&
      !((b(q) & 0xff) == 0xff && (b(q + 1) & 0xff) != 0x00 &&
        ((b(q + 1) & 0xff) < 0xd0 || (b(q + 1) & 0xff) > 0xd7))) q += 1
    if (q + 1 >= b.length) return -1
    q
  }

  /** Decode a progressive (SOF2) JFIF JPEG: full multi-scan marker walk
    * with per-id quant/Huffman table banks, coefficient accumulation
    * across DC/AC first and refinement scans, then one dequant + IDCT +
    * color convert + crop. Reached via [[jpegDecodeRaw]]'s dispatch, so
    * callers need no format switch. Null, never throw, on anything
    * malformed or outside the supported shape (8-bit, 4:4:4/gray, no
    * restarts, no arithmetic coding). */
  def jpegDecodeProgressive(b: Array[Byte]): JpegImage = {
    if (b == null || b.length < 4) return null
    if ((b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8) return null
    var p = 2
    var width = 0; var height = 0; var nc = 0
    val quantTabs = new Array[Array[Int]](4)
    val dcTabs = new Array[HuffDec](4)
    val acTabs = new Array[HuffDec](4)
    val compQ = new Array[Int](3)
    val compId = new Array[Int](3)
    var coefs: Array[Array[Int]] = null
    var mcuW = 0; var mcuH = 0
    var nScans = 0
    var done = false
    while (!done) {
      if (p + 2 > b.length) return null
      if ((b(p) & 0xff) != 0xff) return null
      // T.81 B.1.1.2 fill bytes, as in the baseline walk
      while (p + 2 <= b.length && (b(p + 1) & 0xff) == 0xff) p += 1
      if (p + 2 > b.length) return null
      val marker = b(p + 1) & 0xff
      if (marker == 0xd9) { done = true } // EOI
      else {
        if (p + 4 > b.length) return null
        val len = ((b(p + 2) & 0xff) << 8) | (b(p + 3) & 0xff)
        if (len < 2 || p + 2 + len > b.length) return null
        var advanced = false
        marker match {
          case 0xdb => // DQT: possibly several 8-bit tables with ids
            var q = p + 4
            val end = p + 2 + len
            while (q < end) {
              if ((b(q) & 0xf0) != 0 || (b(q) & 0x0f) > 3 || q + 65 > end)
                return null
              val tb = new Array[Int](64)
              var i = 0
              while (i < 64) { tb(i) = b(q + 1 + i) & 0xff; i += 1 }
              quantTabs(b(q) & 0x0f) = tb
              q += 65
            }
          case 0xc2 => // SOF2
            if (coefs != null || len < 8) return null
            if ((b(p + 4) & 0xff) != 8) return null
            height = ((b(p + 5) & 0xff) << 8) | (b(p + 6) & 0xff)
            width = ((b(p + 7) & 0xff) << 8) | (b(p + 8) & 0xff)
            nc = b(p + 9) & 0xff
            if (width <= 0 || height <= 0 || (nc != 1 && nc != 3)) return null
            // same untrusted-dims budget as the baseline decoder; the
            // coefficient bank is 4 B/coefficient, within the same class
            if ((width.toLong + 7) / 8 * 8 * ((height.toLong + 7) / 8 * 8) * nc > (1 << 25))
              return null
            if (len < 8 + 3 * nc) return null
            var c = 0
            while (c < nc) {
              compId(c) = b(p + 10 + 3 * c) & 0xff
              if ((b(p + 11 + 3 * c) & 0xff) != 0x11) return null // 4:4:4 only
              val tq = b(p + 12 + 3 * c) & 0xff
              if (tq > 3) return null
              compQ(c) = tq
              c += 1
            }
            mcuW = (width + 7) / 8; mcuH = (height + 7) / 8
            coefs = Array.fill(nc)(new Array[Int](mcuW * mcuH * 64))
          case 0xc4 => // DHT: several tables, ids 0..3 per class
            var q = p + 4
            val end = p + 2 + len
            while (q < end) {
              val tc = (b(q) & 0xf0) >> 4
              val th = b(q) & 0x0f
              if (tc > 1 || th > 3 || q + 17 > end) return null
              val bits = new Array[Int](16)
              var total = 0
              var i = 0
              while (i < 16) { bits(i) = b(q + 1 + i) & 0xff; total += bits(i); i += 1 }
              if (q + 17 + total > end) return null
              val vals = new Array[Int](total)
              i = 0
              while (i < total) { vals(i) = b(q + 17 + i) & 0xff; i += 1 }
              val t = new HuffDec(bits, vals)
              if (tc == 0) dcTabs(th) = t else acTabs(th) = t
              q += 17 + total
            }
          case 0xdd => // DRI: restart intervals unsupported
            if (len != 4) return null
            if ((((b(p + 4) & 0xff) << 8) | (b(p + 5) & 0xff)) != 0) return null
          case 0xda => // SOS: decode one scan's entropy data
            if (coefs == null) return null
            val ns = b(p + 4) & 0xff
            if (ns < 1 || ns > nc || len < 6 + 2 * ns) return null
            val comps = new Array[Int](ns)
            val dcSel = new Array[Int](ns)
            val acSel = new Array[Int](ns)
            var i = 0
            while (i < ns) {
              val cid = b(p + 5 + 2 * i) & 0xff
              var ci = -1
              var j = 0
              while (j < nc) { if (compId(j) == cid) ci = j; j += 1 }
              if (ci < 0) return null
              comps(i) = ci
              dcSel(i) = (b(p + 6 + 2 * i) & 0xf0) >> 4
              acSel(i) = b(p + 6 + 2 * i) & 0x0f
              if (dcSel(i) > 3 || acSel(i) > 3) return null
              i += 1
            }
            val ss = b(p + 5 + 2 * ns) & 0xff
            val se = b(p + 6 + 2 * ns) & 0xff
            val ah = (b(p + 7 + 2 * ns) & 0xf0) >> 4
            val al = b(p + 7 + 2 * ns) & 0x0f
            if (ss > 63 || se > 63 || se < ss || ah > 13 || al > 13) return null
            if (ah != 0 && ah != al + 1) return null // successive approx. steps by 1
            val next = decodeProgScan(b, p + 2 + len, coefs, mcuW * mcuH,
              comps, dcSel, acSel, dcTabs, acTabs, ss, se, ah, al, nc)
            if (next < 0) return null
            nScans += 1
            p = next
            advanced = true
          case 0xc0 | 0xc1 | 0xc3 | 0xc5 | 0xc6 | 0xc7 | 0xc9 | 0xca |
               0xcb | 0xcd | 0xce | 0xcf =>
            return null // a second frame header is malformed here
          case _ => () // APPn / COM: skip
        }
        if (!advanced) p += 2 + len
      }
    }
    if (coefs == null || nScans == 0) return null
    var c0 = 0
    while (c0 < nc) { if (quantTabs(compQ(c0)) == null) return null; c0 += 1 }
    // dequant + IDCT every block, then the baseline color convert + crop
    val planes = Array.ofDim[Double](nc, mcuW * 8 * mcuH * 8)
    val block = new Array[Double](64)
    val blockCoef = new Array[Int](64)
    val stride = mcuW * 8
    var c = 0
    while (c < nc) {
      val quant = quantTabs(compQ(c))
      var my = 0
      while (my < mcuH) {
        var mx = 0
        while (mx < mcuW) {
          val base = (my * mcuW + mx) * 64
          System.arraycopy(coefs(c), base, blockCoef, 0, 64)
          idctDequantWith(blockCoef, quant, block)
          var y = 0
          while (y < 8) {
            var x = 0
            while (x < 8) {
              planes(c)((my * 8 + y) * stride + mx * 8 + x) = block(y * 8 + x) + 128.0
              x += 1
            }
            y += 1
          }
          mx += 1
        }
        my += 1
      }
      c += 1
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
    new JpegImage(width, height, nc, out)
  }

  /** Synthesize → encode → decode → certify, the self-certification
    * kernel behind the registered query (JPEG is lossy, so the contract
    * is dims + error bound + truncation rejection, not bit equality):
    * `struct<width,height,channels,max_err,trunc_rejected>` where
    * max_err is max |decoded − original| over all samples and
    * trunc_rejected attests that decoding the first half of the stream
    * returns null instead of fabricating pixels. Null if encode or
    * decode fails outright. */
  def jpegRoundTripStats(seed: Long, width: Int, height: Int,
                         channels: Int): InternalRow = {
    if (width <= 0 || height <= 0 ||
        width.toLong * height * channels > (1 << 24)) return null
    val px = MediaKernels.synthPixels(seed, width * height * channels)
    val enc = jpegEncodePixels(width, height, channels, px)
    if (enc == null) return null
    val dec = jpegDecodeRaw(enc)
    if (dec == null || dec.width != width || dec.height != height ||
        dec.channels != channels) return null
    var maxErr = 0
    var i = 0
    while (i < px.length) {
      val e = math.abs((dec.pixels(i) & 0xff) - (px(i) & 0xff))
      if (e > maxErr) maxErr = e
      i += 1
    }
    val truncated = java.util.Arrays.copyOf(enc, enc.length / 2)
    val r = new GenericInternalRow(5)
    r.setInt(0, dec.width); r.setInt(1, dec.height); r.setInt(2, dec.channels)
    r.setInt(3, maxErr)
    r.setBoolean(4, jpegDecodeRaw(truncated) == null)
    r
  }

  /** Progressive self-certification: synthesize pixels, encode them BOTH
    * ways (sequential baseline and the 8-scan progressive stream), decode
    * both through the dispatching [[jpegDecodeRaw]], and certify what
    * Annex G promises — progressive re-orders the SAME coefficients, so
    * unlike the lossy [[jpegRoundTripStats]] bound this contract is BIT
    * EQUALITY between the two decodes:
    * `struct<width,height,channels,prog_equals_seq,trunc_rejected>`.
    * A wrong EOB-run, a mis-interleaved correction bit, a broken point
    * transform — anything in either the progressive encoder or decoder —
    * lands a differing pixel and flips the boolean. trunc_rejected
    * attests the progressive stream truncated at half returns null. */
  def jpegProgRoundTripStats(seed: Long, width: Int, height: Int,
                             channels: Int): InternalRow = {
    if (width <= 0 || height <= 0 ||
        width.toLong * height * channels > (1 << 24)) return null
    val px = MediaKernels.synthPixels(seed, width * height * channels)
    val seq = jpegEncodePixels(width, height, channels, px)
    val prog = jpegEncodeProgressivePixels(width, height, channels, px)
    if (seq == null || prog == null) return null
    val decSeq = jpegDecodeRaw(seq)
    val decProg = jpegDecodeRaw(prog)
    if (decSeq == null || decProg == null ||
        decProg.width != width || decProg.height != height ||
        decProg.channels != channels) return null
    val r = new GenericInternalRow(5)
    r.setInt(0, decProg.width); r.setInt(1, decProg.height)
    r.setInt(2, decProg.channels)
    r.setBoolean(3, java.util.Arrays.equals(decSeq.pixels, decProg.pixels))
    r.setBoolean(4,
      jpegDecodeRaw(java.util.Arrays.copyOf(prog, prog.length / 2)) == null)
    r
  }
}
