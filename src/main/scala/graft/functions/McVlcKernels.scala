package graft.functions

import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.InternalRow

/** VLC ENTROPY CODING for the motion-compensated transform codec — the
  * bitstream layer ISO/IEC 11172-2 (MPEG-1 Video) Annex B specifies,
  * replacing [[McVideoKernels]]'s self-specified byte coder for the
  * SAME frame plans: macroblock address increments for skip runs
  * (Table B.1), P-picture macroblock types (Table B.2b), motion codes
  * (Table B.4), intra DC size/differential coding (Table B.5a) and
  * run-level DCT coefficient codes with the 6-bit escape (Table B.5b/c)
  * — all published prefix-free Huffman tables, validated prefix-free at
  * class load. Both coders serialize the output of
  * [[McVideoKernels.planFrame]], so their reconstruction chains are
  * bit-identical by construction; the VLC stream is certified SMALLER
  * (`vlc_smaller`) on top of the five byte-codec attestations.
  *
  * Two stream forms carry the coded frames: the self-specified 'GMV1'
  * AVI container (frame-per-chunk, the byte codec's container), and an
  * MPEG-1-video-SHAPED elementary stream ([[mcVlcEncodeEs]], §2.4
  * layering): sequence header (B3), GOP header (B8), picture and
  * slice headers behind byte-aligned 0x000001 start codes, closed by
  * sequence_end (B7) — every header field parse-validated on decode,
  * truncation rejected mid-picture, and the start-code census
  * certifying the payload never emulates a start code.
  *
  * Honest scope: the VLC tables and their grammar (first-coefficient
  * convention, EOB, escape level formats, sign bits, MBA escapes) and
  * the §2.4 header grammar follow the published layout, but THIS
  * coder's macroblock layer runs on the byte codec's 8×8 luma-only
  * "macroblocks" with a fixed quantizer — it exists to entropy-code
  * [[McVideoKernels]]'s plans, not to claim stream conformance. The
  * CONFORMANT 16×16 4:2:0 macroblock layer (Table B.2/B.3 types and
  * coded block patterns, differential motion, the §2.4.4
  * reconstruction arithmetic) is [[Mpeg1Kernels]], which shares these
  * tables and this bit I/O.
  *
  * Frame syntax: byte 0 'I'/'P', then a single MSB-first bitstream:
  *  - I-frame: every 8×8 block in raster order as an INTRA block —
  *    dct_dc_size VLC + differential bits (predictor = previous intra
  *    block's quantized DC, 0 at frame start), then run-level AC codes
  *    (next-coefficient table, sign bit appended), EOB.
  *  - P-frame: coded blocks prefixed by a macroblock address increment
  *    (gap+1 over skipped blocks; escape adds 33); types: '1' MC+coded
  *    (+2 motion codes, + coefficients with the FIRST-coefficient
  *    convention), '01' coded with zero MV, '001' MC only (+2 motion
  *    codes), '00011' intra (DC predictor resets to 0). The LAST block
  *    of a P-frame is never skipped (a skip plan is promoted to
  *    '001' with MV (0,0) — reconstruction-identical), matching the
  *    MPEG rule that a slice cannot end in a skipped macroblock.
  *  - zero padding to the byte boundary; trailing bytes reject.
  * Decoders return null on ANY malformation (unknown prefix, motion
  * vector off canvas, coefficient overrun, address overrun, nonzero
  * padding, trailing bytes), never throw.
  */
object McVlcKernels {

  // ---- bit I/O ----

  private[functions] final class BitWriter {
    private val buf = new java.io.ByteArrayOutputStream(256)
    private var cur = 0
    private var nb = 0
    def putBits(v: Int, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) {
        cur = (cur << 1) | ((v >>> i) & 1)
        nb += 1
        if (nb == 8) { buf.write(cur); cur = 0; nb = 0 }
        i -= 1
      }
    }
    def putCode(c: (Int, Int)): Unit = putBits(c._1, c._2)
    def alignZero(): Unit = if (nb != 0) putBits(0, 8 - nb)
    def toByteArray: Array[Byte] = buf.toByteArray
    def size: Int = buf.size + (if (nb > 0) 1 else 0)
  }

  private[functions] final class BitReader(data: Array[Byte], startByte: Int) {
    private var pos = startByte * 8
    private val end = data.length * 8
    var bad = false
    def bit(): Int =
      if (pos >= end) { bad = true; 0 }
      else {
        val b = (data(pos >>> 3) >> (7 - (pos & 7))) & 1
        pos += 1
        b
      }
    def bits(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v = (v << 1) | bit(); i += 1 }
      v
    }
    def bitPos: Int = pos
    def bitEnd: Int = end
  }

  // ---- VLC tables (codes as "bitstring" literals, parsed once) ----

  private[functions] def parse(s: String): (Int, Int) =
    (java.lang.Integer.parseInt(s, 2), s.length)

  /** Validate a code set is prefix-free (and duplicate-free) — a
    * misremembered table entry must fail at class load, not silently
    * corrupt decode. */
  private[functions] def requirePrefixFree(name: String, codes: Seq[String]): Unit =
    codes.combinations(2).foreach { case Seq(a, b) =>
      require(a != b && !a.startsWith(b) && !b.startsWith(a),
        s"VLC table $name: codes '$a' and '$b' are not prefix-free")
    }

  /** Generic prefix decoder over (value, bitstring) entries. */
  private[functions] final class VlcDecoder(entries: Seq[(Int, String)]) {
    private val map = new java.util.HashMap[Integer, Integer](entries.size * 2)
    private val maxLen = entries.map(_._2.length).max
    entries.foreach { case (v, s) =>
      val (code, len) = parse(s)
      map.put(Integer.valueOf((len << 24) | code), Integer.valueOf(v))
    }
    /** Next symbol, or Int.MinValue with `br.bad` set on an unknown
      * prefix / overrun. */
    def read(br: BitReader): Int = {
      var code = 0
      var len = 0
      while (len < maxLen && !br.bad) {
        code = (code << 1) | br.bit()
        len += 1
        val v = map.get(Integer.valueOf((len << 24) | code))
        if (v != null) return v.intValue
      }
      br.bad = true
      Int.MinValue
    }
  }

  /** Table B.1 — macroblock_address_increment 1..33 + escape (+33). */
  private val MbaEntries: Seq[(Int, String)] = Seq(
    1 -> "1", 2 -> "011", 3 -> "010", 4 -> "0011", 5 -> "0010",
    6 -> "00011", 7 -> "00010", 8 -> "0000111", 9 -> "0000110",
    10 -> "00001011", 11 -> "00001010", 12 -> "00001001",
    13 -> "00001000", 14 -> "00000111", 15 -> "00000110",
    16 -> "0000010111", 17 -> "0000010110", 18 -> "0000010101",
    19 -> "0000010100", 20 -> "0000010011", 21 -> "0000010010",
    22 -> "00000100011", 23 -> "00000100010", 24 -> "00000100001",
    25 -> "00000100000", 26 -> "00000011111", 27 -> "00000011110",
    28 -> "00000011101", 29 -> "00000011100", 30 -> "00000011011",
    31 -> "00000011010", 32 -> "00000011001", 33 -> "00000011000")
  private val MbaEscapeStr = "00000001000"
  private val MbaEscape = 0 // sentinel value in the decoder
  requirePrefixFree("mba", MbaEntries.map(_._2) :+ MbaEscapeStr)
  private[functions] val MbaCodes: Map[Int, (Int, Int)] =
    MbaEntries.map { case (v, s) => v -> parse(s) }.toMap
  private[functions] val MbaEscapeCode = parse(MbaEscapeStr)
  private[functions] val MbaDecoder =
    new VlcDecoder(MbaEntries :+ (MbaEscape -> MbaEscapeStr))

  /** Table B.2b — the P-picture macroblock types this codec emits:
    * 1 = MC+coded, 2 = coded zero-MV, 3 = MC not coded, 4 = intra. */
  private val TypeEntries: Seq[(Int, String)] = Seq(
    1 -> "1", 2 -> "01", 3 -> "001", 4 -> "00011")
  requirePrefixFree("mbtype", TypeEntries.map(_._2))
  private[functions] val TypeCodes: Map[Int, (Int, Int)] =
    TypeEntries.map { case (v, s) => v -> parse(s) }.toMap
  private[functions] val TypeDecoder = new VlcDecoder(TypeEntries)

  /** Table B.4 — motion code magnitudes (sign bit appended when
    * nonzero; 0 = positive). This codec's search range is ±4; the
    * table carries the published codes through 10 (what the
    * differential coding of [[Mpeg1Kernels]] can reach at ±4 search:
    * |code| ≤ 8, plus margin). */
  private val MvEntries: Seq[(Int, String)] = Seq(
    0 -> "1", 1 -> "01", 2 -> "001", 3 -> "0001",
    4 -> "000011", 5 -> "0000101", 6 -> "0000100", 7 -> "0000011",
    8 -> "0000001011", 9 -> "0000001010", 10 -> "0000001001")
  requirePrefixFree("mv",
    MvEntries.flatMap { case (v, s) => if (v == 0) Seq(s) else Seq(s + "0", s + "1") })
  private[functions] val MvCodes: Map[Int, (Int, Int)] =
    MvEntries.map { case (v, s) => v -> parse(s) }.toMap
  private[functions] val MvDecoder = new VlcDecoder(MvEntries)
  private[functions] val MvMax = MvEntries.map(_._1).max

  /** Table B.5a — dct_dc_size_luminance (differential magnitude bit
    * count 0..8, so |DC differential| ≤ 255). */
  private val DcSizeEntries: Seq[(Int, String)] = Seq(
    0 -> "100", 1 -> "00", 2 -> "01", 3 -> "101", 4 -> "110",
    5 -> "1110", 6 -> "11110", 7 -> "111110", 8 -> "1111110")
  requirePrefixFree("dcsize", DcSizeEntries.map(_._2))
  private[functions] val DcSizeCodes: Map[Int, (Int, Int)] =
    DcSizeEntries.map { case (v, s) => v -> parse(s) }.toMap
  private[functions] val DcSizeDecoder = new VlcDecoder(DcSizeEntries)

  /** Table B.5b/c — run-level codes (sign bit appended), EOB, and the
    * 6-bit escape. `(0,1)` at the FIRST coefficient position codes as
    * '1' (EOB cannot occur there — a coded non-intra block has at
    * least one coefficient), everywhere else as '11'. */
  private val RunLevelEntries: Seq[((Int, Int), String)] = Seq(
    (0, 1) -> "11", (0, 2) -> "0100", (0, 3) -> "00101",
    (0, 4) -> "0000110", (0, 5) -> "00100110", (0, 6) -> "00100001",
    (0, 7) -> "0000001010",
    (1, 1) -> "011", (1, 2) -> "000110", (1, 3) -> "00100101",
    (2, 1) -> "0101", (2, 2) -> "0000100",
    (3, 1) -> "00111", (3, 2) -> "00100100",
    (4, 1) -> "00110",
    (5, 1) -> "000111", (6, 1) -> "000101", (7, 1) -> "000100",
    (8, 1) -> "0000111", (9, 1) -> "0000101",
    (10, 1) -> "00100111", (11, 1) -> "00100011", (12, 1) -> "00100010",
    (13, 1) -> "00100000")
  private val EobStr = "10"
  private val EscStr = "000001"
  // decoder symbol packing: (run << 9) | level; sentinels below
  private val SymEob = 1 << 20
  private val SymEsc = 1 << 21
  requirePrefixFree("runlevel-next",
    RunLevelEntries.flatMap { case (_, s) => Seq(s + "0", s + "1") } ++
      Seq(EobStr, EscStr))
  // first-coefficient alphabet: (0,1) -> '1', no EOB
  requirePrefixFree("runlevel-first",
    (RunLevelEntries.toMap.updated((0, 1), "1"))
      .values.toSeq.flatMap(s => Seq(s + "0", s + "1")) :+ EscStr)
  private val RunLevelCodes: Map[(Int, Int), (Int, Int)] =
    RunLevelEntries.map { case (rl, s) => rl -> parse(s) }.toMap
  private[functions] val EobCode = parse(EobStr)
  private val EscCode = parse(EscStr)
  private val NextDecoder = new VlcDecoder(
    RunLevelEntries.map { case ((r, l), s) => ((r << 9) | l) -> s } ++
      Seq(SymEob -> EobStr, SymEsc -> EscStr))
  private val FirstDecoder = new VlcDecoder(
    RunLevelEntries.map { case ((r, l), s) =>
      ((r << 9) | l) -> (if (r == 0 && l == 1) "1" else s) } :+
      (SymEsc -> EscStr))

  // ---- coefficient / block coding ----

  /** One (run, level) symbol: table code + sign bit when present,
    * escape (6-bit run, then the Annex-B level format: 8-bit two's
    * complement for |level| ≤ 127, '00000000'+8 bits for 128..255,
    * '10000000'+8 bits of level+256 for −128..−255) otherwise. */
  private[functions] def writeRunLevel(bw: BitWriter, run: Int, level: Int,
                            first: Boolean): Unit = {
    val mag = math.abs(level)
    require(mag >= 1 && mag <= 255 && run >= 0 && run <= 63,
      s"McVlcKernels: (run=$run, level=$level) outside the Annex-B range")
    RunLevelCodes.get((run, mag)) match {
      case Some((code, len)) =>
        if (first && run == 0 && mag == 1) bw.putBits(1, 1)
        else bw.putBits(code, len)
        bw.putBits(if (level < 0) 1 else 0, 1)
      case None =>
        bw.putCode(EscCode)
        bw.putBits(run, 6)
        if (mag <= 127) bw.putBits(level & 0xff, 8)
        else if (level > 0) { bw.putBits(0, 8); bw.putBits(level, 8) }
        else { bw.putBits(0x80, 8); bw.putBits((level + 256) & 0xff, 8) }
    }
  }

  /** Read one symbol: level into `out(0)`, run into `out(1)`; returns
    * false on EOB (never signalled at the first position). */
  private[functions] def readRunLevel(br: BitReader, first: Boolean,
                           out: Array[Int]): Boolean = {
    val sym = (if (first) FirstDecoder else NextDecoder).read(br)
    if (br.bad) return false
    if (sym == SymEob) return false
    if (sym == SymEsc) {
      val run = br.bits(6)
      val b0 = br.bits(8)
      val level =
        if (b0 == 0) br.bits(8)
        else if (b0 == 0x80) br.bits(8) - 256
        else b0.toByte.toInt
      if (level == 0 || level < -255 || level > 255) { br.bad = true; return false }
      out(0) = level; out(1) = run
    } else {
      val sign = br.bit()
      val mag = sym & 0x1ff
      out(0) = if (sign == 1) -mag else mag
      out(1) = sym >> 9
    }
    true
  }

  /** Intra block: DC size + differential bits (JPEG-style EXTEND
    * encoding), AC run-level codes, EOB. Returns the new DC predictor
    * (this block's quantized DC). */
  private def writeIntraBlock(bw: BitWriter, coef: Array[Int],
                              dcPred: Int): Int = {
    val dc = coef(0)
    val diff = dc - dcPred
    var size = 0
    var m = math.abs(diff)
    while (m > 0) { size += 1; m >>= 1 }
    require(size <= 8,
      s"McVlcKernels: intra DC differential $diff exceeds size 8")
    bw.putCode(DcSizeCodes(size))
    if (size > 0)
      bw.putBits(if (diff >= 0) diff else diff + (1 << size) - 1, size)
    var run = 0
    var z = 1
    while (z < 64) {
      val v = coef(JpegKernels.Zig(z))
      if (v == 0) run += 1
      else { writeRunLevel(bw, run, v, first = false); run = 0 }
      z += 1
    }
    bw.putCode(EobCode)
    dc
  }

  /** Parse an intra block into `coef` (natural order). Returns the new
    * DC predictor, with `br.bad` set on malformation. */
  private def readIntraBlock(br: BitReader, coef: Array[Int],
                             dcPred: Int): Int = {
    java.util.Arrays.fill(coef, 0)
    val size = DcSizeDecoder.read(br)
    if (br.bad) return 0
    val diff =
      if (size == 0) 0
      else {
        val v = br.bits(size)
        if (v < (1 << (size - 1))) v - (1 << size) + 1 else v
      }
    val dc = dcPred + diff
    coef(0) = dc
    val out = new Array[Int](2)
    var z = 0 // index of the last filled zigzag position
    var done = false
    while (!done && !br.bad) {
      if (readRunLevel(br, first = false, out)) {
        z += out(1) + 1
        if (z > 63) { br.bad = true; done = true }
        else coef(JpegKernels.Zig(z)) = out(0)
      } else done = true
    }
    dc
  }

  /** Non-intra (residual) block: all 64 positions, first-coefficient
    * convention, EOB. The plan guarantees ≥ 1 nonzero coefficient. */
  private def writeInterBlock(bw: BitWriter, coef: Array[Int]): Unit = {
    var run = 0
    var z = 0
    var first = true
    while (z < 64) {
      val v = coef(JpegKernels.Zig(z))
      if (v == 0) run += 1
      else { writeRunLevel(bw, run, v, first); first = false; run = 0 }
      z += 1
    }
    require(!first, "McVlcKernels: a coded non-intra block must have " +
      "at least one coefficient (the plan never emits an empty one)")
    bw.putCode(EobCode)
  }

  private def readInterBlock(br: BitReader, coef: Array[Int]): Unit = {
    java.util.Arrays.fill(coef, 0)
    val out = new Array[Int](2)
    // first coefficient is mandatory
    if (!readRunLevel(br, first = true, out)) { br.bad = true; return }
    var z = out(1)
    if (z > 63) { br.bad = true; return }
    coef(JpegKernels.Zig(z)) = out(0)
    var done = false
    while (!done && !br.bad) {
      if (readRunLevel(br, first = false, out)) {
        z += out(1) + 1
        if (z > 63) { br.bad = true; done = true }
        else coef(JpegKernels.Zig(z)) = out(0)
      } else done = true
    }
  }

  private[functions] def writeMv(bw: BitWriter, v: Int): Unit = {
    val mag = math.abs(v)
    require(mag <= MvMax, s"McVlcKernels: |motion code| $mag > $MvMax")
    bw.putCode(MvCodes(mag))
    if (mag != 0) bw.putBits(if (v < 0) 1 else 0, 1)
  }

  private[functions] def readMv(br: BitReader): Int = {
    val mag = MvDecoder.read(br)
    if (br.bad || mag == 0) 0
    else if (br.bit() == 1) -mag else mag
  }

  private[functions] def writeMba(bw: BitWriter, incr0: Int): Unit = {
    var incr = incr0
    while (incr > 33) { bw.putCode(MbaEscapeCode); incr -= 33 }
    bw.putCode(MbaCodes(incr))
  }

  private[functions] def readMba(br: BitReader): Int = {
    var add = 0
    var v = MbaDecoder.read(br)
    while (v == MbaEscape && !br.bad) { add += 33; v = MbaDecoder.read(br) }
    if (br.bad) 0 else add + v
  }

  // ---- spec hooks: primitive-layer round trips on arbitrary inputs ----

  /** Round-trip one non-intra coefficient block (≥ 1 nonzero, natural
    * order) through the bit layer; returns the decoded block, or null
    * if decode failed. Exercises the run-level tables AND all three
    * escape level formats on inputs the query corpora never reach. */
  private[graft] def interBlockRoundTrip(coef: Array[Int]): Array[Int] = {
    val bw = new BitWriter
    writeInterBlock(bw, coef)
    bw.alignZero()
    val br = new BitReader(bw.toByteArray, 0)
    val out = new Array[Int](64)
    readInterBlock(br, out)
    if (br.bad) null else out
  }

  /** Round-trip a CHAIN of intra blocks (DC predictor threaded exactly
    * as in a frame); null on decode failure. */
  private[graft] def intraBlocksRoundTrip(blocks: Array[Array[Int]]): Array[Array[Int]] = {
    val bw = new BitWriter
    var pred = 0
    blocks.foreach(b => pred = writeIntraBlock(bw, b, pred))
    bw.alignZero()
    val br = new BitReader(bw.toByteArray, 0)
    val out = Array.fill(blocks.length)(new Array[Int](64))
    var p = 0
    out.foreach { b => p = readIntraBlock(br, b, p) }
    if (br.bad) null else out
  }

  /** Round-trip motion codes and address increments (incl. repeated
    * escapes for increments > 33); null on decode failure. */
  private[graft] def mvMbaRoundTrip(mvs: Array[Int],
                                    incrs: Array[Int]): (Array[Int], Array[Int]) = {
    val bw = new BitWriter
    mvs.foreach(writeMv(bw, _))
    incrs.foreach(writeMba(bw, _))
    bw.alignZero()
    val br = new BitReader(bw.toByteArray, 0)
    val m = mvs.map(_ => readMv(br))
    val a = incrs.map(_ => readMba(br))
    if (br.bad) null else (m, a)
  }

  // ---- frame serialization over McVideoKernels plans ----

  /** Serialize one frame plan as the VLC bitstream (frame syntax in
    * the object scaladoc). */
  private[graft] def serializeVlc(isI: Boolean,
                                  plans: Array[McVideoKernels.BlockPlan]): Array[Byte] = {
    val bw = new BitWriter
    writeFrameBody(bw, isI, plans)
    bw.alignZero()
    val body = bw.toByteArray
    val out = new Array[Byte](body.length + 1)
    out(0) = (if (isI) 'I' else 'P').toByte
    System.arraycopy(body, 0, out, 1, body.length)
    out
  }

  /** The macroblock-layer bitstream of one frame plan — shared by the
    * 'GMV1' frame serialization and the elementary-stream picture
    * payload (which wraps it in start-coded headers). */
  private def writeFrameBody(bw: BitWriter, isI: Boolean,
                             plans: Array[McVideoKernels.BlockPlan]): Unit = {
    if (isI) {
      var dcPred = 0
      var bi = 0
      while (bi < plans.length) {
        dcPred = writeIntraBlock(bw, plans(bi).coef, dcPred)
        bi += 1
      }
    } else {
      var gap = 0
      var bi = 0
      while (bi < plans.length) {
        val p0 = plans(bi)
        val last = bi == plans.length - 1
        if (p0.mode == 0 && !last) gap += 1
        else {
          // a trailing skip is promoted to MC-not-coded with MV (0,0) —
          // reconstruction-identical, and the frame never ends skipped
          val mode = if (p0.mode == 0) 1 else p0.mode
          val (mx, my) = if (p0.mode == 0) (0, 0) else (p0.mx, p0.my)
          writeMba(bw, gap + 1)
          gap = 0
          mode match {
            case 1 =>
              bw.putCode(TypeCodes(3))
              writeMv(bw, mx); writeMv(bw, my)
            case 2 =>
              if (mx == 0 && my == 0) bw.putCode(TypeCodes(2))
              else {
                bw.putCode(TypeCodes(1))
                writeMv(bw, mx); writeMv(bw, my)
              }
              writeInterBlock(bw, p0.coef)
            case 3 =>
              bw.putCode(TypeCodes(4))
              writeIntraBlock(bw, p0.coef, 0)
          }
        }
        bi += 1
      }
    }
  }

  /** Decode one VLC frame over the previous PADDED reconstruction
    * (null ⇒ I-frame required). Returns the new padded reconstruction
    * or null on any malformation. */
  def mcVlcDecodeFrame(data: Array[Byte], prevRecon: Array[Byte],
                       W: Int, H: Int): Array[Byte] = {
    if (data == null || data.length < 1 || W <= 0 || H <= 0 ||
        (W & 7) != 0 || (H & 7) != 0 ||
        (prevRecon != null && prevRecon.length != W * H)) return null
    val isI = data(0) == 'I'
    if (!isI && data(0) != 'P') return null
    if (!isI && prevRecon == null) return null
    val br = new BitReader(data, 1)
    val recon = readFrameBody(br, isI, prevRecon, W, H)
    if (recon == null) return null
    // byte-boundary padding must be zero bits, then exact end
    while (br.bitPos % 8 != 0) if (br.bit() != 0 || br.bad) return null
    if (br.bitPos != br.bitEnd) return null
    recon
  }

  /** Parse one frame's macroblock layer from the reader's current
    * position; returns the padded reconstruction or null on
    * malformation (reader left wherever the failure occurred). */
  private def readFrameBody(br: BitReader, isI: Boolean,
                            prevRecon: Array[Byte], W: Int, H: Int): Array[Byte] = {
    val nBlocks = (W / 8) * (H / 8)
    val blocksPerRow = W / 8
    val recon = new Array[Byte](W * H)
    val coef = new Array[Int](64)
    @inline def blockXY(bi: Int): (Int, Int) =
      ((bi % blocksPerRow) * 8, (bi / blocksPerRow) * 8)
    if (isI) {
      var dcPred = 0
      var bi = 0
      while (bi < nBlocks) {
        dcPred = readIntraBlock(br, coef, dcPred)
        if (br.bad) return null
        val (bx, by) = blockXY(bi)
        McVideoKernels.reconstructBlock(coef, (_, _) => 128.0, recon, W, bx, by)
        bi += 1
      }
    } else {
      var bi = -1 // address of the previously coded block
      while (bi < nBlocks - 1) {
        val incr = readMba(br)
        if (br.bad || incr < 1 || bi + incr >= nBlocks + 1) return null
        // skipped blocks reconstruct as copy-previous
        var s = bi + 1
        while (s < bi + incr) {
          val (bx, by) = blockXY(s)
          McVideoKernels.reconstructBlock(McVideoKernels.zeroCoef,
            (x, y) => (prevRecon((by + y) * W + bx + x) & 0xff).toDouble,
            recon, W, bx, by)
          s += 1
        }
        bi += incr
        if (bi >= nBlocks) return null
        val (bx, by) = blockXY(bi)
        val t = TypeDecoder.read(br)
        if (br.bad) return null
        if (t == 4) {
          readIntraBlock(br, coef, 0)
          if (br.bad) return null
          McVideoKernels.reconstructBlock(coef, (_, _) => 128.0,
            recon, W, bx, by)
        } else {
          val (mx, my) =
            if (t == 2) (0, 0)
            else {
              val a = readMv(br); val b = readMv(br)
              (a, b)
            }
          if (br.bad) return null
          if (bx + mx < 0 || bx + mx + 8 > W ||
              by + my < 0 || by + my + 8 > H) return null
          if (t == 3) java.util.Arrays.fill(coef, 0)
          else {
            readInterBlock(br, coef)
            if (br.bad) return null
          }
          McVideoKernels.reconstructBlock(coef,
            (x, y) => (prevRecon((by + y + my) * W + bx + x + mx) & 0xff).toDouble,
            recon, W, bx, by)
        }
      }
    }
    recon
  }

  // ---- MPEG-1-shaped ELEMENTARY STREAM framing (ISO/IEC 11172-2 §2.4) ----

  /** Picture-rate enumeration (§2.4.3.2), code 1..8 → Hz. The 4-bit
    * field cannot carry an arbitrary fps (e.g. 12), so the ES stamps
    * the NEAREST enumerated rate and the container fps remains the
    * playback authority — documented, not silently wrong. */
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

  /** Frame plans → ONE MPEG-1-video-SHAPED elementary stream:
    * sequence header (B3: dims, aspect, enumerated rate, variable
    * bit-rate, default quantizer matrices), GOP header (B8), and per
    * frame a picture header (00: temporal reference, I/P type, vbv
    * delay, full-pel forward vector with f_code 1 — our vectors are
    * integer-pel) + one slice (01: quantizer_scale, then the
    * macroblock layer [[writeFrameBody]] emits), closed by a
    * sequence_end code (B7). Every header sits behind a byte-aligned
    * 0x000001 start code; the VLC grammar's zero runs are bounded far
    * under the 23 zeros a start code needs, so payload bytes can never
    * emulate one — certified by the start-code census in the stats
    * kernel. Honest scope: one GOP, one slice per picture, 8×8
    * "macroblocks", the codec's fixed quantizer — stream-SHAPED per
    * §2.4's layering to entropy-code the byte codec's plans; the
    * CONFORMANT macroblock layer is [[Mpeg1Kernels.encodeEs]]. */
  private[graft] def mcVlcEncodeEs(width: Int, height: Int, fps: Int,
      frames: Seq[Array[McVideoKernels.BlockPlan]]): Array[Byte] = {
    require(width >= 1 && width < 4096 && height >= 1 && height < 4096,
      s"mcVlcEncodeEs: dims ${width}x$height outside the 12-bit fields")
    val bw = new BitWriter
    def startCode(code: Int): Unit = {
      bw.alignZero(); bw.putBits(0, 16); bw.putBits(1, 8); bw.putBits(code, 8)
    }
    startCode(0xB3) // sequence header
    bw.putBits(width, 12); bw.putBits(height, 12)
    bw.putBits(1, 4) // pel_aspect_ratio '0001'
    bw.putBits(rateCode(fps), 4)
    bw.putBits(0x3FFFF, 18) // bit_rate: variable
    bw.putBits(1, 1) // marker
    bw.putBits(0, 10) // vbv_buffer_size
    bw.putBits(0, 3) // constrained flag, both load-matrix flags
    startCode(0xB8) // GOP header
    bw.putBits(0, 12); bw.putBits(1, 1); bw.putBits(0, 12) // time_code (marker mid)
    bw.putBits(1, 1) // closed_gop
    bw.putBits(0, 1) // broken_link
    var f = 0
    frames.foreach { plans =>
      startCode(0x00) // picture
      bw.putBits(f % 1024, 10) // temporal_reference (display == coded order)
      bw.putBits(if (f == 0) 1 else 2, 3) // picture_coding_type I/P
      bw.putBits(0xFFFF, 16) // vbv_delay: variable
      if (f > 0) {
        bw.putBits(1, 1) // full_pel_forward_vector: integer-pel MVs
        bw.putBits(1, 3) // forward_f_code = 1
      }
      startCode(0x01) // slice 1
      bw.putBits(4, 5) // quantizer_scale (display; the quantizer is fixed)
      bw.putBits(0, 1) // extra_bit_slice
      writeFrameBody(bw, f == 0, plans)
      f += 1
    }
    startCode(0xB7) // sequence_end
    bw.alignZero()
    bw.toByteArray
  }

  private[graft] final case class EsVideo(width: Int, height: Int,
                                          rateCode: Int,
                                          recons: Array[Array[Byte]])

  /** Parse an [[mcVlcEncodeEs]] stream: headers validated field by
    * field (markers, start codes in order, temporal references,
    * full-pel/f_code convention, quantizer range), each picture's
    * macroblock layer chain-decoded over the reconstruction chain.
    * Null on ANY malformation, including trailing bytes or a missing
    * sequence_end. */
  private[graft] def mcVlcDecodeEs(data: Array[Byte]): EsVideo = {
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
    if (br.bits(4) != 1) return null // aspect
    val rc = br.bits(4)
    if (br.bad || rc < 1 || rc > 8) return null
    br.bits(18) // bit_rate
    if (br.bits(1) != 1) return null // marker
    br.bits(10) // vbv
    if (br.bits(3) != 0 || br.bad) return null // constrained + matrix flags
    if (!expectStart(0xB8)) return null
    br.bits(12)
    if (br.bits(1) != 1) return null // time_code marker
    br.bits(12)
    br.bits(2) // closed_gop + broken_link
    if (br.bad) return null
    val W = McVideoKernels.pad8(width); val H = McVideoKernels.pad8(height)
    val out = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    var prev: Array[Byte] = null
    var done = false
    var f = 0
    while (!done) {
      if (!align()) return null
      if (br.bits(24) != 1 || br.bad) return null
      br.bits(8) match {
        case 0xB7 => done = true
        case 0x00 =>
          if (br.bits(10) != f % 1024) return null // temporal_reference
          val ptype = br.bits(3)
          if (br.bad || (ptype != 1 && ptype != 2)) return null
          if (ptype == 2 && prev == null) return null
          br.bits(16) // vbv_delay
          if (ptype == 2 &&
              (br.bits(1) != 1 || br.bits(3) != 1)) return null
          if (br.bad) return null
          if (!expectStart(0x01)) return null
          val q = br.bits(5)
          if (br.bad || q < 1 || q > 31) return null
          if (br.bits(1) != 0) return null // extra_bit_slice
          val recon = readFrameBody(br, ptype == 1, prev, W, H)
          if (recon == null) return null
          out += recon
          prev = recon
          f += 1
        case _ => return null
      }
    }
    if (!align()) return null
    if (br.bitPos != br.bitEnd || out.isEmpty) return null
    EsVideo(width, height, rc, out.toArray)
  }

  /** Byte-aligned 0x000001 occurrences across EVERY offset — what a
    * resyncing decoder would find. The stats kernel requires this to
    * equal the number of EMITTED start codes, certifying the payload
    * never emulates one. */
  private[graft] def startCodeCensus(b: Array[Byte]): Int = {
    var c = 0
    var i = 0
    while (i + 2 < b.length) {
      if (b(i) == 0 && b(i + 1) == 0 && b(i + 2) == 1) c += 1
      i += 1
    }
    c
  }

  /** The VLC twin of [[McVideoKernels.mcRoundTripStats]]: the same
    * planted-global-motion frames and the SAME frame plans, serialized
    * with the Annex-B VLC layer into a 'GMV1' AVI, chain-decoded and
    * certified — `struct<width, height, fps, n_frames, err_in_bound,
    * recon_exact, mv_engaged, inter_saves, trunc_rejected,
    * vlc_smaller>`. The first five attestations mean what they mean on
    * the byte codec ([[McVideoKernels.mcRoundTripStats]]), with
    * `inter_saves` comparing against a VLC all-intra coding of the
    * same frames; `vlc_smaller` attests the VLC stream total is
    * strictly smaller than the byte coder's for the identical plans —
    * the point of entropy coding; `es_roundtrip` attests the
    * MPEG-1-shaped elementary stream ([[mcVlcEncodeEs]]) chain-decodes
    * to the same reconstructions, rejects truncation, and contains
    * EXACTLY the emitted start codes (no payload emulation). Null if
    * anything fails to decode. */
  def mcVlcRoundTripStats(seed: Long, width: Int, height: Int,
                          nFrames: Int, fps: Int): InternalRow =
    // an out-of-Annex-B-range coefficient (|level| > 255 — possible
    // only on adversarial content far outside the synth scenes'
    // bounded amplitude) surfaces as the kernel's null contract, not
    // a throw inside an expression
    try mcVlcRoundTripStatsImpl(seed, width, height, nFrames, fps)
    catch { case _: IllegalArgumentException => null }

  private def mcVlcRoundTripStatsImpl(seed: Long, width: Int, height: Int,
                                      nFrames: Int, fps: Int): InternalRow = {
    if (nFrames <= 1 || nFrames > 256 || width <= 0 || height <= 0 ||
        width.toLong * height * nFrames > (1 << 24)) return null
    val W = McVideoKernels.pad8(width); val H = McVideoKernels.pad8(height)
    val src = McVideoKernels.synthGlobalMotion(seed, width, height, nFrames)
    val padded = src.map(McVideoKernels.padCanvas(_, width, height))
    val enc = new Array[Array[Byte]](nFrames)
    val encRecons = new Array[Array[Byte]](nFrames)
    val allPlans = new Array[Array[McVideoKernels.BlockPlan]](nFrames)
    val mvUsed = new Array[Boolean](1)
    var interBytes = 0L
    var intraBytes = 0L
    var vlcTotal = 0L
    var byteTotal = 0L
    var prevRecon: Array[Byte] = null
    var f = 0
    while (f < nFrames) {
      val (plans, recon, _) =
        McVideoKernels.planFrame(padded(f), prevRecon, W, H, mvUsed)
      val bits = serializeVlc(f == 0, plans)
      enc(f) = bits
      encRecons(f) = recon
      allPlans(f) = plans
      vlcTotal += bits.length
      byteTotal += McVideoKernels.serializeBytes(f == 0, plans).length
      if (f > 0) {
        interBytes += bits.length
        // the all-intra alternative, in the SAME entropy coder's terms —
        // the plan already carries every block's intra coefficients
        // (the mode decision computed them), so no second planning pass
        val iPlans = plans.map(p =>
          new McVideoKernels.BlockPlan(-1, 0, 0, p.intraCoef, p.intraCoef))
        intraBytes += serializeVlc(true, iPlans).length
      }
      prevRecon = recon
      f += 1
    }
    val avi = AviKernels.aviEncodeGmv(width, height, fps, enc)
    if (avi == null) return null
    val vid = AviKernels.aviDecodeGmv(avi)
    if (vid == null || vid.width != width || vid.height != height ||
        vid.frames.length != nFrames) return null
    var errInBound = true
    var reconExact = true
    var decPrev: Array[Byte] = null
    f = 0
    while (f < nFrames) {
      val dec = mcVlcDecodeFrame(vid.frames(f), decPrev, W, H)
      if (dec == null) return null
      if (!java.util.Arrays.equals(dec, encRecons(f))) reconExact = false
      val cropped = McVideoKernels.cropCanvas(dec, width, height)
      var i = 0
      while (i < cropped.length) {
        if (math.abs((cropped(i) & 0xff) - (src(f)(i) & 0xff)) >
            JpegKernels.ErrBound) errInBound = false
        i += 1
      }
      decPrev = dec
      f += 1
    }
    val truncFrame = mcVlcDecodeFrame(
      java.util.Arrays.copyOf(enc(0), enc(0).length - 1), null, W, H) == null
    val truncRejected =
      AviKernels.aviDecodeGmv(
        java.util.Arrays.copyOf(avi, avi.length / 2)) == null && truncFrame
    // the MPEG-1-shaped ELEMENTARY STREAM over the same plans:
    // chain-decode equals the shared recon chain, truncation rejects,
    // and the start-code census proves the payload never emulates a
    // start code (the bounded-zero-run property, measured not assumed)
    val es = mcVlcEncodeEs(width, height, fps, allPlans.toSeq)
    val esv = mcVlcDecodeEs(es)
    val esOk = esv != null && esv.width == width && esv.height == height &&
      esv.recons.length == nFrames &&
      esv.recons.indices.forall(i =>
        java.util.Arrays.equals(esv.recons(i), encRecons(i))) &&
      // mid-stream truncation: fails inside a picture (a last-byte cut
      // would re-parse the whole stream before failing at sequence_end)
      mcVlcDecodeEs(java.util.Arrays.copyOf(es, es.length / 2)) == null &&
      startCodeCensus(es) == 3 + 2 * nFrames
    val r = new GenericInternalRow(11)
    r.setInt(0, vid.width); r.setInt(1, vid.height); r.setInt(2, vid.fps)
    r.setInt(3, vid.frames.length)
    r.setBoolean(4, errInBound)
    r.setBoolean(5, reconExact)
    r.setBoolean(6, mvUsed(0))
    r.setBoolean(7, interBytes < intraBytes)
    r.setBoolean(8, truncRejected)
    r.setBoolean(9, vlcTotal < byteTotal)
    r.setBoolean(10, esOk)
    r
  }
}
