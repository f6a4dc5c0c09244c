package graft

import graft.functions.{JpegArith, JpegKernels}

/** T.81 arithmetic (QM) coding: the bare coder's exact mutual inversion
  * under adversarial bit patterns (carry chains, 0xFF stacking, flush
  * edges), wire stuffing discipline, and the full SOF9 codec certified
  * against the Huffman baseline path — entropy coding is lossless over
  * the same quantized coefficients, so decoded pixels must be
  * BIT-IDENTICAL across the two paths. */
class JpegArithSpec extends SparkSpec {

  // deterministic pseudo-random stream (no java.util.Random seeding drift)
  private def rng(seed: Long): () => Long = {
    var s = seed
    () => {
      s ^= s << 13; s ^= s >>> 7; s ^= s << 17
      s
    }
  }

  private def roundTrip(bits: Array[Int], ctxs: Array[Int],
                        nBins: Int): Array[Byte] = {
    val (bytes, decoded) = JpegArith.coderProbe(bits, ctxs, nBins)
    assert(decoded.sameElements(bits),
      s"coder round trip diverged at ${decoded.zip(bits).indexWhere(p => p._1 != p._2)} " +
        s"of ${bits.length}")
    bytes
  }

  test("QM coder: exact mutual inversion across biased, alternating, and random patterns") {
    // heavy MPS bias drives long renorm-free runs; heavy LPS bias forces
    // constant renorms; alternating exercises the exchange paths; pure
    // runs push the carry/0xFF stacking machinery
    val r = rng(0x9E3779B97F4A7C15L)
    for ((n, biasNum) <- Seq((0, 0), (1, 1), (7, 1), (64, 9),
        (1000, 1), (5000, 5), (20000, 9))) {
      val bits = Array.tabulate(n)(_ =>
        if (math.floorMod(r(), 10) < biasNum) 1 else 0)
      val ctxs = Array.tabulate(n)(_ => math.floorMod(r(), 16).toInt)
      roundTrip(bits, ctxs, 16)
    }
    roundTrip(Array.fill(4096)(0), Array.fill(4096)(0), 1)
    roundTrip(Array.fill(4096)(1), Array.fill(4096)(0), 1)
    roundTrip(Array.tabulate(4096)(_ % 2), Array.fill(4096)(0), 1)
  }

  test("QM coder fuzz: 150 random (length, bias, context-count) configs invert exactly") {
    val r = rng(0xD1B54A32D192ED03L)
    for (trial <- 1 to 150) {
      val n = (math.floorMod(r(), 3000) + 1).toInt
      val biasNum = math.floorMod(r(), 11).toInt // 0..10 of 10 → incl. degenerate
      val nBins = (math.floorMod(r(), 32) + 1).toInt
      val bits = Array.tabulate(n)(_ =>
        if (math.floorMod(r(), 10) < biasNum) 1 else 0)
      val ctxs = Array.tabulate(n)(_ => math.floorMod(r(), nBins).toInt)
      val (_, decoded) = JpegArith.coderProbe(bits, ctxs, nBins)
      assert(decoded.sameElements(bits), s"fuzz trial $trial diverged " +
        s"(n=$n bias=$biasNum/10 bins=$nBins)")
    }
  }

  test("SOF9 fuzz: random dims and seeds all bit-equal the Huffman path") {
    val r = rng(0xA0761D6478BD642FL)
    for (trial <- 1 to 25) {
      val w = (math.floorMod(r(), 48) + 1).toInt
      val h = (math.floorMod(r(), 48) + 1).toInt
      val c = if (math.floorMod(r(), 2) == 0L) 1 else 3
      val seed = r()
      val px = graft.functions.MediaKernels.synthPixels(seed, w * h * c)
      val seq = JpegKernels.jpegEncodePixels(w, h, c, px)
      val ari = JpegArith.jpegEncodeArithPixels(w, h, c, px)
      assert(seq != null && ari != null, s"trial $trial ${w}x$h c=$c")
      val dSeq = JpegKernels.jpegDecodeRaw(seq)
      val dAri = JpegArith.jpegDecodeArith(ari)
      assert(dSeq != null && dAri != null, s"trial $trial decode")
      assert(java.util.Arrays.equals(dSeq.pixels, dAri.pixels),
        s"fuzz divergence at trial $trial: ${w}x$h c=$c seed=$seed")
    }
  }

  test("QM coder wire: every 0xFF data byte is zero-stuffed") {
    val r = rng(42L)
    // all-1s from a fresh state codes LPS-heavy and walks Qe toward 0.5
    // — the densest-output regime, the one that mints 0xFF bytes
    for (seed <- 1 to 5) {
      val n = 8192
      val bits = Array.tabulate(n)(_ => if (math.floorMod(r(), 4) < 3) 1 else 0)
      val bytes = roundTrip(bits, Array.fill(n)(0), 1)
      var i = 0
      while (i < bytes.length) {
        if ((bytes(i) & 0xff) == 0xff) {
          assert(i + 1 < bytes.length && bytes(i + 1) == 0,
            s"bare 0xFF at $i of ${bytes.length}")
          i += 1
        }
        i += 1
      }
    }
  }

  test("SOF9 round trip: arithmetic decode equals the Huffman path bit-for-bit") {
    for ((seed, w, h, c) <- Seq((1L, 16, 16, 1), (2L, 24, 16, 3),
        (3L, 17, 13, 3), (4L, 9, 31, 1), (5L, 40, 40, 3), (6L, 8, 8, 1))) {
      val px = graft.functions.MediaKernels.synthPixels(seed, w * h * c)
      val seq = JpegKernels.jpegEncodePixels(w, h, c, px)
      val ari = JpegArith.jpegEncodeArithPixels(w, h, c, px)
      assert(seq != null && ari != null)
      val dSeq = JpegKernels.jpegDecodeRaw(seq)
      val dAri = JpegArith.jpegDecodeArith(ari)
      assert(dSeq != null && dAri != null)
      assert(dAri.width == w && dAri.height == h && dAri.channels == c)
      assert(java.util.Arrays.equals(dSeq.pixels, dAri.pixels),
        s"pixel divergence at seed=$seed ${w}x$h c=$c")
      // the adaptive coder should not lose to the fixed Annex-K tables
      assert(ari.length <= seq.length,
        s"arith ${ari.length} > huffman ${seq.length} at seed=$seed")
      // the generic entry dispatches SOF9 like it dispatches SOF2
      val dDispatch = JpegKernels.jpegDecodeRaw(ari)
      assert(dDispatch != null &&
        java.util.Arrays.equals(dDispatch.pixels, dAri.pixels))
    }
  }

  test("DAC conditioning segment: explicit defaults decode identically, bad bounds null") {
    // our encoder relies on the T.81 defaults (DC L=0 U=1, AC Kx=5); a
    // conformant stream may carry them explicitly in a DAC segment —
    // splice one in before SOS and the decode must be byte-identical
    val px = graft.functions.MediaKernels.synthPixels(11L, 24 * 16 * 3)
    val ari = JpegArith.jpegEncodeArithPixels(24, 16, 3, px)
    assert(ari != null)
    val base = JpegArith.jpegDecodeArith(ari)
    assert(base != null)
    // locate SOS (FF DA) in the header region
    var sos = 2
    while (!((ari(sos) & 0xff) == 0xff && (ari(sos + 1) & 0xff) == 0xda)) sos += 1
    def splice(entries: Array[Byte]): Array[Byte] = {
      val dac = Array[Byte](0xff.toByte, 0xcc.toByte,
        0, (2 + entries.length).toByte) ++ entries
      ari.take(sos) ++ dac ++ ari.drop(sos)
    }
    // Tc=0 table 0, Cs = (U=1)<<4 | (L=0); Tc=1 table 0, Cs = Kx=5
    val explicit = splice(Array[Byte](0x00, 0x10, 0x10, 0x05))
    val dec = JpegArith.jpegDecodeArith(explicit)
    assert(dec != null, "explicit-defaults DAC must decode")
    assert(java.util.Arrays.equals(dec.pixels, base.pixels),
      "explicit defaults must decode identically")
    // NON-default conditioning changes the statistical model: the scan
    // bytes no longer parse under it the same way — output differs (or
    // nulls); it must never match silently NOR throw
    val shifted = splice(Array[Byte](0x00, 0x21, 0x10, 0x05)) // L=1,U=2
    val decShifted = JpegArith.jpegDecodeArith(shifted)
    assert(decShifted == null ||
      !java.util.Arrays.equals(decShifted.pixels, base.pixels),
      "different conditioning cannot decode to the same pixels")
    // invalid bounds reject by the marker walk
    assert(JpegArith.jpegDecodeArith(
      splice(Array[Byte](0x00, 0x01.toByte, 0x10, 0x05))) == null) // U=0 < L=1
    assert(JpegArith.jpegDecodeArith(
      splice(Array[Byte](0x10, 0x00, 0x00, 0x00))) == null) // Kx=0
    assert(JpegArith.jpegDecodeArith(
      splice(Array[Byte](0x21, 0x05))) == null) // table class 2
  }

  test("malformed inputs return null, never throw") {
    val px = graft.functions.MediaKernels.synthPixels(7L, 16 * 16 * 3)
    val ari = JpegArith.jpegEncodeArithPixels(16, 16, 3, px)
    assert(ari != null)
    // truncation at any fraction: no EOI -> null
    for (f <- Seq(4, 3, 2)) {
      assert(JpegArith.jpegDecodeArith(
        java.util.Arrays.copyOf(ari, ari.length / f)) == null)
    }
    assert(JpegArith.jpegDecodeArith(null) == null)
    assert(JpegArith.jpegDecodeArith(Array[Byte](1, 2, 3)) == null)
    // a Huffman SOF0 stream is not an arithmetic frame
    val seq = JpegKernels.jpegEncodePixels(16, 16, 3, px)
    assert(JpegArith.jpegDecodeArith(seq) == null)
    // corrupt entropy bytes: either decodes (garbage coefficients are
    // representable) or nulls — but never throws; flip bytes mid-scan
    val mut = ari.clone()
    var i = mut.length / 2
    while (i < math.min(mut.length / 2 + 16, mut.length)) {
      mut(i) = (~mut(i)).toByte; i += 1
    }
    JpegArith.jpegDecodeArith(mut) // must not throw
    // encoder input contract
    assert(JpegArith.jpegEncodeArithPixels(0, 4, 1, new Array[Byte](0)) == null)
    assert(JpegArith.jpegEncodeArithPixels(4, 4, 2, new Array[Byte](32)) == null)
    assert(JpegArith.jpegEncodeArithPixels(4, 4, 1, new Array[Byte](15)) == null)
  }
}
