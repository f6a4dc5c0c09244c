package graft

import graft.functions.{AviKernels, JpegKernels, McVideoKernels => K, McVlcKernels => V}

/** Annex-B-shaped VLC entropy layer over the MC codec's frame plans:
  * the VLC decode chain must be bit-equal to the BYTE codec's
  * reconstruction chain (both serialize the same plans), the VLC
  * stream must be strictly smaller, and every malformation must
  * reject. */
class McVlcSpec extends SparkSpec {

  private def chains(frames: Array[Array[Byte]], w: Int, h: Int)
      : (Array[Array[Byte]], Array[Array[Byte]], Array[Array[Byte]]) = {
    val W = (w + 7) & ~7; val H = (h + 7) & ~7
    val vlcBits = new Array[Array[Byte]](frames.length)
    val byteBits = new Array[Array[Byte]](frames.length)
    val recons = new Array[Array[Byte]](frames.length)
    val mv = new Array[Boolean](1)
    var prev: Array[Byte] = null
    for (f <- frames.indices) {
      val (plans, recon, _) =
        K.planFrame(K.padCanvas(frames(f), w, h), prev, W, H, mv)
      vlcBits(f) = V.serializeVlc(f == 0, plans)
      byteBits(f) = K.serializeBytes(f == 0, plans)
      recons(f) = recon
      prev = recon
    }
    (vlcBits, byteBits, recons)
  }

  test("VLC decode chain == byte-codec reconstruction chain, bit-exact, " +
       "across seeds and dims; VLC stream strictly smaller") {
    for (seed <- Seq(1L, 7L, 42L, 123L);
         (w, h, n) <- Seq((10, 10, 3), (16, 16, 2), (20, 13, 4), (24, 17, 5))) {
      val W = (w + 7) & ~7; val H = (h + 7) & ~7
      val src = K.synthGlobalMotion(seed, w, h, n)
      val (vlcBits, byteBits, recons) = chains(src, w, h)
      var prev: Array[Byte] = null
      for (f <- 0 until n) {
        val dec = V.mcVlcDecodeFrame(vlcBits(f), prev, W, H)
        assert(dec != null, s"VLC frame $f failed to decode ($w x $h seed $seed)")
        assert(java.util.Arrays.equals(dec, recons(f)),
          s"VLC decoder diverged from the shared recon at frame $f")
        // and therefore from the BYTE decoder too
        assert(java.util.Arrays.equals(dec,
          K.mcDecodeFrame(byteBits(f), prev, W, H)))
        prev = dec
      }
      assert(vlcBits.map(_.length).sum < byteBits.map(_.length).sum,
        s"VLC (${vlcBits.map(_.length).sum} B) must beat the byte coder " +
          s"(${byteBits.map(_.length).sum} B) on the same plans")
    }
  }

  test("primitive-layer fuzz: 2000 random coefficient blocks round-trip " +
       "exactly — every table entry, every escape level format, " +
       "chained DC predictors, MV/MBA escapes") {
    val rnd = new scala.util.Random(0xC0DEC)
    def randBlock(maxLevel: Int, allowEmpty: Boolean): Array[Int] = {
      val c = new Array[Int](64)
      val nnz = rnd.nextInt(12) + (if (allowEmpty) 0 else 1)
      for (_ <- 0 until nnz) {
        val mag = 1 + rnd.nextInt(maxLevel)
        c(rnd.nextInt(64)) = if (rnd.nextBoolean()) mag else -mag
      }
      if (!allowEmpty && c.forall(_ == 0)) c(rnd.nextInt(64)) = 1
      c
    }
    // inter blocks: levels across the whole Annex-B range, incl. the
    // 128..255 / -255..-128 double-byte escape formats
    for (i <- 0 until 2000) {
      val maxLevel = Seq(1, 2, 7, 127, 255)(i % 5)
      val c = randBlock(maxLevel, allowEmpty = false)
      val got = V.interBlockRoundTrip(c)
      assert(got != null && java.util.Arrays.equals(got, c),
        s"inter block diverged (maxLevel $maxLevel): " +
          s"${c.mkString(",")} -> ${if (got == null) "null" else got.mkString(",")}")
    }
    // intra chains: DC range through the full size-8 differential
    // envelope (predictors chain, so diffs swing -255..255)
    for (_ <- 0 until 400) {
      val blocks = Array.fill(rnd.nextInt(6) + 1) {
        val b = randBlock(120, allowEmpty = true)
        b(0) = rnd.nextInt(256) - 128 // DC in [-128, 127]
        b
      }
      val got = V.intraBlocksRoundTrip(blocks)
      assert(got != null && got.length == blocks.length &&
        got.indices.forall(i => java.util.Arrays.equals(got(i), blocks(i))))
    }
    // MVs over the full coded range, MBA increments through repeated
    // escapes (1..200 covers 1x..5x the +33 escape)
    for (_ <- 0 until 200) {
      val mvs = Array.fill(8)(rnd.nextInt(15) - 7)
      val incrs = Array.fill(8)(1 + rnd.nextInt(200))
      val got = V.mvMbaRoundTrip(mvs, incrs)
      assert(got != null && got._1.toSeq == mvs.toSeq &&
        got._2.toSeq == incrs.toSeq, s"${mvs.toSeq} / ${incrs.toSeq}")
    }
    // out-of-range inputs fail BY NAME, not silently
    val big = new Array[Int](64); big(5) = 256
    val e = intercept[IllegalArgumentException](V.interBlockRoundTrip(big))
    assert(e.getMessage.contains("Annex-B range"), e.getMessage)
  }

  test("malformation rejection: truncations at every prefix, trailing " +
       "bytes, nonzero padding, bad type, off-canvas MV") {
    val (w, h) = (16, 16)
    val src = K.synthGlobalMotion(9L, w, h, 2)
    val (vlcBits, _, recons) = chains(src, w, h)
    for (cut <- 0 until vlcBits(0).length)
      assert(V.mcVlcDecodeFrame(
        java.util.Arrays.copyOf(vlcBits(0), cut), null, w, h) == null,
        s"I-frame truncated to $cut bytes must reject")
    for (cut <- 1 until vlcBits(1).length)
      assert(V.mcVlcDecodeFrame(
        java.util.Arrays.copyOf(vlcBits(1), cut), recons(0), w, h) == null,
        s"P-frame truncated to $cut bytes must reject")
    // trailing byte after a valid frame
    assert(V.mcVlcDecodeFrame(vlcBits(0) :+ 0x00.toByte, null, w, h) == null)
    // nonzero padding bits: set the last bit of the final byte — either
    // it lands in padding (must reject) or corrupts the tail (must
    // reject or diverge; specifically it can no longer equal the recon)
    val flipped = vlcBits(0).clone()
    flipped(flipped.length - 1) = (flipped(flipped.length - 1) | 1).toByte
    val fd = V.mcVlcDecodeFrame(flipped, null, w, h)
    assert(fd == null || !java.util.Arrays.equals(fd, recons(0)))
    // a P frame with no reference
    assert(V.mcVlcDecodeFrame(vlcBits(1), null, w, h) == null)
    // wrong frame-type byte
    val badType = vlcBits(0).clone(); badType(0) = 'X'.toByte
    assert(V.mcVlcDecodeFrame(badType, null, w, h) == null)
    // empty / null
    assert(V.mcVlcDecodeFrame(Array[Byte](), null, w, h) == null)
    assert(V.mcVlcDecodeFrame(null, null, w, h) == null)
    // dims not block-aligned
    assert(V.mcVlcDecodeFrame(vlcBits(0), null, 12, 16) == null)
  }

  test("'GMV1' AVI + end-to-end stats: all seven attestations green " +
       "over the query's full parameter lattice") {
    val st = V.mcVlcRoundTripStats(3L, 18, 12, 3, 12)
    assert(st != null)
    assert(st.getInt(0) == 18 && st.getInt(1) == 12 && st.getInt(3) == 3)
    assert((4 to 10).forall(st.getBoolean), st.toString)
    // the exact (width, height, nFrames) lattice the registered query
    // derives from doc_id — every combination must certify, so sf0.1
    // can never hit an uncovered shape
    for (wm <- 0 until 11; hm <- 0 until 9; nm <- 0 until 4) {
      val s = V.mcVlcRoundTripStats(wm * 100L + hm * 10L + nm,
        wm + 10, hm + 10, nm + 2, 12)
      assert(s != null, s"null stats at ${wm + 10}x${hm + 10}, ${nm + 2} frames")
      assert((4 to 10).forall(s.getBoolean),
        s"attestation failed at ${wm + 10}x${hm + 10}, ${nm + 2} frames: $s")
    }
    // degenerate sizes reject
    assert(V.mcVlcRoundTripStats(3L, 0, 8, 2, 12) == null)
    assert(V.mcVlcRoundTripStats(3L, 8, 8, 1, 12) == null)
    // GMV1 container cannot cross decoders
    val src = K.synthGlobalMotion(3L, 18, 12, 3)
    val (vlcBits, _, _) = chains(src, 18, 12)
    val avi = AviKernels.aviEncodeGmv(18, 12, 12, vlcBits)
    assert(avi != null && AviKernels.aviDecodeGmc(avi) == null &&
      AviKernels.aviDecodeRle8(avi) == null)
    val vid = AviKernels.aviDecodeGmv(avi)
    assert(vid != null && vid.frames.length == 3)
    assert(JpegKernels.ErrBound >= 0) // keep the import honest
  }

  test("MPEG-1-shaped elementary stream: headers parse, chain decode " +
       "equals the recon chain, start-code census exact, every " +
       "truncation prefix rejects, header corruption rejects") {
    val (w, h, n) = (20, 13, 4)
    val W = (w + 7) & ~7; val H = (h + 7) & ~7
    val src = K.synthGlobalMotion(11L, w, h, n)
    val mv = new Array[Boolean](1)
    val plans = new Array[Array[K.BlockPlan]](n)
    val recons = new Array[Array[Byte]](n)
    var prev: Array[Byte] = null
    for (f <- 0 until n) {
      val (p, r, _) = K.planFrame(K.padCanvas(src(f), w, h), prev, W, H, mv)
      plans(f) = p; recons(f) = r; prev = r
    }
    val es = V.mcVlcEncodeEs(w, h, 12, plans.toSeq)
    // decode: dims, enumerated rate (12 fps -> nearest = 23.976, code 1),
    // frame-exact recon chain
    val esv = V.mcVlcDecodeEs(es)
    assert(esv != null && esv.width == w && esv.height == h &&
      esv.rateCode == 1 && esv.recons.length == n)
    for (f <- 0 until n)
      assert(java.util.Arrays.equals(esv.recons(f), recons(f)),
        s"ES recon diverged at frame $f")
    // start codes: exactly seq + gop + end + (picture + slice) per frame,
    // found by a full every-offset scan — no payload emulation
    assert(V.startCodeCensus(es) == 3 + 2 * n, V.startCodeCensus(es).toString)
    // every truncation prefix rejects
    for (cut <- 0 until es.length)
      assert(V.mcVlcDecodeEs(java.util.Arrays.copyOf(es, cut)) == null,
        s"ES truncated to $cut bytes must reject")
    // trailing garbage rejects
    assert(V.mcVlcDecodeEs(es :+ 0x00.toByte) == null)
    // header corruption rejects: break the sequence start code, the
    // marker bit region, and a picture type
    def corrupt(at: Int, mask: Int): Array[Byte] = {
      val c = es.clone(); c(at) = (c(at) ^ mask).toByte; c
    }
    assert(V.mcVlcDecodeEs(corrupt(2, 0xFF)) == null) // start code byte
    assert(V.mcVlcDecodeEs(corrupt(3, 0xFF)) == null) // B3 -> something else
    // fps maps to the nearest enumerated picture rate
    val es25 = V.mcVlcEncodeEs(w, h, 25, plans.toSeq)
    assert(V.mcVlcDecodeEs(es25).rateCode == 3)
    val es30 = V.mcVlcEncodeEs(w, h, 30, plans.toSeq)
    assert(V.mcVlcDecodeEs(es30).rateCode == 5)
  }
}
