package graft

import graft.functions.{AviKernels, JpegKernels, McVideoKernels => K}

/** Motion-compensated transform codec: closed-loop recon equality,
  * source error bound, motion vectors found on planted translation,
  * inter beating intra, every malformation rejected, and the 'GMC1'
  * AVI container walk. */
class McVideoSpec extends SparkSpec {

  private def encodeChain(frames: Array[Array[Byte]], w: Int, h: Int,
                          mv: Array[Boolean] = new Array[Boolean](1))
      : (Array[Array[Byte]], Array[Array[Byte]], Array[Long]) = {
    val W = (w + 7) & ~7; val H = (h + 7) & ~7
    val bits = new Array[Array[Byte]](frames.length)
    val recons = new Array[Array[Byte]](frames.length)
    val intraAlts = new Array[Long](frames.length)
    var prev: Array[Byte] = null
    for (f <- frames.indices) {
      val (b, r, ia) =
        K.mcEncodeFrame(K.padCanvas(frames(f), w, h), prev, W, H, mv)
      bits(f) = b; recons(f) = r; intraAlts(f) = ia; prev = r
    }
    (bits, recons, intraAlts)
  }

  test("decode == encoder reconstruction bit-exact; source within bound") {
    for (seed <- Seq(1L, 7L, 42L); (w, h, n) <- Seq((10, 10, 3), (16, 16, 2), (20, 13, 4))) {
      val W = (w + 7) & ~7; val H = (h + 7) & ~7
      val src = K.synthGlobalMotion(seed, w, h, n)
      val (bits, recons, _) = encodeChain(src, w, h)
      var prev: Array[Byte] = null
      for (f <- 0 until n) {
        val dec = K.mcDecodeFrame(bits(f), prev, W, H)
        assert(dec != null, s"frame $f failed to decode")
        assert(java.util.Arrays.equals(dec, recons(f)),
          s"decoder diverged from encoder recon at frame $f ($w x $h seed $seed)")
        // cropped source comparison within the quantization bound
        for (y <- 0 until h; x <- 0 until w) {
          val d = math.abs((dec(y * W + x) & 0xff) - (src(f)(y * w + x) & 0xff))
          assert(d <= JpegKernels.ErrBound, s"err $d at ($x,$y) frame $f")
        }
        prev = dec
      }
    }
  }

  test("planted translation: nonzero motion vectors chosen, inter beats intra") {
    val (w, h, n) = (16, 16, 4)
    val src = K.synthGlobalMotion(5L, w, h, n)
    val mv = new Array[Boolean](1)
    val (bits, _, intraAlts) = encodeChain(src, w, h, mv)
    assert(mv(0), "motion search never chose a nonzero vector on a translating scene")
    var interBytes = 0L; var intraBytes = 0L
    for (f <- 1 until n) {
      interBytes += bits(f).length
      // the returned baseline must equal a genuine all-intra encode
      val sep = K.mcEncodeFrame(K.padCanvas(src(f), w, h), null, w, h,
        new Array[Boolean](1))._1.length.toLong
      assert(intraAlts(f) == sep,
        s"intraAlt ${intraAlts(f)} != separate intra encode $sep at frame $f")
      intraBytes += intraAlts(f)
    }
    assert(interBytes < intraBytes,
      s"P-frames ($interBytes B) must beat intra coding ($intraBytes B)")
  }

  test("malformation rejection: every bad stream decodes to null, never throws") {
    val (w, h) = (16, 16)
    val src = K.synthGlobalMotion(9L, w, h, 2)
    val (bits, recons, _) = encodeChain(src, w, h)
    // truncations at every prefix length of both frames
    for (cut <- 0 until bits(0).length)
      assert(K.mcDecodeFrame(java.util.Arrays.copyOf(bits(0), cut), null, w, h) == null)
    for (cut <- 1 until bits(1).length)
      assert(K.mcDecodeFrame(java.util.Arrays.copyOf(bits(1), cut), recons(0), w, h) == null)
    // trailing garbage after a valid frame
    val garbage = bits(0) :+ 0x00.toByte
    assert(K.mcDecodeFrame(garbage, null, w, h) == null)
    // a P frame with no reference canvas
    assert(K.mcDecodeFrame(bits(1), null, w, h) == null)
    // wrong frame-type byte
    val badType = bits(0).clone(); badType(0) = 'X'.toByte
    assert(K.mcDecodeFrame(badType, null, w, h) == null)
    // a motion vector pointing off the canvas: P frame, block 0,
    // mode 1 with mv (-1, 0) at bx=0
    val badMv = Array[Byte]('P'.toByte, 1, -1, 0)
    assert(K.mcDecodeFrame(badMv, recons(0), w, h) == null)
    // an unknown block mode
    val badMode = Array[Byte]('P'.toByte, 9)
    assert(K.mcDecodeFrame(badMode, recons(0), w, h) == null)
    // a coefficient run past position 63
    val badRun = Array[Byte]('I'.toByte, 70)
    assert(K.mcDecodeFrame(badRun, null, w, h) == null)
    // a zero level is never legally coded
    val zeroLevel = Array[Byte]('I'.toByte, 0, 0, 0)
    assert(K.mcDecodeFrame(zeroLevel, null, w, h) == null)
  }

  test("'GMC1' AVI container: round trip, dims, truncation rejected") {
    val (w, h, n) = (18, 12, 3)
    val src = K.synthGlobalMotion(3L, w, h, n)
    val (bits, recons, _) = encodeChain(src, w, h)
    val avi = AviKernels.aviEncodeGmc(w, h, 12, bits)
    assert(avi != null)
    val vid = AviKernels.aviDecodeGmc(avi)
    assert(vid != null && vid.width == w && vid.height == h &&
      vid.fps == 12 && vid.frames.length == n)
    for (f <- 0 until n)
      assert(java.util.Arrays.equals(vid.frames(f), bits(f)))
    assert(AviKernels.aviDecodeGmc(
      java.util.Arrays.copyOf(avi, avi.length / 2)) == null)
    // the MRLE walk must not accept a GMC1 stream and vice versa
    assert(AviKernels.aviDecodeRle8(avi) == null)
    // end-to-end stats row is all-green
    val st = K.mcRoundTripStats(3L, w, h, n, 12)
    assert(st != null)
    assert((4 to 8).forall(st.getBoolean), st.toString)
    // degenerate sizes reject
    assert(K.mcRoundTripStats(3L, 0, 8, 2, 12) == null)
    assert(K.mcRoundTripStats(3L, 8, 8, 1, 12) == null)
    assert(recons(0).length == ((w + 7) & ~7) * ((h + 7) & ~7))
  }
}
