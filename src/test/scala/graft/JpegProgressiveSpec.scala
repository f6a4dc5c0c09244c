package graft

import graft.functions.{JpegKernels, MediaKernels}
import org.scalatest.funsuite.AnyFunSuite

/** Progressive JPEG holds a STRONGER contract than the baseline's lossy
  * error bound: Annex G re-orders the same quantized coefficients across
  * scans, so the progressive stream must decode to BIT-IDENTICAL pixels
  * as the sequential stream of the same input. Any defect in either side
  * — EOB runs, ZRL/correction-bit interleave, the DC/AC point
  * transforms, spectral band bookkeeping — lands a differing byte. */
class JpegProgressiveSpec extends AnyFunSuite {

  private def roundTrip(w: Int, h: Int, c: Int, seed: Long): Unit = {
    val px = MediaKernels.synthPixels(seed, w * h * c)
    val seq = JpegKernels.jpegEncodePixels(w, h, c, px)
    val prog = JpegKernels.jpegEncodeProgressivePixels(w, h, c, px)
    assert(seq != null && prog != null, s"encode failed at ${w}x$h c=$c")
    val dSeq = JpegKernels.jpegDecodeRaw(seq)
    val dProg = JpegKernels.jpegDecodeRaw(prog)
    assert(dSeq != null, s"sequential decode failed at ${w}x$h c=$c")
    assert(dProg != null, s"progressive decode failed at ${w}x$h c=$c")
    assert(dProg.width == w && dProg.height == h && dProg.channels == c)
    assert(java.util.Arrays.equals(dSeq.pixels, dProg.pixels),
      s"progressive != sequential pixels at ${w}x$h c=$c seed=$seed: first diff at " +
        dSeq.pixels.indices.find(i => dSeq.pixels(i) != dProg.pixels(i)).getOrElse(-1))
  }

  test("progressive decode is bit-identical to sequential across sizes and channels") {
    for {
      (w, h) <- Seq((1, 1), (8, 8), (7, 5), (17, 9), (16, 16), (33, 31), (64, 48))
      c <- Seq(1, 3)
      seed <- Seq(1L, 42L, 987654321L)
    } roundTrip(w, h, c, seed)
  }

  test("flat and extreme-value blocks survive the refinement edge cases") {
    // all-zero AC bands (pure EOB scans), max-magnitude values, and
    // single-coefficient blocks exercise EOBRUN and ZRL boundaries
    for ((fill, tag) <- Seq((0, "black"), (255, "white"), (128, "mid"))) {
      val w = 24; val h = 24
      val px = Array.fill[Byte](w * h)(fill.toByte)
      val seq = JpegKernels.jpegEncodePixels(w, h, 1, px)
      val prog = JpegKernels.jpegEncodeProgressivePixels(w, h, 1, px)
      val dSeq = JpegKernels.jpegDecodeRaw(seq)
      val dProg = JpegKernels.jpegDecodeRaw(prog)
      assert(dSeq != null && dProg != null, tag)
      assert(java.util.Arrays.equals(dSeq.pixels, dProg.pixels), tag)
    }
    // a checkerboard maximizes high-frequency coefficients → long runs +
    // many newly-nonzero positions in the 6..63 band
    val w = 32; val h = 32
    val px = Array.tabulate[Byte](w * h)(i =>
      if (((i % w) + (i / w)) % 2 == 0) 0.toByte else 255.toByte)
    val dSeq = JpegKernels.jpegDecodeRaw(JpegKernels.jpegEncodePixels(w, h, 1, px))
    val dProg = JpegKernels.jpegDecodeRaw(
      JpegKernels.jpegEncodeProgressivePixels(w, h, 1, px))
    assert(dSeq != null && dProg != null)
    assert(java.util.Arrays.equals(dSeq.pixels, dProg.pixels), "checkerboard")
  }

  test("progressive streams truncated at every prefix never throw, mostly reject") {
    val px = MediaKernels.synthPixels(7L, 16 * 16 * 3)
    val prog = JpegKernels.jpegEncodeProgressivePixels(16, 16, 3, px)
    (0 until prog.length).foreach { n =>
      try JpegKernels.jpegDecodeRaw(java.util.Arrays.copyOf(prog, n))
      catch { case e: Throwable => fail(s"threw at prefix $n: $e") }
    }
    assert(JpegKernels.jpegDecodeRaw(
      java.util.Arrays.copyOf(prog, prog.length / 2)) == null)
  }

  test("bit flips in progressive streams never throw") {
    val px = MediaKernels.synthPixels(9L, 24 * 16)
    val prog = JpegKernels.jpegEncodeProgressivePixels(24, 16, 1, px)
    val rnd = new scala.util.Random(11)
    (0 until 300).foreach { _ =>
      val m = prog.clone()
      val at = rnd.nextInt(m.length)
      m(at) = (m(at) ^ (1 << rnd.nextInt(8))).toByte
      try JpegKernels.jpegDecodeRaw(m)
      catch { case e: Throwable => fail(s"threw on bit flip at $at: $e") }
    }
  }

  test("progressive: 0xFF fill bytes before markers decode unchanged") {
    // T.81 B.1.1.2 fill padding — before a header marker AND before EOI
    // (after the last scan's entropy data, where a fill parsed as a
    // marker-0xFF would previously mis-read the walk).
    val px = MediaKernels.synthPixels(31L, 16 * 16 * 3)
    val prog = JpegKernels.jpegEncodeProgressivePixels(16, 16, 3, px)
    val base = JpegKernels.jpegDecodeRaw(prog)
    assert(base != null)
    // SOI(2) + APP0(18) = offset 20 is the DQT marker's 0xFF
    val padded = prog.take(20) ++ Array.fill[Byte](2)(0xff.toByte) ++
      prog.dropRight(2).drop(20) ++ Array.fill[Byte](2)(0xff.toByte) ++
      prog.takeRight(2)
    assert((padded(padded.length - 2) & 0xff) == 0xff &&
      (padded(padded.length - 1) & 0xff) == 0xd9)
    val dec = JpegKernels.jpegDecodeRaw(padded)
    assert(dec != null, "fill-padded progressive stream rejected")
    assert(java.util.Arrays.equals(dec.pixels, base.pixels),
      "fill bytes changed progressive decode")
  }

  test("crafted near-max SOF2 dims are rejected before allocation") {
    val px = MediaKernels.synthPixels(3L, 8 * 8)
    val prog = JpegKernels.jpegEncodeProgressivePixels(8, 8, 1, px)
    var p = 2
    var sof = -1
    while (sof < 0 && p + 4 < prog.length) {
      if ((prog(p) & 0xff) == 0xff && (prog(p + 1) & 0xff) == 0xc2) sof = p
      else p += 1
    }
    assert(sof > 0)
    for (dim <- Seq(65535, 46341, 20000)) {
      val m = prog.clone()
      m(sof + 5) = ((dim >> 8) & 0xff).toByte; m(sof + 6) = (dim & 0xff).toByte
      m(sof + 7) = ((dim >> 8) & 0xff).toByte; m(sof + 8) = (dim & 0xff).toByte
      assert(JpegKernels.jpegDecodeRaw(m) == null, s"$dim x $dim")
    }
  }

  test("the certification kernel reports equality and truncation rejection") {
    val r = JpegKernels.jpegProgRoundTripStats(5L, 20, 14, 3)
    assert(r != null)
    assert(r.getInt(0) == 20 && r.getInt(1) == 14 && r.getInt(2) == 3)
    assert(r.getBoolean(3), "prog_equals_seq")
    assert(r.getBoolean(4), "trunc_rejected")
  }
}
