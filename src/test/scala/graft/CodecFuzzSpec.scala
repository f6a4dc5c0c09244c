package graft

import graft.functions.{AviKernels, JpegKernels, MediaKernels}
import org.scalatest.funsuite.AnyFunSuite

/** The defensive contract every decoder documents — at 100 TB some
  * records WILL be garbage, and a poison byte string must return null,
  * never throw — driven with adversarial inputs: pure noise, truncated
  * valid streams at every prefix length, and bit-flipped valid streams.
  * Seeded PRNG, so a failure reproduces. */
class CodecFuzzSpec extends AnyFunSuite {

  private val decoders: Seq[(String, Array[Byte] => Any)] = Seq(
    ("pngDecodeRaw", MediaKernels.pngDecodeRaw),
    ("pngDecodeStats", MediaKernels.pngDecodeStats),
    ("gifDecodeRaw", MediaKernels.gifDecodeRaw),
    ("gifDecodeStats", MediaKernels.gifDecodeStats),
    ("jpegDecodeRaw", JpegKernels.jpegDecodeRaw),
    ("aviDecodeMjpeg", AviKernels.aviDecodeMjpeg),
    ("imageHeader", MediaKernels.imageHeader),
    ("wavHeader", MediaKernels.wavHeader),
    ("wavDecodeStats", MediaKernels.wavDecodeStats))

  private def neverThrows(what: String, b: Array[Byte]): Unit =
    decoders.foreach { case (name, f) =>
      try f(b)
      catch { case e: Throwable =>
        fail(s"$name threw on $what (len=${b.length}): $e")
      }
    }

  test("random noise never throws in any decoder") {
    val rnd = new scala.util.Random(42)
    (0 until 300).foreach { i =>
      val b = new Array[Byte](rnd.nextInt(2000))
      rnd.nextBytes(b)
      neverThrows(s"noise#$i", b)
    }
    neverThrows("empty", Array.emptyByteArray)
  }

  test("valid streams truncated at every prefix length never throw") {
    val samples = Seq(
      MediaKernels.pngEncodePixels(9, 7, 3, MediaKernels.synthPixels(1L, 189)),
      MediaKernels.gifEncodePixels(12, 9, MediaKernels.synthPixels(2L, 108)),
      JpegKernels.jpegEncodePixels(11, 9, 1, MediaKernels.synthPixels(3L, 99)),
      JpegKernels.jpegEncodeProgressivePixels(11, 9, 3,
        MediaKernels.synthPixels(6L, 297)),
      AviKernels.aviEncodeSynth(4L, 8, 8, 3, 12),
      MediaKernels.wavEncodePcm(1, 16000, 64, 5L))
    samples.foreach { s =>
      (0 until s.length).foreach(len =>
        neverThrows("truncation", java.util.Arrays.copyOf(s, len)))
    }
  }

  test("crafted near-max declared dims are rejected (null), not thrown or allocated") {
    // A ~20-byte header can declare 65535×65535: the naive w*h (or the
    // MCU-padded plane size) overflows Int, and just-under-wrap dims
    // demand multi-GB buffers. Both high-severity ADVICE findings — the
    // decoder must reject BEFORE sizing anything from untrusted dims.
    def patch16le(b: Array[Byte], at: Int, v: Int): Unit = {
      b(at) = (v & 0xff).toByte; b(at + 1) = ((v >> 8) & 0xff).toByte
    }
    def patch16be(b: Array[Byte], at: Int, v: Int): Unit = {
      b(at) = ((v >> 8) & 0xff).toByte; b(at + 1) = (v & 0xff).toByte
    }
    for (dim <- Seq(65535, 46341, 20000)) { // wrap-to-negative, just-past-sqrt(MaxInt), multi-GB
      val gif = MediaKernels.gifEncodePixels(8, 8, MediaKernels.synthPixels(2L, 64))
      patch16le(gif, 6, dim); patch16le(gif, 8, dim)
      assert(MediaKernels.gifDecodeRaw(gif) == null, s"gif $dim x $dim")

      val jpg = JpegKernels.jpegEncodePixels(8, 8, 1, MediaKernels.synthPixels(3L, 64))
      var p = 2
      var sof = -1
      while (sof < 0 && p + 4 < jpg.length) {
        if ((jpg(p) & 0xff) == 0xff && (jpg(p + 1) & 0xff) == 0xc0) sof = p
        else p += 1
      }
      assert(sof > 0)
      patch16be(jpg, sof + 5, dim); patch16be(jpg, sof + 7, dim)
      assert(JpegKernels.jpegDecodeRaw(jpg) == null, s"jpeg $dim x $dim")
    }
  }

  test("single-bit flips of valid streams never throw, and either fail or stay in contract") {
    val rnd = new scala.util.Random(7)
    val png = MediaKernels.pngEncodePixels(8, 8, 1, MediaKernels.synthPixels(1L, 64))
    val gif = MediaKernels.gifEncodePixels(8, 8, MediaKernels.synthPixels(2L, 64))
    val jpg = JpegKernels.jpegEncodePixels(8, 8, 1, MediaKernels.synthPixels(3L, 64))
    val avi = AviKernels.aviEncodeSynth(4L, 8, 8, 2, 12)
    Seq(png, gif, jpg, avi).foreach { s =>
      (0 until 200).foreach { _ =>
        val m = s.clone()
        val at = rnd.nextInt(m.length)
        m(at) = (m(at) ^ (1 << rnd.nextInt(8))).toByte
        neverThrows("bit flip", m)
        // dims contract: if a flipped GIF still decodes, its pixel count
        // must still match its declared dims (the decoder's invariant)
        val g = MediaKernels.gifDecodeRaw(m)
        if (g != null) assert(g.indices.length == g.width * g.height)
      }
    }
  }
}
