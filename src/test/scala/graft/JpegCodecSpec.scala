package graft

import graft.functions.{JpegKernels, MediaExpressions, MediaKernels}
import org.apache.spark.sql.functions._

/** Baseline JPEG codec — forward/inverse DCT, Annex-K Huffman entropy
  * coding, byte stuffing, pad+crop — the real implementation that closed
  * the "JPEG entropy decode" half of the multimodal seam. Lossy format,
  * so round trips certify dims + error bound, not bit equality. */
class JpegCodecSpec extends SparkSpec {

  private def roundTrip(w: Int, h: Int, c: Int, seed: Long): Int = {
    val px = MediaKernels.synthPixels(seed, w * h * c)
    val enc = JpegKernels.jpegEncodePixels(w, h, c, px)
    assert(enc != null, s"encode failed for ${w}x${h}x$c")
    val dec = JpegKernels.jpegDecodeRaw(enc)
    assert(dec != null, s"decode failed for ${w}x${h}x$c")
    assert(dec.width == w && dec.height == h && dec.channels == c)
    var maxErr = 0
    var i = 0
    while (i < px.length) {
      maxErr = math.max(maxErr, math.abs((dec.pixels(i) & 0xff) - (px(i) & 0xff)))
      i += 1
    }
    maxErr
  }

  test("jpeg: lossy round trip inside the quantization bound, all shapes") {
    // multiples of 8, non-multiples (pad+crop), single block, gray + RGB
    for (c <- Seq(1, 3); (w, h) <- Seq((8, 8), (16, 24), (9, 13), (1, 1), (33, 7))) {
      val err = roundTrip(w, h, c, seed = 17L * w + h + c)
      assert(err <= JpegKernels.ErrBound,
        s"max err $err exceeds bound ${JpegKernels.ErrBound} for ${w}x${h}x$c")
    }
  }

  test("jpeg: smooth images reconstruct nearly exactly (DC-dominated)") {
    val px = Array.fill[Byte](32 * 32)(100.toByte)
    val dec = JpegKernels.jpegDecodeRaw(JpegKernels.jpegEncodePixels(32, 32, 1, px))
    assert(dec != null)
    val errs = dec.pixels.map(p => math.abs((p & 0xff) - 100))
    assert(errs.max <= 2, s"constant image should be near-exact, max err ${errs.max}")
  }

  test("jpeg: compression is real — noisy bytes shrink vs raw on big images") {
    val n = 128 * 128
    val px = MediaKernels.synthPixels(7L, n)
    val enc = JpegKernels.jpegEncodePixels(128, 128, 1, px)
    // structured synth data + Q=4 must compress below raw size even with
    // header overhead (a broken RLE/Huffman path typically balloons)
    assert(enc.length < n, s"expected < $n bytes, got ${enc.length}")
  }

  test("jpeg decode is defensive: truncation, garbage, non-baseline all reject") {
    val enc = JpegKernels.jpegEncodePixels(24, 24, 3, MediaKernels.synthPixels(3L, 1728))
    assert(JpegKernels.jpegDecodeRaw(enc) != null)
    assert(JpegKernels.jpegDecodeRaw(java.util.Arrays.copyOf(enc, enc.length / 2)) == null)
    assert(JpegKernels.jpegDecodeRaw(null) == null)
    assert(JpegKernels.jpegDecodeRaw(Array[Byte](0, 1, 2, 3)) == null)
    // flip SOF0 -> SOF2 (progressive) — must reject, not misdecode
    val prog = enc.clone()
    var p = 2
    var found = false
    while (!found && p + 4 <= prog.length) {
      if ((prog(p) & 0xff) == 0xff && (prog(p + 1) & 0xff) == 0xc0) {
        prog(p + 1) = 0xc2.toByte; found = true
      } else {
        val len = ((prog(p + 2) & 0xff) << 8) | (prog(p + 3) & 0xff)
        p += 2 + len
      }
    }
    assert(found)
    assert(JpegKernels.jpegDecodeRaw(prog) == null, "progressive must be rejected")
  }

  test("jpeg: 0xFF fill bytes before markers are T.81-legal, decode unchanged") {
    // B.1.1.2 allows any run of 0xFF padding before a marker code;
    // third-party encoders emit them. The walk must read the byte after
    // the LAST 0xFF as the code, not parse the fill as marker 0xFF.
    val px = MediaKernels.synthPixels(23L, 16 * 16 * 3)
    val enc = JpegKernels.jpegEncodePixels(16, 16, 3, px)
    val base = JpegKernels.jpegDecodeRaw(enc)
    assert(base != null)
    // SOI(2) + APP0(18) = offset 20 is the DQT marker's 0xFF — pad it
    val padded = enc.take(20) ++ Array.fill[Byte](3)(0xff.toByte) ++ enc.drop(20)
    val dec = JpegKernels.jpegDecodeRaw(padded)
    assert(dec != null, "fill-padded stream rejected")
    assert(dec.width == base.width && dec.height == base.height &&
      dec.channels == base.channels)
    assert(java.util.Arrays.equals(dec.pixels, base.pixels),
      "fill bytes changed decoded pixels")
  }

  test("jpeg: existing header parser reads the pixel encoder's SOF0") {
    val enc = JpegKernels.jpegEncodePixels(40, 25, 3, MediaKernels.synthPixels(1L, 3000))
    val hdr = MediaKernels.imageHeader(enc)
    assert(hdr != null)
    assert(hdr.getUTF8String(0).toString == "jpeg")
    assert(hdr.getInt(1) == 40 && hdr.getInt(2) == 25)
  }

  test("expression: jpeg_round_trip certifies inside codegen over the documents shape") {
    import spark.implicits._
    val rows = Seq(0L, 1L, 2L, 3L, 254L, 255L).toDF("doc_id")
      .select(col("doc_id"),
        MediaExpressions.jpegRoundTrip(col("doc_id"),
          expr("cast(doc_id % 27 + 9 as int)"),
          expr("cast(doc_id % 19 + 9 as int)"),
          expr("cast(doc_id % 2 * 2 + 1 as int)")).as("st"))
      .select(col("doc_id"), col("st.width"), col("st.height"),
        col("st.channels"), col("st.max_err"), col("st.trunc_rejected"))
      .collect()
    assert(rows.length == 6)
    rows.foreach { r =>
      val id = r.getLong(0)
      assert(r.getInt(1) == (id % 27 + 9).toInt && r.getInt(2) == (id % 19 + 9).toInt)
      assert(r.getInt(3) == (id % 2 * 2 + 1).toInt)
      assert(r.getInt(4) <= JpegKernels.ErrBound,
        s"doc $id max_err ${r.getInt(4)} out of bound")
      assert(r.getBoolean(5), s"doc $id truncation not rejected")
    }
  }

  test("CodecDecoder features histogram decoded JPEG pixels") {
    val px = MediaKernels.synthPixels(0L, 64)
    val enc = JpegKernels.jpegEncodePixels(8, 8, 1, px)
    val rec = graft.operators.Multimodal.MediaRecord(1L, "image", enc, 8, 8, 0L)
    val f = graft.operators.Multimodal.CodecDecoder.features(rec, 4)
    // decoded pixels are within ErrBound of the synth pixels, so each
    // histogram bucket sits within 16 * ErrBound / 255 of the exact value
    val expect = Array.tabulate(4)(b =>
      (0 until 64).filter(_ % 4 == b).map(j => (3L * j % 256) / 255.0).sum)
    (0 until 4).foreach { b =>
      assert(math.abs(f(b) - expect(b)) < 16.0 * JpegKernels.ErrBound / 255.0 + 1e-9)
    }
  }
}
