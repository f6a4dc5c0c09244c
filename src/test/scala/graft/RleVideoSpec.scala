package graft

import graft.functions.{AviKernels, RleVideoKernels => K}

/** MS-RLE8 inter-frame codec: stream grammar against hand-decoded
  * canvases, keyframe/delta round trips, the carried-canvas contract,
  * malformation rejection, and the 'MRLE' AVI container walk. */
class RleVideoSpec extends SparkSpec {


  test("hand-crafted streams: runs, absolute, delta skip, EOL, EOB") {
    // 4x2 canvas, bottom-up lines. Stream paints bottom line with a run
    // of 3 'a' + 1 literal 'b', EOL, then delta-skips 2 and paints "cd".
    val stream = Array[Int](
      3, 'a', 1, 'b',     // bottom line: aaab
      0, 0,               // end of line
      0, 2, 2, 0,         // delta: skip 2 pixels right
      0, 3, 'c', 'd', 'e', 0, // absolute 3 ("cde" won't fit → see below)
      0, 1                // end of bitmap
    ).map(_.toByte)
    // x after delta = 2; absolute 3 would paint cols 2..4 on a width-4
    // canvas → out of bounds → null (bounds are per-op, not best-effort)
    assert(K.rle8DecodeFrame(stream, null, 4, 2) == null)
    val ok = Array[Int](
      3, 'a', 1, 'b',
      0, 0,
      0, 2, 2, 0,
      2, 'c',             // run of 2 at cols 2,3
      0, 1).map(_.toByte)
    val got = K.rle8DecodeFrame(ok, null, 4, 2)
    // top-down raster: top line (line 1) = 0,0,c,c (delta-skipped
    // pixels keep the zero keyframe canvas); bottom line (line 0) = aaab
    val expected = Array[Byte](0, 0, 'c', 'c', 'a', 'a', 'a', 'b')
    assert(got != null && java.util.Arrays.equals(got, expected),
      got.toSeq.toString)
  }

  test("keyframe round trip is exact on random and patterned pixels") {
    for (seed <- 1L to 20L; (w, h) <- Seq((1, 1), (4, 2), (7, 5), (16, 9))) {
      val cur = graft.functions.MediaKernels.synthPixels(seed, w * h)
      val enc = K.rle8EncodeFrame(cur, null, w, h)
      assert(enc != null)
      val dec = K.rle8DecodeFrame(enc, null, w, h)
      assert(dec != null && java.util.Arrays.equals(dec, cur),
        s"keyframe mismatch at seed=$seed ${w}x$h")
    }
    // long runs exercise encoded mode + the 255 chunking
    val runs = Array.fill(600)('x'.toByte)
    val enc = K.rle8EncodeFrame(runs, null, 300, 2)
    assert(enc.length < 20, s"run coding failed: ${enc.length} bytes")
    assert(java.util.Arrays.equals(K.rle8DecodeFrame(enc, null, 300, 2), runs))
  }

  test("delta frames: skipped pixels come from the PREVIOUS canvas") {
    val w = 8; val h = 4
    val prev = Array.tabulate(w * h)(i => (i + 1).toByte)
    val cur = prev.clone()
    cur(10) = 99; cur(11) = 98; cur(29) = 97   // sparse changes
    val enc = K.rle8EncodeFrame(cur, prev, w, h)
    assert(enc != null)
    // decoding over prev reconstructs cur exactly...
    assert(java.util.Arrays.equals(K.rle8DecodeFrame(enc, prev, w, h), cur))
    // ...and the unchanged pixels really were CARRIED, not re-painted:
    // decode the same stream over a sentinel canvas — changed positions
    // match cur, at least one unchanged position keeps the sentinel
    val sentinel = Array.fill(w * h)(0x55.toByte)
    val over = K.rle8DecodeFrame(enc, sentinel, w, h)
    assert(over(10) == 99 && over(11) == 98 && over(29) == 97)
    assert(over(0) == 0x55.toByte && over(w * h - 1) == 0x55.toByte,
      "encoder re-painted pixels it should have skipped")
    // delta stream is much smaller than a keyframe of the same pixels
    val key = K.rle8EncodeFrame(cur, null, w, h)
    assert(enc.length < key.length,
      s"delta ${enc.length}B not smaller than keyframe ${key.length}B")
    // identical frames collapse to bare line ends
    val same = K.rle8EncodeFrame(prev, prev, w, h)
    assert(same.length == 2 * (h - 1) + 2, s"got ${same.length} bytes")
  }

  test("malformations reject by null: overrun, truncation, bad delta") {
    // run past the line end
    assert(K.rle8DecodeFrame(Array[Int](9, 'a', 0, 1).map(_.toByte), null, 4, 2) == null)
    // delta off the canvas
    assert(K.rle8DecodeFrame(Array[Int](0, 2, 200, 200, 0, 1).map(_.toByte), null, 4, 2) == null)
    // absolute mode bytes running out
    assert(K.rle8DecodeFrame(Array[Int](0, 5, 'a', 'b').map(_.toByte), null, 4, 2) == null)
    // stream without end-of-bitmap (truncation)
    assert(K.rle8DecodeFrame(Array[Int](2, 'a').map(_.toByte), null, 4, 2) == null)
    // every prefix of a valid stream must reject or decode — never throw
    val full = K.rle8EncodeFrame(
      graft.functions.MediaKernels.synthPixels(7L, 24), null, 6, 4)
    for (cut <- 0 until full.length)
      K.rle8DecodeFrame(java.util.Arrays.copyOf(full, cut), null, 6, 4)
  }

  test("'MRLE' AVI container: round trip, codec fencing, chained decode") {
    val frames = K.synthMotionFrames(42L, 10, 7, 5)
    val enc = frames.zipWithIndex.map { case (f, i) =>
      K.rle8EncodeFrame(f, if (i == 0) null else frames(i - 1), 10, 7)
    }
    val avi = AviKernels.aviEncodeRle8(10, 7, 12, enc)
    assert(avi != null)
    val vid = AviKernels.aviDecodeRle8(avi)
    assert(vid != null && vid.width == 10 && vid.height == 7 &&
      vid.fps == 12 && vid.frames.length == 5)
    var prev: Array[Byte] = null
    for (f <- 0 until 5) {
      val p = K.rle8DecodeFrame(vid.frames(f), prev, 10, 7)
      assert(java.util.Arrays.equals(p, frames(f)), s"frame $f differs")
      prev = p
    }
    // codec fencing both ways: an MRLE container is not MJPEG, and
    // vice versa — silently decoding the wrong codec would hand RLE
    // streams to the JPEG decoder
    assert(AviKernels.aviDecodeMjpeg(avi) == null)
    val mjpeg = AviKernels.aviEncodeSynth(1L, 8, 8, 2, 10)
    assert(AviKernels.aviDecodeRle8(mjpeg) == null)
  }

  test("rleRoundTripStats certifies exactness, inter savings, truncation") {
    for (seed <- Seq(0L, 3L, 1234L); n <- Seq(1, 2, 6)) {
      val r = K.rleRoundTripStats(seed, 9, 6, n, 12)
      assert(r != null, s"seed=$seed n=$n")
      assert(r.getInt(0) == 9 && r.getInt(1) == 6 && r.getInt(3) == n)
      assert(r.getBoolean(4), "not exact")
      assert(r.getBoolean(5), "delta coding failed to beat keyframes")
      assert(r.getBoolean(6), "truncation not rejected")
    }
    // guards
    assert(K.rleRoundTripStats(1L, 0, 4, 2, 12) == null)
    assert(K.rleRoundTripStats(1L, 4, 4, 0, 12) == null)
  }
}
