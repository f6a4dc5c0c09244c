package graft

import graft.functions.{MediaExpressions, MediaKernels}
import org.apache.spark.sql.functions._

/** Pixel-level PNG codec (deflate + all five scanline filters) and
  * 16-bit PCM WAV sample codec — the real implementations that closed
  * the pixel/sample half of the multimodal decode seam. */
class PngPixelCodecSpec extends SparkSpec {

  private def roundTrip(w: Int, h: Int, c: Int, seed: Long): Unit = {
    val px = MediaKernels.synthPixels(seed, w * h * c)
    val enc = MediaKernels.pngEncodePixels(w, h, c, px)
    assert(enc != null)
    val dec = MediaKernels.pngDecodeRaw(enc)
    assert(dec != null, s"decode failed for ${w}x${h}x$c")
    assert(dec.width == w && dec.height == h && dec.channels == c)
    assert(dec.pixels.sameElements(px), s"pixel mismatch for ${w}x${h}x$c")
  }

  test("png pixels: exact round trip across all five filter types and color types") {
    // height >= 5 cycles filters None/Sub/Up/Average/Paeth; every channel
    // count; dims that stress bpp offsets and single-pixel rows
    for (c <- Seq(1, 3, 4); (w, h) <- Seq((7, 11), (1, 6), (16, 5), (3, 3)))
      roundTrip(w, h, c, seed = 41L * w + h + c)
  }

  test("png decode verifies CRCs: one flipped IDAT byte rejects the file") {
    val enc = MediaKernels.pngEncodePixels(8, 8, 3, MediaKernels.synthPixels(5L, 192))
    assert(MediaKernels.pngDecodeRaw(enc) != null)
    // IDAT payload starts after sig(8) + IHDR chunk(25); flip a byte
    // inside the IDAT payload (offset 8+25+8+2 lands in deflate data)
    val corrupt = enc.clone()
    corrupt(43) = (corrupt(43) ^ 0x40).toByte
    assert(MediaKernels.pngDecodeRaw(corrupt) == null, "CRC mismatch must reject")
  }

  test("png decode concatenates multiple IDAT chunks") {
    val enc = MediaKernels.pngEncodePixels(9, 7, 3, MediaKernels.synthPixels(9L, 189))
    // split the single IDAT into two chunks, re-CRC both
    val ihdrEnd = 8 + 25
    val idatLen = ((enc(ihdrEnd) & 0xff) << 24) | ((enc(ihdrEnd + 1) & 0xff) << 16) |
      ((enc(ihdrEnd + 2) & 0xff) << 8) | (enc(ihdrEnd + 3) & 0xff)
    assert(idatLen > 2, "need a splittable IDAT")
    val payload = enc.slice(ihdrEnd + 8, ihdrEnd + 8 + idatLen)
    val (p1, p2) = payload.splitAt(idatLen / 2)
    def chunk(payload: Array[Byte]): Array[Byte] = {
      val out = new Array[Byte](12 + payload.length)
      out(0) = (payload.length >>> 24).toByte; out(1) = (payload.length >>> 16).toByte
      out(2) = (payload.length >>> 8).toByte; out(3) = payload.length.toByte
      "IDAT".getBytes("US-ASCII").copyToArray(out, 4)
      payload.copyToArray(out, 8)
      val crc = new java.util.zip.CRC32()
      crc.update(out, 4, 4 + payload.length)
      val v = crc.getValue.toInt
      out(8 + payload.length) = (v >>> 24).toByte
      out(9 + payload.length) = (v >>> 16).toByte
      out(10 + payload.length) = (v >>> 8).toByte
      out(11 + payload.length) = v.toByte
      out
    }
    val rebuilt = enc.take(ihdrEnd) ++ chunk(p1) ++ chunk(p2) ++
      enc.drop(ihdrEnd + 12 + idatLen)
    val dec = MediaKernels.pngDecodeRaw(rebuilt)
    assert(dec != null && dec.width == 9 && dec.height == 7,
      "split IDAT must decode identically")
    assert(dec.pixels.sameElements(MediaKernels.synthPixels(9L, 189)))
  }

  test("png decode rejects truncated deflate streams and trailing garbage") {
    val enc = MediaKernels.pngEncodePixels(6, 6, 1, MediaKernels.synthPixels(3L, 36))
    // drop the IEND chunk and half the IDAT payload, then re-CRC is NOT
    // done — the chunk CRC check itself must reject first
    assert(MediaKernels.pngDecodeRaw(enc.take(enc.length - 20)) == null)
    // a wrong-dims IHDR (more pixels declared than the stream holds):
    // inflate must come up short → null, not an exception
    val small = MediaKernels.pngEncodePixels(2, 2, 1, MediaKernels.synthPixels(1L, 4))
    val grown = small.clone()
    grown(19) = 9 // IHDR width high-byte area: width 2 -> huge is invalid CRC too
    assert(MediaKernels.pngDecodeRaw(grown) == null)
  }

  test("nearest-neighbor resize matches direct index arithmetic") {
    val (w, h, c) = (10, 8, 3)
    val seed = 17L
    val enc = MediaKernels.pngEncodePixels(w, h, c, MediaKernels.synthPixels(seed, w * h * c))
    val (wo, ho) = (4, 3)
    val resized = MediaKernels.pngResize(enc, wo, ho)
    val dec = MediaKernels.pngDecodeRaw(resized)
    assert(dec != null && dec.width == wo && dec.height == ho && dec.channels == c)
    for (y <- 0 until ho; x <- 0 until wo; ch <- 0 until c) {
      val j = ((y * h / ho) * w + (x * w / wo)) * c + ch
      val expected = ((seed + 3L * j) % 256).toByte
      assert(dec.pixels((y * wo + x) * c + ch) == expected,
        s"resized pixel ($x,$y,$ch) wrong")
    }
    // upscale works too (source coords repeat)
    val up = MediaKernels.pngDecodeRaw(MediaKernels.pngResize(enc, 20, 16))
    assert(up != null && up.width == 20 && up.height == 16)
  }

  test("wav pcm: samples round trip exactly, amp_sum matches arithmetic") {
    val (ch, rate, n, seed) = (2, 16000, 301, 77L)
    val enc = MediaKernels.wavEncodePcm(ch, rate, n, seed)
    val st = MediaKernels.wavDecodeStats(enc)
    assert(st != null)
    assert(st.getInt(0) == ch && st.getInt(1) == rate && st.getLong(2) == n.toLong)
    var expected = 0L
    for (j <- 0 until n * ch)
      expected += math.abs(((seed + 5L * j) % 65536).toInt - 32768)
    assert(st.getLong(3) == expected)
    // non-16-bit payloads refuse sample decode (header still parses)
    val eightBit = MediaKernels.wavEncode(1, 8000, 8, 10)
    assert(MediaKernels.wavHeader(eightBit) != null)
    assert(MediaKernels.wavDecodeStats(eightBit) == null)
  }

  test("CodecDecoder: real pixel/sample features for PNG and WAV, named seam for the rest") {
    import graft.operators.Multimodal.{CodecDecoder, MediaRecord}
    val png = MediaKernels.pngEncodePixels(4, 4, 1, MediaKernels.synthPixels(2L, 16))
    val f = CodecDecoder.features(MediaRecord(1L, "image", png, 4, 4, 0L), dim = 4)
    // histogram over REAL decoded pixels: recompute directly
    val px = MediaKernels.synthPixels(2L, 16)
    val expect = new Array[Double](4)
    for (i <- px.indices) expect(i % 4) += (px(i) & 0xff) / 255.0
    assert(f.zip(expect).forall { case (a, b) => math.abs(a - b) < 1e-12 })
    val wav = MediaKernels.wavEncodePcm(1, 8000, 20, 3L)
    val fw = CodecDecoder.features(MediaRecord(2L, "audio", wav, 0, 0, 0L), dim = 4)
    assert(fw.sum > 0.0)
    intercept[UnsupportedOperationException] {
      CodecDecoder.features(MediaRecord(3L, "video", Array[Byte](1, 2, 3), 0, 0, 0L), 4)
    }
  }

  test("registered pixel queries match their arithmetic expectation at sf0.001") {
    val pix = graft.SparkEntry.queries("multimodal_pixels")(spark, sfDir).collect()
    assert(pix.nonEmpty)
    pix.foreach { r =>
      val id = r.getLong(0)
      val (w, h) = ((id % 21 + 4).toInt, (id % 17 + 4).toInt)
      val c = Seq(1, 3, 4)((id % 3).toInt)
      val (wo, ho) = (w / 2, h / 2)
      assert(r.getInt(1) == wo && r.getInt(2) == ho && r.getInt(3) == c)
      var sum = 0L
      for (i <- 0 until wo * ho * c) {
        val chn = i % c; val pi = i / c
        val sx = (pi % wo) * w / wo; val sy = (pi / wo) * h / ho
        sum += (id + 3L * ((sy * w + sx) * c + chn)) % 256
      }
      assert(r.getLong(4) == sum, s"px_sum wrong for doc $id")
    }
    val wavq = graft.SparkEntry.queries("multimodal_waveform")(spark, sfDir).collect()
    assert(wavq.nonEmpty)
    wavq.foreach { r =>
      val id = r.getLong(0)
      val ch = (id % 2 + 1).toInt; val n = (id % 251 + 50).toInt
      assert(r.getInt(1) == ch && r.getLong(3) == n.toLong)
      var amp = 0L
      for (j <- 0 until n * ch) amp += math.abs(((id + 5L * j) % 65536).toInt - 32768)
      assert(r.getLong(4) == amp, s"amp_sum wrong for doc $id")
    }
  }

  test("pixel pipeline stays inside whole-stage codegen") {
    val df = spark.range(0, 8).toDF("id").select(
      MediaExpressions.pngDecodeStats(
        MediaExpressions.pngResize(
          MediaExpressions.pngEncodeSynth(col("id"), lit(10), lit(10), lit(3)),
          lit(5), lit(5))).as("st"))
    assert(df.collect().forall(r => r.getStruct(0).getInt(0) == 5))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), s"expected codegen'd plan:\n$plan")
  }
}
