package graft

import graft.functions.{MediaExpressions, MediaKernels}
import org.apache.spark.sql.functions._

/** LZW-level GIF codec — variable code width, dictionary reset at 4096,
  * KwKwK handling — the real implementation that closed the "GIF LZW"
  * half of the multimodal decode seam. */
class GifCodecSpec extends SparkSpec {

  private def roundTrip(w: Int, h: Int, px: Array[Byte]): Unit = {
    val enc = MediaKernels.gifEncodePixels(w, h, px)
    assert(enc != null, s"encode failed for ${w}x$h")
    val dec = MediaKernels.gifDecodeRaw(enc)
    assert(dec != null, s"decode failed for ${w}x$h")
    assert(dec.width == w && dec.height == h)
    assert(dec.indices.sameElements(px), s"index mismatch for ${w}x$h")
  }

  test("gif lzw: exact round trip across sizes, including 1-pixel and 1-row images") {
    for ((w, h) <- Seq((1, 1), (7, 1), (1, 9), (13, 11), (40, 30)))
      roundTrip(w, h, MediaKernels.synthPixels(37L * w + h, w * h))
  }

  test("gif lzw: code width grows past 9 and 10 bits on large synthetic images") {
    // 64x64 synthetic: 4096 pixels; synthPixels has period-256 structure
    // but the 3-step stride yields enough novel strings to push the
    // dictionary past 512 and 1024 entries (widths 10 and 11)
    roundTrip(64, 64, MediaKernels.synthPixels(3L, 4096))
  }

  test("gif lzw: dictionary reset (CLEAR at 4096 entries) on incompressible data") {
    // xxhash-noise pixels: nearly every 2-string is novel, so a 128x128
    // image (~16k pixels) forces multiple 4096-entry resets
    val n = 128 * 128
    val px = new Array[Byte](n)
    var i = 0
    while (i < n) {
      px(i) = (org.apache.spark.sql.catalyst.expressions.XXH64
        .hashLong(i, 7L) & 0xff).toByte
      i += 1
    }
    roundTrip(128, 128, px)
    // and highly-compressible data (one long run) round-trips too
    roundTrip(100, 50, Array.fill[Byte](5000)(42))
  }

  test("gif decode is defensive: truncation, bad signature, wrong pixel count") {
    val enc = MediaKernels.gifEncodePixels(16, 16, MediaKernels.synthPixels(1L, 256))
    assert(MediaKernels.gifDecodeRaw(enc) != null)
    assert(MediaKernels.gifDecodeRaw(java.util.Arrays.copyOf(enc, enc.length / 2)) == null,
      "truncated stream must reject")
    val badSig = enc.clone(); badSig(0) = 'X'
    assert(MediaKernels.gifDecodeRaw(badSig) == null)
    // declare a taller image than the data encodes -> pixel-count mismatch
    val badH = enc.clone()
    badH(8) = ((badH(8) & 0xff) + 1).toByte
    // height appears in both LSD and image descriptor; decoder requires
    // they agree, so this must fail either on the match or the count
    assert(MediaKernels.gifDecodeRaw(badH) == null)
    assert(MediaKernels.gifDecodeRaw(null) == null)
    assert(MediaKernels.gifDecodeRaw(Array.emptyByteArray) == null)
  }

  test("gif header parser accepts the pixel encoder's output") {
    val enc = MediaKernels.gifEncodePixels(33, 21, MediaKernels.synthPixels(9L, 693))
    val hdr = MediaKernels.imageHeader(enc)
    assert(hdr != null)
    assert(hdr.getUTF8String(0).toString == "gif")
    assert(hdr.getInt(1) == 33 && hdr.getInt(2) == 21)
  }

  test("expressions: synth -> decode round trip inside codegen matches the arithmetic") {
    import spark.implicits._
    val rows = Seq(0L, 1L, 17L, 255L).toDF("doc_id")
      .select(col("doc_id"),
        MediaExpressions.gifDecodeStats(
          MediaExpressions.gifEncodeSynth(col("doc_id"), lit(20), lit(10))).as("st"))
      .select(col("doc_id"), col("st.width"), col("st.height"),
        col("st.n_colors"), col("st.idx_sum"))
      .collect()
    rows.foreach { r =>
      val seed = r.getLong(0)
      assert(r.getInt(1) == 20 && r.getInt(2) == 10 && r.getInt(3) == 256)
      val expect = (0 until 200).map(j => (seed + 3L * j) % 256).sum
      assert(r.getLong(4) == expect, s"idx_sum mismatch for seed $seed")
    }
  }

  test("CodecDecoder features histogram decoded GIF palette intensities") {
    val enc = MediaKernels.gifEncodePixels(10, 10, MediaKernels.synthPixels(0L, 100))
    val rec = graft.operators.Multimodal.MediaRecord(1L, "image", enc, 10, 10, 0L)
    val f = graft.operators.Multimodal.CodecDecoder.features(rec, 4)
    // grayscale palette: intensity == index; bucket b sums (3j+b-ish)/255
    val expect = Array.tabulate(4)(b =>
      (0 until 100).filter(_ % 4 == b).map(j => (3L * j % 256) / 255.0).sum)
    (0 until 4).foreach(b => assert(math.abs(f(b) - expect(b)) < 1e-9))
  }
}
