package graft

import graft.functions.{AviKernels, JpegKernels, MediaExpressions, MediaKernels}
import org.apache.spark.sql.functions._

/** MJPEG-in-AVI video codec — RIFF container walk around per-frame
  * baseline JPEG — the real implementation that made video frame
  * sampling and frame decode run without a library. */
class AviCodecSpec extends SparkSpec {

  private def synthVideo(seed: Long, w: Int, h: Int, n: Int): Array[Byte] = {
    val frames = Array.tabulate(n)(f =>
      JpegKernels.jpegEncodePixels(w, h, 1, MediaKernels.synthPixels(seed + f, w * h)))
    AviKernels.aviEncodeMjpeg(w, h, 12, frames)
  }

  test("avi: container round trip preserves dims, fps, frame count, order, payloads") {
    val enc = synthVideo(5L, 16, 8, 5)
    val vid = AviKernels.aviDecodeMjpeg(enc)
    assert(vid != null)
    assert(vid.width == 16 && vid.height == 8 && vid.fps == 12)
    assert(vid.frames.length == 5)
    // each frame decodes to its own seed's pixels (order preserved)
    vid.frames.zipWithIndex.foreach { case (f, i) =>
      val img = JpegKernels.jpegDecodeRaw(f)
      assert(img != null && img.width == 16 && img.height == 8)
      val px = MediaKernels.synthPixels(5L + i, 128)
      val maxErr = img.pixels.zip(px)
        .map { case (a, b) => math.abs((a & 0xff) - (b & 0xff)) }.max
      assert(maxErr <= JpegKernels.ErrBound, s"frame $i err $maxErr")
    }
  }

  test("avi decode is defensive: truncation, garbage, non-MJPG streams reject") {
    val enc = synthVideo(1L, 8, 8, 3)
    assert(AviKernels.aviDecodeMjpeg(enc) != null)
    assert(AviKernels.aviDecodeMjpeg(java.util.Arrays.copyOf(enc, enc.length / 2)) == null,
      "truncated container must reject, not decode to fewer frames")
    assert(AviKernels.aviDecodeMjpeg(null) == null)
    assert(AviKernels.aviDecodeMjpeg("RIFFxxxxWAVE".getBytes) == null)
    // flip the stream codec to H264 — must reject (library seam)
    val h264 = enc.clone()
    val strhAt = {
      var p = -1; var i = 0
      while (p < 0 && i + 8 < h264.length) {
        if (h264(i) == 's' && h264(i + 1) == 't' && h264(i + 2) == 'r' &&
          h264(i + 3) == 'h') p = i
        i += 1
      }
      p
    }
    assert(strhAt > 0)
    "H264".getBytes("US-ASCII").copyToArray(h264, strhAt + 12)
    assert(AviKernels.aviDecodeMjpeg(h264) == null, "non-MJPG must hit the seam")
  }

  test("avi: one-frame video and odd-length frame payloads (even padding) work") {
    // odd payload lengths exercise the RIFF even-byte padding rule
    val frames = Array(JpegKernels.jpegEncodePixels(9, 9, 1,
      MediaKernels.synthPixels(3L, 81)))
    val enc = AviKernels.aviEncodeMjpeg(9, 9, 1, frames)
    val vid = AviKernels.aviDecodeMjpeg(enc)
    assert(vid != null && vid.frames.length == 1)
    assert(vid.frames(0).sameElements(frames(0)))
  }

  test("expression: avi_round_trip certifies inside codegen over the documents shape") {
    import spark.implicits._
    val rows = Seq(0L, 1L, 5L, 11L).toDF("doc_id")
      .select(col("doc_id"),
        MediaExpressions.aviRoundTrip(col("doc_id"),
          expr("cast(doc_id % 11 + 8 as int)"),
          expr("cast(doc_id % 7 + 8 as int)"),
          expr("cast(doc_id % 6 + 2 as int)"), fps = 12).as("st"))
      .select(col("doc_id"), col("st.width"), col("st.height"), col("st.fps"),
        col("st.n_frames"), col("st.max_err"), col("st.trunc_rejected"))
      .collect()
    rows.foreach { r =>
      val id = r.getLong(0)
      assert(r.getInt(1) == (id % 11 + 8).toInt && r.getInt(2) == (id % 7 + 8).toInt)
      assert(r.getInt(3) == 12 && r.getInt(4) == (id % 6 + 2).toInt)
      assert(r.getInt(5) <= JpegKernels.ErrBound)
      assert(r.getBoolean(6))
    }
  }

  test("CodecDecoder: video features from decoded frames; frame sampling returns JPEGs") {
    val enc = synthVideo(7L, 8, 8, 6)
    val rec = graft.operators.Multimodal.MediaRecord(1L, "video", enc, 8, 8, 500L)
    val f = graft.operators.Multimodal.CodecDecoder.features(rec, 4)
    assert(f.sum > 0, "features must come from decoded pixels")
    val sampled = graft.operators.Multimodal.CodecDecoder.frames(rec, 3)
    assert(sampled.length == 3)
    sampled.foreach(fr => assert(JpegKernels.jpegDecodeRaw(fr) != null,
      "sampled frames must be decodable JPEG payloads"))
    // sampling more than available returns all, in order
    assert(graft.operators.Multimodal.CodecDecoder.frames(rec, 99).length == 6)
  }
}
