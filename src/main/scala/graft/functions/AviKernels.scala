package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow

/** Pure-JVM MJPEG-in-AVI video codec: a RIFF container walk (LIST hdrl
  * with avih/strh/strf, LIST movi with one '00dc' chunk per frame, idx1
  * keyframe index) around per-frame baseline JPEG ([[JpegKernels]]).
  * MJPEG is a real, widely-produced video format (capture cards, older
  * cameras, lab equipment) whose container layer is plain chunk walking
  * and whose frames are exactly the baseline JPEG this library already
  * decodes — so video FRAME-SAMPLING and frame decode run for real.
  * INTER-FRAME (delta) decode is covered by the MS-RLE8 twin
  * ([[RleVideoKernels]], 'MRLE' streams through the same container
  * walk); the remaining library seam is motion-compensated transform
  * codecs (H.264/VP9/AV1 and friends), which genuinely need external
  * libraries.
  *
  * Same defensive contract as the other codecs: decoders return null on
  * malformed input, never throw. Encoders emit spec-consistent sizes
  * (RIFF/LIST sizes, even-byte chunk padding, idx1 entries) so any
  * conformant AVI reader accepts the container structurally.
  */
object AviKernels {

  private def le32(out: Array[Byte], off: Int, v: Int): Unit = {
    out(off) = (v & 0xff).toByte; out(off + 1) = ((v >> 8) & 0xff).toByte
    out(off + 2) = ((v >> 16) & 0xff).toByte; out(off + 3) = ((v >> 24) & 0xff).toByte
  }
  private def rle32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)
  private def fourcc(b: Array[Byte], off: Int): String =
    new String(b, off, 4, "US-ASCII")

  /** Wrap JPEG frame payloads in a minimal standard AVI (RIFF 'AVI ',
    * hdrl with avih + one 'vids'/'MJPG' stream, movi of '00dc' chunks,
    * idx1). Null on invalid dims/fps or empty/null frames. */
  def aviEncodeMjpeg(width: Int, height: Int, fps: Int,
                     frames: Array[Array[Byte]]): Array[Byte] =
    aviEncode(width, height, fps, frames, "MJPG", 24, None,
      keyframeOnly0 = false)

  /** Wrap MS-RLE8 frame streams ([[RleVideoKernels]]) in the same AVI
    * shell: 'MRLE' stream fourcc, 8-bit BITMAPINFOHEADER with
    * biCompression=1 (BI_RLE8) and a 256-entry grayscale palette (8bpp
    * DIBs are palette-indexed; identity grayscale keeps index == sample),
    * and idx1 flags marking ONLY frame 0 as a keyframe — the delta
    * frames are not independently decodable, and the index must say so
    * or a seeking player would corrupt the canvas. */
  def aviEncodeRle8(width: Int, height: Int, fps: Int,
                    frames: Array[Array[Byte]]): Array[Byte] = {
    val pal = new Array[Byte](1024)
    var i = 0
    while (i < 256) {
      pal(i * 4) = i.toByte; pal(i * 4 + 1) = i.toByte; pal(i * 4 + 2) = i.toByte
      i += 1
    }
    aviEncode(width, height, fps, frames, "MRLE", 8, Some(pal),
      keyframeOnly0 = true)
  }

  /** Wrap motion-compensated transform streams ([[McVideoKernels]]) in
    * the same AVI shell: self-specified 'GMC1' stream fourcc (also in
    * strf biCompression, the custom-codec convention), 8-bit frames
    * with the grayscale palette, idx1 keyframe flag on frame 0 only —
    * the P-frames predict from the reconstruction chain and are not
    * independently decodable. */
  def aviEncodeGmc(width: Int, height: Int, fps: Int,
                   frames: Array[Array[Byte]]): Array[Byte] = {
    val pal = new Array[Byte](1024)
    var i = 0
    while (i < 256) {
      pal(i * 4) = i.toByte; pal(i * 4 + 1) = i.toByte; pal(i * 4 + 2) = i.toByte
      i += 1
    }
    aviEncode(width, height, fps, frames, "GMC1", 8, Some(pal),
      keyframeOnly0 = true)
  }

  /** [[aviEncodeGmc]]'s VLC-coded sibling: 'GMV1' stream fourcc for
    * [[McVlcKernels]] frame streams (Annex-B-shaped entropy coding of
    * the same plans). A distinct fourcc keeps the two bitstreams from
    * ever crossing decoders silently. */
  def aviEncodeGmv(width: Int, height: Int, fps: Int,
                   frames: Array[Array[Byte]]): Array[Byte] = {
    val pal = new Array[Byte](1024)
    var i = 0
    while (i < 256) {
      pal(i * 4) = i.toByte; pal(i * 4 + 1) = i.toByte; pal(i * 4 + 2) = i.toByte
      i += 1
    }
    aviEncode(width, height, fps, frames, "GMV1", 8, Some(pal),
      keyframeOnly0 = true)
  }

  private def aviEncode(width: Int, height: Int, fps: Int,
                        frames: Array[Array[Byte]], codec: String,
                        bitCount: Int, palette: Option[Array[Byte]],
                        keyframeOnly0: Boolean): Array[Byte] = {
    if (width <= 0 || height <= 0 || fps <= 0) return null
    if (frames == null || frames.length == 0 || frames.exists(f => f == null || f.isEmpty))
      return null
    val n = frames.length
    val maxFrame = frames.map(_.length).max
    val bos = new java.io.ByteArrayOutputStream(frames.map(_.length).sum + 512)
    def asc(s: String): Unit = bos.write(s.getBytes("US-ASCII"))
    def w32(v: Int): Unit = { val t = new Array[Byte](4); le32(t, 0, v); bos.write(t) }

    // ---- hdrl ----
    val avih = new Array[Byte](56)
    le32(avih, 0, 1000000 / fps)      // microseconds per frame
    le32(avih, 12, 0x10)              // AVIF_HASINDEX
    le32(avih, 16, n)                 // total frames
    le32(avih, 24, 1)                 // streams
    le32(avih, 28, maxFrame)          // suggested buffer
    le32(avih, 32, width); le32(avih, 36, height)
    val strh = new Array[Byte](56)
    "vids".getBytes("US-ASCII").copyToArray(strh, 0)
    codec.getBytes("US-ASCII").copyToArray(strh, 4)
    le32(strh, 20, 1)                 // scale
    le32(strh, 24, fps)               // rate (fps = rate/scale)
    le32(strh, 32, n)                 // length in frames
    le32(strh, 36, maxFrame)
    val palLen = palette.map(_.length).getOrElse(0)
    val strf = new Array[Byte](40 + palLen) // BITMAPINFOHEADER [+ palette]
    le32(strf, 0, 40)
    le32(strf, 4, width); le32(strf, 8, height)
    strf(12) = 1                      // planes
    strf(14) = bitCount.toByte
    codec match {
      case "MJPG" => "MJPG".getBytes("US-ASCII").copyToArray(strf, 16)
      case "MRLE" => le32(strf, 16, 1) // biCompression = BI_RLE8
      case "GMC1" => "GMC1".getBytes("US-ASCII").copyToArray(strf, 16)
      case "GMV1" => "GMV1".getBytes("US-ASCII").copyToArray(strf, 16)
      case other => throw new IllegalArgumentException(s"aviEncode: $other")
    }
    le32(strf, 20, width * height * (bitCount / 8))
    palette.foreach { p =>
      le32(strf, 32, p.length / 4)    // biClrUsed
      p.copyToArray(strf, 40)
    }

    // sizes: LIST strl = 4 + (8+56) + (8+strf); LIST hdrl = 4 + (8+56) + (8+strl)
    val strlSize = 4 + 8 + 56 + 8 + strf.length
    val hdrlSize = 4 + 8 + 56 + 8 + strlSize
    val moviPayload = frames.map(f => 8 + f.length + (f.length & 1)).sum
    val moviSize = 4 + moviPayload
    val idx1Size = 16 * n
    val riffSize = 4 + (8 + hdrlSize) + (8 + moviSize) + (8 + idx1Size)

    asc("RIFF"); w32(riffSize); asc("AVI ")
    asc("LIST"); w32(hdrlSize); asc("hdrl")
    asc("avih"); w32(56); bos.write(avih)
    asc("LIST"); w32(strlSize); asc("strl")
    asc("strh"); w32(56); bos.write(strh)
    asc("strf"); w32(strf.length); bos.write(strf)
    asc("LIST"); w32(moviSize); asc("movi")
    val offsets = new Array[Int](n)
    var rel = 4 // offsets in idx1 are relative to the 'movi' fourcc
    var i = 0
    while (i < n) {
      offsets(i) = rel
      asc("00dc"); w32(frames(i).length); bos.write(frames(i))
      if ((frames(i).length & 1) == 1) bos.write(0) // even padding
      rel += 8 + frames(i).length + (frames(i).length & 1)
      i += 1
    }
    asc("idx1"); w32(idx1Size)
    i = 0
    while (i < n) {
      asc("00dc"); w32(if (keyframeOnly0 && i > 0) 0 else 0x10)
      w32(offsets(i)); w32(frames(i).length)
      i += 1
    }
    bos.toByteArray
  }

  /** Decoded container: dims/fps/frame payloads (still JPEG-encoded —
    * frame-sampling does not pay pixel decode for unsampled frames). */
  final class AviVideo(val width: Int, val height: Int, val fps: Int,
                       val frames: Array[Array[Byte]])

  /** Walk the RIFF container: header dims/fps from avih/strh, frames
    * from the movi LIST's '00dc'/'00db' chunks. Tolerant of unknown
    * chunks; null on truncation, wrong magic, a non-MJPG video stream,
    * or a declared size running past the buffer. */
  def aviDecodeMjpeg(b: Array[Byte]): AviVideo = aviDecodeCodec(b, "MJPG")

  /** [[aviDecodeMjpeg]]'s MS-RLE8 twin: same container walk, 'MRLE'
    * stream required; frames come back as raw RLE8 streams for
    * [[RleVideoKernels.rle8DecodeFrame]] to chain (frame f needs frame
    * f-1's canvas — the inter-frame contract). */
  def aviDecodeRle8(b: Array[Byte]): AviVideo = aviDecodeCodec(b, "MRLE")

  /** [[aviDecodeRle8]]'s motion-compensated twin: 'GMC1' stream
    * required; frames come back as raw I/P bitstreams for
    * [[McVideoKernels.mcDecodeFrame]] to chain over the recon canvas. */
  def aviDecodeGmc(b: Array[Byte]): AviVideo = aviDecodeCodec(b, "GMC1")

  /** 'GMV1' (VLC-coded MC) twin — frames for
    * [[McVlcKernels.mcVlcDecodeFrame]]. */
  def aviDecodeGmv(b: Array[Byte]): AviVideo = aviDecodeCodec(b, "GMV1")

  private def aviDecodeCodec(b: Array[Byte], codec: String): AviVideo = {
    if (b == null || b.length < 24) return null
    if (fourcc(b, 0) != "RIFF" || fourcc(b, 8) != "AVI ") return null
    // the declared RIFF size must fit — a truncated container is
    // rejected outright, never silently decoded to fewer frames
    if (8L + rle32(b, 4) > b.length) return null
    val riffEnd = (8 + rle32(b, 4)).toInt
    var width = 0; var height = 0; var fps = 0
    var sawCodec = false
    val frames = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]

    def walk(from: Int, to: Int): Boolean = { // false => malformed
      var p = from
      while (p + 8 <= to) {
        val id = fourcc(b, p)
        val size = rle32(b, p + 4)
        if (size < 0 || p + 8 + size > to) return false
        id match {
          case "LIST" =>
            if (size < 4) return false
            // recurse into hdrl/strl/movi; skip other lists
            val listType = fourcc(b, p + 8)
            if (listType == "hdrl" || listType == "strl" || listType == "movi") {
              if (!walk(p + 12, p + 8 + size)) return false
            }
          case "avih" =>
            if (size < 40) return false
            val usPerFrame = rle32(b, p + 8)
            if (usPerFrame > 0) fps = math.round(1000000.0 / usPerFrame).toInt
            width = rle32(b, p + 8 + 32); height = rle32(b, p + 8 + 36)
          case "strh" =>
            if (size < 28) return false
            if (fourcc(b, p + 8) == "vids") {
              if (fourcc(b, p + 12) != codec) return false // other codecs: library
              sawCodec = true
              val scale = rle32(b, p + 8 + 20); val rate = rle32(b, p + 8 + 24)
              if (scale > 0 && rate > 0) fps = rate / scale
            }
          case "00dc" | "00db" =>
            frames += java.util.Arrays.copyOfRange(b, p + 8, p + 8 + size)
          case _ => () // strf/idx1/JUNK/unknown: skip
        }
        p += 8 + size + (size & 1)
      }
      true
    }
    if (!walk(12, riffEnd)) return null
    if (!sawCodec || width <= 0 || height <= 0 || frames.isEmpty) return null
    new AviVideo(width, height, math.max(fps, 1), frames.toArray)
  }

  /** Synthesize an n-frame MJPEG AVI whose frame f carries
    * [[MediaKernels.synthPixels]] data seeded `seed + f` — the
    * expression-level encode dual. Null on invalid dims / counts. */
  def aviEncodeSynth(seed: Long, width: Int, height: Int,
                     nFrames: Int, fps: Int): Array[Byte] = {
    if (nFrames <= 0 || nFrames > 256 ||
        width.toLong * height * nFrames > (1 << 24)) return null
    val frames = new Array[Array[Byte]](nFrames)
    var f = 0
    while (f < nFrames) {
      frames(f) = JpegKernels.jpegEncodePixels(width, height, 1,
        MediaKernels.synthPixels(seed + f, width * height))
      if (frames(f) == null) return null
      f += 1
    }
    aviEncodeMjpeg(width, height, fps, frames)
  }

  /** Container decode + per-frame entropy decode + certification:
    * `struct<width,height,fps,n_frames,max_err,trunc_rejected>` where
    * max_err is the max |decoded − synthesized| pixel error over EVERY
    * frame (each frame must round-trip inside the JPEG quantization
    * bound) and trunc_rejected attests a half-length stream decodes to
    * null. Null if the container or any frame fails to decode. */
  def aviRoundTripStats(seed: Long, width: Int, height: Int,
                        nFrames: Int, fps: Int): InternalRow = {
    val enc = aviEncodeSynth(seed, width, height, nFrames, fps)
    if (enc == null) return null
    val vid = aviDecodeMjpeg(enc)
    if (vid == null || vid.width != width || vid.height != height ||
        vid.frames.length != nFrames) return null
    var maxErr = 0
    var f = 0
    while (f < nFrames) {
      val img = JpegKernels.jpegDecodeRaw(vid.frames(f))
      if (img == null || img.width != width || img.height != height) return null
      val px = MediaKernels.synthPixels(seed + f, width * height)
      var i = 0
      while (i < px.length) {
        val e = math.abs((img.pixels(i) & 0xff) - (px(i) & 0xff))
        if (e > maxErr) maxErr = e
        i += 1
      }
      f += 1
    }
    val r = new GenericInternalRow(6)
    r.setInt(0, vid.width); r.setInt(1, vid.height); r.setInt(2, vid.fps)
    r.setInt(3, vid.frames.length); r.setInt(4, maxErr)
    r.setBoolean(5, aviDecodeMjpeg(java.util.Arrays.copyOf(enc, enc.length / 2)) == null)
    r
  }
}
