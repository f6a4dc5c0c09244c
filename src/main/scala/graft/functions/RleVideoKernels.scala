package graft.functions

import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.InternalRow

/** Pure-JVM MS-RLE8 INTER-FRAME video codec — the delta-frame seam the
  * MJPEG path deliberately left open: frames after the first encode only
  * the pixels that CHANGED, and every skipped position (delta-escape
  * moves, early line ends) is defined to retain the PREVIOUS frame's
  * pixel. That "undamaged canvas carries forward" rule is the essential
  * mechanic of all motion-compensated codecs, in the simplest format
  * that really ships it: BI_RLE8 (biCompression=1) inside AVI with the
  * 'MRLE' stream fourcc — a real Video-for-Windows codec, decodable by
  * ffmpeg/VLC, specified publicly in the Windows BMP documentation.
  *
  * Stream grammar (per frame, lines BOTTOM-UP like any DIB):
  *   (n>0, v)          paint n copies of palette index v
  *   (0, 0)            end of line — x:=0, line+=1
  *   (0, 1)            end of bitmap
  *   (0, 2, dx, dy)    delta — skip dx right, dy lines up (pixels keep
  *                     their previous-frame values: the INTER part)
  *   (0, n>=3, bytes)  absolute — n literal pixels, padded to even
  *
  * Same defensive contract as the other codecs: decoders return null on
  * malformed/truncated input (a stream without its end-of-bitmap, a run
  * past the line end, a delta off the canvas), never throw. RLE8 is
  * LOSSLESS, so round trips certify exact pixel equality — a stronger
  * oracle than the JPEG error bound.
  */
object RleVideoKernels {

  /** Encode one frame against `prev` (null ⇒ keyframe: every pixel is
    * painted). Pixels are 8-bit palette indices in TOP-DOWN raster
    * order; the stream's lines run bottom-up per the DIB convention.
    * Unchanged pixels are skipped with delta escapes (within a line) or
    * bare end-of-line escapes (whole unchanged lines), runs of ≥3 equal
    * bytes use encoded mode, short mixed stretches use absolute mode.
    * Null on bad dims or size mismatches. */
  def rle8EncodeFrame(cur: Array[Byte], prev: Array[Byte],
                      width: Int, height: Int): Array[Byte] = {
    if (cur == null || width <= 0 || height <= 0 ||
        cur.length != width * height ||
        (prev != null && prev.length != cur.length)) return null
    val out = new java.io.ByteArrayOutputStream(width * height / 4 + 16)
    def emit(a: Int, b: Int): Unit = { out.write(a); out.write(b) }
    var line = 0
    while (line < height) {
      val row = (height - 1 - line) * width
      var x = 0
      // x position the DECODER believes; deltas advance it lazily
      var decX = 0
      while (x < width) {
        // skip unchanged pixels (delta frames only); a fully-unchanged
        // line falls straight through to the bare EOL below
        if (prev != null)
          while (x < width && cur(row + x) == prev(row + x)) x += 1
        if (x < width) {
          // the decoder sits at decX; move it to x with delta escapes
          var skip = x - decX
          while (skip > 0) {
            val d = math.min(skip, 255)
            emit(0, 2); emit(d, 0)
            skip -= d
          }
          // changed segment: [x, segEnd)
          var segEnd = x
          if (prev == null) segEnd = width
          else {
            // extend while changed; tolerate short unchanged gaps (<4)
            // inside a segment — re-painting 3 pixels is cheaper than a
            // 4-byte delta escape
            var gap = 0
            var p = x
            while (p < width && gap < 4) {
              if (cur(row + p) == prev(row + p)) gap += 1 else { gap = 0; segEnd = p + 1 }
              p += 1
            }
          }
          // encode [x, segEnd): runs of >=3 as encoded mode, the rest
          // buffered into absolute mode
          val lit = new java.io.ByteArrayOutputStream(32)
          def flushLit(): Unit = {
            val bs = lit.toByteArray
            var o = 0
            while (bs.length - o >= 3) {
              val n = math.min(bs.length - o, 255)
              if (n >= 3) {
                emit(0, n); out.write(bs, o, n)
                if ((n & 1) == 1) out.write(0) // word padding
                o += n
              }
            }
            while (o < bs.length) { emit(1, bs(o) & 0xff); o += 1 }
            lit.reset()
          }
          while (x < segEnd) {
            var rl = 1
            while (x + rl < segEnd && cur(row + x + rl) == cur(row + x)) rl += 1
            if (rl >= 3) {
              flushLit()
              var left = rl
              while (left > 0) {
                val n = math.min(left, 255)
                emit(n, cur(row + x) & 0xff)
                left -= n
              }
            } else {
              var i = 0
              while (i < rl) { lit.write(cur(row + x) & 0xff); i += 1 }
            }
            x += rl
          }
          flushLit()
          decX = segEnd
        }
      }
      if (line < height - 1) emit(0, 0) // end of line
      line += 1
    }
    emit(0, 1) // end of bitmap
    out.toByteArray
  }

  /** Decode one frame over `prev` (null ⇒ zero canvas). Returns the new
    * TOP-DOWN pixel array, or null on any malformation: a run past the
    * line end, a delta moving off the canvas, absolute bytes running out,
    * painting past the top line, or a stream that ends without its
    * end-of-bitmap escape (truncation is rejected, never partially
    * decoded). */
  def rle8DecodeFrame(data: Array[Byte], prev: Array[Byte],
                      width: Int, height: Int): Array[Byte] = {
    if (data == null || width <= 0 || height <= 0 ||
        (prev != null && prev.length != width * height)) return null
    val canvas =
      if (prev != null) prev.clone() else new Array[Byte](width * height)
    var p = 0
    var x = 0
    var line = 0
    while (p + 2 <= data.length) {
      val c = data(p) & 0xff
      val v = data(p + 1) & 0xff
      p += 2
      if (c > 0) { // encoded run
        if (line >= height || x + c > width) return null
        val row = (height - 1 - line) * width
        var i = 0
        while (i < c) { canvas(row + x + i) = v.toByte; i += 1 }
        x += c
      } else v match {
        case 0 => // end of line
          x = 0; line += 1
          if (line > height) return null
        case 1 => // end of bitmap — the only legal way out
          return canvas
        case 2 => // delta: skipped pixels keep their prev-frame values
          if (p + 2 > data.length) return null
          val dx = data(p) & 0xff; val dy = data(p + 1) & 0xff
          p += 2
          x += dx; line += dy
          if (x > width || line > height) return null
        case n => // absolute mode: n literal pixels + word padding
          val need = n + (n & 1)
          if (p + need > data.length) return null
          if (line >= height || x + n > width) return null
          val row = (height - 1 - line) * width
          var i = 0
          while (i < n) { canvas(row + x + i) = data(p + i); i += 1 }
          p += need
          x += n
      }
    }
    null // ran out of bytes before end-of-bitmap: truncated
  }

  /** Synthesize `nFrames` of planted-motion video: frame 0 is
    * [[MediaKernels.synthPixels]], each later frame copies its
    * predecessor and repaints one small moving rectangle with fresh
    * synthesized values — most pixels are INTER-redundant by
    * construction, which is what delta coding must exploit. */
  def synthMotionFrames(seed: Long, width: Int, height: Int,
                        nFrames: Int): Array[Array[Byte]] = {
    val frames = new Array[Array[Byte]](nFrames)
    frames(0) = MediaKernels.synthPixels(seed, width * height)
    val rw = math.min(4, width); val rh = math.min(3, height)
    var f = 1
    while (f < nFrames) {
      val fp = frames(f - 1).clone()
      val fresh = MediaKernels.synthPixels(seed + f, rw * rh)
      val ox = (f * 3) % (width - rw + 1)
      val oy = (f * 2) % (height - rh + 1)
      var r = 0
      while (r < rh) {
        var ccol = 0
        while (ccol < rw) {
          fp((oy + r) * width + ox + ccol) = fresh(r * rw + ccol)
          ccol += 1
        }
        r += 1
      }
      frames(f) = fp
      f += 1
    }
    frames
  }

  /** Encode planted-motion frames as an 'MRLE' AVI (frame 0 keyframe,
    * the rest delta-coded against their predecessor), decode the
    * container back, chain-decode every frame, and certify:
    * `struct<width, height, fps, n_frames, exact, inter_saves,
    * trunc_rejected>` — `exact` is bit equality of every decoded frame
    * with its planted source (RLE8 is lossless; 0-tolerance, unlike the
    * JPEG bound), `inter_saves` attests the delta-coded frame bytes are
    * strictly smaller than re-keyframing every frame (vacuous at
    * nFrames=1), and `trunc_rejected` attests BOTH a truncated container
    * AND a truncated frame payload decode to null. Null if anything
    * fails to decode. */
  def rleRoundTripStats(seed: Long, width: Int, height: Int,
                        nFrames: Int, fps: Int): InternalRow = {
    if (nFrames <= 0 || nFrames > 256 || width <= 0 || height <= 0 ||
        width.toLong * height * nFrames > (1 << 24)) return null
    val frames = synthMotionFrames(seed, width, height, nFrames)
    val enc = new Array[Array[Byte]](nFrames)
    val keyed = new Array[Array[Byte]](nFrames)
    var f = 0
    while (f < nFrames) {
      enc(f) = rle8EncodeFrame(frames(f), if (f == 0) null else frames(f - 1),
        width, height)
      keyed(f) = rle8EncodeFrame(frames(f), null, width, height)
      if (enc(f) == null || keyed(f) == null) return null
      f += 1
    }
    val avi = AviKernels.aviEncodeRle8(width, height, fps, enc)
    if (avi == null) return null
    val vid = AviKernels.aviDecodeRle8(avi)
    if (vid == null || vid.width != width || vid.height != height ||
        vid.frames.length != nFrames) return null
    var exact = true
    var prevPx: Array[Byte] = null
    f = 0
    while (f < nFrames) {
      val px = rle8DecodeFrame(vid.frames(f), prevPx, width, height)
      if (px == null) return null
      if (!java.util.Arrays.equals(px, frames(f))) exact = false
      prevPx = px
      f += 1
    }
    val interSaves = nFrames == 1 ||
      enc.map(_.length.toLong).sum < keyed.map(_.length.toLong).sum
    val truncFrame =
      if (enc(0).length < 2) true
      else rle8DecodeFrame(
        java.util.Arrays.copyOf(enc(0), enc(0).length - 2), null,
        width, height) == null
    val truncRejected =
      AviKernels.aviDecodeRle8(
        java.util.Arrays.copyOf(avi, avi.length / 2)) == null && truncFrame
    val r = new GenericInternalRow(7)
    r.setInt(0, vid.width); r.setInt(1, vid.height); r.setInt(2, vid.fps)
    r.setInt(3, vid.frames.length)
    r.setBoolean(4, exact); r.setBoolean(5, interSaves)
    r.setBoolean(6, truncRejected)
    r
  }
}
