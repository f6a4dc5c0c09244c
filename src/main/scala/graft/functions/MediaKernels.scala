package graft.functions

import java.util.zip.CRC32

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.unsafe.types.UTF8String

/** Pure-JVM media container codecs: byte-level encoders and header
  * parsers for PNG / JPEG / GIF images and RIFF-WAVE audio. This is the
  * real implementation behind the multimodal decode seam
  * ([[graft.operators.Multimodal]]): container/header-level decode needs
  * no external codec library, so it runs for real in this build —
  * pixel/sample-level decode remains the documented library seam.
  *
  * Encoders emit spec-conformant byte streams (PNG chunk CRCs are real
  * CRC32s, JPEG segments carry correct big-endian lengths, RIFF sizes
  * are consistent), so the parsers are exercised against honest input
  * and any third-party reader accepts the containers structurally.
  * Parsers are defensive: any truncated, corrupt, or unknown payload
  * returns null rather than throwing — at 100 TB some records WILL be
  * garbage, and a poison byte string must not kill a stage.
  *
  * All methods are static-forwarder callable from generated Java
  * (`graft.functions.MediaKernels.imageHeader(...)`), the same kernel
  * pattern as [[TextKernels]] / [[VectorKernels]].
  */
object MediaKernels {

  // ---------------------------------------------------------------------
  // byte-order helpers
  // ---------------------------------------------------------------------

  private def be32(out: Array[Byte], off: Int, v: Int): Unit = {
    out(off) = (v >>> 24).toByte; out(off + 1) = (v >>> 16).toByte
    out(off + 2) = (v >>> 8).toByte; out(off + 3) = v.toByte
  }
  private def be16(out: Array[Byte], off: Int, v: Int): Unit = {
    out(off) = (v >>> 8).toByte; out(off + 1) = v.toByte
  }
  private def le32(out: Array[Byte], off: Int, v: Int): Unit = {
    out(off) = v.toByte; out(off + 1) = (v >>> 8).toByte
    out(off + 2) = (v >>> 16).toByte; out(off + 3) = (v >>> 24).toByte
  }
  private def le16(out: Array[Byte], off: Int, v: Int): Unit = {
    out(off) = v.toByte; out(off + 1) = (v >>> 8).toByte
  }
  private def rbe32(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
      ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)
  private def rbe16(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 8) | (b(off + 1) & 0xff)
  private def rle32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)
  private def rle16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  // ---------------------------------------------------------------------
  // encoders
  // ---------------------------------------------------------------------

  private val PngSig = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)

  private def pngChunk(name: String, payload: Array[Byte]): Array[Byte] = {
    val out = new Array[Byte](12 + payload.length)
    be32(out, 0, payload.length)
    var i = 0
    while (i < 4) { out(4 + i) = name.charAt(i).toByte; i += 1 }
    System.arraycopy(payload, 0, out, 8, payload.length)
    val crc = new CRC32()
    crc.update(out, 4, 4 + payload.length)
    be32(out, 8 + payload.length, crc.getValue.toInt)
    out
  }

  /** Minimal spec-conformant PNG: signature, IHDR (8-bit, color type from
    * `channels`: 1→greyscale, 3→truecolor, 4→truecolor+alpha), a stub
    * IDAT (zlib header only — headers, not pixels, are the contract
    * here), IEND. Chunk CRCs are real. */
  def pngEncode(width: Int, height: Int, channels: Int): Array[Byte] = {
    if (width <= 0 || height <= 0) return null
    val colorType = channels match {
      case 1 => 0
      case 3 => 2
      case 4 => 6
      case _ => return null
    }
    val ihdr = new Array[Byte](13)
    be32(ihdr, 0, width); be32(ihdr, 4, height)
    ihdr(8) = 8; ihdr(9) = colorType.toByte // bit depth 8; comp/filter/interlace 0
    val chunks = Array(
      pngChunk("IHDR", ihdr),
      pngChunk("IDAT", Array[Byte](0x78, 0x9c.toByte)),
      pngChunk("IEND", Array.emptyByteArray))
    val out = new Array[Byte](PngSig.length + chunks.map(_.length).sum)
    System.arraycopy(PngSig, 0, out, 0, PngSig.length)
    var off = PngSig.length
    chunks.foreach { c => System.arraycopy(c, 0, out, off, c.length); off += c.length }
    out
  }

  /** Minimal JFIF JPEG: SOI, APP0 (so parsers must genuinely walk
    * segments by length), SOF0 with `channels` components (1→greyscale,
    * 3→YCbCr), EOI. Dimensions are 16-bit per the format. */
  def jpegEncode(width: Int, height: Int, channels: Int): Array[Byte] = {
    if (width <= 0 || height <= 0 || width > 0xffff || height > 0xffff) return null
    val ncomp = channels match {
      case 1 => 1
      case 3 => 3
      case _ => return null
    }
    val app0Len = 16                   // segment length incl. the 2 length bytes
    val sofLen = 8 + 3 * ncomp
    val out = new Array[Byte](2 + 2 + app0Len + 2 + sofLen + 2)
    var p = 0
    out(p) = 0xff.toByte; out(p + 1) = 0xd8.toByte; p += 2             // SOI
    out(p) = 0xff.toByte; out(p + 1) = 0xe0.toByte; p += 2             // APP0
    be16(out, p, app0Len)
    "JFIF".getBytes("US-ASCII").copyToArray(out, p + 2)                // id + NUL
    out(p + 7) = 1                                                      // version 1.1
    out(p + 8) = 1
    out(p + 9) = 0                                                      // no density units
    be16(out, p + 10, 1); be16(out, p + 12, 1)                          // density 1×1
    p += app0Len
    out(p) = 0xff.toByte; out(p + 1) = 0xc0.toByte; p += 2             // SOF0
    be16(out, p, sofLen)
    out(p + 2) = 8                                                      // precision
    be16(out, p + 3, height); be16(out, p + 5, width)
    out(p + 7) = ncomp.toByte
    var c = 0
    while (c < ncomp) {
      out(p + 8 + 3 * c) = (c + 1).toByte                               // component id
      out(p + 9 + 3 * c) = if (c == 0) 0x22 else 0x11                   // sampling
      out(p + 10 + 3 * c) = if (c == 0) 0 else 1                        // quant table
      c += 1
    }
    p += sofLen
    out(p) = 0xff.toByte; out(p + 1) = 0xd9.toByte                      // EOI
    out
  }

  /** Minimal GIF89a: header, logical screen descriptor (global color
    * table flag set, color resolution 8 bits, 2-entry table), trailer.
    * Dimensions are 16-bit little-endian per the format. GIF pixels are
    * palette indices into an RGB table — channels is always 3. */
  def gifEncode(width: Int, height: Int): Array[Byte] = {
    if (width <= 0 || height <= 0 || width > 0xffff || height > 0xffff) return null
    val out = new Array[Byte](6 + 7 + 6 + 1)
    "GIF89a".getBytes("US-ASCII").copyToArray(out, 0)
    le16(out, 6, width); le16(out, 8, height)
    out(10) = 0xf0.toByte // GCT present | color resolution 7 (=8 bits) | GCT size 0 (2 entries)
    // bg color 0, aspect 0, then the 2×3-byte global color table (black, white)
    out(16) = 0xff.toByte; out(17) = 0xff.toByte; out(18) = 0xff.toByte
    out(19) = 0x3b // trailer
    out
  }

  /** Canonical RIFF-WAVE (PCM): RIFF header, fmt chunk, data chunk of
    * `nFrames` zeroed frames. All declared sizes are consistent with the
    * actual byte stream. */
  def wavEncode(channels: Int, sampleRate: Int, bitsPerSample: Int, nFrames: Int): Array[Byte] = {
    if (channels <= 0 || channels > 0xffff || sampleRate <= 0 || nFrames < 0 ||
        (bitsPerSample != 8 && bitsPerSample != 16 && bitsPerSample != 24 && bitsPerSample != 32))
      return null
    val blockAlign = channels * (bitsPerSample / 8)
    val dataSize = nFrames * blockAlign
    if (dataSize < 0 || dataSize > (1 << 26)) return null // refuse >64 MiB single records
    val out = new Array[Byte](44 + dataSize)
    "RIFF".getBytes("US-ASCII").copyToArray(out, 0)
    le32(out, 4, 36 + dataSize)
    "WAVE".getBytes("US-ASCII").copyToArray(out, 8)
    "fmt ".getBytes("US-ASCII").copyToArray(out, 12)
    le32(out, 16, 16)                                   // fmt chunk size
    le16(out, 20, 1)                                    // PCM
    le16(out, 22, channels)
    le32(out, 24, sampleRate)
    le32(out, 28, sampleRate * blockAlign)              // byte rate
    le16(out, 32, blockAlign)
    le16(out, 34, bitsPerSample)
    "data".getBytes("US-ASCII").copyToArray(out, 36)
    le32(out, 40, dataSize)
    out
  }

  // ---------------------------------------------------------------------
  // parsers
  // ---------------------------------------------------------------------

  private def imgRow(fmt: String, w: Int, h: Int, depth: Int, channels: Int): InternalRow = {
    val r = new GenericInternalRow(5)
    r.update(0, UTF8String.fromString(fmt))
    r.setInt(1, w); r.setInt(2, h); r.setInt(3, depth); r.setInt(4, channels)
    r
  }

  /** Sniff + parse an image container header:
    * `struct<format, width, height, bit_depth, channels>`, null when the
    * payload is not a recognizable/intact PNG, JPEG, or GIF. */
  def imageHeader(b: Array[Byte]): InternalRow = {
    if (b == null || b.length < 10) return null
    // PNG ------------------------------------------------------------
    if ((b(0) & 0xff) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G') {
      if (b.length < 8) return null
      var p = 8
      while (p + 8 <= b.length) { // walk chunks; IHDR must come first but walk anyway
        val len = rbe32(b, p)
        if (len < 0 || p + 8 + len > b.length) return null
        if (b(p + 4) == 'I' && b(p + 5) == 'H' && b(p + 6) == 'D' && b(p + 7) == 'R') {
          if (len < 13) return null
          val w = rbe32(b, p + 8); val h = rbe32(b, p + 12)
          val depth = b(p + 16) & 0xff
          val channels = (b(p + 17) & 0xff) match {
            case 0 => 1; case 2 => 3; case 3 => 1; case 4 => 2; case 6 => 4
            case _ => return null
          }
          if (w <= 0 || h <= 0) return null
          return imgRow("png", w, h, depth, channels)
        }
        p += 12 + len
      }
      return null
    }
    // JPEG -----------------------------------------------------------
    if ((b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8) {
      var p = 2
      while (p + 4 <= b.length) {
        if ((b(p) & 0xff) != 0xff) return null
        var m = b(p + 1) & 0xff
        while (m == 0xff && p + 2 < b.length) { p += 1; m = b(p + 1) & 0xff } // fill bytes
        if (m == 0xd9 || m == 0xda) return null // EOI / SOS before any SOF
        if (m == 0x01 || (m >= 0xd0 && m <= 0xd7)) { p += 2 } // standalone markers
        else {
          val len = rbe16(b, p + 2)
          if (len < 2 || p + 2 + len > b.length) return null
          val isSof = m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc
          if (isSof) {
            if (len < 8) return null
            val depth = b(p + 4) & 0xff
            val h = rbe16(b, p + 5); val w = rbe16(b, p + 7)
            val ncomp = b(p + 9) & 0xff
            if (w <= 0 || h <= 0 || ncomp <= 0) return null
            return imgRow("jpeg", w, h, depth, ncomp)
          }
          p += 2 + len
        }
      }
      return null
    }
    // GIF ------------------------------------------------------------
    if (b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8' &&
        (b(4) == '7' || b(4) == '9') && b(5) == 'a') {
      if (b.length < 11) return null
      val w = rle16(b, 6); val h = rle16(b, 8)
      if (w <= 0 || h <= 0) return null
      val depth = ((b(10) >> 4) & 0x7) + 1
      return imgRow("gif", w, h, depth, 3)
    }
    null
  }

  /** Parse a RIFF-WAVE header:
    * `struct<channels, sample_rate, bits_per_sample, n_frames, duration_ms>`,
    * null when the payload is not an intact PCM WAV. Walks RIFF chunks
    * (word-aligned) rather than assuming the canonical 44-byte layout, so
    * files with LIST/INFO chunks before `data` still parse. */
  def wavHeader(b: Array[Byte]): InternalRow = {
    if (b == null || b.length < 44) return null
    if (!(b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
          b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E')) return null
    var p = 12
    var channels = -1; var rate = -1; var bits = -1; var blockAlign = -1
    var dataSize = -1L
    while (p + 8 <= b.length && (channels < 0 || dataSize < 0)) {
      val size = rle32(b, p + 4).toLong & 0xffffffffL
      if (b(p) == 'f' && b(p + 1) == 'm' && b(p + 2) == 't' && b(p + 3) == ' ') {
        if (size < 16 || p + 8 + 16 > b.length) return null
        if (rle16(b, p + 8) != 1) return null // PCM only
        channels = rle16(b, p + 10)
        rate = rle32(b, p + 12)
        blockAlign = rle16(b, p + 20)
        bits = rle16(b, p + 22)
      } else if (b(p) == 'd' && b(p + 1) == 'a' && b(p + 2) == 't' && b(p + 3) == 'a') {
        if (p + 8 + size > b.length) return null // declared more data than present
        dataSize = size
      }
      p += 8 + size.toInt + (size.toInt & 1) // chunks are word-aligned
    }
    if (channels <= 0 || rate <= 0 || bits <= 0 || blockAlign <= 0 || dataSize < 0) return null
    if (blockAlign != channels * (bits / 8)) return null
    val nFrames = dataSize / blockAlign
    val r = new GenericInternalRow(5)
    r.setInt(0, channels); r.setInt(1, rate); r.setInt(2, bits)
    r.setLong(3, nFrames); r.setLong(4, nFrames * 1000L / rate)
    r
  }

  /** Dispatching encoder for the synthesis path: format is "png",
    * "jpeg", or "gif". Null on unknown format or invalid dims — same
    * defensive contract as the parsers. */
  def imageEncode(format: UTF8String, width: Int, height: Int, channels: Int): Array[Byte] = {
    if (format == null) return null
    format.toString match {
      case "png"  => pngEncode(width, height, channels)
      case "jpeg" => jpegEncode(width, height, channels)
      case "gif"  => gifEncode(width, height)
      case _      => null
    }
  }

  // ---------------------------------------------------------------------
  // PIXEL-level PNG codec (full: deflate + all five scanline filters)
  //
  // PNG's pixel layer needs only zlib (java.util.zip) and the five
  // per-scanline filters from the spec — no external codec library. This
  // makes pixel decode/resize/feature-extract REAL for PNG; the encoder
  // cycles every filter type across rows so the decoder's defiltering is
  // genuinely exercised, and all chunk CRCs are written and VERIFIED
  // (a real decoder rejects bit rot; so does this one).
  // Supported subset: bit depth 8, color types 0/2/6, non-interlaced —
  // the dominant shapes in training corpora; anything else parses as
  // null, never throws.
  // ---------------------------------------------------------------------

  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  /** Deterministic synthetic pixel buffer: byte j = (seed + 3j) mod 256.
    * Arithmetic a SQL oracle can replay, covering all byte values. */
  def synthPixels(seed: Long, n: Int): Array[Byte] = {
    if (n < 0) return null
    val out = new Array[Byte](n)
    var j = 0
    while (j < n) { out(j) = ((seed + 3L * j) % 256).toByte; j += 1 }
    out
  }

  /** Encode raw 8-bit pixels (row-major, `width*height*channels` bytes)
    * as a real PNG: per-row filter cycling 0..4 (None/Sub/Up/Average/
    * Paeth), zlib-deflated IDAT, real CRCs. Null on invalid dims /
    * channel count / buffer size. */
  def pngEncodePixels(width: Int, height: Int, channels: Int,
                      pixels: Array[Byte]): Array[Byte] = {
    if (width <= 0 || height <= 0) return null
    val colorType = channels match {
      case 1 => 0; case 3 => 2; case 4 => 6; case _ => return null
    }
    if (pixels == null || pixels.length.toLong != width.toLong * height * channels)
      return null
    val bpp = channels
    val stride = width * channels
    val raw = new Array[Byte](height * (1 + stride))
    var y = 0
    while (y < height) {
      val ft = y % 5
      val base = y * (1 + stride)
      raw(base) = ft.toByte
      var i = 0
      while (i < stride) {
        val cur = pixels(y * stride + i) & 0xff
        val left = if (i >= bpp) pixels(y * stride + i - bpp) & 0xff else 0
        val up = if (y > 0) pixels((y - 1) * stride + i) & 0xff else 0
        val ul = if (y > 0 && i >= bpp) pixels((y - 1) * stride + i - bpp) & 0xff else 0
        val pred = ft match {
          case 0 => 0
          case 1 => left
          case 2 => up
          case 3 => (left + up) / 2
          case _ => paeth(left, up, ul)
        }
        raw(base + 1 + i) = ((cur - pred) & 0xff).toByte
        i += 1
      }
      y += 1
    }
    val defl = new java.util.zip.Deflater()
    defl.setInput(raw); defl.finish()
    val bos = new java.io.ByteArrayOutputStream(raw.length / 2 + 64)
    val tmp = new Array[Byte](8192)
    while (!defl.finished()) bos.write(tmp, 0, defl.deflate(tmp))
    defl.end()
    val ihdr = new Array[Byte](13)
    be32(ihdr, 0, width); be32(ihdr, 4, height)
    ihdr(8) = 8; ihdr(9) = colorType.toByte
    val chunks = Array(
      pngChunk("IHDR", ihdr),
      pngChunk("IDAT", bos.toByteArray),
      pngChunk("IEND", Array.emptyByteArray))
    val out = new Array[Byte](PngSig.length + chunks.map(_.length).sum)
    System.arraycopy(PngSig, 0, out, 0, PngSig.length)
    var off = PngSig.length
    chunks.foreach { c => System.arraycopy(c, 0, out, off, c.length); off += c.length }
    out
  }

  /** Full PNG pixel decode: chunk walk with CRC verification, multi-IDAT
    * concatenation, zlib inflate, per-row defiltering. Returns
    * (width, height, channels, pixels) or null on anything malformed —
    * truncation, CRC mismatch, unsupported depth/color/interlace, or an
    * inflate stream of the wrong length. */
  def pngDecodeRaw(b: Array[Byte]): PngImage = {
    if (b == null || b.length < 8) return null
    if (!((b(0) & 0xff) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G')) return null
    var w = 0; var h = 0; var channels = 0
    var seenIhdr = false
    val idat = new java.io.ByteArrayOutputStream()
    var p = 8
    var done = false
    while (!done && p + 8 <= b.length) {
      val len = rbe32(b, p)
      if (len < 0 || p + 12 + len > b.length) return null
      val crc = new CRC32()
      crc.update(b, p + 4, 4 + len)
      if (crc.getValue.toInt != rbe32(b, p + 8 + len)) return null // bit rot
      val name = new String(b, p + 4, 4, "US-ASCII")
      name match {
        case "IHDR" =>
          if (len < 13) return null
          w = rbe32(b, p + 8); h = rbe32(b, p + 12)
          if (w <= 0 || h <= 0 || (b(p + 16) & 0xff) != 8) return null
          channels = (b(p + 17) & 0xff) match {
            case 0 => 1; case 2 => 3; case 6 => 4; case _ => return null
          }
          if ((b(p + 20) & 0xff) != 0) return null // interlaced: unsupported
          seenIhdr = true
        case "IDAT" => idat.write(b, p + 8, len)
        case "IEND" => done = true
        case _ => () // ancillary chunk: skip
      }
      p += 12 + len
    }
    if (!seenIhdr || !done || idat.size() == 0) return null
    val stride = w * channels
    val expected = h * (1 + stride)
    val raw = new Array[Byte](expected)
    val infl = new java.util.zip.Inflater()
    infl.setInput(idat.toByteArray)
    var got = 0
    try {
      while (got < expected && !infl.finished()) {
        val k = infl.inflate(raw, got, expected - got)
        if (k == 0 && infl.needsInput()) return null // truncated stream
        got += k
      }
      if (got != expected || infl.inflate(new Array[Byte](1)) != 0) return null
    } catch { case _: java.util.zip.DataFormatException => return null }
    finally infl.end()
    val bpp = channels
    val px = new Array[Byte](h * stride)
    var y = 0
    while (y < h) {
      val ft = raw(y * (1 + stride)) & 0xff
      if (ft > 4) return null
      var i = 0
      while (i < stride) {
        val f = raw(y * (1 + stride) + 1 + i) & 0xff
        val left = if (i >= bpp) px(y * stride + i - bpp) & 0xff else 0
        val up = if (y > 0) px((y - 1) * stride + i) & 0xff else 0
        val ul = if (y > 0 && i >= bpp) px((y - 1) * stride + i - bpp) & 0xff else 0
        val pred = ft match {
          case 0 => 0
          case 1 => left
          case 2 => up
          case 3 => (left + up) / 2
          case _ => paeth(left, up, ul)
        }
        px(y * stride + i) = ((f + pred) & 0xff).toByte
        i += 1
      }
      y += 1
    }
    new PngImage(w, h, channels, px)
  }

  /** Decoded raw image — a plain holder so generated code can call
    * straight through without Scala tuple boxing. */
  final class PngImage(val width: Int, val height: Int, val channels: Int,
                       val pixels: Array[Byte])

  /** Synthesize-and-encode in one step (pixels from [[synthPixels]]):
    * the expression-level entry for oracle-checkable pixel round trips. */
  def pngEncodeSynth(seed: Long, width: Int, height: Int, channels: Int): Array[Byte] = {
    if (width <= 0 || height <= 0 || width.toLong * height * channels > (1 << 24))
      return null // refuse >16M-pixel-byte single records
    pngEncodePixels(width, height, channels,
      synthPixels(seed, width * height * channels))
  }

  /** Decode + reduce: `struct<width,height,channels,px_sum>` where
    * px_sum is the sum of all decoded pixel bytes (unsigned) — the
    * arithmetic a SQL oracle replays to certify the whole
    * deflate→inflate→defilter path. Null when the payload doesn't
    * decode. */
  def pngDecodeStats(b: Array[Byte]): InternalRow = {
    val img = pngDecodeRaw(b)
    if (img == null) return null
    var sum = 0L
    var i = 0
    val px = img.pixels
    while (i < px.length) { sum += px(i) & 0xff; i += 1 }
    val r = new GenericInternalRow(4)
    r.setInt(0, img.width); r.setInt(1, img.height); r.setInt(2, img.channels)
    r.setLong(3, sum)
    r
  }

  /** Nearest-neighbor resize: decode, resample on integer source
    * coordinates (sx = x·wIn/wOut), re-encode. Null when the input
    * doesn't decode or the target dims are invalid. */
  def pngResize(b: Array[Byte], outW: Int, outH: Int): Array[Byte] = {
    if (outW <= 0 || outH <= 0) return null
    val img = pngDecodeRaw(b)
    if (img == null) return null
    val c = img.channels
    val out = new Array[Byte](outW * outH * c)
    var y = 0
    while (y < outH) {
      val sy = y * img.height / outH
      var x = 0
      while (x < outW) {
        val sx = x * img.width / outW
        var ch = 0
        while (ch < c) {
          out((y * outW + x) * c + ch) = img.pixels((sy * img.width + sx) * c + ch)
          ch += 1
        }
        x += 1
      }
      y += 1
    }
    pngEncodePixels(outW, outH, c, out)
  }

  // ---------------------------------------------------------------------
  // SAMPLE-level WAV codec (16-bit PCM)
  // ---------------------------------------------------------------------

  /** Canonical 16-bit PCM WAV with real sample data: sample j (frame
    * order, channels interleaved) = ((seed + 5j) mod 65536) − 32768,
    * little-endian — arithmetic a SQL oracle can replay. */
  def wavEncodePcm(channels: Int, sampleRate: Int, nFrames: Int, seed: Long): Array[Byte] = {
    val shell = wavEncode(channels, sampleRate, 16, nFrames)
    if (shell == null) return null
    val nSamples = nFrames * channels
    var j = 0
    while (j < nSamples) {
      val v = ((seed + 5L * j) % 65536).toInt - 32768
      shell(44 + 2 * j) = v.toByte
      shell(45 + 2 * j) = (v >> 8).toByte
      j += 1
    }
    shell
  }

  /** Byte offset of the first `data` chunk's payload inside a RIFF
    * stream, or -1. Callers must have validated the container via
    * [[wavHeader]] first. */
  def wavDataOffset(b: Array[Byte]): Int = {
    var p = 12
    while (p + 8 <= b.length) {
      val size = rle32(b, p + 4)
      if (b(p) == 'd' && b(p + 1) == 'a' && b(p + 2) == 't' && b(p + 3) == 'a')
        return p + 8
      p += 8 + size + (size & 1)
    }
    -1
  }

  /** Decode + reduce for 16-bit PCM:
    * `struct<channels,sample_rate,n_frames,amp_sum>` where amp_sum is
    * the sum of |sample| over every decoded sample. Walks RIFF chunks
    * like [[wavHeader]]; null on malformed input or non-16-bit audio. */
  def wavDecodeStats(b: Array[Byte]): InternalRow = {
    val hdr = wavHeader(b)
    if (hdr == null || hdr.getInt(2) != 16) return null
    val channels = hdr.getInt(0)
    val nFrames = hdr.getLong(3)
    val dataOff = wavDataOffset(b)
    if (dataOff < 0) return null
    var sum = 0L
    var j = 0
    val nSamples = (nFrames * channels).toInt
    while (j < nSamples) {
      val v = (b(dataOff + 2 * j) & 0xff) | (b(dataOff + 2 * j + 1).toInt << 8)
      sum += math.abs(v)
      j += 1
    }
    val r = new GenericInternalRow(4)
    r.setInt(0, channels); r.setInt(1, hdr.getInt(1))
    r.setLong(2, nFrames); r.setLong(3, sum)
    r
  }

  // ---------------------------------------------------------------------
  // PIXEL-level GIF codec (LZW)
  // ---------------------------------------------------------------------
  // GIF's only compression is LZW over palette indices — variable-width
  // codes (9..12 bits for an 8-bit palette) packed LSB-first, a CLEAR
  // code that resets the string table when it fills at 4096 entries, and
  // the KwKwK corner case where a code is consumed one step before it is
  // defined. All of it is integer/table work, so like PNG's
  // deflate+filters it is fully in reach of the bare JVM — closing the
  // "GIF LZW" half of the former library seam. Images use a 256-entry
  // grayscale global color table (index i -> RGB(i,i,i)), so palette
  // indices ARE intensities and the PNG/GIF stats reduce identically.

  /** Encode 8-bit palette indices (row-major, `width*height` bytes) as a
    * real GIF89a: 256-gray global color table, image descriptor, and an
    * honest LZW-compressed data stream (variable code width, clear-code
    * reset on table overflow). Null on invalid dims / buffer size. */
  def gifEncodePixels(width: Int, height: Int, indices: Array[Byte]): Array[Byte] = {
    if (width <= 0 || height <= 0 || width > 0xffff || height > 0xffff) return null
    // the codec's 1<<24-pixel budget, mirrored on both sides so
    // encode→decode stays closed (the decoder rejects larger declared
    // dims as its untrusted-input guard)
    if (width.toLong * height > (1 << 24)) return null
    if (indices == null || indices.length.toLong != width.toLong * height) return null
    val bos = new java.io.ByteArrayOutputStream(indices.length / 2 + 64)
    val hdr = new Array[Byte](13)
    "GIF89a".getBytes("US-ASCII").copyToArray(hdr, 0)
    le16(hdr, 6, width); le16(hdr, 8, height)
    hdr(10) = 0xf7.toByte // GCT present | color res 8 | GCT size 7 (256 entries)
    bos.write(hdr)
    var i = 0
    while (i < 256) { bos.write(i); bos.write(i); bos.write(i); i += 1 }
    val desc = new Array[Byte](10)
    desc(0) = 0x2c // image separator; left=top=0, full frame, no LCT
    le16(desc, 5, width); le16(desc, 7, height)
    bos.write(desc)
    bos.write(8) // LZW minimum code size (8-bit palette)

    // LZW: string table keyed (prefixCode << 8 | nextByte) -> code
    val CLEAR = 256; val EOI = 257
    val dict = new java.util.HashMap[Integer, Integer](4096)
    var nextCode = 258
    var codeWidth = 9
    // LSB-first bit packer into 255-byte sub-blocks
    var bitBuf = 0L; var bitCnt = 0
    val block = new Array[Byte](255); var blockLen = 0
    def flushByte(): Unit = {
      block(blockLen) = (bitBuf & 0xff).toByte
      blockLen += 1; bitBuf >>>= 8; bitCnt -= 8
      if (blockLen == 255) { bos.write(blockLen); bos.write(block, 0, blockLen); blockLen = 0 }
    }
    def emit(code: Int): Unit = {
      bitBuf |= code.toLong << bitCnt; bitCnt += codeWidth
      while (bitCnt >= 8) flushByte()
    }
    emit(CLEAR)
    var prefix = indices(0) & 0xff
    i = 1
    while (i < indices.length) {
      val k = indices(i) & 0xff
      val key = Integer.valueOf((prefix << 8) | k)
      val hit = dict.get(key)
      if (hit != null) prefix = hit.intValue()
      else {
        emit(prefix)
        dict.put(key, Integer.valueOf(nextCode))
        // widen AFTER registering: the decoder widens when its next slot
        // reaches 1 << width, and both sides must flip on the same code
        if (nextCode == (1 << codeWidth) && codeWidth < 12) codeWidth += 1
        nextCode += 1
        if (nextCode == 4096) {
          emit(CLEAR); dict.clear(); nextCode = 258; codeWidth = 9
        }
        prefix = k
      }
      i += 1
    }
    emit(prefix); emit(EOI)
    if (bitCnt > 0) flushByte()
    if (blockLen > 0) { bos.write(blockLen); bos.write(block, 0, blockLen) }
    bos.write(0)    // block terminator
    bos.write(0x3b) // trailer
    bos.toByteArray
  }

  /** Decoded GIF — palette indices plus the palette, a plain holder like
    * [[PngImage]]. With the grayscale table indices are intensities. */
  final class GifImage(val width: Int, val height: Int,
                       val indices: Array[Byte], val palette: Array[Byte])

  /** Full GIF pixel decode: LSD + global color table, extension-block
    * skip, image descriptor, LZW decompression (variable width,
    * clear-code reset, KwKwK). Supports the single-image, non-interlaced,
    * no-local-table shape [[gifEncodePixels]] emits (and any conformant
    * file of that shape); anything else — truncation, interlace, bad
    * codes, wrong pixel count — returns null, never throws. */
  def gifDecodeRaw(b: Array[Byte]): GifImage = {
    if (b == null || b.length < 14) return null
    val sig = new String(b, 0, 6, "US-ASCII")
    if (sig != "GIF89a" && sig != "GIF87a") return null
    val w = rle16(b, 6); val h = rle16(b, 8)
    if (w <= 0 || h <= 0) return null
    // Cap header-declared dims before sizing any buffer from them: 65535
    // ×65535 overflows Int (NegativeArraySizeException) and near-max dims
    // demand ~4 GB — both from a ~20-byte crafted header. Mirror
    // gifEncodeSynth's 1<<24-pixel budget; reject, never throw.
    if (w.toLong * h > (1 << 24)) return null
    val flags = b(10) & 0xff
    if ((flags & 0x80) == 0) return null // no global color table
    val gctN = 1 << ((flags & 7) + 1)
    var p = 13
    if (p + 3 * gctN > b.length) return null
    val palette = java.util.Arrays.copyOfRange(b, p, p + 3 * gctN)
    p += 3 * gctN
    // skip extensions until the image descriptor
    while (p < b.length && (b(p) & 0xff) == 0x21) {
      p += 2 // introducer + label
      while (p < b.length && b(p) != 0) p += 1 + (b(p) & 0xff)
      p += 1
    }
    if (p + 10 > b.length || (b(p) & 0xff) != 0x2c) return null
    val left = rle16(b, p + 1); val top = rle16(b, p + 3)
    val iw = rle16(b, p + 5); val ih = rle16(b, p + 7)
    val iflags = b(p + 9) & 0xff
    if (left != 0 || top != 0 || iw != w || ih != h) return null
    if ((iflags & 0xc0) != 0) return null // local table / interlace
    p += 10
    if (p >= b.length) return null
    val minCode = b(p) & 0xff; p += 1
    if (minCode < 2 || minCode > 8) return null
    // concatenate data sub-blocks
    val data = new java.io.ByteArrayOutputStream()
    while (p < b.length && b(p) != 0) {
      val len = b(p) & 0xff
      if (p + 1 + len > b.length) return null
      data.write(b, p + 1, len); p += 1 + len
    }
    if (p >= b.length) return null
    val lzw = data.toByteArray
    val CLEAR = 1 << minCode; val EOI = CLEAR + 1
    val out = new Array[Byte](w * h)
    var outN = 0
    // string table as prefix/suffix links; firstOf(c) = first byte of c's
    // expansion (needed for the KwKwK case without walking the chain)
    val prefixT = new Array[Int](4096)
    val suffixT = new Array[Byte](4096)
    val firstOf = new Array[Byte](4096)
    var c = 0
    while (c < CLEAR) { suffixT(c) = c.toByte; firstOf(c) = c.toByte; c += 1 }
    var nextSlot = EOI + 1
    var codeWidth = minCode + 1
    var prev = -1
    var bitBuf = 0L; var bitCnt = 0; var bp = 0
    def writeCode(code: Int): Boolean = { // expand code into out; false on overflow
      var n = 0
      var cc = code
      while (cc >= CLEAR) { n += 1; cc = prefixT(cc) } // chain length - 1
      n += 1
      if (outN + n > out.length) return false
      var pos = outN + n - 1
      cc = code
      while (cc >= CLEAR) { out(pos) = suffixT(cc); pos -= 1; cc = prefixT(cc) }
      out(pos) = suffixT(cc)
      outN += n
      true
    }
    var done = false
    while (!done) {
      while (bitCnt < codeWidth && bp < lzw.length) {
        bitBuf |= (lzw(bp) & 0xffL) << bitCnt; bitCnt += 8; bp += 1
      }
      if (bitCnt < codeWidth) return null // truncated stream before EOI
      val code = (bitBuf & ((1L << codeWidth) - 1)).toInt
      bitBuf >>>= codeWidth; bitCnt -= codeWidth
      if (code == CLEAR) {
        nextSlot = EOI + 1; codeWidth = minCode + 1; prev = -1
      } else if (code == EOI) {
        done = true
      } else if (prev == -1) {
        if (code >= CLEAR) return null // first code must be a literal
        if (!writeCode(code)) return null
        prev = code
      } else {
        if (code > nextSlot || (code == nextSlot && nextSlot >= 4096)) return null
        val kByte =
          if (code == nextSlot) firstOf(prev) // KwKwK: code defined by this step
          else firstOf(code)
        if (nextSlot < 4096) {
          prefixT(nextSlot) = prev; suffixT(nextSlot) = kByte
          firstOf(nextSlot) = firstOf(prev)
          // widen when the NEXT slot no longer fits the current width —
          // mirrors the encoder's post-register widen
          if (nextSlot + 1 == (1 << codeWidth) && codeWidth < 12) codeWidth += 1
          nextSlot += 1
        }
        if (!writeCode(code)) return null
        prev = code
      }
    }
    if (outN != w * h) return null
    new GifImage(w, h, out, palette)
  }

  /** Synthesize-and-encode dual for GIF (indices from [[synthPixels]]) —
    * the expression-level entry for oracle-checkable LZW round trips. */
  def gifEncodeSynth(seed: Long, width: Int, height: Int): Array[Byte] = {
    if (width <= 0 || height <= 0 || width.toLong * height > (1 << 24)) return null
    gifEncodePixels(width, height, synthPixels(seed, width * height))
  }

  /** Decode + reduce: `struct<width,height,n_colors,idx_sum>` — idx_sum
    * sums every decoded palette index, certifying the whole LZW
    * compress→decompress path against SQL-replayable arithmetic. Null
    * when the payload doesn't decode. */
  def gifDecodeStats(b: Array[Byte]): InternalRow = {
    val img = gifDecodeRaw(b)
    if (img == null) return null
    var sum = 0L
    var i = 0
    while (i < img.indices.length) { sum += img.indices(i) & 0xff; i += 1 }
    val r = new GenericInternalRow(4)
    r.setInt(0, img.width); r.setInt(1, img.height)
    r.setInt(2, img.palette.length / 3); r.setLong(3, sum)
    r
  }
}
