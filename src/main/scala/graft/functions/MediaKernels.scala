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
}
