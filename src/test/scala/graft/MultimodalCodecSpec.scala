package graft

import graft.functions.{MediaExpressions, MediaKernels}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row

/** Byte-level and plan-level checks of the pure-JVM media codecs — the
  * real implementation behind the multimodal decode seam. */
class MultimodalCodecSpec extends SparkSpec {
  import spark.implicits._

  private def img(b: Array[Byte]): Option[(String, Int, Int, Int, Int)] =
    Option(MediaKernels.imageHeader(b)).map { r =>
      (r.getUTF8String(0).toString, r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4))
    }

  test("png round trip: dims, bit depth, channels for all three color types") {
    for ((ch, _) <- Seq(1 -> 0, 3 -> 2, 4 -> 6)) {
      val b = MediaKernels.pngEncode(1920, 1080, ch)
      assert(img(b).contains(("png", 1920, 1080, 8, ch)))
    }
    assert(img(MediaKernels.pngEncode(1, 1, 3)).contains(("png", 1, 1, 8, 3)))
  }

  test("png bytes are spec-conformant: signature, chunk layout, real CRCs") {
    val b = MediaKernels.pngEncode(640, 480, 3)
    assert(b.take(8).sameElements(
      Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)))
    // IHDR chunk: length 13 at offset 8, type at 12
    assert(new String(b.slice(12, 16), "US-ASCII") == "IHDR")
    val crc = new java.util.zip.CRC32()
    crc.update(b, 12, 4 + 13)
    val stored = ((b(29) & 0xff) << 24) | ((b(30) & 0xff) << 16) |
      ((b(31) & 0xff) << 8) | (b(32) & 0xff)
    assert(stored == crc.getValue.toInt, "IHDR CRC must be a real CRC32")
    assert(new String(b.takeRight(8).slice(0, 4), "US-ASCII") == "IEND")
  }

  test("jpeg round trip walks segments: greyscale and YCbCr") {
    assert(img(MediaKernels.jpegEncode(1280, 720, 3)).contains(("jpeg", 1280, 720, 8, 3)))
    assert(img(MediaKernels.jpegEncode(7, 5, 1)).contains(("jpeg", 7, 5, 8, 1)))
    val b = MediaKernels.jpegEncode(1280, 720, 3)
    assert((b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8, "SOI")
    assert((b(b.length - 2) & 0xff) == 0xff && (b(b.length - 1) & 0xff) == 0xd9, "EOI")
    // APP0 JFIF segment must precede SOF0, forcing a genuine marker walk
    // (SOI 0-1, APP0 marker 2-3, length 4-5, identifier from 6)
    assert(new String(b.slice(6, 10), "US-ASCII") == "JFIF")
  }

  test("gif round trip: little-endian dims, palette channels") {
    assert(img(MediaKernels.gifEncode(320, 200)).contains(("gif", 320, 200, 8, 3)))
    val b = MediaKernels.gifEncode(320, 200)
    assert(new String(b.take(6), "US-ASCII") == "GIF89a")
    assert(b.last == 0x3b, "trailer")
  }

  test("wav round trip incl. non-canonical chunk order and word alignment") {
    val b = MediaKernels.wavEncode(2, 44100, 16, 1000)
    val r = MediaKernels.wavHeader(b)
    assert(r != null)
    assert((r.getInt(0), r.getInt(1), r.getInt(2), r.getLong(3), r.getLong(4)) ==
      ((2, 44100, 16, 1000L, 1000L * 1000 / 44100)))
    assert(b.length == 44 + 1000 * 2 * 2, "declared data size matches actual bytes")

    // a LIST chunk with odd payload before fmt/data: the walker must skip
    // it word-aligned rather than assuming the canonical 44-byte layout
    val list = "LIST".getBytes("US-ASCII") ++ Array[Byte](3, 0, 0, 0, 'x', 'y', 'z', 0)
    val shuffled = b.take(12) ++ list ++ b.drop(12)
    // fix RIFF size
    val riffSize = shuffled.length - 8
    shuffled(4) = riffSize.toByte; shuffled(5) = (riffSize >> 8).toByte
    shuffled(6) = (riffSize >> 16).toByte; shuffled(7) = (riffSize >> 24).toByte
    val r2 = MediaKernels.wavHeader(shuffled)
    assert(r2 != null && r2.getLong(3) == 1000L, "chunk walker survives LIST chunk")
  }

  test("corrupt, truncated, and alien payloads return null, never throw") {
    assert(MediaKernels.imageHeader(null) == null)
    assert(MediaKernels.imageHeader(Array.emptyByteArray) == null)
    assert(MediaKernels.imageHeader("not an image at all".getBytes) == null)
    assert(MediaKernels.wavHeader("RIFFxxxxWAVEbut-truncated".getBytes) == null)
    for (fmt <- Seq("png", "jpeg", "gif")) {
      val whole = MediaKernels.imageEncode(
        org.apache.spark.unsafe.types.UTF8String.fromString(fmt), 100, 50, 3)
      assert(img(whole).isDefined)
      // no prefix may throw, and a cut INSIDE the header region (dims not
      // yet readable) must parse as null
      for (cut <- 0 until whole.length) {
        MediaKernels.imageHeader(whole.take(cut)) // must not throw
      }
      val headerCut = fmt match { case "png" => 20; case "jpeg" => 10; case _ => 10 }
      assert(img(whole.take(headerCut)).isEmpty, s"$fmt cut mid-header must not parse")
    }
    // declared WAV data longer than actual bytes → null
    val w = MediaKernels.wavEncode(1, 8000, 16, 10)
    assert(MediaKernels.wavHeader(w.take(w.length - 1)) == null)
    // invalid encode parameters → null
    assert(MediaKernels.pngEncode(0, 5, 3) == null)
    assert(MediaKernels.jpegEncode(70000, 5, 3) == null, "jpeg dims are 16-bit")
    assert(MediaKernels.wavEncode(1, 8000, 12, 10) == null, "non-PCM bit width")
  }

  test("expressions: codegen path equals interpreted eval and stays in WholeStageCodegen") {
    val df = spark.range(0, 64).toDF("id").select(
      col("id"),
      MediaExpressions.imageHeader(MediaExpressions.imageEncode(
        element_at(typedLit(Seq("png", "jpeg", "gif")), (pmod(col("id"), lit(3)) + 1).cast("int")),
        (col("id") + 1).cast("int"), (col("id") + 2).cast("int"), lit(3))).as("hdr"),
      MediaExpressions.wavHeader(MediaExpressions.wavEncode(
        lit(2), lit(16000), lit(16), (col("id") + 1).cast("int"))).as("wav"))
    val rows = df.collect().sortBy(_.getLong(0))
    assert(rows.length == 64)
    rows.foreach { r =>
      val id = r.getLong(0)
      val hdr = r.getStruct(1)
      assert(hdr.getString(0) == Seq("png", "jpeg", "gif")((id % 3).toInt))
      assert(hdr.getInt(1) == id + 1 && hdr.getInt(2) == id + 2)
      val wav = r.getStruct(2)
      assert(wav.getLong(3) == id + 1)
      assert(wav.getLong(4) == (id + 1) * 1000L / 16000)
    }
    // not CodegenFallback: the projection must sit inside WholeStageCodegen
    // (the `*(n)` prefix in the executed-plan string)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), s"expected codegen'd projection:\n$plan")
  }

  test("registered decode queries match their arithmetic expectation at sf0.001") {
    val dec = graft.SparkEntry.queries("multimodal_decode")(spark, sfDir).collect()
    assert(dec.nonEmpty)
    dec.foreach { r =>
      val id = r.getLong(0)
      assert(r.getString(1) == Seq("png", "jpeg", "gif")((id % 3).toInt))
      assert(r.getInt(2) == (id % 1920) + 1)
      assert(r.getInt(3) == (id % 1080) + 1)
      assert(r.getInt(4) == 8)
    }
    val aud = graft.SparkEntry.queries("multimodal_audio")(spark, sfDir).collect()
    assert(aud.nonEmpty)
    aud.foreach { r =>
      val id = r.getLong(0)
      val rate = Seq(8000, 16000, 44100)((id % 3).toInt)
      assert(r.getInt(2) == rate)
      assert(r.getLong(4) == (id % 997) + 100)
      assert(r.getLong(5) == ((id % 997) + 100) * 1000 / rate)
    }
  }
}
