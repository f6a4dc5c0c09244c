package graft.sources

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType, StringType,
  StructField, StructType}
import org.json4s._
import org.json4s.jackson.JsonMethods

/** PORTABLE tokenizer serialization — the interop seam a pretraining
  * team crosses when the trained tokenizer leaves Spark for the model
  * trainer: the stored BPE / unigram models ([[TokenizerStore]]) export
  * to ONE documented JSON file and import back bit-losslessly, so the
  * id spaces downstream code depends on survive the hand-off. The
  * parity gate is the registered `tokenizer_export` query
  * (store → export → import → identical segmentations on the planted
  * corpus, totals oracle-replayed) plus TokenizerInteropSpec's
  * field-level round trips.
  *
  * Format (version 1, UTF-8, one JSON object):
  * {{{
  * { "format": "graft-tokenizer", "version": 1,
  *   "kind": "bpe",                         // or "unigram"
  *   "alphabet": "bytes",                   // or "chars"
  *   "merges": [[left, right, freq], ...] } // rank order (bpe only)
  * // unigram carries instead:
  * //  "maxPieceLen": 8, "emRounds": 0,
  * //  "pieces": [[piece, cnt, logp_micro], ...]
  * }}}
  * Byte-alphabet symbols are the stores' own lowercase hex-pair
  * strings; char-alphabet symbols are JSON-escaped verbatim (the
  * serializer handles any code point). Pieces export in the
  * deterministic `(cnt DESC, piece ASC)` vocabulary order — the same
  * ranking that assigns ids — so identical models always serialize to
  * the identical file. The import path re-enters the
  * [[TokenizerStore]] build lifecycle (pin, count, stamp, marker
  * LAST), so a truncated or tampered file fails BY NAME at import or
  * at the first fenced load — never as silent re-segmentation.
  */
object TokenizerInterop {

  val FormatName = "graft-tokenizer"
  val FormatVersion = 1

  // ---- file IO (Hadoop FS — the same filesystems the stores live on,
  // so export works against HDFS/S3/local alike; models are
  // vocabulary-shaped, so one driver-side file is the right shape) ----

  private def writeString(spark: SparkSession, path: String,
                          s: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  private def readString(spark: SparkSession, path: String): String = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(p), s"TokenizerInterop: no file at $path")
    val in = fs.open(p)
    try {
      val bos = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](64 * 1024)
      var n = in.read(buf)
      while (n >= 0) { bos.write(buf, 0, n); n = in.read(buf) }
      new String(bos.toByteArray,
        java.nio.charset.StandardCharsets.UTF_8)
    } finally in.close()
  }

  // ---- shared parse/validation -----------------------------------------

  private def asLong(v: JValue, what: String): Long = v match {
    case JInt(x) => x.toLong
    case JLong(x) => x
    case JDecimal(x) if x.isWhole => x.toLong
    case other => throw new IllegalArgumentException(
      s"TokenizerInterop: $what must be an integer, got $other")
  }

  private def asString(v: JValue, what: String): String = v match {
    case JString(s) => s
    case other => throw new IllegalArgumentException(
      s"TokenizerInterop: $what must be a string, got $other")
  }

  /** Parse + fence the envelope: wrong format name, an unknown
    * version, or the wrong kind all fail by name BEFORE any store is
    * touched. Returns the field map. */
  private def parseDoc(spark: SparkSession, path: String,
                       wantKind: String): Map[String, JValue] = {
    val j = JsonMethods.parse(readString(spark, path)) match {
      case JObject(fields) => fields.toMap
      case other => throw new IllegalArgumentException(
        s"TokenizerInterop: $path is not a JSON object: $other")
    }
    require(j.get("format").map(asString(_, "format"))
        .contains(FormatName),
      s"TokenizerInterop: $path is not a $FormatName file")
    val ver = asLong(j.getOrElse("version",
      throw new IllegalArgumentException(
        s"TokenizerInterop: $path lacks a version")), "version")
    require(ver == FormatVersion,
      s"TokenizerInterop: $path is format version $ver; this reader " +
        s"understands $FormatVersion")
    val kind = asString(j.getOrElse("kind",
      throw new IllegalArgumentException(
        s"TokenizerInterop: $path lacks a kind")), "kind")
    require(kind == wantKind,
      s"TokenizerInterop: $path holds a '$kind' model but was imported " +
        s"as '$wantKind' — the two would re-segment every document " +
        "silently")
    val alphabet = asString(j.getOrElse("alphabet", JString("chars")),
      "alphabet")
    require(alphabet == "bytes" || alphabet == "chars",
      s"TokenizerInterop: unknown alphabet '$alphabet' in $path")
    j
  }

  // ---- BPE --------------------------------------------------------------

  /** Export the stored BPE model (either alphabet) as a version-1
    * interop file: the complete `(left, right, freq)` merge list in
    * rank order plus the stamped alphabet — everything [[importBpe]]
    * needs to rebuild a bit-identical store. */
  def exportBpe(spark: SparkSession, prefix: String, path: String): Unit = {
    val t = TokenizerStore.bpeTable(prefix)
    require(TokenizerStore.isComplete(spark, prefix),
      s"TokenizerInterop: no complete BPE store under $t to export")
    val mode = TokenizerStore.mode(spark, prefix)
    val rows = spark.table(t)
      .select(col("rank").cast(IntegerType), col("left"), col("right"),
        col("freq").cast(LongType))
      .orderBy(col("rank")).collect()
    val merges = JArray(rows.toList.map(r => JArray(List(
      JString(r.getString(1)), JString(r.getString(2)),
      JLong(r.getLong(3))))))
    val doc = JObject(List(
      "format" -> JString(FormatName),
      "version" -> JInt(FormatVersion),
      "kind" -> JString("bpe"),
      "alphabet" -> JString(mode),
      "merges" -> merges))
    writeString(spark, path,
      JsonMethods.compact(JsonMethods.render(doc)))
  }

  /** Import a version-1 BPE interop file under `prefix` — rebuilds the
    * `(rank, left, right, freq)` table through the
    * [[TokenizerStore.buildFrom]] lifecycle (drop, pin, count, stamp,
    * marker last) with the file's alphabet, so the imported store loads
    * through exactly the fences the original did. */
  def importBpe(spark: SparkSession, path: String, prefix: String): Unit = {
    val j = parseDoc(spark, path, "bpe")
    val alphabet = asString(j.getOrElse("alphabet", JString("chars")),
      "alphabet")
    val merges = j.getOrElse("merges",
      throw new IllegalArgumentException(
        s"TokenizerInterop: $path lacks merges")) match {
      case JArray(xs) => xs.zipWithIndex.map {
        case (JArray(List(l, r, f)), i) =>
          Row(i, asString(l, "merge left"), asString(r, "merge right"),
            asLong(f, "merge freq"))
        case (other, i) => throw new IllegalArgumentException(
          s"TokenizerInterop: merge $i must be [left, right, freq], " +
            s"got $other")
      }
      case other => throw new IllegalArgumentException(
        s"TokenizerInterop: merges must be an array, got $other")
    }
    import scala.jdk.CollectionConverters._
    val df = spark.createDataFrame(merges.asJava, StructType(Seq(
      StructField("rank", IntegerType, nullable = false),
      StructField("left", StringType, nullable = false),
      StructField("right", StringType, nullable = false),
      StructField("freq", LongType, nullable = false))))
    TokenizerStore.buildFrom(spark, prefix, df,
      byteLevel = alphabet == "bytes")
  }

  // ---- unigram ----------------------------------------------------------

  /** Export the stored unigram model (either alphabet) as a version-1
    * interop file: the complete `(piece, cnt, logp_micro)` table in the
    * deterministic `(cnt DESC, piece ASC)` vocabulary order, plus the
    * stamped `maxPieceLen` / alphabet / emRounds. */
  def exportUnigram(spark: SparkSession, prefix: String,
                    path: String): Unit = {
    val t = TokenizerStore.unigramTable(prefix)
    require(spark.catalog.tableExists(t) &&
        CatalogProps.propOption(spark, t, "graft.tok.complete")
          .contains("true"),
      s"TokenizerInterop: no complete unigram store under $t to export")
    val alphabet = CatalogProps.propOption(spark, t, "graft.tok.alphabet")
      .getOrElse("chars")
    val maxLen = CatalogProps.prop(spark, t, "graft.tok.maxlen",
      "TokenizerInterop").toInt
    val emRounds = CatalogProps.propOption(spark, t, "graft.tok.emrounds")
      .map(_.toInt).getOrElse(0)
    val rows = spark.table(t)
      .select(col("piece"), col("cnt").cast(LongType),
        col("logp_micro").cast(LongType))
      .orderBy(col("cnt").desc, col("piece")).collect()
    val pieces = JArray(rows.toList.map(r => JArray(List(
      JString(r.getString(0)), JLong(r.getLong(1)), JLong(r.getLong(2))))))
    val doc = JObject(List(
      "format" -> JString(FormatName),
      "version" -> JInt(FormatVersion),
      "kind" -> JString("unigram"),
      "alphabet" -> JString(alphabet),
      "maxPieceLen" -> JInt(maxLen),
      "emRounds" -> JInt(emRounds),
      "pieces" -> pieces))
    writeString(spark, path,
      JsonMethods.compact(JsonMethods.render(doc)))
  }

  /** Import a version-1 unigram interop file under `prefix` through the
    * alphabet-matched [[TokenizerStore]] build lifecycle
    * ([[TokenizerStore.buildUnigramBytesFrom]] /
    * [[TokenizerStore.buildUnigramFrom]]), so the byte/char cross-load
    * fences hold on the imported store exactly as on the original. */
  def importUnigram(spark: SparkSession, path: String,
                    prefix: String): Unit = {
    val j = parseDoc(spark, path, "unigram")
    val alphabet = asString(j.getOrElse("alphabet", JString("chars")),
      "alphabet")
    val maxLen = asLong(j.getOrElse("maxPieceLen",
      throw new IllegalArgumentException(
        s"TokenizerInterop: $path lacks maxPieceLen")),
      "maxPieceLen").toInt
    val emRounds = asLong(j.getOrElse("emRounds", JInt(0)),
      "emRounds").toInt
    val pieces = j.getOrElse("pieces",
      throw new IllegalArgumentException(
        s"TokenizerInterop: $path lacks pieces")) match {
      case JArray(xs) => xs.zipWithIndex.map {
        case (JArray(List(p, c, lp)), _) =>
          Row(asString(p, "piece"), asLong(c, "piece cnt"),
            asLong(lp, "piece logp_micro"))
        case (other, i) => throw new IllegalArgumentException(
          s"TokenizerInterop: piece $i must be " +
            s"[piece, cnt, logp_micro], got $other")
      }
      case other => throw new IllegalArgumentException(
        s"TokenizerInterop: pieces must be an array, got $other")
    }
    import scala.jdk.CollectionConverters._
    val df = spark.createDataFrame(pieces.asJava, StructType(Seq(
      StructField("piece", StringType, nullable = false),
      StructField("cnt", LongType, nullable = false),
      StructField("logp_micro", LongType, nullable = false))))
    if (alphabet == "bytes")
      TokenizerStore.buildUnigramBytesFrom(spark, prefix, df, maxLen,
        emRounds)
    else TokenizerStore.buildUnigramFrom(spark, prefix, df, maxLen)
  }
}
