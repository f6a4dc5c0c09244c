package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bucketed-table ingest: the shuffle you pay ONCE so that repeated
  * large-large joins and aggregations on the bucket key never shuffle
  * again. Two tables bucketed the same way (same key, same bucket count)
  * SortMergeJoin with zero exchanges — and zero per-query sorts when
  * bucket-sorted — whatever their size; a groupBy on the bucket key
  * aggregates in one stage. At 100 TB this converts the dominant
  * per-query cost of a fact-fact join into a one-time ingest cost, which
  * is why training-data stores keep their document/embedding tables
  * bucketed by doc id.
  */
object Bucketing {

  /** Write `df` as a managed parquet table bucketed (and bucket-sorted)
    * by `keys` — multi-column keys hash on all of them, e.g. the minhash
    * signature index bucketed by (band, sig). `sortCols` defaults to the
    * keys themselves. */
  def writeBucketed(df: DataFrame, table: String, keys: Seq[String],
                    buckets: Int, sortCols: Seq[String] = Nil): Unit = {
    require(keys.nonEmpty, "need at least one bucket column")
    val sorted = if (sortCols.isEmpty) keys else sortCols
    df.write.mode("overwrite")
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(sorted.head, sorted.tail: _*)
      .format("parquet")
      .saveAsTable(table)
  }

  /** Append `df` to an existing bucketed table written by [[writeBucketed]]
    * with the SAME keys/buckets — the cheap half of an ingest loop: each
    * append shuffles only the delta into the existing bucket layout (one
    * file per touched bucket), and every join/aggregation on the bucket key
    * stays exchange-free afterwards. The bucket spec must be re-stated
    * because `saveAsTable(Append)` validates it against the catalog — a
    * mismatched spec is an AnalysisException, not silent corruption. Note
    * bucket-SORT guarantees weaken under append (multiple files per
    * bucket): joins stay exchange-free but may re-sort per query. */
  def appendBucketed(df: DataFrame, table: String, keys: Seq[String],
                     buckets: Int, sortCols: Seq[String] = Nil): Unit = {
    require(keys.nonEmpty, "need at least one bucket column")
    val sorted = if (sortCols.isEmpty) keys else sortCols
    df.write.mode("append")
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(sorted.head, sorted.tail: _*)
      .format("parquet")
      .saveAsTable(table)
  }

  /** Z-order (Morton) key: interleave the low `bits` bits of each column
    * so that sorting by the single key clusters rows close in EVERY
    * dimension. Built from shift/and/or expressions only — codegen'd, no
    * UDF. Columns must be non-negative integers (pre-scale skewed domains
    * first); `bits × cols.size` must fit in a long. */
  def zorderKey(cols: Seq[Column], bits: Int = 16): Column = {
    val n = cols.size
    require(n >= 2, "z-order needs at least two dimensions")
    require(bits * n <= 63, s"bits ($bits) x dims ($n) must fit in a long")
    val masked = cols.map(_.cast("long").bitwiseAND(lit((1L << bits) - 1)))
    val terms = for {
      b <- 0 until bits
      (c, j) <- masked.zipWithIndex
    } yield shiftleft(shiftright(c, b).bitwiseAND(lit(1L)), b * n + j)
    terms.reduce(_ bitwiseOR _)
  }

  /** Data layout for multi-column scan pruning: range-partition and sort by
    * the z-order key, so every output file covers a small hyper-rectangle
    * of the key space and parquet min/max statistics prune files for
    * point/range predicates on ANY of the z-columns — not just the leading
    * sort column, which is all a plain sort can serve. The one-time cost is
    * a single range shuffle at ingest; at 100 TB this is the difference
    * between a selective query reading a handful of files and scanning the
    * corpus. */
  def writeZOrdered(df: DataFrame, path: String, zcols: Seq[Column],
                    numFiles: Int, bits: Int = 16): Unit =
    df.withColumn("__z", zorderKey(zcols, bits))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)
}
