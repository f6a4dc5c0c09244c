package graft.sources

import org.apache.spark.sql.DataFrame

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
    * by `key` — `sortCols` defaults to the key itself. */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int, sortCols: Seq[String] = Nil): Unit = {
    val sorted = if (sortCols.isEmpty) Seq(key) else sortCols
    df.write.mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(sorted.head, sorted.tail: _*)
      .format("parquet")
      .saveAsTable(table)
  }
}
