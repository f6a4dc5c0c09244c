package graft.streaming

import graft.operators.Pca
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** A PCA moment table maintained from a vector stream — the streaming
  * half of [[graft.operators.Pca]]: the packed first+second moment state
  * (`[n, d, sums…, outer-sums…]`, [[graft.functions
  * .VectorMomentsAggregator]]'s output) is MERGEABLE — element-wise
  * addable — which makes it exactly the shape the fenced sketch-table
  * family stores. Each micro-batch aggregates its own vectors into one
  * d²-sized packed row (a normal partial+final aggregation, constant in
  * the batch's row count) and folds it into the stored state behind
  * [[FencedStore]]'s batch-id fence; [[model]] then fits a full
  * [[Pca.PcaModel]] from the STORED STATE ALONE — the vector history is
  * never rescanned, and a model over everything-seen-so-far costs one
  * driver eigensolve regardless of how many batches arrived.
  *
  * Replay semantics, documented honestly (the KLL/freq side of the
  * family, not the HLL side): moments summarize a MULTISET — a replayed
  * batch that escaped the fence would double-weight its vectors — so
  * the fence is the SINGLE exactly-once layer. The spec asserts a full
  * fresh-checkpoint replay leaves the stored state bit-identical.
  *
  * The merge is driver-side on two report-sized rows (≤ 8 MB each at
  * the MaxDim=1024 guard, enforced in the aggregator's reduce before
  * any d² allocation) — never data-sized. */
object StreamingPca {

  /** Vector stream schema for [[stream]]. */
  val eventSchema: StructType = StructType(Seq(
    StructField("vec", ArrayType(DoubleType))))

  private val tableSchema = StructType(Seq(
    StructField("packed", ArrayType(DoubleType, containsNull = false))))

  private def fencePrefix(prefix: String) = s"${prefix}_pcamom"

  def provision(spark: SparkSession, prefix: String): Unit =
    FencedStore.provision(spark, fencePrefix(prefix), tableSchema)

  /** The stored packed moments as of the last applied batch (0 or 1 row). */
  def current(spark: SparkSession, prefix: String): DataFrame =
    FencedStore.current(spark, fencePrefix(prefix))

  /** Element-wise moment merge: same dimension required, counts and all
    * sums add. Both operands are packed `[n, d, …]` states. */
  private[streaming] def mergePacked(a: Seq[Double],
                                     b: Seq[Double]): Seq[Double] = {
    require(a(1) == b(1),
      s"StreamingPca: dimension changed mid-stream — stored d=${a(1).toInt}, " +
        s"batch d=${b(1).toInt}; a corpus cannot mix embedding widths")
    val out = new Array[Double](a.length)
    out(0) = a(0) + b(0)
    out(1) = a(1)
    var i = 2
    while (i < out.length) { out(i) = a(i) + b(i); i += 1 }
    out.toSeq
  }

  /** Fold one micro-batch of vectors in (idempotent per batch id). */
  def applyBatch(spark: SparkSession, prefix: String, batch: DataFrame,
                 batchId: Long): Boolean =
    FencedStore.applyBatch(spark, fencePrefix(prefix), tableSchema, batchId) {
      cur =>
        if (batch.isEmpty) None
        else {
          val agg = udaf(graft.functions.VectorMomentsAggregator)
          // Same in-column null-element poison as Pca.train: a vector with
          // null ELEMENTS must fail by name here, not as an opaque encoder
          // NPE (or a silent 0.0 fill) — the aggregator's own Seq-level
          // check sits after deserialization and may never see the null.
          val v0 = col("vec").cast("array<double>")
          val guarded = when(v0.isNotNull && exists(v0, x => x.isNull),
            raise_error(lit("StreamingPca.applyBatch: a vector contains " +
              "null elements — clean or filter the embedding column " +
              "before folding moments")).cast("array<double>"))
            .otherwise(v0)
          val delta = batch
            .select(guarded.as("v"))
            .agg(agg(col("v"))).head().getSeq[Double](0)
          if (delta.isEmpty) None // all-null/empty batch: nothing to fold
          else {
            val stored = cur.collect() // ≤ 1 report-sized row
            val merged =
              if (stored.isEmpty || stored(0).getSeq[Double](0).isEmpty) delta
              else mergePacked(stored(0).getSeq[Double](0), delta)
            import scala.jdk.CollectionConverters._
            Some(spark.createDataFrame(
              Seq(Row(merged)).asJava, tableSchema))
          }
        }
    }

  /** Fit a k-component model from the stored moments alone — one driver
    * eigensolve over the d×d covariance, zero scans. Fails by name on an
    * empty store (nothing folded yet). */
  def model(spark: SparkSession, prefix: String, k: Int): Pca.PcaModel = {
    val rows = current(spark, prefix).collect()
    require(rows.nonEmpty && rows(0).getSeq[Double](0).nonEmpty,
      "StreamingPca.model: no moments stored yet — stream at least one " +
        "non-empty batch before fitting")
    Pca.fromMoments(rows(0).getSeq[Double](0), k)
  }

  /** Drive the table from parquet vector files arriving in `srcDir`. */
  def stream(spark: SparkSession, srcDir: String, prefix: String,
             ckptDir: String,
             trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    provision(spark, prefix)
    spark.readStream.schema(eventSchema).parquet(srcDir)
      .writeStream.trigger(trigger)
      .option("checkpointLocation", ckptDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        applyBatch(spark, prefix, batch, batchId); ()
      }
      .start()
  }

  def drop(spark: SparkSession, prefix: String): Unit =
    FencedStore.drop(spark, fencePrefix(prefix))
}
