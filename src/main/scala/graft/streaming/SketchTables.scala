package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** The ONE implementation behind every fenced streaming sketch table
  * ([[StreamingSketch]] HLL, [[StreamingQuantiles]] KLL,
  * [[StreamingTheta]], [[StreamingFreq]]): a per-bucket sketch table
  * where each micro-batch builds its own per-bucket delta sketches and
  * folds them in by UNION-THEN-REAGGREGATE ((stored ∪ delta) rows, one
  * union aggregate per bucket) behind [[FencedStore]]'s batch-id fence.
  *
  * The four families differ only in the two aggregate columns — and in
  * whether item inserts are idempotent, which each public wrapper
  * documents and specs honestly: HLL and theta summarize SETS
  * (re-observing an item cannot move the state — two replay-safety
  * layers), KLL and frequent-items summarize MULTISETS (a replayed
  * batch that escaped the fence double-weights — the fence is the
  * single exactly-once layer).
  *
  * Scale: per batch, one bucket-keyed partial+final sketch aggregate of
  * the delta (map-side merge, fixed small state per group) and a
  * bucket-table-sized rewrite — never event-history-sized. */
private[streaming] final class FencedSketchTable(
    suffix: String, valueField: StructField,
    deltaAgg: Column => Column, unionAgg: Column => Column) {

  val eventSchema: StructType = StructType(Seq(
    StructField("bucket", LongType), valueField))

  private val tableSchema = StructType(Seq(
    StructField("bucket", LongType), StructField("sk", BinaryType)))

  private def fencePrefix(prefix: String) = s"${prefix}_$suffix"

  def provision(spark: SparkSession, prefix: String): Unit =
    FencedStore.provision(spark, fencePrefix(prefix), tableSchema)

  def current(spark: SparkSession, prefix: String): DataFrame =
    FencedStore.current(spark, fencePrefix(prefix))

  def applyBatch(spark: SparkSession, prefix: String, batch: DataFrame,
                 batchId: Long): Boolean =
    FencedStore.applyBatch(spark, fencePrefix(prefix), tableSchema, batchId) {
      cur =>
        if (batch.isEmpty) None
        else {
          val delta = batch.groupBy(col("bucket"))
            .agg(deltaAgg(col(valueField.name)).as("sk"))
          Some(cur.select(col("bucket"), col("sk")).unionByName(delta)
            .groupBy(col("bucket"))
            .agg(unionAgg(col("sk")).as("sk")))
        }
    }

  /** Merged sketch bytes over `[lo, hi]` buckets, None when the range
    * holds no buckets. */
  def mergedBytes(spark: SparkSession, prefix: String, lo: Long,
                  hi: Long): Option[Array[Byte]] = {
    val r = current(spark, prefix).filter(col("bucket").between(lo, hi))
      .agg(count(lit(1)).as("n"), unionAgg(col("sk")).as("sk")).head()
    if (r.getLong(0) == 0L) None else Some(r.getAs[Array[Byte]](1))
  }

  def stream(spark: SparkSession, srcDir: String, prefix: String,
             ckptDir: String, trigger: Trigger): StreamingQuery = {
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

/** Per-bucket THETA sketch table from a (bucket, item) stream — the
  * set-algebra member of the streaming sketch family: range unions AND
  * intersections from stored bytes ("users active in both windows",
  * live). Like HLL (and unlike KLL/freq), theta summarizes a SET, so
  * replay safety is two-layered: the fence absorbs replayed batch ids,
  * and re-observed items past the fence cannot move the state. */
object StreamingTheta {
  import graft.functions.SketchAggregators

  private val impl = new FencedSketchTable("theta",
    StructField("item", LongType),
    v => SketchAggregators.thetaAggLong(v),
    sk => SketchAggregators.thetaUnion(sk))

  val eventSchema: StructType = impl.eventSchema
  def provision(spark: SparkSession, prefix: String): Unit =
    impl.provision(spark, prefix)
  def current(spark: SparkSession, prefix: String): DataFrame =
    impl.current(spark, prefix)
  def applyBatch(spark: SparkSession, prefix: String, batch: DataFrame,
                 batchId: Long): Boolean =
    impl.applyBatch(spark, prefix, batch, batchId)

  /** Distinct estimate over `[lo, hi]` buckets from the stored bytes. */
  def estimate(spark: SparkSession, prefix: String, lo: Long,
               hi: Long): Double =
    impl.mergedBytes(spark, prefix, lo, hi).fold(0.0)(bytes =>
      org.apache.datasketches.theta.Sketches.heapifySketch(
        org.apache.datasketches.memory.Memory.wrap(bytes)).getEstimate)

  /** Intersection (estimate, lower, upper) of TWO bucket ranges from
    * the stored bytes alone — the query HLL tables cannot answer. */
  def intersect(spark: SparkSession, prefix: String, a: (Long, Long),
                b: (Long, Long)): (Double, Double, Double) = {
    import org.apache.datasketches.memory.Memory
    import org.apache.datasketches.theta.{SetOperation, Sketches}
    (impl.mergedBytes(spark, prefix, a._1, a._2),
      impl.mergedBytes(spark, prefix, b._1, b._2)) match {
      case (Some(x), Some(y)) =>
        val inter = SetOperation.builder().buildIntersection()
        inter.intersect(Sketches.heapifySketch(Memory.wrap(x)))
        inter.intersect(Sketches.heapifySketch(Memory.wrap(y)))
        val cs = inter.getResult
        (cs.getEstimate, cs.getLowerBound(2), cs.getUpperBound(2))
      case _ => (0.0, 0.0, 0.0)
    }
  }

  def stream(spark: SparkSession, srcDir: String, prefix: String,
             ckptDir: String,
             trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    impl.stream(spark, srcDir, prefix, ckptDir, trigger)

  def drop(spark: SparkSession, prefix: String): Unit =
    impl.drop(spark, prefix)
}

/** Per-bucket FREQUENT-ITEMS sketch table from a (bucket, item) string
  * stream — live heavy hitters over any bucket range. Like KLL (and
  * unlike HLL/theta), the sketch summarizes a MULTISET: re-observed
  * items past the fence double their counts, so the batch-id fence is
  * the SINGLE exactly-once layer (spec'd, as for StreamingQuantiles). */
object StreamingFreq {
  import graft.functions.SketchAggregators

  private def implU(maxMapSize: Int) = new FencedSketchTable("freq",
    StructField("item", StringType),
    v => SketchAggregators.freqAgg(v, maxMapSize),
    sk => graft.functions.SketchAggregators.freqUnion(sk, maxMapSize))

  val eventSchema: StructType = implU(2048).eventSchema
  def provision(spark: SparkSession, prefix: String): Unit =
    implU(2048).provision(spark, prefix)
  def current(spark: SparkSession, prefix: String): DataFrame =
    implU(2048).current(spark, prefix)
  def applyBatch(spark: SparkSession, prefix: String, batch: DataFrame,
                 batchId: Long, maxMapSize: Int = 2048): Boolean =
    implU(maxMapSize).applyBatch(spark, prefix, batch, batchId)

  /** `(maxError, [(item, estimate, lower, upper)…])` over `[lo, hi]`
    * buckets from the stored bytes alone. */
  def top(spark: SparkSession, prefix: String, lo: Long, hi: Long,
          maxMapSize: Int = 2048): (Long, Seq[(String, Long, Long, Long)]) =
    implU(maxMapSize).mergedBytes(spark, prefix, lo, hi) match {
      case None => (0L, Seq.empty)
      case Some(bytes) =>
        val sk = org.apache.datasketches.frequencies.ItemsSketch
          .getInstance[String](
            org.apache.datasketches.memory.Memory.wrap(bytes),
            new org.apache.datasketches.common.ArrayOfStringsSerDe)
        (sk.getMaximumError, sk.getFrequentItems(
          org.apache.datasketches.frequencies.ErrorType.NO_FALSE_NEGATIVES)
          .toSeq.map(r => (r.getItem, r.getEstimate, r.getLowerBound,
            r.getUpperBound)))
    }

  def stream(spark: SparkSession, srcDir: String, prefix: String,
             ckptDir: String, maxMapSize: Int = 2048,
             trigger: Trigger = Trigger.AvailableNow()): StreamingQuery =
    implU(maxMapSize).stream(spark, srcDir, prefix, ckptDir, trigger)

  def drop(spark: SparkSession, prefix: String): Unit =
    implU(2048).drop(spark, prefix)
}
