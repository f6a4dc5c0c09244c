package graft.functions

import java.io.{IOException, ObjectInputStream, ObjectOutputStream}

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{CompactSketch, Intersection, SetOperation, Sketches, Union, UpdateSketch}
import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions

/** Mergeable sketch aggregators beyond Spark's built-in HLL pair
  * (`hll_sketch_agg`/`hll_union_agg`): KLL quantile sketches and theta
  * set-operation sketches, both from the Apache DataSketches library
  * already on Spark's classpath (datasketches-java 6.2).
  *
  * Why these two: the HLL rollup (`q_sketch_rollup`) answers
  * any-date-range DISTINCT counts from a per-day sketch table without
  * rescanning events; KLL extends that pattern to any-range QUANTILES
  * (p50/p90/p99 latency over an arbitrary window), and theta extends it
  * to set ALGEBRA — HLL unions but cannot intersect, theta sketches
  * intersect with published error bounds, which is what "users active
  * in BOTH week 1 and week 4" needs at 100 TB.
  *
  * Execution shape: each aggregator's buffer is a plain JVM holder
  * object wrapping the live sketch — Spark's ScalaAggregator runs typed
  * aggregators as TypedImperativeAggregate, so the buffer stays an
  * object through every per-row `reduce` and serializes (via the
  * holder's Java serialization hook, which delegates to the sketch's
  * own compact byte form) ONLY at the partial→final exchange. Per-row
  * cost is one sketch update; per-shuffle cost is one compact
  * serialization per group per partition — the same contract as Spark's
  * built-in `hll_sketch_agg`.
  */
object SketchAggregators {

  // ───────────────────────────── KLL ─────────────────────────────

  /** Serializable wrapper for a KLL doubles sketch. The sketch itself
    * is @transient; Java serialization writes the compact byte form. */
  final class KllHolder(private var k: Int) extends Serializable {
    @transient private var sk: KllDoublesSketch = _

    def sketch: KllDoublesSketch = {
      if (sk == null) sk = KllDoublesSketch.newHeapInstance(k)
      sk
    }
    def isEmpty: Boolean = sk == null || sk.isEmpty
    def raw: KllDoublesSketch = sk

    def mergeFrom(other: KllHolder): Unit =
      if (other.sk != null && !other.sk.isEmpty) sketch.merge(other.sk)
    def mergeBytes(bytes: Array[Byte]): Unit =
      if (bytes != null && bytes.nonEmpty)
        sketch.merge(KllDoublesSketch.heapify(Memory.wrap(bytes)))
    def toBytes: Array[Byte] = sketch.toByteArray

    @throws[IOException]
    private def writeObject(out: ObjectOutputStream): Unit = {
      out.writeInt(k)
      val bytes = if (sk == null) Array.empty[Byte] else sk.toByteArray
      out.writeInt(bytes.length)
      out.write(bytes)
    }
    @throws[IOException]
    private def readObject(in: ObjectInputStream): Unit = {
      k = in.readInt()
      val n = in.readInt()
      if (n > 0) {
        val bytes = new Array[Byte](n)
        in.readFully(bytes)
        sk = KllDoublesSketch.heapify(Memory.wrap(bytes))
      }
    }
  }

  /** Build one KLL sketch per group from raw double values; finishes to
    * the compact byte form (the row of a persisted sketch table). Null
    * inputs are skipped, like every built-in aggregate. */
  final class KllBuildAggregator(k: Int)
      extends Aggregator[java.lang.Double, KllHolder, Array[Byte]] {
    override def zero: KllHolder = new KllHolder(k)
    override def reduce(b: KllHolder, v: java.lang.Double): KllHolder = {
      if (v != null) b.sketch.update(v.doubleValue)
      b
    }
    override def merge(x: KllHolder, y: KllHolder): KllHolder = {
      x.mergeFrom(y); x
    }
    override def finish(b: KllHolder): Array[Byte] = b.toBytes
    override def bufferEncoder: Encoder[KllHolder] =
      Encoders.javaSerialization[KllHolder]
    override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** Shared byte-merging half of every KLL rollup aggregator — ONE
    * copy of zero/reduce/merge, subclasses differ only in `finish`. */
  sealed abstract class KllMergeBase[OUT](k: Int)
      extends Aggregator[Array[Byte], KllHolder, OUT] {
    final override def zero: KllHolder = new KllHolder(k)
    final override def reduce(b: KllHolder, bytes: Array[Byte]): KllHolder = {
      b.mergeBytes(bytes); b
    }
    final override def merge(x: KllHolder, y: KllHolder): KllHolder = {
      x.mergeFrom(y); x
    }
    final override def bufferEncoder: Encoder[KllHolder] =
      Encoders.javaSerialization[KllHolder]
  }

  /** Union stored KLL sketches (byte rows of the sketch table);
    * finishes to the merged compact bytes. */
  final class KllUnionAggregator(k: Int) extends KllMergeBase[Array[Byte]](k) {
    override def finish(b: KllHolder): Array[Byte] = b.toBytes
    override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** Union stored KLL sketches and finish straight to quantile
    * estimates at the given ranks, plus the sketch's own normalized
    * rank error as the last element — `[q_1 … q_m, eps]` — so a range
    * query needs no second pass over the sketch bytes. Empty union
    * (no rows in the range) finishes to an empty array. */
  final class KllQuantilesAggregator(k: Int, ranks: Seq[Double])
      extends KllMergeBase[Seq[Double]](k) {
    require(ranks.nonEmpty && ranks.forall(r => r > 0.0 && r < 1.0),
      s"quantile ranks must lie in (0,1), got $ranks")
    override def finish(b: KllHolder): Seq[Double] =
      if (b.isEmpty) Seq.empty
      else ranks.map(r => b.raw.getQuantile(r)) :+
        b.raw.getNormalizedRankError(false)
    override def outputEncoder: Encoder[Seq[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
  }

  // ───────────────────────────── theta ─────────────────────────────

  /** Serializable wrapper for a theta sketch under construction: raw
    * updates land in an UpdateSketch, merged partials in a Union; the
    * compact result folds both. Java serialization writes the compact
    * byte form (union order does not change the resulting set). */
  final class ThetaHolder(private var nominalEntries: Int) extends Serializable {
    @transient private var up: UpdateSketch = _
    @transient private var un: Union = _

    def updateLong(v: Long): Unit = {
      if (up == null)
        up = UpdateSketch.builder().setNominalEntries(nominalEntries).build()
      up.update(v)
    }
    private def union: Union = {
      if (un == null)
        un = SetOperation.builder().setNominalEntries(nominalEntries).buildUnion()
      un
    }
    def absorbBytes(bytes: Array[Byte]): Unit =
      if (bytes != null && bytes.nonEmpty)
        union.union(Sketches.heapifySketch(Memory.wrap(bytes)))
    def mergeFrom(other: ThetaHolder): Unit = {
      if (other.up != null) union.union(other.up.compact())
      if (other.un != null) union.union(other.un.getResult)
    }
    def result: CompactSketch = {
      if (un == null && up == null)
        UpdateSketch.builder().setNominalEntries(nominalEntries).build().compact()
      else if (un == null) up.compact()
      else {
        if (up != null) { un.union(up.compact()); up = null }
        un.getResult
      }
    }

    @throws[IOException]
    private def writeObject(out: ObjectOutputStream): Unit = {
      out.writeInt(nominalEntries)
      val bytes = result.toByteArray
      out.writeInt(bytes.length)
      out.write(bytes)
    }
    @throws[IOException]
    private def readObject(in: ObjectInputStream): Unit = {
      nominalEntries = in.readInt()
      val n = in.readInt()
      if (n > 0) {
        val bytes = new Array[Byte](n)
        in.readFully(bytes)
        un = SetOperation.builder().setNominalEntries(nominalEntries).buildUnion()
        un.union(Sketches.heapifySketch(Memory.wrap(bytes)))
      }
    }
  }

  /** Build one theta sketch per group over LONG keys; finishes to the
    * compact byte form. */
  final class ThetaBuildAggregator(nominalEntries: Int)
      extends Aggregator[java.lang.Long, ThetaHolder, Array[Byte]] {
    override def zero: ThetaHolder = new ThetaHolder(nominalEntries)
    override def reduce(b: ThetaHolder, v: java.lang.Long): ThetaHolder = {
      if (v != null) b.updateLong(v.longValue)
      b
    }
    override def merge(x: ThetaHolder, y: ThetaHolder): ThetaHolder = {
      x.mergeFrom(y); x
    }
    override def finish(b: ThetaHolder): Array[Byte] = b.result.toByteArray
    override def bufferEncoder: Encoder[ThetaHolder] =
      Encoders.javaSerialization[ThetaHolder]
    override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** Union stored theta sketches; finishes to the merged compact bytes. */
  final class ThetaUnionAggregator(nominalEntries: Int)
      extends Aggregator[Array[Byte], ThetaHolder, Array[Byte]] {
    override def zero: ThetaHolder = new ThetaHolder(nominalEntries)
    override def reduce(b: ThetaHolder, bytes: Array[Byte]): ThetaHolder = {
      b.absorbBytes(bytes); b
    }
    override def merge(x: ThetaHolder, y: ThetaHolder): ThetaHolder = {
      x.mergeFrom(y); x
    }
    override def finish(b: ThetaHolder): Array[Byte] = b.result.toByteArray
    override def bufferEncoder: Encoder[ThetaHolder] =
      Encoders.javaSerialization[ThetaHolder]
    override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** Serializable intersection buffer: identity is the (conceptual)
    * universe, tracked with a seen-flag rather than a sentinel sketch. */
  final class ThetaIntersectHolder extends Serializable {
    @transient private var inter: Intersection = _
    private var seeded: Boolean = false

    def absorbBytes(bytes: Array[Byte]): Unit =
      if (bytes != null && bytes.nonEmpty) {
        if (inter == null) inter = SetOperation.builder().buildIntersection()
        inter.intersect(Sketches.heapifySketch(Memory.wrap(bytes)))
        seeded = true
      }
    def mergeFrom(other: ThetaIntersectHolder): Unit =
      if (other.seeded) {
        if (inter == null) inter = SetOperation.builder().buildIntersection()
        inter.intersect(other.inter.getResult)
        seeded = true
      }
    def result: Option[CompactSketch] =
      if (seeded) Some(inter.getResult) else None

    @throws[IOException]
    private def writeObject(out: ObjectOutputStream): Unit = {
      out.writeBoolean(seeded)
      if (seeded) {
        val bytes = inter.getResult.toByteArray
        out.writeInt(bytes.length)
        out.write(bytes)
      }
    }
    @throws[IOException]
    private def readObject(in: ObjectInputStream): Unit = {
      seeded = in.readBoolean()
      if (seeded) {
        val n = in.readInt()
        val bytes = new Array[Byte](n)
        in.readFully(bytes)
        inter = SetOperation.builder().buildIntersection()
        inter.intersect(Sketches.heapifySketch(Memory.wrap(bytes)))
      }
    }
  }

  /** Intersect stored theta sketches (associative + commutative over
    * the input rows); finishes to `(estimate, lower, upper)` at 2
    * standard deviations — the sketch's OWN confidence interval, which
    * is what a self-certifying query asserts the exact value against.
    * No input rows → (0, 0, 0). */
  final class ThetaIntersectAggregator
      extends Aggregator[Array[Byte], ThetaIntersectHolder, (Double, Double, Double)] {
    override def zero: ThetaIntersectHolder = new ThetaIntersectHolder
    override def reduce(b: ThetaIntersectHolder, bytes: Array[Byte]): ThetaIntersectHolder = {
      b.absorbBytes(bytes); b
    }
    override def merge(x: ThetaIntersectHolder, y: ThetaIntersectHolder): ThetaIntersectHolder = {
      x.mergeFrom(y); x
    }
    override def finish(b: ThetaIntersectHolder): (Double, Double, Double) =
      b.result match {
        case Some(cs) => (cs.getEstimate, cs.getLowerBound(2), cs.getUpperBound(2))
        case None     => (0.0, 0.0, 0.0)
      }
    override def bufferEncoder: Encoder[ThetaIntersectHolder] =
      Encoders.javaSerialization[ThetaIntersectHolder]
    override def outputEncoder: Encoder[(Double, Double, Double)] =
      Encoders.product[(Double, Double, Double)]
  }

  // ──────────────────── frequent items (heavy hitters) ────────────────────

  private def stringSerDe = new org.apache.datasketches.common.ArrayOfStringsSerDe

  /** Serializable wrapper for a frequent-items sketch over strings. */
  final class FreqHolder(private var maxMapSize: Int) extends Serializable {
    import org.apache.datasketches.frequencies.ItemsSketch
    @transient private var sk: ItemsSketch[String] = _

    def sketch: ItemsSketch[String] = {
      if (sk == null) sk = new ItemsSketch[String](maxMapSize)
      sk
    }
    def mergeFrom(other: FreqHolder): Unit =
      if (other.sk != null && !other.sk.isEmpty) sketch.merge(other.sk)
    def mergeBytes(bytes: Array[Byte]): Unit =
      if (bytes != null && bytes.nonEmpty)
        sketch.merge(ItemsSketch.getInstance[String](
          Memory.wrap(bytes), stringSerDe))
    def toBytes: Array[Byte] = sketch.toByteArray(stringSerDe)

    @throws[IOException]
    private def writeObject(out: ObjectOutputStream): Unit = {
      out.writeInt(maxMapSize)
      val bytes = if (sk == null) Array.empty[Byte] else toBytes
      out.writeInt(bytes.length)
      out.write(bytes)
    }
    @throws[IOException]
    private def readObject(in: ObjectInputStream): Unit = {
      maxMapSize = in.readInt()
      val n = in.readInt()
      if (n > 0) {
        val bytes = new Array[Byte](n)
        in.readFully(bytes)
        sk = org.apache.datasketches.frequencies.ItemsSketch.getInstance[String](
          Memory.wrap(bytes), stringSerDe)
      }
    }
  }

  /** Build one frequent-items sketch per group over STRING items. */
  final class FreqBuildAggregator(maxMapSize: Int)
      extends Aggregator[String, FreqHolder, Array[Byte]] {
    override def zero: FreqHolder = new FreqHolder(maxMapSize)
    override def reduce(b: FreqHolder, v: String): FreqHolder = {
      if (v != null) b.sketch.update(v)
      b
    }
    override def merge(x: FreqHolder, y: FreqHolder): FreqHolder = {
      x.mergeFrom(y); x
    }
    override def finish(b: FreqHolder): Array[Byte] = b.toBytes
    override def bufferEncoder: Encoder[FreqHolder] =
      Encoders.javaSerialization[FreqHolder]
    override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** Shared byte-merging half of the frequent-items rollup aggregators
    * — ONE copy of zero/reduce/merge, subclasses differ only in
    * `finish`. */
  sealed abstract class FreqMergeBase[OUT](maxMapSize: Int)
      extends Aggregator[Array[Byte], FreqHolder, OUT] {
    final override def zero: FreqHolder = new FreqHolder(maxMapSize)
    final override def reduce(b: FreqHolder, bytes: Array[Byte]): FreqHolder = {
      b.mergeBytes(bytes); b
    }
    final override def merge(x: FreqHolder, y: FreqHolder): FreqHolder = {
      x.mergeFrom(y); x
    }
    final override def bufferEncoder: Encoder[FreqHolder] =
      Encoders.javaSerialization[FreqHolder]
  }

  /** Union stored frequent-items sketches; finishes to the merged
    * compact bytes (the row of a rolled-up sketch table). */
  final class FreqUnionAggregator(maxMapSize: Int)
      extends FreqMergeBase[Array[Byte]](maxMapSize) {
    override def finish(b: FreqHolder): Array[Byte] = b.toBytes
    override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  }

  /** Union stored frequent-items sketches and finish to
    * `(maxError, [(item, estimate, lower, upper)…])` — every item the
    * NO_FALSE_NEGATIVES guarantee can surface (any item whose true
    * count exceeds maxError IS in the list; below nominal capacity the
    * sketch is exact, maxError is 0 and every interval is a point). */
  final class FreqTopAggregator(maxMapSize: Int)
      extends FreqMergeBase[(Long, Seq[(String, Long, Long, Long)])](maxMapSize) {
    override def finish(b: FreqHolder): (Long, Seq[(String, Long, Long, Long)]) = {
      val sk = b.sketch
      val rows = sk.getFrequentItems(
        org.apache.datasketches.frequencies.ErrorType.NO_FALSE_NEGATIVES)
      (sk.getMaximumError,
        rows.toSeq.map(r => (r.getItem, r.getEstimate, r.getLowerBound,
          r.getUpperBound)))
    }
    override def outputEncoder: Encoder[(Long, Seq[(String, Long, Long, Long)])] =
      Encoders.product[(Long, Seq[(String, Long, Long, Long)])]
  }

  // ──────────────────────── Column surface ────────────────────────

  /** KLL sketch of a double column (compact bytes per group). */
  def kllAgg(v: Column, k: Int = 200): Column =
    functions.udaf(new KllBuildAggregator(k), Encoders.DOUBLE).apply(v)

  /** Union of stored KLL sketch bytes. */
  def kllUnion(sk: Column, k: Int = 200): Column =
    functions.udaf(new KllUnionAggregator(k), Encoders.BINARY).apply(sk)

  /** Union of stored KLL sketch bytes, finished to
    * `[quantile(r) for r in ranks] ++ [normalizedRankError]`. */
  def kllUnionQuantiles(sk: Column, ranks: Seq[Double], k: Int = 200): Column =
    functions.udaf(new KllQuantilesAggregator(k, ranks), Encoders.BINARY).apply(sk)

  /** Theta sketch of a long key column (compact bytes per group). */
  def thetaAggLong(v: Column, nominalEntries: Int = 16384): Column =
    functions.udaf(new ThetaBuildAggregator(nominalEntries), Encoders.LONG).apply(v)

  /** Union of stored theta sketch bytes. */
  def thetaUnion(sk: Column, nominalEntries: Int = 16384): Column =
    functions.udaf(new ThetaUnionAggregator(nominalEntries), Encoders.BINARY).apply(sk)

  /** Intersection of stored theta sketch bytes →
    * struct(estimate, lower, upper) at 2 standard deviations. */
  def thetaIntersect(sk: Column): Column =
    functions.udaf(new ThetaIntersectAggregator, Encoders.BINARY).apply(sk)

  /** Frequent-items sketch of a string column (compact bytes per group).
    * `maxMapSize` must be a power of 2; below it the sketch is exact. */
  def freqAgg(v: Column, maxMapSize: Int = 2048): Column =
    functions.udaf(new FreqBuildAggregator(maxMapSize), Encoders.STRING).apply(v)

  /** Union of stored frequent-items sketches →
    * struct(maxError, rows[(item, estimate, lower, upper)]). */
  def freqTop(sk: Column, maxMapSize: Int = 2048): Column =
    functions.udaf(new FreqTopAggregator(maxMapSize), Encoders.BINARY).apply(sk)

  /** Union of stored frequent-items sketches → merged compact bytes. */
  def freqUnion(sk: Column, maxMapSize: Int = 2048): Column =
    functions.udaf(new FreqUnionAggregator(maxMapSize), Encoders.BINARY).apply(sk)
}
