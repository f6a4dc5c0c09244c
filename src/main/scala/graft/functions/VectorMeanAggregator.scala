package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Element-wise mean of `array<double>` vectors (centroid) as a typed
  * [[Aggregator]] — the engine's UDAF surface. Register with
  * `functions.udaf(VectorMeanAggregator)` and use in any groupBy; the
  * buffer is (running sum vector, count), merged associatively, so it
  * runs as a normal partial→final aggregation with map-side combine.
  * Null/empty inputs are ignored; vectors of differing lengths throw.
  */
object VectorMeanAggregator
    extends Aggregator[Seq[Double], (Array[Double], Long), Seq[Double]] {

  override def zero: (Array[Double], Long) = (Array.empty[Double], 0L)

  override def reduce(b: (Array[Double], Long), v: Seq[Double]): (Array[Double], Long) = {
    if (v == null || v.isEmpty) b
    else if (b._2 == 0L) (v.toArray, 1L)
    else {
      require(b._1.length == v.length,
        s"vector length mismatch: ${b._1.length} vs ${v.length}")
      var i = 0
      while (i < v.length) { b._1(i) += v(i); i += 1 }
      (b._1, b._2 + 1)
    }
  }

  override def merge(x: (Array[Double], Long), y: (Array[Double], Long)): (Array[Double], Long) = {
    if (x._2 == 0L) y
    else if (y._2 == 0L) x
    else {
      require(x._1.length == y._1.length,
        s"vector length mismatch across partitions: ${x._1.length} vs ${y._1.length}")
      var i = 0
      while (i < x._1.length) { x._1(i) += y._1(i); i += 1 }
      (x._1, x._2 + y._2)
    }
  }

  override def finish(b: (Array[Double], Long)): Seq[Double] =
    if (b._2 == 0L) Seq.empty else b._1.map(_ / b._2).toSeq

  override def bufferEncoder: Encoder[(Array[Double], Long)] =
    Encoders.product[(Array[Double], Long)]

  override def outputEncoder: Encoder[Seq[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
}
