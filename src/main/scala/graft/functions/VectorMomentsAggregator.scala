package graft.functions

import org.apache.spark.sql.expressions.Aggregator

/** One-pass first+second vector moments for PCA ([[graft.operators.Pca]]):
  * the buffer is (sum vector d, sum of outer products d², count), merged
  * associatively — a normal partial→final aggregation whose shuffled
  * state is d²-sized (32 KB at d=64), CONSTANT in the row count. The
  * finish packs `[n, d, sum…, outerSum…]` into one flat array; the
  * caller derives mean and covariance on the driver (report-sized).
  * Null/empty vectors are ignored ([[VectorMeanAggregator]] convention);
  * vectors of differing lengths, vectors containing null ELEMENTS, and
  * vectors wider than [[MaxDim]] all throw BY NAME inside reduce —
  * before any d²-sized buffer is allocated — so a mistakenly-passed
  * wide or dirty column fails with a message, not an executor OOM or
  * an unboxing NullPointerException mid-corpus. */
object VectorMomentsAggregator
    extends Aggregator[Seq[Double], (Array[Double], Array[Double], Long), Seq[Double]] {

  /** Largest supported dimensionality, enforced in `reduce` BEFORE the
    * d² allocation: past this the per-task buffer is multi-MB and past
    * d≈46341 `d*d` overflows Int. [[graft.operators.Pca.MaxDim]] aliases
    * this value so the operator-level contract and the executor-side
    * guard cannot drift apart. */
  val MaxDim = 1024

  override def zero: (Array[Double], Array[Double], Long) =
    (Array.empty[Double], Array.empty[Double], 0L)

  override def reduce(b: (Array[Double], Array[Double], Long),
                      v: Seq[Double]): (Array[Double], Array[Double], Long) = {
    if (v == null || v.isEmpty) return b
    val d = v.length
    require(d <= MaxDim,
      s"VectorMomentsAggregator: vector dimension $d exceeds MaxDim=$MaxDim — " +
        "the moment state is d² doubles; is this really an embedding column?")
    // inspect as Seq[Any]: touching elements AS Double would unbox and
    // NPE on the very null we are trying to report by name
    require(!v.asInstanceOf[Seq[Any]].exists(_ == null),
      "VectorMomentsAggregator: vector contains null elements — clean or " +
        "filter the embedding column before computing moments")
    val (s, o, n) =
      if (b._3 == 0L) (new Array[Double](d), new Array[Double](d * d), 0L)
      else b match { case (s0, o0, n0) =>
        require(s0.length == d,
          s"vector length mismatch: ${s0.length} vs $d")
        (s0, o0, n0)
      }
    val arr = v.toArray
    var i = 0
    while (i < d) {
      val xi = arr(i)
      s(i) += xi
      var j = 0
      val row = i * d
      while (j < d) { o(row + j) += xi * arr(j); j += 1 }
      i += 1
    }
    (s, o, n + 1)
  }

  override def merge(x: (Array[Double], Array[Double], Long),
                     y: (Array[Double], Array[Double], Long)): (Array[Double], Array[Double], Long) = {
    if (x._3 == 0L) y
    else if (y._3 == 0L) x
    else {
      require(x._1.length == y._1.length,
        s"vector length mismatch across partitions: ${x._1.length} vs ${y._1.length}")
      var i = 0
      while (i < x._1.length) { x._1(i) += y._1(i); i += 1 }
      i = 0
      while (i < x._2.length) { x._2(i) += y._2(i); i += 1 }
      (x._1, x._2, x._3 + y._3)
    }
  }

  override def finish(b: (Array[Double], Array[Double], Long)): Seq[Double] =
    if (b._3 == 0L) Seq.empty
    else (Array(b._3.toDouble, b._1.length.toDouble) ++ b._1 ++ b._2).toSeq

  override def bufferEncoder: org.apache.spark.sql.Encoder[(Array[Double], Array[Double], Long)] =
    org.apache.spark.sql.Encoders.product[(Array[Double], Array[Double], Long)]

  override def outputEncoder: org.apache.spark.sql.Encoder[Seq[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
}
