package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Custom Catalyst expressions for vector kernels where the higher-order
  * function formulation is interpreted and measurably hot. */
object VectorExpressions {

  /** Random-hyperplane LSH bucket of an `array<double>` vector: bit `p` of
    * the result is the sign of the projection onto pseudo-random plane `p`,
    * whose components derive from `XXH64.hashLong(p * dim + d)` scaled to
    * [-1, 1] — deterministic, no plane matrix to broadcast, one tight pass
    * over `nPlanes × dim` products. Dimension is read from the array. */
  case class HyperplaneLshBucket(child: Expression, nPlanes: Int)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = LongType
    override def nullable: Boolean = true
    override def prettyName: String = "hyperplane_lsh_bucket"

    private val SEED = 42L
    private val SCALE = 1.0 / Long.MaxValue.toDouble

    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val dim = arr.numElements()
      var bucket = 0L
      var p = 0
      while (p < nPlanes) {
        var proj = 0.0
        var d = 0
        val base = p.toLong * dim
        while (d < dim) {
          proj += arr.getDouble(d) * (XXH64.hashLong(base + d, SEED) * SCALE)
          d += 1
        }
        bucket = bucket * 2 + (if (proj >= 0.0) 1L else 0L)
        p += 1
      }
      java.lang.Long.valueOf(bucket)
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  def hyperplaneLshBucket(vec: Column, nPlanes: Int): Column =
    ColumnBridge.column(HyperplaneLshBucket(ColumnBridge.expression(vec), nPlanes))

  /** Σ aᵢ·bᵢ over two `array<double>` columns. Accumulates sequentially
    * left-to-right — the same order as the higher-order-function
    * formulation and DuckDB's list_inner_product — so results are
    * bit-identical across engines; null if the lengths differ. */
  case class DotProduct(left: Expression, right: Expression)
      extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
      with CodegenFallback {
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true
    override def prettyName: String = "vector_dot"

    override def nullSafeEval(l: Any, r: Any): Any = {
      val a = l.asInstanceOf[ArrayData]
      val b = r.asInstanceOf[ArrayData]
      val n = a.numElements()
      if (n != b.numElements()) null
      else {
        var acc = 0.0
        var i = 0
        while (i < n) {
          acc += a.getDouble(i) * b.getDouble(i)
          i += 1
        }
        java.lang.Double.valueOf(acc)
      }
    }

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  def dotProduct(a: Column, b: Column): Column =
    ColumnBridge.column(DotProduct(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Index of the nearest centroid (squared-euclidean argmin) for an
    * `array<double>` vector, against a small centroid set embedded in the
    * plan. Since ‖v‖² is constant across centroids, the score is
    * ‖c‖² − 2·v·c; ties break to the lowest index. One tight k×dim pass
    * per row — no join, no shuffle, no row fan-out — which is what lets a
    * Lloyd assignment step run as a pure projection over the corpus. */
  case class NearestCentroid(child: Expression, centroids: Seq[Seq[Double]])
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = IntegerType
    override def nullable: Boolean = true
    override def prettyName: String = "nearest_centroid"

    @transient private lazy val cvecs: Array[Array[Double]] =
      centroids.map(_.toArray).toArray
    @transient private lazy val cnorm2: Array[Double] = cvecs.map { c =>
      var s = 0.0; var i = 0
      while (i < c.length) { s += c(i) * c(i); i += 1 }
      s
    }

    override def nullSafeEval(input: Any): Any = {
      val v = input.asInstanceOf[ArrayData]
      val dim = v.numElements()
      var best = -1
      var bestScore = Double.PositiveInfinity
      var ci = 0
      while (ci < cvecs.length) {
        val c = cvecs(ci)
        if (c.length == dim) {
          var dotAcc = 0.0
          var i = 0
          while (i < dim) { dotAcc += v.getDouble(i) * c(i); i += 1 }
          val score = cnorm2(ci) - 2.0 * dotAcc
          if (score < bestScore) { bestScore = score; best = ci }
        }
        ci += 1
      }
      if (best < 0) null else java.lang.Integer.valueOf(best)
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  def nearestCentroid(vec: Column, centroids: Seq[Seq[Double]]): Column =
    ColumnBridge.column(NearestCentroid(ColumnBridge.expression(vec), centroids))
}
