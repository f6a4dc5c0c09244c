package graft.functions

import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.catalyst.util.ArrayData

/** Vector kernels as static JVM methods shared by interpreted `eval` and
  * generated code (same pattern and rationale as [[TextKernels]]). */
object VectorKernels {

  private val SEED = 42L
  private val SCALE = 1.0 / Long.MaxValue.toDouble

  /** Σ aᵢ·bᵢ, sequential left-to-right; boxed null if lengths differ. */
  def dot(a: ArrayData, b: ArrayData): java.lang.Double = {
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

  /** Sign-pattern bucket over `nPlanes` pseudo-random hyperplanes whose
    * components derive from `XXH64.hashLong(p * dim + d)` scaled to
    * [-1, 1] — deterministic, no plane matrix to broadcast. */
  def hyperplaneBucket(v: ArrayData, nPlanes: Int): Long =
    hyperplaneBucket(v, nPlanes, 0)

  /** As above, projecting onto planes `planeOffset until planeOffset+nPlanes`
    * of the same global pseudo-random plane family — disjoint offsets give
    * statistically independent hash columns, which is how LSH configs wider
    * than 63 total bits split across multiple 64-bit bucket keys. */
  def hyperplaneBucket(v: ArrayData, nPlanes: Int, planeOffset: Int): Long = {
    val dim = v.numElements()
    var bucket = 0L
    var p = planeOffset
    val end = planeOffset + nPlanes
    while (p < end) {
      var proj = 0.0
      var d = 0
      val base = p.toLong * dim
      while (d < dim) {
        proj += v.getDouble(d) * (XXH64.hashLong(base + d, SEED) * SCALE)
        d += 1
      }
      bucket = bucket * 2 + (if (proj >= 0.0) 1L else 0L)
      p += 1
    }
    bucket
  }

  /** Index of the squared-euclidean argmin centroid (ties to lowest index;
    * `cn2(i)` = ‖cᵢ‖², so the score is ‖c‖² − 2·v·c). Boxed null when no
    * centroid matches the vector's dimension. */
  def nearestCentroid(v: ArrayData, cvecs: Array[Array[Double]],
                      cn2: Array[Double]): java.lang.Integer = {
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
        val score = cn2(ci) - 2.0 * dotAcc
        if (score < bestScore) { bestScore = score; best = ci }
      }
      ci += 1
    }
    if (best < 0) null else java.lang.Integer.valueOf(best)
  }
}
