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

  /** Product-quantization code of an `array<double>` vector: the vector is
    * split into `m = codebooks.length` contiguous subvectors and each is
    * replaced by the index of its squared-euclidean argmin centroid in that
    * subspace's codebook (`codebooks(j)` is `ks` centroids of `dsub = dim/m`
    * components, flattened row-major). Ties break to the lowest code, same
    * rule as [[nearestCentroid]]. Null when the dimension is not divisible
    * into the codebook geometry. One byte per subspace — the 64×
    * compression (vs these double vectors) that makes a 100 TB candidate
    * scan read code bytes instead of float payloads. */
  def pqEncode(v: ArrayData, codebooks: Array[Array[Double]]): Array[Byte] = {
    val ints = pqAssignInts(v, codebooks)
    if (ints == null) null
    else {
      val out = new Array[Byte](ints.length)
      var j = 0
      while (j < ints.length) {
        if (ints(j) > 255) return null  // a byte code needs ks <= 256
        out(j) = ints(j).toByte
        j += 1
      }
      out
    }
  }

  /** [[pqEncode]] with int codes — the training-loop form, where the code
    * must be consumable as an `array<int>` column for the per-subspace
    * regroup (`element_at`), not packed bytes. */
  def pqAssignInts(v: ArrayData, codebooks: Array[Array[Double]]): Array[Int] = {
    val m = codebooks.length
    val dim = v.numElements()
    if (m == 0 || dim % m != 0) return null
    val dsub = dim / m
    val out = new Array[Int](m)
    var j = 0
    while (j < m) {
      val cb = codebooks(j)
      if (cb.length % dsub != 0) return null
      val ks = cb.length / dsub
      val base = j * dsub
      var best = 0
      var bestScore = Double.PositiveInfinity
      var c = 0
      while (c < ks) {
        // ‖v_sub − c‖² without the constant ‖v_sub‖² term: ‖c‖² − 2·v·c
        var dotAcc = 0.0
        var cn2 = 0.0
        var i = 0
        val cbase = c * dsub
        while (i < dsub) {
          val cv = cb(cbase + i)
          dotAcc += v.getDouble(base + i) * cv
          cn2 += cv * cv
          i += 1
        }
        val score = cn2 - 2.0 * dotAcc
        if (score < bestScore) { bestScore = score; best = c }
        c += 1
      }
      out(j) = best
      j += 1
    }
    out
  }

  /** Asymmetric-distance lookup table for a query vector: entry
    * `j*ks + c` is the dot product of the query's j-th subvector with
    * centroid c of subspace j. `Σ_j lut[j*ks + code_j]` then reproduces
    * `dot(query, reconstruction(code))` EXACTLY (subspaces partition the
    * coordinates), which is what [[pqAdcDot]] computes per corpus row in
    * O(m) instead of O(dim). */
  def pqLut(q: ArrayData, codebooks: Array[Array[Double]]): Array[Double] = {
    val m = codebooks.length
    val dim = q.numElements()
    if (m == 0 || dim % m != 0) return null
    val dsub = dim / m
    if (codebooks.exists(_.length % dsub != 0)) return null
    val ks = codebooks(0).length / dsub
    if (codebooks.exists(_.length != ks * dsub)) return null
    val out = new Array[Double](m * ks)
    var j = 0
    while (j < m) {
      val cb = codebooks(j)
      val base = j * dsub
      var c = 0
      while (c < ks) {
        var acc = 0.0
        var i = 0
        val cbase = c * dsub
        while (i < dsub) { acc += q.getDouble(base + i) * cb(cbase + i); i += 1 }
        out(j * ks + c) = acc
        c += 1
      }
      j += 1
    }
    out
  }

  /** `dot(query, reconstruction(code))` from a query LUT: `ks` is inferred
    * from the shapes. Null on geometry mismatch. */
  def pqAdcDot(lut: ArrayData, code: Array[Byte]): java.lang.Double = {
    val m = code.length
    if (m == 0 || lut.numElements() % m != 0) return null
    val ks = lut.numElements() / m
    var acc = 0.0
    var j = 0
    while (j < m) {
      val c = code(j) & 0xff
      if (c >= ks) return null
      acc += lut.getDouble(j * ks + c)
      j += 1
    }
    java.lang.Double.valueOf(acc)
  }

  /** ‖reconstruction(code)‖²: because subspaces occupy DISJOINT
    * coordinates, the reconstruction's squared norm is exactly the sum of
    * the chosen centroids' squared norms — `cn2` holds those per-centroid
    * values flattened `m × ks`. Null on geometry mismatch. */
  def pqReconNorm2(code: Array[Byte], cn2: Array[Double]): java.lang.Double = {
    val m = code.length
    if (m == 0 || cn2.length % m != 0) return null
    val ks = cn2.length / m
    var acc = 0.0
    var j = 0
    while (j < m) {
      val c = code(j) & 0xff
      if (c >= ks) return null
      acc += cn2(j * ks + c)
      j += 1
    }
    java.lang.Double.valueOf(acc)
  }

  /** `dot(reconstruction(a), reconstruction(b))` from the precomputed
    * symmetric-distance table (SDC, Jégou et al. §III-A): `sdc` holds
    * `m × ks × ks` entries flattened, entry `j*ks*ks + ca*ks + cb` =
    * dot(centroid ca, centroid cb) of subspace j. Subspaces partition the
    * coordinates, so the sum over subspaces is EXACTLY the reconstructions'
    * dot product — both sides stay 16-byte codes, no float vector and no
    * per-query LUT is touched, which is what lets a code-only shuffle
    * score candidate pairs. Null on geometry mismatch. */
  def pqSdcDot(a: Array[Byte], b: Array[Byte],
               sdc: Array[Double]): java.lang.Double = {
    val m = a.length
    if (m == 0 || b.length != m || sdc.length % m != 0) return null
    val ks2 = sdc.length / m
    val ks = Math.sqrt(ks2.toDouble).toInt
    if (ks * ks != ks2) return null
    var acc = 0.0
    var j = 0
    while (j < m) {
      val ca = a(j) & 0xff
      val cb = b(j) & 0xff
      if (ca >= ks || cb >= ks) return null
      acc += sdc(j * ks2 + ca * ks + cb)
      j += 1
    }
    java.lang.Double.valueOf(acc)
  }

  /** [[nearestCentroid]] within ONE bank of a per-cell centroid bank:
    * the level-2 step of a hierarchical (two-level) coarse quantizer.
    * `banks(cell)` holds that level-1 cell's sub-centroids and
    * `cn2(cell)` their squared norms; the argmin runs over the selected
    * bank only, so per-row cost is O(k2·dim) regardless of how many
    * total cells k1×k2 the quantizer has. Null on an out-of-range cell
    * or when no sub-centroid matches the dimension. */
  def nearestCentroidBank(v: ArrayData, cell: Int,
                          banks: Array[Array[Array[Double]]],
                          cn2: Array[Array[Double]]): java.lang.Integer = {
    if (cell < 0 || cell >= banks.length) return null
    nearestCentroid(v, banks(cell), cn2(cell))
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
