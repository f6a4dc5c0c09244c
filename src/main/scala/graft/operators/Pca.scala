package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Principal-component analysis over an embedding column — the
  * dimensionality-reduction stage an embedding pipeline runs before ANN
  * or clustering (half the dimensions ≈ half the index bytes and scan
  * time, at a measured variance cost).
  *
  * Spark shape: training is ONE partial→final aggregation whose shuffled
  * state is the d²-sized moment matrix ([[graft.functions
  * .VectorMomentsAggregator]] — constant in the row count), the
  * eigendecomposition runs on the driver over the d×d covariance
  * (report-sized; cyclic Jacobi, deterministic), and projection is
  * map-side — one codegen'd [[graft.functions.VectorExpressions
  * .dotProduct]] per output dimension against plan-embedded component
  * literals, no shuffle, no UDF. The 100 TB story is exactly the
  * unigram-LM one: model cost is corpus-one-pass, per-row cost is
  * model-size-independent.
  *
  * Eigenvector signs are normalized (largest-magnitude entry positive)
  * so training is deterministic run to run; eigenvalues sort descending
  * with a deterministic index tie-break.
  */
object Pca {

  /** Trained model: `components(j)` is the j-th principal axis (unit
    * length, sign-normalized), `eigenvalues(j)` its variance.
    * `allEigenvalues` (full spectrum, descending) and `totalVariance`
    * (= trace of the covariance) back the certification checks. */
  final case class PcaModel(n: Long, dim: Int, mean: Array[Double],
                            eigenvalues: Array[Double],
                            components: Array[Array[Double]],
                            allEigenvalues: Array[Double],
                            totalVariance: Double) {
    /** max |GᵀG − I| over the kept components — the driver-exact
      * orthonormality certificate the registered query asserts. */
    def gramMaxDeviation: Double = {
      var worst = 0.0
      var i = 0
      while (i < components.length) {
        var j = 0
        while (j < components.length) {
          var dot = 0.0
          var t = 0
          while (t < dim) { dot += components(i)(t) * components(j)(t); t += 1 }
          val dev = math.abs(dot - (if (i == j) 1.0 else 0.0))
          // NaN-aware: a NaN deviation (NaN/Inf in the moments poisoning
          // a component) must FAIL the certificate, and `dev > worst` is
          // false for NaN — so test the negation
          if (!(dev <= worst)) worst = dev
          j += 1
        }
        i += 1
      }
      worst
    }
  }

  /** Largest supported dimensionality: the aggregation state is d²
    * doubles and the driver eigensolve is O(d³) — 1024 keeps both
    * trivially cheap (8 MB state, ~1 s solve) while catching a
    * mistakenly-passed row id or token array by name. Aliases the
    * executor-side guard ([[graft.functions.VectorMomentsAggregator
    * .MaxDim]], enforced inside `reduce` BEFORE any d² allocation) so
    * oversized vectors fail by name without running the corpus pass. */
  val MaxDim: Int = graft.functions.VectorMomentsAggregator.MaxDim

  /** Train on `vec` (array<float|double>): one corpus pass → moments →
    * driver Jacobi eigensolve → top-`k` sign-normalized components. */
  def train(vecs: DataFrame, vec: Column, k: Int): PcaModel = {
    require(k >= 1, s"need k >= 1, got $k")
    val agg = udaf(graft.functions.VectorMomentsAggregator)
    // null ELEMENTS inside a vector must fail by name, not silently
    // default-to-0.0 through the primitive-Seq encoder (null/empty
    // VECTORS stay ignored per the aggregator convention). Same
    // in-column raise_error poison as the sampling guards: zero cost on
    // clean data, fires at the first dirty row.
    val v0 = vec.cast("array<double>")
    val guarded = when(v0.isNotNull && exists(v0, x => x.isNull),
      raise_error(lit("Pca.train: a vector contains null elements — clean " +
        "or filter the embedding column before computing moments"))
        .cast("array<double>"))
      .otherwise(v0)
    val packed = vecs.select(guarded.as("v"))
      .agg(agg(col("v")).as("m")).head().getSeq[Double](0)
    fromMoments(packed, k)
  }

  /** Fit the model from a PACKED moment state ([[graft.functions
    * .VectorMomentsAggregator]] output: `[n, d, sums…, outer-sums…]`).
    * Moments are MERGEABLE (element-wise addable across corpus slices or
    * micro-batches), so this is the training endpoint for any
    * pre-aggregated or streamed state — [[graft.streaming.StreamingPca]]
    * folds per-batch moments behind its fence and derives models from
    * the stored state alone, never rescanning history. */
  def fromMoments(packed: Seq[Double], k: Int): PcaModel = {
    require(k >= 1, s"need k >= 1, got $k")
    require(packed.nonEmpty,
      "Pca.train: no non-empty vectors — cannot fit a model to nothing")
    val n = packed(0).toLong
    val d = packed(1).toInt
    require(d <= MaxDim,
      s"Pca.train: dimension $d exceeds MaxDim=$MaxDim — the moment " +
        "state is d² doubles; is this really an embedding column?")
    require(k <= d, s"Pca.train: k=$k exceeds dimension $d")
    val mean = Array.tabulate(d)(i => packed(2 + i) / n)
    val cov = Array.tabulate(d, d)((i, j) =>
      packed(2 + d + i * d + j) / n - mean(i) * mean(j))
    val (evals, evecs) = symEig(cov)
    // sort descending, deterministic tie-break on index
    val order = evals.indices.sortBy(i => (-evals(i), i))
    val top = order.take(k)
    val components = top.map { ci =>
      val comp = Array.tabulate(d)(r => evecs(r)(ci))
      // sign normalization: the largest-|entry| coordinate is positive
      var best = 0
      var t = 1
      while (t < d) {
        if (math.abs(comp(t)) > math.abs(comp(best))) best = t
        t += 1
      }
      if (comp(best) < 0) { t = 0; while (t < d) { comp(t) = -comp(t); t += 1 } }
      comp
    }.toArray
    val trace = { var s = 0.0; var i = 0; while (i < d) { s += cov(i)(i); i += 1 }; s }
    PcaModel(n, d, mean, top.map(evals(_)).toArray, components,
      order.map(evals(_)).toArray, trace)
  }

  /** Project to the model's components: `(id, z_0..z_{k-1})` where
    * `z_j = components(j) · (x − mean)` — map-side, one codegen'd dot
    * product per output dimension, the mean term folded to a constant. */
  def project(df: DataFrame, id: Column, vec: Column,
              model: PcaModel): DataFrame = {
    import graft.functions.VectorExpressions.dotProduct
    val v = vec.cast("array<double>")
    val zCols = model.components.zipWithIndex.map { case (comp, j) =>
      val meanDot = dot(comp, model.mean)
      (dotProduct(v, typedLit(comp.toSeq)) - lit(meanDot)).as(s"z$j")
    }
    df.select(id.as("id") +: zCols: _*)
  }

  private def dot(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }

  /** Cyclic Jacobi eigensolver for a symmetric matrix: (eigenvalues,
    * eigenvector matrix with eigenvectors in COLUMNS). Deterministic —
    * fixed sweep order, fixed convergence threshold. */
  private[operators] def symEig(a0: Array[Array[Double]]): (Array[Double], Array[Array[Double]]) = {
    val n = a0.length
    val a = a0.map(_.clone())
    val v = Array.tabulate(n, n)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var off = offNorm(a)
    val scale = math.max(1e-300, frobNorm(a))
    while (sweep < 100 && off > 1e-14 * scale) {
      var p = 0
      while (p < n - 1) {
        var q = p + 1
        while (q < n) {
          val apq = a(p)(q)
          if (math.abs(apq) > 1e-300) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
            val t =
              if (theta >= 0) 1.0 / (theta + math.sqrt(theta * theta + 1.0))
              else -1.0 / (-theta + math.sqrt(theta * theta + 1.0))
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            var i = 0
            while (i < n) {
              val aip = a(i)(p); val aiq = a(i)(q)
              a(i)(p) = c * aip - s * aiq
              a(i)(q) = s * aip + c * aiq
              i += 1
            }
            i = 0
            while (i < n) {
              val api = a(p)(i); val aqi = a(q)(i)
              a(p)(i) = c * api - s * aqi
              a(q)(i) = s * api + c * aqi
              i += 1
            }
            i = 0
            while (i < n) {
              val vip = v(i)(p); val viq = v(i)(q)
              v(i)(p) = c * vip - s * viq
              v(i)(q) = s * vip + c * viq
              i += 1
            }
          }
          q += 1
        }
        p += 1
      }
      off = offNorm(a)
      sweep += 1
    }
    (Array.tabulate(n)(i => a(i)(i)), v)
  }

  private def offNorm(a: Array[Array[Double]]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) {
      var j = 0
      while (j < a.length) {
        if (i != j) s += a(i)(j) * a(i)(j)
        j += 1
      }
      i += 1
    }
    math.sqrt(s)
  }

  private def frobNorm(a: Array[Array[Double]]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) {
      var j = 0
      while (j < a.length) { s += a(i)(j) * a(i)(j); j += 1 }
      i += 1
    }
    math.sqrt(s)
  }

  /** Self-certification frame for the registered query: one row per
    * requested k with the properties a correct PCA cannot violate —
    * component orthonormality (driver-exact Gram deviation ≤ 1e-9),
    * eigenvalue sanity (descending, non-negative within jitter, their
    * FULL sum matching the covariance trace within 1e-6 relative), and
    * mean reconstruction error non-increasing in k (computed in ONE
    * corpus aggregate over all ks at once via the orthonormal-projection
    * identity ‖x−μ‖² − Σ_{j<k} z_j², which the certified orthonormality
    * licenses; the k=0 baseline is the total variance). Booleans, not
    * floats, so the DuckDB oracle can pin the expectation exactly. */
  def certify(spark: SparkSession, vecs: DataFrame, vec: Column,
              ks: Seq[Int]): DataFrame = {
    require(ks.nonEmpty && ks == ks.sorted && ks.distinct == ks,
      s"ks must be distinct ascending, got $ks")
    import graft.functions.VectorExpressions.dotProduct
    val kMax = ks.max
    val model = train(vecs, vec, kMax)
    val v = vec.cast("array<double>").as("v")
    val meanLit = typedLit(model.mean.toSeq)
    val meanNorm2 = dot(model.mean, model.mean)
    val base = dotProduct(col("v"), col("v")) -
      lit(2.0) * dotProduct(col("v"), meanLit) + lit(meanNorm2)
    val zSq = model.components.map { comp =>
      val z = dotProduct(col("v"), typedLit(comp.toSeq)) - lit(dot(comp, model.mean))
      z * z
    }
    val errCols = ks.map { k =>
      avg(zSq.take(k).foldLeft(base)(_ - _)).as(s"err_$k")
    }
    val row = vecs.select(v)
      .agg(count(lit(1)).as("n"), (avg(base).as("err_0") +: errCols): _*)
      .head()
    val nVecs = row.getLong(0)
    val errs = Array.tabulate(ks.size + 1)(i => row.getDouble(1 + i))
    val orthonormal = model.gramMaxDeviation <= 1e-9
    val evs = model.allEigenvalues
    val eigenOk = evs.zip(evs.tail).forall { case (a, b) => a >= b - 1e-9 } &&
      evs.forall(_ >= -1e-9 * math.max(1.0, evs.head)) &&
      math.abs(evs.sum - model.totalVariance) <=
        1e-6 * math.max(1e-300, math.abs(model.totalVariance))
    val rows = ks.zipWithIndex.map { case (k, i) =>
      (k, nVecs, model.dim, orthonormal, eigenOk,
        errs(i + 1) <= errs(i) + 1e-9)
    }
    import spark.implicits._
    rows.toDF("k", "n_vectors", "dim", "orthonormal", "eigen_ok",
      "err_improves").orderBy(col("k"))
  }
}
