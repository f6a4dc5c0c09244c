package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<double>` columns, built entirely from Spark's
  * codegen'd higher-order functions — no UDFs, so the whole computation
  * stays inside whole-stage codegen and is usable in any engine context
  * (batch, streaming, window).
  *
  * All accumulation is sequential left-to-right over the array, which makes
  * results bit-deterministic and comparable across engines that do the same
  * (e.g. DuckDB's list functions).
  */
object VectorFunctions {

  /** Σ aᵢ·bᵢ — single pass over zipped elements. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  /** ‖a‖₂ */
  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  /** cos(a,b) = a·b / (‖a‖‖b‖); null-safe on zero norms. */
  def cosine(a: Column, b: Column): Column = {
    val d = dot(a, b)
    val n = l2Norm(a) * l2Norm(b)
    when(n === 0.0, lit(null)).otherwise(d / n)
  }

  /** Squared euclidean distance. */
  def l2DistanceSq(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0.0),
      (acc, v) => acc + v)

  /** Sign bits of projections onto `nPlanes` deterministic pseudo-random
    * hyperplanes — the random-hyperplane LSH bucket key for cosine
    * similarity. Plane components are derived from `xxhash64(planeIdx, dim)`
    * scaled to [-1, 1], so buckets are reproducible with no driver-side
    * randomness and no broadcast of plane matrices.
    */
  def hyperplaneLshBucket(vec: Column, nPlanes: Int, dim: Int): Column = {
    val bits = transform(sequence(lit(0), lit(nPlanes - 1)), p => {
      val proj = aggregate(
        zip_with(vec, sequence(lit(0), lit(dim - 1)),
          (x, i) => x * (xxhash64(p * lit(dim) + i).cast("double") / lit(Long.MaxValue.toDouble))),
        lit(0.0), (acc, v) => acc + v)
      when(proj >= 0.0, lit(1L)).otherwise(lit(0L))
    })
    // pack bits into one long key
    aggregate(bits, lit(0L), (acc, b) => acc * 2 + b)
  }
}
