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

  /** Σ aᵢ·bᵢ — tight-loop custom expression ([[VectorExpressions.DotProduct]]);
    * same sequential accumulation order as the higher-order-function form
    * and DuckDB's list_inner_product, so results are engine-identical. */
  def dot(a: Column, b: Column): Column = VectorExpressions.dotProduct(a, b)

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

  /** Random-hyperplane LSH bucket key for cosine similarity — delegates to
    * the tight-loop custom expression
    * [[VectorExpressions.HyperplaneLshBucket]] (the higher-order-function
    * formulation was interpreted and dominated ANN bucketing cost). */
  def hyperplaneLshBucket(vec: Column, nPlanes: Int, planeOffset: Int = 0): Column =
    VectorExpressions.hyperplaneLshBucket(vec, nPlanes, planeOffset)
}
