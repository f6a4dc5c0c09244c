package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (backward) join: for each left row, attach the most recent right
  * row with the same key and `rightTs <= leftTs`.
  *
  * Spark has no native as-of join; rather than a custom physical operator,
  * this composes as the union-and-carry-forward pattern, which scales to
  * arbitrary sizes with exactly ONE shuffle (by key) and no range
  * explosion: tag both sides, union them, order within each key by
  * (ts, side) — right rows sorting before left rows at equal ts, giving
  * inclusive `<=` — and carry the last non-null right payload forward onto
  * each left row with `last(..., ignoreNulls)` over a running window.
  * A join+filter+argmax formulation is quadratic per key, and a bucketed
  * range join duplicates rows per bucket; the union-window form is the
  * 100 TB plan.
  *
  * For deterministic output the right side should be unique per
  * (key, ts) — pre-aggregate it otherwise (ties are resolved by physical
  * order, as in other engines' ASOF joins).
  */
object AsOfJoin {

  /** Output = all left columns + `payload` columns from the matched right
    * row (null where no right row precedes). Payload names must not clash
    * with left column names. */
  def backward(left: DataFrame, right: DataFrame,
               leftKey: Column, rightKey: Column,
               leftTs: Column, rightTs: Column,
               payload: Seq[(String, Column)]): DataFrame = {
    val lT = left
      .withColumn("__k", leftKey).withColumn("__ts", leftTs)
      .withColumn("__side", lit(1))
    val rT = right.select(
      rightKey.as("__k") +: rightTs.as("__ts") +: lit(0).as("__side") +:
        payload.map { case (n, c) => c.as(n) }: _*)
    val all = lT.unionByName(rT, allowMissingColumns = true)
    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    all
      .select(col("*") +: payload.map { case (n, _) =>
        last(col(n), ignoreNulls = true).over(w).as(s"__asof_$n") }: _*)
      .filter(col("__side") === 1)
      .select(left.columns.map(col).toSeq ++
        payload.map { case (n, _) => col(s"__asof_$n").as(n) }: _*)
  }
}
