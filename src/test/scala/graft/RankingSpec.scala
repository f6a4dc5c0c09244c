package graft

import graft.operators.{Ranking, Similarity}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The partial-aggregated top-k must be BIT-IDENTICAL to the Window
  * formulation it replaced — including ties (lowest cand_id first) and
  * null scores (nulls last), the cases a subtly-wrong comparator gets
  * wrong silently. */
class RankingSpec extends SparkSpec {
  import spark.implicits._

  private def windowForm(scored: org.apache.spark.sql.DataFrame, k: Int) = {
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("cand_id"))
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("rk"), col("cand_id"), col("cosine"))
  }

  test("exact parity with the window form on ties and null scores") {
    val scored = Seq(
      // query 1: tie on 0.9 -> ids 3 then 7; null ranks after 0.1
      (1L, 7L, java.lang.Double.valueOf(0.9)),
      (1L, 3L, java.lang.Double.valueOf(0.9)),
      (1L, 9L, java.lang.Double.valueOf(0.1)),
      (1L, 2L, null.asInstanceOf[java.lang.Double]),
      // query 2: all null — nulls still rank deterministically by id
      (2L, 5L, null.asInstanceOf[java.lang.Double]),
      (2L, 4L, null.asInstanceOf[java.lang.Double])
    ).toDF("query_id", "cand_id", "cosine")
    for (k <- Seq(1, 2, 3, 10)) {
      val a = Ranking.topKPerQuery(scored, k).collect().toSet
      val b = windowForm(scored, k).collect().toSet
      assert(a == b, s"parity broke at k=$k:\nagg=$a\nwin=$b")
    }
    // explicit expectations, not just parity
    val top2 = Ranking.topKPerQuery(scored, 2)
      .filter(col("query_id") === 1).orderBy(col("rk"))
      .select("cand_id").as[Long].collect().toSeq
    assert(top2 == Seq(3L, 7L), "tie must break to the lowest cand_id")
    val q2 = Ranking.topKPerQuery(scored, 2)
      .filter(col("query_id") === 2).orderBy(col("rk"))
      .select("cand_id").as[Long].collect().toSeq
    assert(q2 == Seq(4L, 5L), "null scores rank by id, nulls last overall")
  }

  test("NaN scores keep parity with the window form (total order, partitioning-invariant)") {
    // Spark sorts NaN greater than every other double; a comparator built
    // on `!=`/`>` is NOT a total order under NaN (both before(a,b) and
    // before(b,a) false), which made buffer contents insertion-order-
    // dependent. Corrupt vectors yield NaN cosines, so this case is real.
    val nan = java.lang.Double.valueOf(Double.NaN)
    val scored = Seq(
      (1L, 8L, nan),
      (1L, 3L, nan), // two NaNs: tie must break to the lowest cand_id
      (1L, 5L, java.lang.Double.valueOf(0.9)),
      (1L, 1L, java.lang.Double.valueOf(Double.PositiveInfinity)),
      (1L, 2L, null.asInstanceOf[java.lang.Double]),
      // Spark treats -0.0 == 0.0 as a TIE (id order); raw Double.compare
      // would rank +0.0 first and flip 7 before 6 — a reachable case via
      // negative-dot underflow
      (2L, 7L, java.lang.Double.valueOf(0.0)),
      (2L, 6L, java.lang.Double.valueOf(-0.0))
    ).toDF("query_id", "cand_id", "cosine")
    for (k <- Seq(1, 2, 3, 10)) {
      val a = Ranking.topKPerQuery(scored, k).collect().toSet
      val b = windowForm(scored, k).collect().toSet
      assert(a == b, s"NaN parity broke at k=$k:\nagg=$a\nwin=$b")
    }
    val order = Ranking.topKPerQuery(scored, 10)
      .filter(col("query_id") === 1).orderBy(col("rk"))
      .select("cand_id").as[Long].collect().toSeq
    assert(order == Seq(3L, 8L, 1L, 5L, 2L),
      "expected NaN first (ids 3,8), then +Inf, 0.9, null last")
    val zeros = Ranking.topKPerQuery(scored, 10)
      .filter(col("query_id") === 2).orderBy(col("rk"))
      .select("cand_id").as[Long].collect().toSeq
    assert(zeros == Seq(6L, 7L), "-0.0 and 0.0 must tie and break by id")
    val a1 = Ranking.topKPerQuery(scored.repartition(7), 3).collect().toSet
    val a2 = Ranking.topKPerQuery(scored.repartition(2), 3).collect().toSet
    assert(a1 == a2, "NaN handling must be partitioning-invariant")
  }

  test("parity on the real corpus at several k, and across partitionings") {
    val all = Similarity.prepared(Tables(spark, sfDir).embeddings,
      col("vec_id"), col("embedding"))
    val q = all.filter(col("vec_id") < 7)
    val scored = all.select(col("vec_id").as("cand_id"), col("vec").as("cv"),
        col("norm").as("cn"))
      .crossJoin(broadcast(q.select(col("vec_id").as("query_id"),
        col("vec").as("qv"), col("norm").as("qn"))))
      .filter(col("cand_id") =!= col("query_id"))
      .withColumn("cosine", graft.functions.VectorFunctions.dot(col("cv"), col("qv"))
        / (col("cn") * col("qn")))
      .select("query_id", "cand_id", "cosine")
    for (k <- Seq(1, 5, 40)) {
      val a = Ranking.topKPerQuery(scored, k).collect().toSet
      val b = windowForm(scored, k).collect().toSet
      assert(a == b, s"parity broke at k=$k on the real corpus")
    }
    // partial-merge order must not matter: repartitioned input, same rows
    val a1 = Ranking.topKPerQuery(scored.repartition(13), 5).collect().toSet
    val a2 = Ranking.topKPerQuery(scored.repartition(2), 5).collect().toSet
    assert(a1 == a2, "aggregation must be partitioning-invariant")
  }

  test("the ranking plan is an aggregation, not a window") {
    val scored = Seq((1L, 2L, java.lang.Double.valueOf(0.5)))
      .toDF("query_id", "cand_id", "cosine")
    val plan = Ranking.topKPerQuery(scored, 5)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"must not plan a window:\n$plan")
    assert(plan.contains("Aggregate") || plan.contains("HashAggregate") ||
      plan.contains("SortAggregate") || plan.contains("ObjectHashAggregate"),
      s"must plan an aggregation:\n$plan")
  }

  test("rrfFuse: hand-computed fusion, absent-from-list items, guards") {
    import spark.implicits._
    // list A ranks 1,2,3 ; list B ranks 2,9 — doc 2 is in both
    val a = Seq((10L, 1), (20L, 2), (30L, 3)).toDF("id", "rk")
    val b = Seq((20L, 1), (90L, 2)).toDF("id", "rk")
    val got = Ranking.rrfFuse(Seq("a" -> a, "b" -> b), "id", "rk", k = 10)
      .as[(Int, Long, Long, Long, Double)].collect().toSeq
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // doc 20: 1/62 + 1/61; doc 10: 1/61; doc 90: 1/62; doc 30: 1/63
    val expected = Seq(
      (1, 20L, 2L, 1L, r6(1.0 / 62 + 1.0 / 61)),
      (2, 10L, 1L, 0L, r6(1.0 / 61)),
      (3, 90L, 0L, 2L, r6(1.0 / 62)),
      (4, 30L, 3L, 0L, r6(1.0 / 63)))
    assert(got == expected, s"got $got")
    // k truncates after fusion, not per list
    assert(Ranking.rrfFuse(Seq("a" -> a, "b" -> b), "id", "rk", k = 2)
      .count() == 2)
    intercept[IllegalArgumentException] {
      Ranking.rrfFuse(Seq("a" -> a), "id", "rk", 5)
    }
    intercept[IllegalArgumentException] {
      Ranking.rrfFuse(Seq("a" -> a, "a" -> b), "id", "rk", 5)
    }
    // a list ranking an id twice would fan the join out — the in-column
    // poison fails by name when the fused result is consumed (no
    // construction-time action re-running the ranking lineage)
    def poisonMsg(e: Throwable): String =
      (Iterator.iterate(e)(_.getCause).takeWhile(_ != null).map(_.getMessage)
        ++ Iterator(e.toString)).mkString(" | ")
    val dup = Seq((10L, 3), (10L, 7)).toDF("id", "rk")
    val e1 = intercept[Exception] {
      Ranking.rrfFuse(Seq("a" -> dup, "b" -> b), "id", "rk", 5).collect()
    }
    assert(poisonMsg(e1).contains("more than once"), poisonMsg(e1))
    // 0-based ranks collide with the output's absent sentinel — by name
    val zero = Seq((10L, 0), (20L, 1)).toDF("id", "rk")
    val e2 = intercept[Exception] {
      Ranking.rrfFuse(Seq("a" -> zero, "b" -> b), "id", "rk", 5).collect()
    }
    assert(poisonMsg(e2).contains("1-based"), poisonMsg(e2))
    // fractional ranks would silently truncate through the long cast
    val frac = Seq((10L, 1.5), (20L, 2.0)).toDF("id", "rk")
    val e3 = intercept[Exception] {
      Ranking.rrfFuse(Seq("a" -> frac, "b" -> b.withColumn("rk",
        col("rk").cast("double"))), "id", "rk", 5).collect()
    }
    assert(poisonMsg(e3).contains("non-integral"), poisonMsg(e3))
    // null ranks still read "absent" (rank 0), unpoisoned
    val withNull = Seq((10L, Some(1)), (20L, Option.empty[Int]))
      .toDF("id", "rk")
    val fused = Ranking.rrfFuse(Seq("a" -> withNull, "b" -> b), "id", "rk", 5)
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(fused(20L) == 0L, s"null rank must read absent: $fused")
  }
}
