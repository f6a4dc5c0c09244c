package graft

import graft.functions.SketchExpressions
import graft.operators.Dedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bloom-prefiltered exact-dedup admission ([[Dedup.bloomAdmit]]): the
  * result must be EXACT for any fpp (one-sided bloom error + confirm join),
  * the broadcast path must keep text out of every exchange, and the
  * membership expression must stay inside whole-stage codegen. */
class BloomAdmissionSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs =
    Tables(spark, sfDir).documents.select(col("doc_id"), col("text"))
  private lazy val corpus = docs.filter(pmod(col("doc_id"), lit(4)) =!= 0)
  // the %4 slice plus renumbered byte-identical copies of corpus docs —
  // planted true duplicates the admission must reject
  private lazy val batch = docs.filter(pmod(col("doc_id"), lit(4)) === 0)
    .unionByName(corpus.filter(col("doc_id") < 40)
      .select((col("doc_id") + 200000).as("doc_id"), col("text")))
  private lazy val idx = Dedup.admissionIndex(corpus, col("text"))
  private lazy val bloomBc =
    spark.sparkContext.broadcast(Dedup.admissionBloom(idx, fpp = 0.01))

  private def admittedIds(df: DataFrame): Set[Long] =
    df.select("doc_id").as[Long].collect().toSet

  /** Ground truth: text-keyed anti-join. */
  private lazy val expected: Set[Long] =
    batch.join(corpus.select(col("text")), Seq("text"), "left_anti")
      .select("doc_id").as[Long].collect().toSet

  test("bloom admission equals the text-keyed anti-join") {
    val got = admittedIds(
      Dedup.bloomAdmit(idx, bloomBc, batch, col("doc_id"), col("text")))
    val batchIds = batch.select("doc_id").as[Long].collect().toSet
    assert(expected.nonEmpty && expected != batchIds,
      "fixture must plant both admitted and rejected documents")
    assert(got == expected)
  }

  test("no false negatives: every indexed fingerprint tests positive") {
    val misses = idx
      .filter(!SketchExpressions.bloomMightContain(col("fp"), bloomBc))
      .count()
    assert(misses == 0L, s"$misses indexed fingerprints tested bloom-negative")
  }

  test("false-positive rate on non-members is near the configured fpp") {
    // 20k longs far outside the xxhash64 image of the corpus is the wrong
    // framing — any long is a potential fingerprint; just probe fresh ones.
    val probes = spark.range(20000).select(xxhash64(col("id") + 123456789L).as("fp"))
      .join(idx, Seq("fp"), "left_anti")
    val n = probes.count()
    val fps = probes
      .filter(SketchExpressions.bloomMightContain(col("fp"), bloomBc)).count()
    val rate = fps.toDouble / n
    assert(rate < 0.05, s"false-positive rate $rate far above configured 0.01")
  }

  test("shuffle fallback (candidate cap 0) returns the identical set") {
    val got = admittedIds(Dedup.bloomAdmit(idx, bloomBc, batch,
      col("doc_id"), col("text"), maxBroadcastCandidates = 0L))
    assert(got == expected)
  }

  test("plan guard: broadcast path shuffles no text column and keeps codegen") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val out = Dedup.bloomAdmit(idx, bloomBc, batch, col("doc_id"), col("text"))
      val root = out.queryExecution.executedPlan
      val planStr = root.toString
      // both confirm joins take the broadcast strategy under the cap
      assert("BroadcastHashJoin".r.findAllIn(planStr).size >= 2,
        s"expected broadcast semi+anti joins:\n$planStr")
      // the only shuffles allowed are fp-only (candidate distinct / bloom
      // build); the batch text reaches the output via scans and map-side
      // filters, never an exchange
      root.collect { case e: ShuffleExchangeLike => e }.foreach { e =>
        val carried = e.asInstanceOf[org.apache.spark.sql.execution.SparkPlan]
          .output.map(_.name).filter(_.toLowerCase.contains("text"))
        assert(carried.isEmpty, s"text columns shuffled: $carried\n$planStr")
      }
      // the membership filter runs inside a whole-stage-codegen span (the
      // expression is not CodegenFallback)
      import org.apache.spark.sql.execution.{FilterExec, WholeStageCodegenExec}
      def bloomFilters(p: org.apache.spark.sql.execution.SparkPlan) =
        p.collect {
          case f: FilterExec if f.condition.toString.contains("bloom_might_contain") => f
        }
      val all = bloomFilters(root).toSet
      assert(all.nonEmpty, s"membership filter missing:\n$planStr")
      // collect from a span recurses past exchanges into nested spans, so
      // test coverage (every filter under SOME span), not counts
      val covered = root.collect { case w: WholeStageCodegenExec => w }
        .flatMap(bloomFilters).toSet
      assert(all.subsetOf(covered), s"bloom filter fell out of codegen:\n$planStr")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
  }
}
