package graft

import graft.operators.Dsir
import org.apache.spark.sql.functions._

/** DSIR importance resampling: hand-computed ratio/weight fixture,
  * planted domain shift selection, blank hygiene, determinism. */
class DsirSpec extends SparkSpec {
  import spark.implicits._

  test("ratioTable + weights: hand-computed Laplace log-ratios on a " +
       "two-feature fixture (unigrams only)") {
    val raw = Seq((1L, "aa aa bb"), (2L, "bb bb")).toDF("doc_id", "text")
    val tgt = Seq((10L, "aa aa aa bb")).toDF("doc_id", "text")
    // raw counts: aa 2, bb 3 (N_R = 5); tgt: aa 3, bb 1 (N_T = 4); V = 2
    val rt = Dsir.ratioTable(raw, tgt, col("doc_id"), col("text"),
        ngram = 1)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val aaExp = r6(math.log(4.0 / 6.0) - math.log(3.0 / 7.0))
    val bbExp = r6(math.log(2.0 / 6.0) - math.log(4.0 / 7.0))
    assert(rt("aa") == ((3L, 2L, aaExp)), rt.toString)
    assert(rt("bb") == ((1L, 3L, bbExp)), rt.toString)
    // doc 1 = 2*aa + 1*bb, doc 2 = 2*bb — exact DECIMAL sums
    val w = Dsir.weights(raw, tgt, col("doc_id"), col("text"), ngram = 1)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2))).toMap
    assert(w(1L)._1 == 3L && w(2L)._1 == 2L)
    assert(math.abs(w(1L)._2 -
      (BigDecimal(aaExp) * 2 + BigDecimal(bbExp)).toDouble) < 1e-12)
    assert(math.abs(w(2L)._2 - (BigDecimal(bbExp) * 2).toDouble) < 1e-12)
    // the target-leaning doc outranks the target-averse one
    assert(w(1L)._2 > w(2L)._2)
  }

  test("select: a planted domain shift pulls in-domain docs to the " +
       "top; blank docs score (0, 0.0); partitioning-invariant") {
    // raw: 200 docs from a shared vocab; every 10th carries the domain
    // marker tokens the target is made of
    val base = spark.range(200).select(col("id").as("doc_id"),
      concat(
        concat_ws(" ", transform(sequence(lit(0), lit(19)), i =>
          concat(lit("w"), pmod(xxhash64(col("id"), i), lit(50))
            .cast("string")))),
        when(pmod(col("id"), lit(10)) === 0,
          lit(" quantum flux capacitor")).otherwise(lit("")))
        .as("text"))
    // a target SAMPLE large enough that smoothing doesn't flatten it
    // (the operator's documented estimate-quality contract)
    val tgt = spark.range(30).select((col("id") + 500).as("doc_id"),
      lit("quantum flux capacitor experiments with quantum flux")
        .as("text"))
    val top = Dsir.select(base, tgt, col("doc_id"), col("text"), k = 20)
      .collect().map(_.getLong(0)).toSet
    assert(top == (0L until 200L by 10L).toSet,
      s"selection missed the planted domain: $top")
    // blank docs carry the paper's empty-vector ratio of 1 (logw 0)
    val raw = base.unionByName(
      Seq((900L, "   ")).toDF("doc_id", "text"))
    val w = Dsir.weights(raw, tgt, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2))).toMap
    assert(w(900L) == ((0L, 0.0)), s"blank doc: ${w(900L)}")
    // partitioning invariance
    val again = Dsir.select(base.repartition(13), tgt, col("doc_id"),
        col("text"), k = 20)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).sortBy(_._1)
    val first = Dsir.select(base, tgt, col("doc_id"), col("text"), k = 20)
      .collect().map(r => (r.getLong(0), r.getDouble(2))).sortBy(_._1)
    assert(again.toSeq == first.toSeq)
  }

  test("hashed buckets: a SMALL target still finds the planted domain " +
       "(the tail pools into estimated buckets), and bucket counts " +
       "are a partition of the raw feature mass") {
    val base = spark.range(200).select(col("id").as("doc_id"),
      concat(
        concat_ws(" ", transform(sequence(lit(0), lit(19)), i =>
          concat(lit("w"), pmod(xxhash64(col("id"), i), lit(500))
            .cast("string")))),
        when(pmod(col("id"), lit(10)) === 0,
          lit(" quantum flux capacitor quantum flux")).otherwise(lit("")))
        .as("text"))
    // the UNHASHED form is estimate-starved at this target size; 64
    // WELL-FILLED buckets (pooling needs buckets ≪ mass, the
    // operator's documented dial) pool the 500-token tail and a MODEST
    // 10-row target sample is enough for the plant to dominate
    val tgt = spark.range(10).select((col("id") + 500).as("doc_id"),
      lit("quantum flux capacitor quantum flux").as("text"))
    val top = Dsir.select(base, tgt, col("doc_id"), col("text"), k = 20,
        ngram = 2, nBuckets = 64)
      .collect().map(_.getLong(0)).toSet
    // bucket collisions make the tiny-corpus ranking statistical —
    // demand strong recall plus clean mean separation, not exactness
    assert(top.count(_ % 10 == 0) >= 15,
      s"hashed selection found only ${top.count(_ % 10 == 0)}/20: $top")
    val w = Dsir.weights(base, tgt, col("doc_id"), col("text"),
        ngram = 2, nBuckets = 64)
      .collect().map(r => (r.getLong(0), r.getDouble(2)))
    val (pl, npl) = w.partition(_._1 % 10 == 0)
    val pm = pl.map(_._2).sum / pl.length
    val nm = npl.map(_._2).sum / npl.length
    assert(pm > nm + 2.0,
      f"planted mean $pm%.2f vs non-planted $nm%.2f — no separation")
    // bucket mass partition: Σ raw_n over buckets == total feature
    // occurrences
    val rt = Dsir.ratioTable(base, tgt, col("doc_id"), col("text"),
      ngram = 1, nBuckets = 64)
    val mass = rt.agg(sum(col("raw_n"))).head().getLong(0)
    assert(mass == 200L * 20L + 20L * 5L, s"bucket mass $mass")
  }

  test("select plan: rank-limited top-k, no global sort") {
    val raw = Tables(spark, sfDir).documents
    val tgt = raw.filter(col("doc_id") % 7 === 0)
    val plan = Dsir.select(raw, tgt, col("doc_id"), col("text"), k = 20)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"selection must be rank-limited:\n$plan")
  }
}
