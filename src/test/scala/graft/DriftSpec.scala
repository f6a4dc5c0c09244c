package graft

import graft.operators.Drift
import org.apache.spark.sql.functions._

/** Drift monitoring: hand-computed PSI on a planted shift, the
  * zero-drift identity, bin partition completeness, and token drift
  * decomposition with the rest bucket. */
class DriftSpec extends SparkSpec {
  import spark.implicits._

  test("psi: identical distributions score ~0; a planted shift scores " +
       "high; bins partition both sides completely") {
    val ref = spark.range(1000).select((col("id") % 100).cast("double").as("v"))
    // identical data -> every per-bin term is exactly 0 after rounding
    val same = Drift.psi(ref, ref, col("v")).collect()(0)
    assert(same.getLong(0) == 10 && same.getLong(1) == 1000 &&
      same.getLong(2) == 1000 && same.getDouble(3) == 0.0, same.toString)
    // planted shift: current values +50 pushes mass into the top bins
    val cur = spark.range(1000)
      .select((col("id") % 100 + 50).cast("double").as("v"))
    val shifted = Drift.psi(ref, cur, col("v")).collect()(0)
    assert(shifted.getDouble(3) > 0.25,
      s"a half-range shift must read as major drift: $shifted")
    // bin frame partitions both sides (counts sum to the inputs)
    val bins = Drift.psiBins(ref, cur, col("v")).collect()
    assert(bins.length == 10)
    assert(bins.map(_.getLong(1)).sum == 1000 &&
      bins.map(_.getLong(2)).sum == 1000)
    // every PSI term is non-negative (the (p-q)ln(p/q) >= 0 identity)
    assert(bins.forall(_.getDouble(5) >= 0.0))
    // nulls carry no evidence
    val withNull = Seq[Option[Double]](Some(1.0), None, Some(2.0)).toDF("v")
    val r = Drift.psi(withNull, withNull, col("v"), nBins = 2).collect()(0)
    assert(r.getLong(1) == 2 && r.getLong(2) == 2)
  }

  test("psi: hand-computed two-bin fixture") {
    // ref: 8 values, 4 below/4 above the median boundary;
    // cur: 2 low, 6 high. Laplace: ref p = 5/10 both bins;
    // cur p = 3/10 and 7/10.
    // terms rounded to 6dp: (0.3-0.5)ln(0.3/0.5) = 0.102165,
    // (0.7-0.5)ln(0.7/0.5) = 0.067294; DECIMAL sum = 0.169459 exactly
    val ref = Seq(1.0, 2, 3, 4, 10, 11, 12, 13).toDF("v")
    val cur = Seq(1.0, 2, 10, 11, 12, 13, 14, 15).toDF("v")
    val r = Drift.psi(ref, cur, col("v"), nBins = 2).collect()(0)
    assert(r.getLong(0) == 2 && r.getLong(1) == 8 && r.getLong(2) == 8)
    assert(r.getDouble(3) == 0.169459, r.toString)
  }

  test("tokenDrift: planted new token lands in the rest bucket; shared " +
       "tokens show the dilution; buckets partition both streams") {
    val ref = Seq("aa bb aa", "aa cc").toDF("text")           // aa3 bb1 cc1
    val cur = Seq("aa bb zz", "aa cc zz").toDF("text")        // aa2 bb1 cc1 zz2
    val rows = Drift.tokenDrift(ref, cur, col("text"), topK = 2).collect()
    assert(rows.length == 3) // 2 named + rest
    val byBucket = rows.map(r => (r.getString(0), r.getBoolean(1),
      r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5),
      r.getDouble(6))).toSeq
    // top-2 of ref by (count desc, token): aa(3), bb(1)
    val aa = byBucket.find(_._1 == "aa").get
    assert(!aa._2 && aa._3 == 3 && aa._4 == 2)
    assert(aa._5 == 0.6 && math.abs(aa._6 - 0.333333) < 1e-9)
    val bb = byBucket.find(_._1 == "bb").get
    assert(bb._3 == 1 && bb._4 == 1 && bb._5 == 0.2)
    // rest: ref cc(1); cur cc(1) + zz(2) = 3 -> the drift shows here
    val rest = byBucket.find(_._2).get
    assert(rest._3 == 1 && rest._4 == 3)
    assert(rest._7 > 0.2, s"planted token must surface in the rest gap: $rest")
    // partition completeness
    assert(byBucket.map(_._3).sum == 5 && byBucket.map(_._4).sum == 6)
    // no drift -> every gap 0
    val zero = Drift.tokenDrift(ref, ref, col("text"), topK = 2).collect()
    assert(zero.forall(_.getDouble(6) == 0.0))
  }

  test("refBoundariesApprox: rank-certified boundaries; PSI downstream " +
       "agrees with the exact path on smooth data; impossible tolerance " +
       "fails by name") {
    val ref = spark.range(20000)
      .select(pmod(xxhash64(col("id")), lit(10000)).cast("double").as("v"))
    val cur = spark.range(20000)
      .select((pmod(xxhash64(col("id"), lit(3)), lit(10000)) * 1.4)
        .cast("double").as("v"))
    val exact = Drift.psi(ref, cur, col("v"), nBins = 10).collect()(0)
    val approx = Drift.psiApprox(ref, cur, col("v"), nBins = 10,
      accuracy = 50000).collect()(0)
    // same verdict class: both read the planted drift, counts complete
    assert(approx.getLong(1) == exact.getLong(1) &&
      approx.getLong(2) == exact.getLong(2))
    assert(exact.getDouble(3) > 0.1 && approx.getDouble(3) > 0.1)
    assert(math.abs(approx.getDouble(3) - exact.getDouble(3)) < 0.05,
      s"approx boundaries moved PSI too far: $approx vs $exact")
    // a tolerance the sketch cannot meet fails by name, not silently
    val e = intercept[IllegalArgumentException] {
      Drift.refBoundariesApprox(ref, col("v"), nBins = 10,
        accuracy = 100, rankTol = 1e-7)
    }
    assert(e.getMessage.contains("refBoundariesApprox") ||
      e.getMessage.contains("accuracy"), e.getMessage)
  }

  test("embeddingDrift: zero drift -> mean shift 0, no alert, " +
       "attestations hold; planted scale+offset -> exact mean shift " +
       "and a PSI alert") {
    val vecs = spark.range(400).select(col("id").as("vec_id"),
      transform(sequence(lit(0), lit(7)), i =>
        (pmod(xxhash64(col("id"), i), lit(1000)).cast("double") / 500.0
          - 1.0)).as("embedding"))
    val same = Drift.embeddingDrift(vecs, vecs, col("embedding"),
      k = 3, nBins = 8).collect()(0)
    assert(same.getLong(0) == 400 && same.getLong(1) == 400)
    assert(same.getInt(2) == 8 && same.getInt(3) == 3)
    assert(same.getDouble(4) == 0.0, s"self mean shift: $same")
    assert(same.getBoolean(5) && same.getBoolean(6) && same.getBoolean(7))
    assert(!same.getBoolean(8), "self-comparison must not alert")
    // planted pure offset: +0.5 on every dim -> mean shift exactly
    // sqrt(8*0.25) = sqrt(2) quantized; scale drives the PSI alert
    val cur = vecs.select(col("vec_id"),
      transform(col("embedding"), x => x * 2.0 + 0.5).as("embedding"))
    val drifted = Drift.embeddingDrift(vecs, cur, col("embedding"),
      k = 3, nBins = 8).collect()(0)
    assert(drifted.getBoolean(8), s"planted drift must alert: $drifted")
    assert(drifted.getBoolean(5) && drifted.getBoolean(6) &&
      drifted.getBoolean(7))
    assert(drifted.getDouble(4) > 0.5, s"mean shift too small: $drifted")
  }
}
