package graft

import graft.operators.Pca
import org.apache.spark.sql.functions._

class PcaSpec extends SparkSpec {
  import spark.implicits._

  test("axis-aligned data: eigenvalues are the per-axis variances, components the axes") {
    // x-axis values ±1 (var 1), y-axis values ±2 (var 4), z constant 0
    val df = Seq(
      Seq(1.0, 0.0, 0.0), Seq(-1.0, 0.0, 0.0),
      Seq(0.0, 2.0, 0.0), Seq(0.0, -2.0, 0.0)
    ).toDF("v")
    val m = Pca.train(df, col("v"), k = 3)
    // covariance diag = (0.5, 2.0, 0) over the 4 rows (population)
    assert(m.n == 4 && m.dim == 3)
    assert(math.abs(m.eigenvalues(0) - 2.0) < 1e-12, m.eigenvalues.toSeq.toString)
    assert(math.abs(m.eigenvalues(1) - 0.5) < 1e-12)
    assert(math.abs(m.eigenvalues(2)) < 1e-12)
    // first component = y axis, sign-normalized positive
    assert(math.abs(m.components(0)(1) - 1.0) < 1e-9, m.components(0).toSeq.toString)
    assert(math.abs(m.components(1)(0) - 1.0) < 1e-9)
    assert(m.gramMaxDeviation < 1e-12)
    assert(math.abs(m.totalVariance - 2.5) < 1e-12)
  }

  test("planted rank-2 structure: k=2 reconstructs exactly, projection matches by hand") {
    // x_i = a_i*u + b_i*w + mu with orthonormal u, w in 6 dims
    val u = Array(1.0, 0, 0, 0, 0, 0)
    val w = Array(0.0, 1, 0, 0, 0, 0)
    val mu = Array(0.0, 0, 0, 5, 0, 0)
    // coefficient vectors chosen zero-mean AND uncorrelated (Σab = 0),
    // so the principal axes are exactly u and w, not a rotation of them
    val coefs = Seq((3.0, 1.0), (-3.0, 1.0), (1.0, -1.0), (-1.0, -1.0))
    val rows = coefs.map { case (a, b) =>
      Array.tabulate(6)(i => a * u(i) + b * w(i) + mu(i)).toSeq
    }
    val df = rows.toDF("v")
    val m = Pca.train(df, col("v"), k = 2)
    // only two nonzero eigenvalues
    assert(m.allEigenvalues.drop(2).forall(e => math.abs(e) < 1e-12),
      m.allEigenvalues.toSeq.toString)
    // projection: z for (3,1) along component0 (= u, var 5 > var 2.5 of w)
    val proj = Pca.project(df.withColumn("id", monotonically_increasing_id()),
        col("id"), col("v"), m)
      .orderBy(col("id")).collect()
    assert(math.abs(math.abs(proj(0).getDouble(1)) - 3.0) < 1e-9)
    assert(math.abs(math.abs(proj(0).getDouble(2)) - 1.0) < 1e-9)
    // exact reconstruction at k=2: err columns in certify say so
    val cert = Pca.certify(spark, df, col("v"), Seq(1, 2))
      .collect().map(r => r.getInt(0) ->
        ((r.getLong(1), r.getBoolean(3), r.getBoolean(4), r.getBoolean(5)))).toMap
    assert(cert(1) == ((4L, true, true, true)), cert.toString)
    assert(cert(2) == ((4L, true, true, true)), cert.toString)
  }

  test("training is deterministic and guards fail by name") {
    val df = Tables(spark, sfDir).embeddings
      .select(col("embedding").as("v")).limit(200)
    val m1 = Pca.train(df, col("v"), k = 4)
    val m2 = Pca.train(df, col("v"), k = 4)
    assert(m1.components.flatten.toSeq == m2.components.flatten.toSeq,
      "sign-normalized training must be bit-deterministic")
    assert(m1.gramMaxDeviation < 1e-9)
    val e1 = intercept[IllegalArgumentException] {
      Pca.train(df.filter(lit(false)), col("v"), k = 2)
    }
    assert(e1.getMessage.contains("Pca.train"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException] {
      Pca.train(df, col("v"), k = 100000)
    }
    assert(e2.getMessage.contains("exceeds dimension"), e2.getMessage)
    // a mistakenly-passed wide column (d > MaxDim) fails by name INSIDE
    // the aggregator's reduce, before the d^2 buffer is even allocated —
    // so the guard is a named message, not an executor OOM; Spark wraps
    // the task failure, so match the message through the wrapper
    val wide = Seq(Seq.tabulate(Pca.MaxDim + 1)(_.toDouble)).toDF("v")
    val e3 = intercept[Exception] { Pca.train(wide, col("v"), k = 2) }
    assert(messageChain(e3).contains("MaxDim"), messageChain(e3))
    // null ELEMENTS inside a vector fail by name, not with an unboxing NPE
    val dirty = Seq(Seq[java.lang.Double](1.0, null, 3.0)).toDF("v")
    val e4 = intercept[Exception] {
      Pca.train(dirty.select(col("v").cast("array<double>").as("v")), col("v"), k = 1)
    }
    assert(messageChain(e4).contains("null elements"), messageChain(e4))
    intercept[IllegalArgumentException] {
      Pca.certify(spark, df, col("v"), Seq(8, 4)) // not ascending
    }
  }

  test("pcaTopK: exact parity at conservative params; recall degrades honestly on a flat spectrum") {
    // this corpus is hash-isotropic (explained@16 ~ 0.25), the WORST
    // case for PCA candidates — measured recall@5 ladder:
    //   kd=16 rr=4: 0.40   kd=24 rr=8: 0.78   kd=32 rr=8: 0.98
    //   kd=32 rr=16: 1.00  (the parity point pinned below)
    import graft.operators.Similarity
    val t = Tables(spark, sfDir)
    val all = Similarity.prepared(t.embeddings, col("vec_id"), col("embedding"))
    val queries = all.filter(col("vec_id") < 10)
    val exact = Similarity.bruteForceTopK(all, queries, k = 5)
      .withColumn("cosine", round(col("cosine"), 6))
    val reduced = Similarity.pcaTopK(all, queries, k = 5, rerank = 16,
        kDims = 32)
      .withColumn("cosine", round(col("cosine"), 6))
    assert(reduced.exceptAll(exact).isEmpty && exact.exceptAll(reduced).isEmpty,
      "PCA-candidate top-k must equal exact brute force at kd=32, rr=16")
    // the cheap setting keeps a usable fraction even here — the floor of
    // the spectrum-dependence story, not a target
    val cheap = Similarity.pcaTopK(all, queries, k = 5, rerank = 4,
        kDims = 16)
      .select(col("query_id"), col("cand_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val exactSet = exact.select(col("query_id"), col("cand_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (cheap & exactSet).size.toDouble / exactSet.size
    assert(recall >= 0.3, s"flat-spectrum floor: recall $recall")
  }

  test("certify on real embeddings: all properties hold, variance concentrates") {
    val t = Tables(spark, sfDir)
    val got = Pca.certify(spark, t.embeddings, col("embedding"), Seq(4, 16))
      .collect().map(r => (r.getInt(0), r.getBoolean(3), r.getBoolean(4),
        r.getBoolean(5))).toSeq
    assert(got == Seq((4, true, true, true), (16, true, true, true)),
      got.toString)
  }
}
