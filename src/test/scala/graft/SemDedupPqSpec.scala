package graft

import graft.operators.{IvfIndex, PqCodec, Similarity}
import graft.functions.{VectorExpressions, VectorFunctions}
import org.apache.spark.sql.functions._

/** The PQ-coded semantic dedup (Similarity.semDedupPqKeep) must return the
  * SAME keep set as the float path on the planted corpus — precision is
  * structural (exact re-check decides every prune), recall rests on the
  * margin covering SDC quantization noise on true near-dup pairs, and
  * that coverage is MEASURED here, not assumed. Plus the plan property
  * the operator exists for: the cluster exchanges carry codes, never
  * float vectors. */
class SemDedupPqSpec extends SparkSpec {
  import spark.implicits._

  /** The registered planted corpus: every 10th vector gets a +100000-id
    * near-twin (v + 0.01·reverse(v), cosine ≈ 0.9999); background pairs
    * top out ≈ 0.6 — the gapped shape of real near-dup data. */
  private lazy val planted = {
    val base = Tables(spark, sfDir).embeddings
      .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"),
        col("label"))
    base.unionByName(base.filter(pmod(col("vec_id"), lit(10)) === 0)
      .select((col("vec_id") + 100000).as("vec_id"),
        zip_with(col("embedding"), reverse(col("embedding")),
          (x, y) => x + y * lit(0.01)).as("embedding"),
        col("label")))
  }

  private lazy val model =
    PqCodec.train(Similarity.prepared(planted, col("vec_id"), col("embedding")),
      m = 16, ks = 16)

  test("keep-set parity with the float path on label clusters") {
    val float = Similarity.semDedupKeep(planted, col("vec_id"), col("embedding"),
      col("label"), threshold = 0.8).as[(Long, Int)].collect().toSet
    val pq = Similarity.semDedupPqKeep(planted, col("vec_id"), col("embedding"),
      col("label"), threshold = 0.8, model).as[(Long, Int)].collect().toSet
    assert(pq == float,
      s"PQ path diverged: only-float=${float -- pq}, only-pq=${pq -- float}")
    // the corpus must actually exercise pruning
    assert(pq.size < planted.count(), "expected at least one pruned twin")
  }

  test("keep-set parity under the IVF assignment (production composition)") {
    val prep = Similarity.prepared(planted, col("vec_id"), col("embedding"))
    val (assignedRaw, _) = IvfIndex.build(prep, k = 16)
    val assigned = assignedRaw.localCheckpoint(true)
    val float = Similarity.semDedupKeep(assigned, col("vec_id"), col("vec"),
      col("centroid_id"), threshold = 0.8).as[(Long, Int)].collect().toSet
    val pq = Similarity.semDedupPqKeep(assigned, col("vec_id"), col("vec"),
      col("centroid_id"), threshold = 0.8, model).as[(Long, Int)].collect().toSet
    assert(pq == float,
      s"PQ path diverged under IVF: only-float=${float -- pq}, only-pq=${pq -- float}")
  }

  test("margin headroom: SDC cosine of every true near-dup pair clears threshold - margin") {
    // The documented recall contract: margin (default 0.3 at threshold
    // 0.8 → candidate cutoff 0.5) must absorb the worst SDC shift a
    // true within-threshold pair suffers. Measure it: for every pair
    // with EXACT cosine ≥ 0.8 (cluster-scope ignored — this bounds all
    // scopes), the code-pair SDC cosine must clear the cutoff, with
    // headroom reported in the failure message.
    val prep = Similarity.prepared(planted, col("vec_id"), col("embedding"))
      .withColumn("code", VectorExpressions.pqEncode(col("vec"), model.codebooks))
      .withColumn("crn",
        sqrt(VectorExpressions.pqReconNorm2(col("code"), model.cn2)))
    val a = prep.select(col("vec_id").as("id_a"), col("vec").as("va"),
      col("norm").as("na"), col("code").as("ca"), col("crn").as("crna"))
    val b = prep.select(col("vec_id").as("id_b"), col("vec").as("vb"),
      col("norm").as("nb"), col("code").as("cb"), col("crn").as("crnb"))
    val sdcOfTrue = a.join(b, col("id_a") < col("id_b"))
      .withColumn("cosine", VectorFunctions.dot(col("va"), col("vb"))
        / (col("na") * col("nb")))
      .filter(col("cosine") >= 0.8)
      .withColumn("acos",
        VectorExpressions.pqSdcDot(col("ca"), col("cb"), model.sdc)
          / (col("crna") * col("crnb")))
      .select("acos").as[Double].collect()
    assert(sdcOfTrue.nonEmpty, "planted corpus must contain true near-dup pairs")
    val worst = sdcOfTrue.min
    assert(worst >= 0.5,
      s"SDC cosine $worst of a true pair fell below the 0.5 candidate cutoff " +
        "— margin 0.3 no longer covers quantization noise at this geometry")
  }

  test("plan guard: cluster exchanges carry codes, never float vectors") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val root = Similarity.semDedupPqKeep(planted, col("vec_id"),
          col("embedding"), col("label"), threshold = 0.8, model)
        .queryExecution.executedPlan
      val clusterEx = root.collect {
        case e: ShuffleExchangeLike
          if e.asInstanceOf[org.apache.spark.sql.execution.SparkPlan]
            .output.exists(a => a.name == "ca" || a.name == "cb") => e
      }
      assert(clusterEx.nonEmpty, s"expected cluster-key code exchanges in:\n$root")
      clusterEx.foreach { e =>
        val vecs = e.asInstanceOf[org.apache.spark.sql.execution.SparkPlan]
          .output.filter(at => at.name == "va" || at.name == "vb" ||
            at.name == "vec" || at.name == "embedding")
        assert(vecs.isEmpty, s"cluster exchange carries float vectors: $vecs\n$root")
      }
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
    }
  }

  test("corrupt vectors (NaN/Inf) keep parity with the float path") {
    // A NaN vector encodes to a NORMAL code (the argmin's NaN scores
    // never win), so its pairs would score a finite SDC cosine and
    // could fall out of candidacy while the float path's NaN cosine
    // decides differently — the `bad` flag routes such pairs to the
    // exact re-check unconditionally, making the two paths decide
    // identically whatever Spark's NaN comparison semantics are.
    val dim = planted.select(size(col("embedding"))).as[Int].head()
    val poison = Seq(
      (800000L, Seq.fill(dim)(Double.NaN), 1),
      (800001L, Seq.tabulate(dim)(i => if (i == 0) Double.PositiveInfinity else 1.0), 1),
      (800002L, Seq.tabulate(dim)(i => i.toDouble), 2)
    ).toDF("vec_id", "embedding", "label")
    val corpus = planted.limit(60)
      .select(col("vec_id"), col("embedding"), pmod(col("vec_id"), lit(3)).cast("int").as("label"))
      .unionByName(poison)
    val float = Similarity.semDedupKeep(corpus, col("vec_id"), col("embedding"),
      col("label"), threshold = 0.8).as[(Long, Int)].collect().toSet
    val pq = Similarity.semDedupPqKeep(corpus, col("vec_id"), col("embedding"),
      col("label"), threshold = 0.8, model).as[(Long, Int)].collect().toSet
    assert(pq == float,
      s"poisoned parity broke: only-float=${float -- pq}, only-pq=${pq -- float}")
  }

  test("rows that fail to encode are kept, never thrown on") {
    // dim not divisible by the model geometry → pqEncode null → the row
    // can never be a candidate (keep-on-null, same direction as the
    // float path's zero-norm guard)
    val corpus = planted.limit(20).unionByName(
      Seq((777000L, Seq(1.0, 2.0, 3.0), 1)).toDF("vec_id", "embedding", "label"))
    val kept = Similarity.semDedupPqKeep(corpus, col("vec_id"), col("embedding"),
      col("label"), threshold = 0.8, model)
      .select("vec_id").as[Long].collect().toSet
    assert(kept.contains(777000L), "un-encodable row must survive")
  }
}
