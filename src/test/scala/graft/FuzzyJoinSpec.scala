package graft

import graft.functions.TextHashExpressions
import graft.operators.FuzzyJoin
import org.apache.spark.sql.functions._

/** Edit-distance key join via deletion banding: recall 1 against the
  * brute-force levenshtein cross join at d=1 and d=2, fallback parity,
  * fail-fast on document-length keys, fixed-width band exchanges. */
class FuzzyJoinSpec extends SparkSpec {
  import spark.implicits._

  // part names + planted variants: a 1-deletion, a substitution (still
  // dist 1), and a 2-edit variant only d=2 may match
  private lazy val names = Tables(spark, sfDir).part
    .select(col("p_partkey"), col("p_name"))
  private lazy val keys = names.select(col("p_name").as("key"))
    .unionByName(names.filter(col("p_partkey") < 20)
      .select(concat(substring(col("p_name"), 1, 2),
        expr("substring(p_name, 4)")).as("key")))
    .unionByName(names.filter(col("p_partkey") === 25)
      .select(concat(lit("Z"), expr("substring(p_name, 2)")).as("key")))
    .unionByName(names.filter(col("p_partkey") === 30)
      .select(concat(lit("ZZ"), expr("substring(p_name, 3)")).as("key")))

  private def brute(maxDist: Int): Set[(String, String, Long)] = {
    val dk = keys.filter(col("key").isNotNull).distinct()
    dk.as("a").join(dk.as("b"), col("a.key") < col("b.key"))
      .withColumn("dist", levenshtein(col("a.key"), col("b.key")).cast("long"))
      .filter(col("dist") <= maxDist)
      .select(col("a.key"), col("b.key"), col("dist"))
      .as[(String, String, Long)].collect().toSet
  }

  test("d=1 pairs equal the brute-force levenshtein cross join") {
    val got = FuzzyJoin.editDistancePairs(keys, col("key"))
      .as[(String, String, Long)].collect().toSet
    val expect = brute(1)
    assert(expect.size >= 21, s"fixture should plant >=21 pairs, got ${expect.size}")
    assert(got == expect)
  }

  test("d=2 pairs equal brute force and include the 2-edit plant") {
    val got = FuzzyJoin.editDistancePairs(keys, col("key"), maxDist = 2)
      .as[(String, String, Long)].collect().toSet
    val expect = brute(2)
    assert(got == expect)
    assert(got.exists(_._3 == 2L), "the 2-edit planted variant should appear")
  }

  test("duplicate keys collapse: key-value pairs are unaffected by row copies") {
    val doubled = keys.unionByName(keys.limit(200))
    val got = FuzzyJoin.editDistancePairs(doubled, col("key"))
      .as[(String, String, Long)].collect().toSet
    assert(got == brute(1))
  }

  test("broadcast-guard fallback (cap 0) returns the identical pair set") {
    val got = FuzzyJoin.editDistancePairs(keys, col("key"),
        maxBroadcastCandidates = 0L)
      .as[(String, String, Long)].collect().toSet
    assert(got == brute(1))
  }

  test("fails fast on document-length keys") {
    val docs = Tables(spark, sfDir).documents.select(col("text"))
    val e = intercept[IllegalArgumentException] {
      FuzzyJoin.editDistancePairs(docs, col("text"))
    }
    assert(e.getMessage.contains("bands KEYS"))
  }

  test("neighborhood kernel: exact membership semantics") {
    val row = Seq("abc").toDF("k")
      .select(TextHashExpressions.deletionNeighborhood(col("k"), 1).as("n"))
      .as[Seq[String]].head().toSet
    assert(row == Set("abc", "bc", "ac", "ab"))
    val empty = Seq("").toDF("k")
      .select(TextHashExpressions.deletionNeighborhood(col("k"), 2).as("n"))
      .as[Seq[String]].head()
    assert(empty == Seq(""))
  }

  test("extensions register deletion_neighborhood in SQL, = Column API") {
    val viaSql = spark.sql(
      "SELECT deletion_neighborhood('abc') AS n, deletion_neighborhood('abc', 2) AS n2")
      .head()
    assert(viaSql.getSeq[String](0).toSet == Set("abc", "bc", "ac", "ab"))
    val viaCol = Seq("abc").toDF("k")
      .select(TextHashExpressions.deletionNeighborhood(col("k"), 2))
      .head().getSeq[String](0)
    assert(viaSql.getSeq[String](1) == viaCol)
  }

  test("plan guard: band exchanges carry only fixed-width columns") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val root = FuzzyJoin.editDistancePairs(keys, col("key"))
        .queryExecution.executedPlan
      // the ONLY string-carrying exchanges allowed are the distinct-key
      // collapse (map-side combined, distinct-sized, grouped on the key
      // string itself so no 64-bit collision can drop a key) and nothing
      // else: band rows and candidate pairs are (kf, vh) longs
      val stringShuffles = root.collect { case e: ShuffleExchangeLike => e }
        .filter(_.asInstanceOf[org.apache.spark.sql.execution.SparkPlan]
          .output.exists(_.dataType.typeName == "string"))
      stringShuffles.foreach { e =>
        val p = e.asInstanceOf[org.apache.spark.sql.execution.SparkPlan]
        // the collapse exchange carries exactly the bare key column of the
        // partial distinct aggregate — anything wider is a leak
        assert(p.output.map(_.name) == Seq("key") &&
          p.children.exists(_.toString.contains("HashAggregate")),
          s"non-collapse exchange carries strings:\n$p")
      }
    } finally spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
  }
}
