package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** Near-dup operators against brute force on the sf0.001 corpus, which has
  * planted near-duplicate pairs (shingle Jaccard > 0.9) and otherwise
  * well-separated documents (< 0.2). */
class DedupSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables(spark, sfDir).documents

  /** Brute-force all-pairs 3-gram Jaccard ≥ threshold. */
  private def brutePairs(threshold: Double): Set[(Long, Long)] = {
    val sh = docs.select(col("doc_id"), Dedup.shingles(col("text"), 3).as("sh"))
      .filter(size(col("sh")) > 0)
    sh.as("a").join(sh.as("b"), col("a.doc_id") < col("b.doc_id"))
      .withColumn("inter", size(array_intersect(col("a.sh"), col("b.sh"))))
      .withColumn("j", col("inter").cast("double") /
        (size(col("a.sh")) + size(col("b.sh")) - col("inter")))
      .filter(col("j") >= threshold)
      .select(col("a.doc_id"), col("b.doc_id"))
      .as[(Long, Long)].collect().toSet
  }

  test("minhash LSH finds exactly the brute-force near-dup pairs") {
    val got = Dedup.minhashLshPairs(docs, col("doc_id"), col("text"))
      .select(col("id_a"), col("id_b")).as[(Long, Long)].collect().toSet
    val expect = brutePairs(0.8)
    assert(expect.nonEmpty, "corpus should contain planted near-dups")
    assert(got == expect)
  }

  test("minhash LSH jaccard values are the exact set Jaccard") {
    val pair = Dedup.minhashLshPairs(docs, col("doc_id"), col("text"))
      .orderBy(col("id_a")).head()
    val (a, b) = (pair.getLong(0), pair.getLong(1))
    val sets = docs.filter(col("doc_id").isin(a, b))
      .select(Dedup.shingles(col("text"), 3)).as[Seq[String]].collect()
    val (sa, sb) = (sets(0).toSet, sets(1).toSet)
    val expected = (sa & sb).size.toDouble / (sa | sb).size
    assert(math.abs(pair.getDouble(2) - expected) < 1e-12)
  }

  test("simhash pairs cover the high-similarity pairs with small hamming") {
    val got = Dedup.simhashPairs(docs, col("doc_id"), col("text"), maxHamming = 3)
      .select(col("id_a"), col("id_b")).as[(Long, Long)].collect().toSet
    val planted = brutePairs(0.9)
    // simhash@3 is a coarser filter than jaccard 0.9; it must at least
    // recover most planted pairs and produce nothing wildly dissimilar
    val recall = (got & planted).size.toDouble / planted.size
    assert(recall >= 0.5, s"simhash recall $recall too low (got=${got.size})")
    val lowSim = got -- brutePairs(0.3)
    assert(lowSim.isEmpty, s"simhash matched dissimilar pairs: $lowSim")
  }

  test("simhash hamming values match recomputed signatures") {
    val hashes = docs.select(col("doc_id"), Dedup.simhash64(col("text")).as("h"))
      .as[(Long, Long)].collect().toMap
    Dedup.simhashPairs(docs, col("doc_id"), col("text"), maxHamming = 3)
      .as[(Long, Long, Int)].collect().foreach { case (a, b, d) =>
        assert(java.lang.Long.bitCount(hashes(a) ^ hashes(b)) == d)
      }
  }

  test("exact dedup groups duplicates and keeps min id") {
    val d = docs.select(col("doc_id"), col("text"))
    val corpus = d.union(d.filter(col("doc_id") < 10)
      .select((col("doc_id") + 1000).as("doc_id"), col("text")))
    val groups = Dedup.exactGroups(corpus, col("text"), col("doc_id"))
    assert(groups.count() == docs.count())
    assert(groups.filter(col("n_copies") === 2).count() == 10)
    assert(groups.agg(max(when(col("n_copies") === 2, col("keep_id"))))
      .head().getLong(0) < 1000)
  }

  test("keepFirst keeps exactly one earliest row per key") {
    val events = Tables(spark, sfDir).events
    val out = Dedup.keepFirst(events,
      Seq(col("user_id"), col("event_type")), Seq(col("ts"), col("event_id")))
    val perKey = out.groupBy("user_id", "event_type").count()
      .agg(max("count")).head().getLong(0)
    assert(perKey == 1)
    // kept row's ts is the min ts of its group
    val joined = out.select(col("user_id"), col("event_type"), col("ts").as("kept_ts"))
      .join(events.groupBy("user_id", "event_type").agg(min("ts").as("min_ts")),
        Seq("user_id", "event_type"))
    assert(joined.filter(col("kept_ts") =!= col("min_ts")).count() == 0)
  }
}
