package graft

import org.apache.spark.sql.functions._

/** IngestApp: batch admission against an indexed corpus, both modes. */
class IngestAppSpec extends SparkSpec {
  import spark.implicits._

  test("docs mode: every rejection reason fires on its planted case, fresh docs admitted") {
    val rnd = new scala.util.Random(11)
    val vocabA = Vector("alpha", "beam", "cache", "delta", "eddy", "flume",
      "grain", "helix", "ivory", "joule", "karst", "lumen", "mason", "night",
      "ocean", "pivot", "quark", "ridge", "sigma", "totem")
    val vocabB = vocabA.map(_.toUpperCase)   // disjoint token space
    def doc(vocab: Vector[String]) =
      Seq.fill(60)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    val corpusRows = (0L until 40L).map(i => (i, doc(vocabA)))
    val corpus = corpusRows.toDF("doc_id", "text")
    val freshDup = doc(vocabB)
    val spanDoc = (corpusRows(7)._2.split(" ").take(36) ++
      Seq.fill(24)(vocabB(rnd.nextInt(vocabB.size)))).mkString(" ")
    val batch = ((100L until 110L).map(i => (i, doc(vocabB))) ++ Seq(
      (110L, corpusRows(5)._2),   // exact copy of a corpus doc
      (111L, spanDoc),            // 31 of 55 windows indexed -> frac > 0.5
      (112L, freshDup),           // within-batch twins: smaller id survives
      (113L, freshDup))).toDF("doc_id", "text")
    val (admitted, rejects) = IngestApp.runDocs(corpus, batch)
    val admittedIds = admitted.select("doc_id").as[Long].collect().toSet
    val reasonsById = rejects.as[(Long, String)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(admittedIds == ((100L until 110L).toSet + 112L))
    // the exact copy is caught at stage 0 (bloom-prefiltered exact check)
    // and never reaches the LSH/span stages
    assert(reasonsById(110L) == Set("exact_dup_of_corpus"))
    assert(reasonsById(111L) == Set("span_overlap_with_corpus"))
    assert(reasonsById(113L) == Set("near_dup_within_batch"))
    assert(!reasonsById.contains(112L))
  }

  test("quality-gated docs: junk and off-language rejected BEFORE dedup, gate precedence") {
    val rnd = new scala.util.Random(17)
    val vocabA = Vector("alpha", "beam", "cache", "delta", "eddy", "flume",
      "grain", "helix", "ivory", "joule", "karst", "lumen", "mason", "night",
      "ocean", "pivot", "quark", "ridge", "sigma", "totem")
    def doc(vocab: Vector[String]) =
      ("the of and is " +
        Seq.fill(56)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    val corpus = (0L until 20L).map(i => (i, doc(vocabA))).toDF("doc_id", "text")
    val junk = "!!! ??? ### $$$ %%% ^^^ &&& *** ((( )))" // punctuation soup
    val german = "der hund und die katze ist ein schönes tier und " +
      Seq.fill(51)(vocabA(rnd.nextInt(vocabA.size))).mkString(" ")
    val batch = Seq(
      (200L, doc(vocabA)),        // clean + english -> admitted
      (201L, junk),               // low_quality
      (202L, german),             // lang_not_allowed (en-only gate)
      (203L, junk)                // junk twin of 201: gate catches it FIRST,
                                  // so no near_dup_within_batch label
    ).toDF("doc_id", "text")
    val (admitted, rejects) = IngestApp.runDocsGated(
      corpus, batch, minQuality = 0.1, langs = Set("en"))
    val admittedIds = admitted.select("doc_id").as[Long].collect().toSet
    val reasonsById = rejects.as[(Long, String)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(admittedIds == Set(200L), reasonsById.toString)
    assert(reasonsById(201L) == Set("low_quality", "lang_not_allowed"))
    assert(reasonsById(202L) == Set("lang_not_allowed"))
    // gate precedence: the junk twin never reached the LSH stage
    assert(reasonsById(203L) == Set("low_quality", "lang_not_allowed"))
    // no language gate: the german doc passes (its quality is fine)
    val (admitted2, rejects2) =
      IngestApp.runDocsGated(corpus, batch, minQuality = 0.1)
    assert(admitted2.select("doc_id").as[Long].collect().toSet ==
      Set(200L, 202L))
    assert(rejects2.as[(Long, String)].collect().toMap ==
      Map(201L -> "low_quality", 203L -> "low_quality"))
  }

  test("vecs mode: corpus twins and within-batch copies rejected, fresh vectors admitted") {
    val base = Tables(spark, sfDir).embeddings
      .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
    val twins = base.filter(pmod(col("vec_id"), lit(10)) === 0)
      .select((col("vec_id") + 100000).as("vec_id"),
        zip_with(col("embedding"), reverse(col("embedding")),
          (x, y) => x + y * lit(0.01)).as("embedding"))
    val twinOfZero = twins.filter(col("vec_id") === 100000L)
      .select((col("vec_id") + 100001).as("vec_id"), col("embedding"))
    val rnd = new scala.util.Random(13)
    val fresh = (300000L until 300005L)
      .map(i => (i, Seq.fill(64)(rnd.nextDouble() * 2 - 1)))
      .toDF("vec_id", "embedding")
    val batch = twins.unionByName(twinOfZero)
      .unionByName(fresh.select(col("vec_id"),
        col("embedding").cast("array<double>").as("embedding")))
    val (admitted, rejects) = IngestApp.runVecs(base, batch)
    val admittedIds = admitted.select("vec_id").as[Long].collect().toSet
    val reasonsById = rejects.as[(Long, String)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(admittedIds == (300000L until 300005L).toSet,
      s"expected only fresh vectors admitted, got $admittedIds")
    val twinIds = base.filter(pmod(col("vec_id"), lit(10)) === 0)
      .select((col("vec_id") + 100000).as("t")).as[Long].collect().toSet
    twinIds.foreach(t => assert(reasonsById(t).contains("near_dup_of_corpus"),
      s"twin $t should be rejected against the corpus"))
    // the duplicated twin is caught BOTH ways
    assert(reasonsById(200001L) ==
      Set("near_dup_of_corpus", "near_dup_within_batch"))
  }
}
