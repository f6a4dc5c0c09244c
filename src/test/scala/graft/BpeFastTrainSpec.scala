package graft

import graft.operators.TextAnalysis
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The production-depth BPE trainer (delta-updated pair counts on the
  * collected word table) must be BIT-IDENTICAL to the classic
  * one-aggregate-per-merge Spark loop — ranks, symbols, AND
  * selection-time freqs — on real corpora and on adversarial fixtures
  * (ties, self-pairs, merge-created pairs, exhaustion). Plus the hashed
  * ids kernel vs the plan-literal-map reference formulation. */
class BpeFastTrainSpec extends SparkSpec {
  import spark.implicits._

  private def rows(df: DataFrame): Seq[(Int, String, String, Long)] =
    df.select(col("rank").cast("int"), col("left"), col("right"),
        col("freq").cast("long"))
      .orderBy(col("rank")).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq

  test("byte-level: fast == classic on the corpus, 24 merges deep") {
    val docs = Tables(spark, sfDir).documents
    val classic = rows(TextAnalysis.bpeTrainBytes(docs, col("text"), 24))
    val fast = rows(TextAnalysis.bpeTrainBytesFast(docs, col("text"), 24))
    assert(fast == classic,
      s"fast trainer diverged from the classic loop:\n" +
        s"classic=$classic\nfast=$fast")
  }

  test("char-level: fast == classic on the corpus") {
    val docs = Tables(spark, sfDir).documents
    val classic = rows(TextAnalysis.bpeTrain(docs, col("text"), 16))
    val fast = rows(TextAnalysis.bpeTrainFast(docs, col("text"), 16))
    assert(fast == classic)
  }

  test("adversarial fixtures: ties, self-pair chains, created pairs, " +
       "exhaustion — fast == classic merge for merge") {
    val fixtures = Seq(
      // self-pair chains: greedy LTR [a,a,a] -> [aa,a]
      Seq("aaaa aaa aa", "aaaaa aa"),
      // exact tie on freq: lexicographic (l, r) must decide
      Seq("ab cd", "ab cd", "ef ef"),
      // merges that create new best pairs ((a,b)->ab then (ab,ab))
      Seq("abab abab abab", "ab ab"),
      // exhaustion: every word collapses before nMerges rounds
      Seq("ab ab ab"),
      // single-letter and OOV tokens never train
      Seq("a b c Hello! 123", "aa bb aa"))
    fixtures.foreach { texts =>
      val docs = texts.toDF("text")
      val classic = rows(TextAnalysis.bpeTrain(docs, col("text"), 10))
      val fast = rows(TextAnalysis.bpeTrainFast(docs, col("text"), 10))
      assert(fast == classic,
        s"fixture $texts:\nclassic=$classic\nfast=$fast")
      val classicB = rows(TextAnalysis.bpeTrainBytes(docs, col("text"), 10))
      val fastB = rows(TextAnalysis.bpeTrainBytesFast(docs, col("text"), 10))
      assert(fastB == classicB,
        s"byte fixture $texts:\nclassic=$classicB\nfast=$fastB")
    }
  }

  test("randomized corpora: fast == classic across 6 seeded random " +
       "token distributions, both alphabets, to exhaustion depth") {
    val rnd = new scala.util.Random(1717)
    for (c <- 0 until 6) {
      // small vocab + skew so ties, chains, and early exhaustion all
      // occur naturally at some seed
      val vocab = Array.fill(4 + rnd.nextInt(6))(
        (1 to 2 + rnd.nextInt(4)).map(_ => ('a' + rnd.nextInt(5)).toChar).mkString)
      val texts = (0 until 20 + rnd.nextInt(30)).map(_ =>
        (0 until 1 + rnd.nextInt(8)).map(_ => vocab(rnd.nextInt(vocab.length)))
          .mkString(" "))
      val docs = texts.toDF("text")
      val depth = 15 // deep enough to exhaust some corpora
      assert(rows(TextAnalysis.bpeTrainFast(docs, col("text"), depth)) ==
        rows(TextAnalysis.bpeTrain(docs, col("text"), depth)),
        s"char divergence on random corpus $c: $texts")
      assert(rows(TextAnalysis.bpeTrainBytesFast(docs, col("text"), depth)) ==
        rows(TextAnalysis.bpeTrainBytes(docs, col("text"), depth)),
        s"byte divergence on random corpus $c: $texts")
    }
  }

  test("footprint guard fails by name citing the minWordFreq lever; " +
       "minWordFreq prunes the table it trains on") {
    val docs = Tables(spark, sfDir).documents
    val e = intercept[IllegalArgumentException] {
      TextAnalysis.bpeTrainBytesFast(docs, col("text"), 8,
        maxTableBytes = 1024)
    }
    assert(e.getMessage.contains("bpeTrainFast") &&
      e.getMessage.contains("minWordFreq"), e.getMessage)
    // pruned training: plant a singleton tail (the sf corpus has none),
    // prune it, and train — merges must come from the surviving head only
    val tailed = docs.select(col("text"))
      .unionByName(spark.range(40)
        .select(concat(lit("zq"), col("id"), lit("x")).as("text")))
    val wcAll = TextAnalysis.bpeWordCountsBytes(tailed, col("text"))
    assert(wcAll.filter(col("freq") < 3).count() >= 40,
      "fixture must actually have a prunable tail")
    val fast = rows(TextAnalysis.bpeTrainBytesFast(tailed, col("text"), 8,
      minWordFreq = 3))
    assert(fast.nonEmpty && fast.size <= 8)
    // its merges must all be derivable and apply cleanly corpus-wide
    val merges = fast.map(m => (m._2, m._3))
    val total = docs.select(
      sum(TextAnalysis.bpeEncodeBytesCount(col("text"), merges)))
      .head().getLong(0)
    assert(total > 0)
  }

  test("hashed ids kernel == plan-literal-map reference (char + byte), " +
       "and bpeIdTable == bpeVocab") {
    val docs = Tables(spark, sfDir).documents
    val merges = TextAnalysis.bpeMerges(
      TextAnalysis.bpeTrainBytesFast(docs, col("text"), 12))
    val mergesC = TextAnalysis.bpeMerges(
      TextAnalysis.bpeTrainFast(docs, col("text"), 12))

    // table == public vocab, entry for entry
    import scala.jdk.CollectionConverters._
    val tB = graft.functions.TextKernels.bpeIdTable(merges, byteLevel = true)
    assert(tB.asScala.map { case (k, v) => (k, v.intValue) }.toMap ==
      TextAnalysis.bpeVocabBytes(merges).toMap)
    val tC = graft.functions.TextKernels.bpeIdTable(mergesC, byteLevel = false)
    assert(tC.asScala.map { case (k, v) => (k, v.intValue) }.toMap ==
      TextAnalysis.bpeVocab(mergesC).toMap)

    // byte ids: kernel vs the r16 merge-only literal-map formulation
    val vocabB = typedLit(TextAnalysis.bpeVocabBytes(merges).drop(256).toMap)
    val refB = transform(TextAnalysis.bpeEncodeBytes(col("text"), merges),
      s => when(length(s) === 2, conv(s, 16, 10).cast("int"))
        .otherwise(coalesce(element_at(vocabB, s), lit(-1))))
    assert(docs.select(
        (TextAnalysis.bpeEncodeIdsBytes(col("text"), merges) =!= refB).as("d"))
      .filter(col("d")).count() == 0)

    // char ids: kernel vs the full-vocab literal-map formulation,
    // including OOV -1 positions
    val vocabC = typedLit(TextAnalysis.bpeVocab(mergesC).toMap)
    val refC = transform(TextAnalysis.bpeEncode(col("text"), mergesC),
      s => coalesce(element_at(vocabC, s), lit(-1)))
    assert(docs.select(
        (TextAnalysis.bpeEncodeIds(col("text"), mergesC) =!= refC).as("d"))
      .filter(col("d")).count() == 0)

    // null text -> null ids; empty text -> empty array
    val edge = Seq[(Integer, String)]((1, null), (2, ""), (3, "  "))
      .toDF("i", "text")
      .select(TextAnalysis.bpeEncodeIdsBytes(col("text"), merges).as("ids"))
      .collect()
    assert(edge(0).isNullAt(0) && edge(1).getSeq[Int](0).isEmpty &&
      edge(2).getSeq[Int](0).isEmpty)
  }
}
