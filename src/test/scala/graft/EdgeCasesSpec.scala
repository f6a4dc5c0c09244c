package graft

import graft.operators.{AsOfJoin, Dedup, Skew}
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Operator edge cases beyond the happy path. */
class EdgeCasesSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("as-of join: left rows with no key on the right side get null payload") {
    val left = Seq((1L, 7L, ts("2024-01-05 00:00:00"))).toDF("event_id", "k", "ts")
    val right = Seq((9L, ts("2024-01-01 00:00:00"), "x")).toDF("k", "rts", "tag")
    val got = AsOfJoin.backward(left, right, col("k"), col("k"),
      col("ts"), col("rts"), Seq("tag" -> col("tag"))).collect()
    assert(got.length == 1 && got(0).isNullAt(3))
  }

  test("salted aggregation equals plain aggregation on skewed data") {
    // 90% of rows on one hot key — the scenario salting exists for
    val df = ((1 to 900).map(i => (1L, i.toDouble)) ++
      (1 to 100).map(i => (i.toLong + 1, i.toDouble))).toDF("k", "v")
    val salted = Skew.saltedAgg(df, Seq(col("k")), buckets = 8,
      Seq(Skew.count2("n"), Skew.sum2("s", col("v").cast("decimal(18,6)")),
        Skew.min2("mn", col("v")), Skew.max2("mx", col("v"))),
      Skew.SaltMode.RoundRobinUnsafe)
      .withColumn("s", col("s").cast("double"))
    val plain = df.groupBy(col("k")).agg(
      count(lit(1)).as("n"),
      sum(col("v").cast("decimal(18,6)")).cast("double").as("s"),
      min(col("v")).as("mn"), max(col("v")).as("mx"))
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
  }

  test("salted join equals plain join on hot-key data") {
    import spark.implicits._
    // one hot key (0) carrying 90% of the fact rows
    val fact = spark.range(1000)
      .select(col("id").as("row_id"),
        when(col("id") % 10 =!= 0, lit(0L)).otherwise(col("id")).as("k"))
    val dim = fact.groupBy("k").agg(count(lit(1)).as("dn"))
    val salted = graft.operators.Skew.saltedJoin(fact, dim, "k", saltFactor = 4,
      graft.operators.Skew.SaltMode.RoundRobinUnsafe)
      .select("row_id", "k", "dn").as[(Long, Long, Long)].collect().toSet
    val plain = fact.join(dim, "k")
      .select("row_id", "k", "dn").as[(Long, Long, Long)].collect().toSet
    assert(salted == plain)
    assert(salted.size == 1000)
  }

  test("salt from a unique id is deterministic (retry-safe shuffle key)") {
    // With SaltMode.FromId, the whole plan must be deterministic — a
    // nondeterministic shuffle key is the SPARK-23207 indeterminate-stage
    // hazard: after a fetch failure, regenerated map output would route
    // rows to different buckets than the output already consumed.
    val df = ((1 to 900).map(i => (i.toLong, 1L, i.toDouble)) ++
      (1 to 100).map(i => (900L + i, i.toLong + 1, i.toDouble)))
      .toDF("row_id", "k", "v")
    val salted = Skew.saltedAgg(df, Seq(col("k")), buckets = 8,
      Seq(Skew.count2("n"), Skew.sum2("s", col("v").cast("decimal(18,6)"))),
      Skew.SaltMode.FromId(col("row_id")))
    val analyzed = salted.queryExecution.analyzed
    assert(analyzed.collect { case p => p }.forall(_.expressions.forall(_.deterministic)),
      "saltedAgg with SaltMode.FromId must contain no nondeterministic expression")
    assert(!analyzed.toString.contains("monotonically_increasing_id"))
    val plain = df.groupBy(col("k")).agg(count(lit(1)).as("n"),
      sum(col("v").cast("decimal(18,6)")).as("s"))
    assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)

    // deterministic salt must still SPREAD the hot key: its 900
    // byte-distinct ids should land in every one of the 8 buckets
    val nBuckets = df.filter(col("k") === 1)
      .select(pmod(xxhash64(col("row_id")), lit(8L))).distinct().count()
    assert(nBuckets == 8, s"hot key spread over $nBuckets/8 buckets")

    val sj = Skew.saltedJoin(df, df.groupBy("k").agg(count(lit(1)).as("dn")),
      "k", saltFactor = 4, Skew.SaltMode.FromId(col("row_id")))
    val sjAnalyzed = sj.queryExecution.analyzed
    assert(sjAnalyzed.collect { case p => p }.forall(_.expressions.forall(_.deterministic)))
    assert(sj.count() == 1000)
  }

  test("exact dedup treats null keys as one group") {
    val df = Seq((1L, "a"), (2L, null), (3L, null), (4L, "a"))
      .toDF("id", "key")
    val groups = Dedup.exactGroups(df, col("key"), col("id"))
      .collect().map(r => Option(r.getString(0)) -> r.getLong(2)).toMap
    assert(groups(Some("a")) == 2L && groups(None) == 2L)
  }

  test("keepFirst on single-row groups returns the row unchanged") {
    val df = Seq((1L, ts("2024-01-01 00:00:00"), "only")).toDF("k", "ts", "v")
    val out = Dedup.keepFirst(df, Seq(col("k")), Seq(col("ts")))
    assert(out.collect().map(_.getString(2)).toSeq == Seq("only"))
  }

  test("minhash LSH on a corpus with no near-dups returns empty, not error") {
    val docs = Seq((1L, "alpha beta gamma delta"), (2L, "one two three four"))
      .toDF("doc_id", "text")
    assert(Dedup.minhashLshPairs(docs, col("doc_id"), col("text")).count() == 0)
  }

  test("span operators on degenerate corpora: empty, single doc, all-identical") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(Dedup.spanStats(empty, col("doc_id"), col("text")).count() == 0)
    assert(Dedup.spanExcise(empty, col("doc_id"), col("text")).count() == 0)

    val single = Seq((7L, "a b c d e f g h")).toDF("doc_id", "text")
    val st = Dedup.spanStats(single, col("doc_id"), col("text")).head()
    assert(st.getLong(1) == 3 && st.getLong(2) == 0)   // 8 tokens → 3 windows
    assert(Dedup.spanExcise(single, col("doc_id"), col("text"))
      .head().getString(1) == "a b c d e f g h")

    // ten byte-identical docs: the first survives whole, the rest empty
    val same = (1L to 10L).map(i => (i, "w x y z a b c d")).toDF("doc_id", "text")
    val excised = Dedup.spanExcise(same, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(excised(1L) == "w x y z a b c d")
    (2L to 10L).foreach(i => assert(excised(i) == "", s"doc $i: '${excised(i)}'"))
  }

  test("sequence packing degenerate cases: seqLen 1, doc longer than seqLen") {
    val docs = Seq((1L, "a b c"), (2L, "d e")).toDF("doc_id", "text")
    val one = graft.operators.Sampling.packSequences(docs, col("doc_id"),
        col("text"), nShards = 1, seqLen = 1, salt = "e")
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    // seqLen=1 → every token its own sequence, ids 0..4, pieces of 1
    assert(one.length == 5 && one.forall(_._4 == 1L))
    assert(one.map(_._1).sorted.toSeq == (0L to 4L))

    val long = Seq((1L, Seq.fill(10)("t").mkString(" "))).toDF("doc_id", "text")
    val pieces = graft.operators.Sampling.packSequences(long, col("doc_id"),
        col("text"), nShards = 1, seqLen = 4, salt = "e")
      .orderBy("seq_id")
      .collect().map(r => (r.getLong(1), r.getLong(3), r.getLong(4)))
    // 10 tokens at seqLen 4 → pieces (0,4)(4,4)(8,2) in sequences 0,1,2
    assert(pieces.toSeq == Seq((0L, 0L, 4L), (1L, 4L, 4L), (2L, 8L, 2L)))
  }

  test("incremental embedding dedup degenerate cases: empty batch, empty corpus, zero vectors") {
    import graft.operators.Similarity
    val mk = (rows: Seq[(Long, Seq[Double])]) =>
      Similarity.prepared(rows.toDF("vec_id", "embedding"),
        col("vec_id"), col("embedding"))
    val corpus = mk(Seq((1L, Seq(1.0, 0.0)), (2L, Seq(0.0, 1.0))))
    val index = Similarity.lshIndex(corpus, nPlanes = 4, nTables = 2)
    val emptyBatch = mk(Seq.empty)
    assert(Similarity.cosineIncrementalPairs(index, corpus, emptyBatch, 0.9,
      nPlanes = 4, nTables = 2).isEmpty)
    val emptyCorpus = mk(Seq.empty)
    val emptyIndex = Similarity.lshIndex(emptyCorpus, nPlanes = 4, nTables = 2)
    assert(Similarity.cosineIncrementalPairs(emptyIndex, emptyCorpus,
      mk(Seq((9L, Seq(1.0, 0.0)))), 0.9, nPlanes = 4, nTables = 2).isEmpty)
    // a zero vector has no direction: it must pair with nothing, not
    // divide by zero (same contract as the batch operators)
    val zeroBatch = mk(Seq((10L, Seq(0.0, 0.0)), (11L, Seq(1.0, 0.0))))
    val got = Similarity.cosineIncrementalPairs(index, corpus, zeroBatch, 0.5,
        nPlanes = 4, nTables = 2)
      .select("old_id", "new_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 11L)), s"got $got")
  }

  test("boilerplate stripping with a custom separator and minDocs 2") {
    val docs = Seq(
      (1L, "keep me|shared line"),
      (2L, "shared line|also keep"),
      (3L, "solo content here")
    ).toDF("doc_id", "text")
    val got = graft.operators.TextAnalysis.stripBoilerplate(docs, col("doc_id"),
        col("text"), sep = "|", minDocs = 2)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "keep me", 2L -> "also keep",
      3L -> "solo content here"), s"got $got")
  }
}
