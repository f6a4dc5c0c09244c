package graft

import graft.operators.{PqCodec, Similarity}
import graft.sources.IndexStore
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The PQ codes sidecar of a vectors store: provision, search, and every
  * maintenance verb keeping codes/model/corpus in lockstep. */
class PqStoreSpec extends SparkSpec {

  private lazy val allVecs = Tables(spark, sfDir).embeddings
    .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))

  private def materialize(df: DataFrame): DataFrame =
    spark.createDataFrame(java.util.Arrays.asList(df.collect(): _*), df.schema)

  private def prepared(df: DataFrame): DataFrame =
    Similarity.prepared(df, col("vec_id"), col("embedding"))

  test("buildPq + searchPq: store search equals the direct PqCodec pipeline") {
    val p = "pqs_a"
    IndexStore.dropVecs(spark, p)
    try {
      IndexStore.buildVecs(allVecs.filter(col("vec_id") < 300),
        col("vec_id"), col("embedding"), p, nTables = 4, buckets = 4)
      IndexStore.buildPq(spark, p, m = 16, ks = 16)
      assert(spark.table(IndexStore.pqTable(p)).count() == 300)
      val model = IndexStore.loadPqModel(spark, p)
      assert(model.m == 16 && model.ks == 16 && model.dsub == 4)
      // planted copies: store search must find each original at rank 1,
      // same as the direct (non-store) pipeline
      val corpus = prepared(allVecs.filter(col("vec_id") < 300))
      val copies = corpus.filter(col("vec_id") < 10)
        .select((col("vec_id") + 100000).as("vec_id"), col("vec"), col("norm"))
      val viaStore = IndexStore.searchPq(spark, p, copies, k = 1, rerank = 32)
        .select("query_id", "cand_id").collect().toSet
      val direct = PqCodec.topK(corpus, copies, k = 1, model, rerank = 32)
        .select("query_id", "cand_id").collect().toSet
      assert(viaStore == direct && viaStore.size == 10)
      viaStore.foreach(r => assert(r.getLong(1) == r.getLong(0) - 100000))
    } finally IndexStore.dropVecs(spark, p)
  }

  test("appendVecs keeps the sidecar in lockstep with the stored codebooks") {
    val p = "pqs_b"
    IndexStore.dropVecs(spark, p)
    try {
      IndexStore.buildVecs(allVecs.filter(col("vec_id") < 200),
        col("vec_id"), col("embedding"), p, nTables = 4, buckets = 4)
      IndexStore.buildPq(spark, p, m = 16, ks = 16)
      val model = IndexStore.loadPqModel(spark, p)
      IndexStore.appendVecs(
        materialize(allVecs.filter(col("vec_id").between(200, 249))),
        col("vec_id"), col("embedding"), p)
      val pq = spark.table(IndexStore.pqTable(p))
      assert(pq.count() == 250, "appended batch must be encoded into _pq")
      assert(pq.count() == spark.table(IndexStore.vecsTable(p)).count())
      // appended codes must be exactly what the STORED model encodes
      // (no silent retrain on append)
      val expect = PqCodec.encode(
        prepared(allVecs.filter(col("vec_id").between(200, 249))), model)
        .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1).toSeq).toMap
      pq.filter(col("vec_id") >= 200).collect().foreach { r =>
        assert(r.getAs[Array[Byte]](1).toSeq == expect(r.getLong(0)))
      }
    } finally IndexStore.dropVecs(spark, p)
  }

  test("compact and remove rewrite the sidecar; search forgets removed vectors") {
    val p = "pqs_c"
    IndexStore.dropVecs(spark, p)
    try {
      IndexStore.buildVecs(allVecs.filter(col("vec_id") < 200),
        col("vec_id"), col("embedding"), p, nTables = 4, buckets = 4)
      IndexStore.buildPq(spark, p, m = 16, ks = 16)
      IndexStore.appendVecs(
        materialize(allVecs.filter(col("vec_id").between(200, 229))),
        col("vec_id"), col("embedding"), p)
      val before = spark.table(IndexStore.pqTable(p)).collect()
        .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1).toSeq).toMap
      IndexStore.compactVecs(spark, p)
      val after = spark.table(IndexStore.pqTable(p)).collect()
        .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1).toSeq).toMap
      assert(after == before, "compaction must not change the codes")
      // takedown: remove vector 5, then a planted copy of 5 must no
      // longer find it (rank-1 becomes something else)
      import spark.implicits._
      IndexStore.removeVecs(spark, p, Seq(5L).toDF("vec_id"))
      assert(spark.table(IndexStore.pqTable(p)).filter(col("vec_id") === 5).isEmpty)
      assert(spark.table(IndexStore.pqTable(p)).count() == 229)
      val copy5 = prepared(allVecs.filter(col("vec_id") === 5))
        .select(lit(100005L).as("vec_id"), col("vec"), col("norm"))
      val got = IndexStore.searchPq(spark, p, copy5, k = 1, rerank = 32)
        .select("cand_id").collect()
      assert(got.nonEmpty && got(0).getLong(0) != 5L,
        "search must not return a removed vector")
    } finally IndexStore.dropVecs(spark, p)
  }

  test("rebuildPq re-provisions geometry; version fencing rejects a model/codes mismatch") {
    val p = "pqs_d"
    IndexStore.dropVecs(spark, p)
    try {
      IndexStore.buildVecs(allVecs.filter(col("vec_id") < 200),
        col("vec_id"), col("embedding"), p, nTables = 4, buckets = 4)
      IndexStore.buildPq(spark, p, m = 8, ks = 16)
      assert(IndexStore.loadPqModel(spark, p).m == 8)
      // grow the corpus, then re-provision at finer geometry
      IndexStore.appendVecs(
        materialize(allVecs.filter(col("vec_id").between(200, 299))),
        col("vec_id"), col("embedding"), p)
      IndexStore.rebuildPq(spark, p, m = 16)
      val model = IndexStore.loadPqModel(spark, p)
      assert(model.m == 16 && model.ks == 16)
      assert(spark.table(IndexStore.pqTable(p)).count() == 300)
      // codes must match a fresh encode under the new model
      val expect = PqCodec.encode(
        prepared(allVecs.filter(col("vec_id") < 300)), model)
        .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1).toSeq).toMap
      spark.table(IndexStore.pqTable(p)).collect().foreach { r =>
        assert(r.getAs[Array[Byte]](1).toSeq == expect(r.getLong(0)))
      }
      // simulate the crash window: model swapped, codes not — loadPqModel
      // must fail by name, not decode with foreign codebooks
      spark.sql(s"ALTER TABLE ${IndexStore.pqModelTable(p)} " +
        "SET TBLPROPERTIES ('graft.pq.version'='crashed-version')")
      val e = intercept[IllegalArgumentException] {
        IndexStore.loadPqModel(spark, p)
      }
      assert(e.getMessage.contains("version mismatch") &&
        e.getMessage.contains("rebuildPq"))
      // and the named recovery actually recovers
      IndexStore.rebuildPq(spark, p)
      assert(IndexStore.loadPqModel(spark, p).m == 16)
    } finally IndexStore.dropVecs(spark, p)
  }

  test("searchPq plan: ADC candidates scan _pq; _vecs is touched only through the id fetch") {
    val p = "pqs_e"
    IndexStore.dropVecs(spark, p)
    try {
      IndexStore.buildVecs(allVecs.filter(col("vec_id") < 200),
        col("vec_id"), col("embedding"), p, nTables = 4, buckets = 4)
      IndexStore.buildPq(spark, p, m = 16, ks = 16)
      val queries = prepared(allVecs.filter(col("vec_id") < 3))
        .select((col("vec_id") + 100000).as("vec_id"), col("vec"), col("norm"))
      val plan = IndexStore.searchPq(spark, p, queries, k = 1, rerank = 8)
        .queryExecution.executedPlan.toString
      // the only _vecs access carries the pushed candidate-id filter
      assert(plan.contains("vec_id IN") || plan.contains("vec_id#"),
        s"plan must show the id fetch:\n$plan")
      assert(!plan.contains("Window"), "ranking must be the partial top-k aggregation")
    } finally IndexStore.dropVecs(spark, p)
  }
}
