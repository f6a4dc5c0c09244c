package graft

import graft.operators.Cdc
import org.apache.spark.sql.functions._

class CdcSpec extends SparkSpec {
  import spark.implicits._

  private def hist(rows: (Long, Long, String)*) =
    rows.toDF("k", "ts", "v")

  private def scd2(df: org.apache.spark.sql.DataFrame) =
    Cdc.scd2FromHistory(df, col("k"), col("ts"), col("v"))

  test("scd2FromHistory: runs collapse, version chain links, open tail") {
    val got = scd2(hist(
        (1L, 10L, "a"), (1L, 20L, "a"), (1L, 30L, "b"), (1L, 40L, "a"),
        (2L, 15L, "x")))
      .orderBy("key", "valid_from")
      .as[(Long, String, Long, Option[Long], Boolean)].collect().toSeq
    assert(got == Seq(
      (1L, "a", 10L, Some(30L), false),   // 10 and 20 collapse
      (1L, "b", 30L, Some(40L), false),
      (1L, "a", 40L, None, true),         // value may recur in a later run
      (2L, "x", 15L, None, true)))
  }

  test("scd2FromHistory: null attribute is a value; null→null is no change") {
    val df = Seq((1L, 10L, Some("a")), (1L, 20L, None: Option[String]),
      (1L, 30L, None: Option[String]), (1L, 40L, Some("b")))
      .toDF("k", "ts", "v")
    val got = scd2(df).orderBy("valid_from")
      .as[(Long, Option[String], Long, Option[Long], Boolean)].collect().toSeq
    assert(got == Seq(
      (1L, Some("a"), 10L, Some(20L), false),
      (1L, None, 20L, Some(40L), false),  // the two nulls collapse
      (1L, Some("b"), 40L, None, true)))
  }

  test("scd2FromHistory: struct attribute versions as one tuple; ties break on tieBreak") {
    val df = Seq((1L, 10L, 5, "a", "e1"), (1L, 10L, 7, "a", "e2"),
      (1L, 20L, 7, "a", "e3")).toDF("k", "ts", "n", "s", "eid")
    val got = Cdc.scd2FromHistory(df, col("k"), col("ts"),
        struct(col("n"), col("s")), Seq(col("eid")))
      .orderBy("valid_from", "attr.n")
      .select(col("attr.n"), col("valid_from"), col("is_current"))
      .as[(Int, Long, Boolean)].collect().toSeq
    // at ts=10 the tie-break orders e1 (n=5) before e2 (n=7): two versions
    // open at ts=10; (7,"a") then survives the ts=20 repeat unchanged
    assert(got == Seq((5, 10L, false), (7, 10L, true)))
  }

  test("scd2Merge reproduces the full rebuild across any split (keys in dim-only, batch-only, both)") {
    // seeded pseudo-random history: 40 keys × 60 observations, 3 values
    val full = spark.range(2400)
      .select((col("id") % 40).as("k"),
        (col("id") * 7 % 601 + 1).as("ts"),
        concat(lit("v"), pmod(xxhash64(col("id")), lit(3))).as("v"))
      // key 39 only before ts=300, key 38 only after (dim-only / batch-only)
      .filter(!(col("k") === 39 && col("ts") >= 300) &&
        !(col("k") === 38 && col("ts") < 300))
      .cache()
    val rebuilt = scd2(full.toDF("k", "ts", "v"))
    val merged = Cdc.scd2Merge(
      scd2(full.filter(col("ts") < 300).toDF("k", "ts", "v")),
      full.filter(col("ts") >= 300), col("k"), col("ts"), col("v"))
    assert(merged.exceptAll(rebuilt).isEmpty && rebuilt.exceptAll(merged).isEmpty,
      "merge must equal full rebuild")
    // a batch repeating the current value extends the open version
    val dim = scd2(hist((1L, 10L, "a")))
    val ext = Cdc.scd2Merge(dim, hist((1L, 20L, "a"), (1L, 30L, "b")),
        col("k"), col("ts"), col("v"))
      .orderBy("valid_from").as[(Long, String, Long, Option[Long], Boolean)]
      .collect().toSeq
    assert(ext == Seq((1L, "a", 10L, Some(30L), false), (1L, "b", 30L, None, true)))
  }

  test("scd2Merge: late observation fails by name, not silently rewritten") {
    val dim = scd2(hist((1L, 10L, "a"), (1L, 30L, "b")))
    val e = intercept[IllegalArgumentException] {
      Cdc.scd2Merge(dim, hist((1L, 30L, "c")), col("k"), col("ts"), col("v"))
    }
    assert(e.getMessage.contains("scd2Merge"), e.getMessage)
    // the guard routes the caller to the repair helpers by name
    assert(e.getMessage.contains("rebuildKeys"), e.getMessage)
    assert(e.getMessage.contains("lateKeys"), e.getMessage)
  }

  test("lateKeys + rebuildKeys: merge-with-late-batch repair equals the full rebuild") {
    // 40 keys × 60 observations; keys k%10==3 have their EARLY slice
    // (ts<150) withheld from the initial build — their chains start too
    // late — and it arrives mixed into the next batch
    val full = spark.range(2400)
      .select((col("id") % 40).as("k"),
        (col("id") * 7 % 601 + 1).as("ts"),
        concat(lit("v"), pmod(xxhash64(col("id")), lit(3))).as("v"))
      .cache()
    val withheld = col("k") % 10 === 3 && col("ts") < 150
    val dim = scd2(full.filter(col("ts") < 300 && !withheld).toDF("k", "ts", "v"))
    val batch = full.filter(col("ts") >= 300 || withheld)
    // the whole mixed batch is rejected by name...
    val eAll = intercept[IllegalArgumentException] {
      Cdc.scd2Merge(dim, batch, col("k"), col("ts"), col("v"))
    }
    assert(eAll.getMessage.contains("rebuildKeys"), eAll.getMessage)
    // ...lateKeys names exactly the withheld keys...
    val lk = Cdc.lateKeys(dim, batch, col("k"), col("ts")).localCheckpoint(true)
    assert(lk.as[Long].collect().toSet == Set(3L, 13L, 23L, 33L), "late set")
    // ...the clean remainder merges, the late keys rebuild from history
    val clean = batch.join(lk, batch("k") === lk("key"), "left_anti")
    val merged = Cdc.scd2Merge(dim, clean, col("k"), col("ts"), col("v"))
    val repaired = Cdc.rebuildKeys(merged, full.toDF("k", "ts", "v"),
      col("k"), col("ts"), col("v"), lk)
    val rebuilt = scd2(full.toDF("k", "ts", "v"))
    assert(repaired.exceptAll(rebuilt).isEmpty &&
      rebuilt.exceptAll(repaired).isEmpty,
      "merge-plus-repair must equal the full rebuild")
    // multi-column keys frame fails by name, not positionally misread
    val e2 = intercept[IllegalArgumentException] {
      Cdc.rebuildKeys(merged, full.toDF("k", "ts", "v"), col("k"), col("ts"),
        col("v"), lk.select(col("key"), col("key").as("k2")))
    }
    assert(e2.getMessage.contains("single-column"), e2.getMessage)
  }

  test("plan guard: both windows share ONE key exchange") {
    val plan = scd2(Tables(spark, sfDir).events
        .select(col("user_id").as("k"), col("ts"), col("event_type").as("v")))
      .queryExecution.executedPlan.toString
    val n = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(n == 1, s"expected 1 hash exchange, got $n:\n$plan")
  }

  test("snapshotDiff: added/removed/changed classification, unchanged " +
       "suppressed, text never compared directly") {
    import graft.operators.Cdc
    val a = Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma"), (4L, "delta"))
      .toDF("id", "payload")
    val b = Seq((1L, "alpha"), (2L, "beta CHANGED"), (4L, "delta"),
      (9L, "new doc")).toDF("id", "payload")
    val out = Cdc.snapshotDiff(a, b, col("id"), col("payload"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(2L -> "changed", 3L -> "removed", 9L -> "added"),
      out.toString)
    // identical snapshots diff to nothing
    assert(Cdc.snapshotDiff(a, a, col("id"), col("payload")).count() == 0L)
  }

  test("snapshotDiff: duplicate keys compare as multisets — one row per " +
       "key, order-insensitive, no per-key cross product") {
    import graft.operators.Cdc
    val a = Seq((1L, "x"), (1L, "y"), (2L, "p"), (2L, "p"), (3L, "solo"))
      .toDF("id", "payload")
    // key 1: same multiset, reordered -> unchanged (suppressed)
    // key 2: one copy dropped -> changed; key 3: payload swap -> changed
    val b = Seq((1L, "y"), (1L, "x"), (2L, "p"), (3L, "other"))
      .toDF("id", "payload")
    val rows = Cdc.snapshotDiff(a, b, col("id"), col("payload")).collect()
    assert(rows.length == 2, rows.mkString(", ")) // ONE row per key
    val out = rows.map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(2L -> "changed", 3L -> "changed"), out.toString)
  }
}
