package graft

import graft.operators.Dedup
import graft.sources.IndexStore
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.exchange.{BroadcastExchangeLike, ShuffleExchangeLike}
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, BroadcastNestedLoopJoinExec, HashJoin}
import org.apache.spark.sql.functions._

/** Plan-shape guard for the steady-state admission path (`ingest_admit`):
  * the 100-TB property is that admission cost scales with the BATCH, not
  * the store — which holds exactly when no store-table scan is ever
  * re-partitioned or broadcast on its way into its probe join. PLANS.md
  * r10 audited this by Explain; this spec asserts it, so a future change
  * that puts an Exchange on the store side (or flips a probe join's
  * build side onto the store) fails by name instead of silently turning
  * per-batch cost into per-corpus cost.
  *
  * The invariant, per store-table scan in the executed plan:
  *  1. no Exchange (shuffle OR broadcast) sits between the scan and its
  *     nearest join ancestor — the store side enters every probe join
  *     in its bucketed on-disk layout;
  *  2. if that join is broadcast-built, the store scan is on the
  *     STREAMED side (the build side is always batch-derived).
  * Exchanges ABOVE the join are legitimate: join output is
  * candidate-sized, batch-derived. A store-side scan with no join
  * ancestor at all must reach the root exchange-free.
  *
  * Checked over BOTH admission executions: the returned rejects frame
  * (minhash/span/docs-fetch probes) and a fresh [[Dedup.bloomAdmit]]
  * over the store's fp table — the fp confirm join is pinned behind a
  * `localCheckpoint` inside [[IngestApp.admitDocs]] (the r10
  * survivor-pinning optimization), so the rejects plan alone never
  * shows it. AQE is disabled for the inspection (its pre-execution plan
  * carries no exchanges) and the auto-broadcast threshold is -1, so any
  * broadcast in the plan is one the OPERATOR CODE hinted — the guard
  * can't pass vacuously off size estimation. */
class IngestAdmitPlanSpec extends SparkSpec {

  private lazy val allDocs = Tables(spark, sfDir).documents
    .select(col("doc_id"), col("text"))

  private def isStoreScan(p: SparkPlan, prefix: String): Boolean = p match {
    case f: FileSourceScanExec =>
      f.relation.location.rootPaths.exists(_.toString.contains(prefix))
    case _ => false
  }

  /** Root-to-scan ancestor chains for every store-table scan. */
  private def scanPaths(p: SparkPlan, prefix: String,
                        acc: List[SparkPlan] = Nil): Seq[List[SparkPlan]] = {
    val self = if (isStoreScan(p, prefix)) Seq(p :: acc) else Nil
    self ++ p.children.flatMap(c => scanPaths(c, prefix, p :: acc))
  }

  private def isJoin(p: SparkPlan): Boolean = p match {
    case _: HashJoin | _: BroadcastNestedLoopJoinExec => true
    case _ => p.getClass.getSimpleName.contains("Join")
  }

  private def assertStoreSideShape(df: DataFrame, prefix: String,
                                   what: String): Int = {
    val root = df.queryExecution.executedPlan
    val paths = scanPaths(root, prefix)
    paths.foreach { case scan :: ancestors =>
      // ancestors are scan-upward; cut at the nearest join
      val toJoin = ancestors.takeWhile(!isJoin(_))
      toJoin.foreach {
        case e @ (_: ShuffleExchangeLike | _: BroadcastExchangeLike) =>
          fail(s"$what: ${e.nodeName} between a store scan and its probe " +
            s"join — the store side must stay in its bucketed layout:\n$root")
        case _ =>
      }
      // rule 2 applies to the NEAREST join only: the store scan itself
      // must stream into it, never be its broadcast build input. Outer
      // joins may broadcast the nearest join's OUTPUT (e.g. the
      // candidate-sized text-fetch frame) — that frame is batch-derived
      // by then, which is exactly the legitimate shape.
      val childOnPath = toJoin.lastOption.getOrElse(scan)
      ancestors.drop(toJoin.length).headOption.foreach {
        case j: BroadcastHashJoinExec =>
          val build = j.buildSide match {
            case org.apache.spark.sql.catalyst.optimizer.BuildLeft => j.left
            case org.apache.spark.sql.catalyst.optimizer.BuildRight => j.right
          }
          assert(!(build eq childOnPath),
            s"$what: store scan IS the broadcast build side of its probe " +
              s"join — the build side must be batch-derived:\n$root")
        case _ => // shuffle-side join: rule 1 already proved the store
                  // side entered exchange-free (bucketed SMJ/SHJ shape)
      }
    case Nil => ()
    }
    paths.length
  }

  test("admission probes keep every store scan exchange-free into its join") {
    val p = "plan_guard_store"
    IndexStore.dropDocs(spark, p)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      IndexStore.buildDocs(allDocs.filter(col("doc_id") < 300),
        col("doc_id"), col("text"), p, IndexStore.DocConfig(buckets = 4))
      // RDD-backed, not a LocalRelation: Catalyst evaluates deterministic
      // filters over LocalRelations at optimize time, which would fold
      // the bloom probe driver-side and collapse the whole plan under
      // inspection to a LocalTableScan
      val batch = allDocs.filter(col("doc_id").between(300, 349))
        .localCheckpoint(true)

      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")

      // rejects plan: minhash-vs-corpus, span-vs-corpus, candidate text
      // fetch — all the store probes that survive the stage-0 pinning
      val (_, rej) = IngestApp.admitDocs(spark, p, batch)
      val nRej = assertStoreSideShape(rej, p, "rejects plan")
      assert(nRej >= 3,
        s"expected the mh/span/docs store scans in the rejects plan, saw $nRej")

      // the pinned stage's own plan: bloom probe + fp confirm join
      val bloom = spark.sparkContext.broadcast(IndexStore.readBloom(spark, p))
      val surv = Dedup.bloomAdmit(spark.table(IndexStore.fpTable(p)), bloom,
        batch, col("doc_id"), col("text"))
      val nFp = assertStoreSideShape(surv, p, "bloom-admit plan")
      assert(nFp >= 1,
        s"expected the fp store scan in the bloom-admit plan, saw $nFp")

      // non-vacuous: the same rejects plan DOES carry exchanges — on the
      // batch-derived side, where they belong
      val shuffles = rej.queryExecution.executedPlan
        .collect { case e: ShuffleExchangeLike => e }
      assert(shuffles.nonEmpty,
        "expected batch-side exchanges in the admission plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      IndexStore.dropDocs(spark, p)
    }
  }
}
