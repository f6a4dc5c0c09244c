package graft

import org.apache.spark.sql.types.TimestampType

/** Guards against driver-side testdata regeneration changing physical
  * parquet types under unchanged code (round 9 lost 16 queries to a silent
  * TIMESTAMP(NANOS) → TIMESTAMP_MICROS flip of `events.ts`).
  *
  * Two layers:
  *  1. [[Tables.events]] must normalize `ts` to session-TZ TimestampType on
  *     every sf dir, whatever the file's physical type.
  *  2. Every registered query must at least pass Catalyst analysis against
  *     sf0.001 — one named failing assertion per broken query instead of
  *     scattered runtime errors that Verify silently skips.
  */
class TestdataDriftSpec extends SparkSpec {

  for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
    test(s"events.ts normalizes to TimestampType on $sf") {
      val dir = s"/root/testdata/$sf"
      if (new java.io.File(dir).isDirectory) {
        assert(Tables(spark, dir).events.schema("ts").dataType === TimestampType,
          s"Tables.events must yield a session-TZ timestamp ts for $dir")
      } else cancel(s"$dir not present")
    }
  }

  test("pipeline-table schemas hold the shapes the operators assume") {
    import org.apache.spark.sql.types._
    val t = Tables(spark, sfDir)
    val docs = t.documents.schema
    assert(docs("doc_id").dataType === LongType, s"documents.doc_id: ${docs("doc_id").dataType}")
    assert(docs("text").dataType === StringType, s"documents.text: ${docs("text").dataType}")
    val emb = t.embeddings.schema
    assert(emb("vec_id").dataType === LongType, s"embeddings.vec_id: ${emb("vec_id").dataType}")
    assert(emb("embedding").dataType === ArrayType(FloatType),
      s"embeddings.embedding: ${emb("embedding").dataType}")
    assert(emb("label").dataType === IntegerType, s"embeddings.label: ${emb("label").dataType}")
    val ev = t.events.schema
    for (f <- Seq("event_id" -> LongType, "user_id" -> LongType,
                  "event_type" -> StringType, "value" -> DoubleType,
                  "props" -> StringType))
      assert(ev(f._1).dataType === f._2, s"events.${f._1}: ${ev(f._1).dataType}")
  }

  test("every registered query analyzes against sf0.001") {
    val broken = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, q) =>
      try {
        q(spark, sfDir).queryExecution.analyzed
        None
      } catch {
        case e: Throwable => Some(s"$name: ${e.getClass.getSimpleName}: ${e.getMessage.take(200)}")
      }
    }
    assert(broken.isEmpty, s"${broken.size} queries fail analysis:\n${broken.mkString("\n")}")
  }
}
