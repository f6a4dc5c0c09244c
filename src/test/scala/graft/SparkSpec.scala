package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for the spec suite — one session per JVM
  * (suites run forked in one JVM; getOrCreate dedups). */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .withExtensions(new GraftExtensions)
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  val sfDir = "/root/testdata/sf0.001"

  /** All messages down the cause chain — executor-side named guards
    * arrive wrapped in SparkException layers; match through them. */
  def messageChain(e: Throwable): String = {
    val sb = new StringBuilder
    var cur = e
    var depth = 0
    while (cur != null && depth < 10) {
      sb.append(cur.getMessage).append(" | ")
      cur = cur.getCause
      depth += 1
    }
    sb.toString
  }
}
