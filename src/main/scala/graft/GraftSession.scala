package graft

import org.apache.spark.sql.SparkSession

/** One place for the local SparkSession shape every runner uses: graft
  * extensions installed, shuffle partitions sized to the thread count,
  * UTC session time zone (oracle parity), UI off. */
object GraftSession {
  def local(cpus: String): SparkSession = {
    val spark = SparkSession.builder()
      .withExtensions(new GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
