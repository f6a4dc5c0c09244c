package graft

import org.apache.spark.sql.SparkSession

/** One place for the local SparkSession shape every runner uses: graft
  * extensions installed, shuffle partitions sized to the thread count,
  * UTC session time zone (oracle parity), UI off.
  *
  * `SPARK_GRAFT_SHUFFLE_PARTITIONS` overrides the thread-count default:
  * partition COUNT must track shuffle VOLUME, not core count, once a
  * partition's sort footprint outgrows per-task execution memory — on a
  * real cluster this is `bytes / ~128MB`; the 32M-vector semdedup probe
  * is where the fixed-32 default measurably hits the spill cliff
  * (BENCH_NOTES round 11). */
object GraftSession {
  def local(cpus: String): SparkSession = {
    val builder = SparkSession.builder()
      .withExtensions(new GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", cpus))
    // SPARK_GRAFT_EXTRA_CONF="k=v;k2=v2" — arbitrary conf overrides for
    // probe experiments (event logs, AQE toggles); never set by default.
    sys.env.get("SPARK_GRAFT_EXTRA_CONF").foreach(_.split(";").foreach { kv =>
      val i = kv.indexOf('=')
      if (i > 0) builder.config(kv.take(i).trim, kv.drop(i + 1).trim)
    })
    val spark = builder
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
