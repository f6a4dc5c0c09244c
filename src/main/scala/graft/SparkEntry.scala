package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Query registry is assembled from per-domain modules:
  *  - [[ParityQueries]]     — the reference's capability (order/event stats)
  *  - [[RelationalQueries]] — joins/windows/sorts/set-ops/grouping substrate
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("daily_order_stats")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ParityQueries.queries ++ RelationalQueries.queries ++
      PipelineQueries.queries ++ ChatQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    ParityQueries.oracle ++ RelationalQueries.oracle ++
      PipelineQueries.oracle ++ ChatQueries.oracle
}
