package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Cohort retention over an event stream: users grouped by first-seen day,
  * distinct-active user counts per (cohort day, day offset).
  *
  * Plan shape, chosen for billion-user scale: ONE shuffle keyed on the user
  * (partial `min`/`collect_set` map-side — per-user state is bounded by the
  * calendar, not the event count), explode the per-user day set, then the
  * final (cohort, offset) aggregation whose cardinality is days². The naive
  * formulation — distinct user-days joined back to a per-user first-day
  * frame, then count-distinct — shuffles the event stream twice more and
  * adds a user-cardinality join; this one never joins at all.
  */
object Retention {

  /** `(cohort_day: date, day_offset: long, n_users: long)` rows. */
  def cohortRetention(df: DataFrame, user: Column, ts: Column): DataFrame =
    df.select(user.as("user_id"), to_date(ts).as("day"))
      .groupBy(col("user_id"))
      .agg(min(col("day")).as("cohort_day"),
        collect_set(col("day")).as("active_days"))
      .select(col("cohort_day"), explode(col("active_days")).as("day"))
      .groupBy(col("cohort_day"),
        datediff(col("day"), col("cohort_day")).cast("long").as("day_offset"))
      .agg(count(lit(1)).as("n_users"))
}
