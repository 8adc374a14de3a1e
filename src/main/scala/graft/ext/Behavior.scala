package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Event-sequence analytics over a (user_id, event_type, ts) stream:
  * ordered conversion funnels and cohort retention — the two workloads
  * that turn a raw event log into product metrics, and the batch duals
  * of the sessionization row.
  *
  * Scale shape: both are built entirely from per-user aggregates joined
  * back on `user_id`. Every shuffle in the chain keys on `user_id`, so
  * after the first exchange the stages are co-partitioned (no reshuffle
  * between the stage joins and the stage groupBys), and state per stage
  * is one row per qualifying user — never the event log squared. The
  * funnel deliberately avoids a sort-based window over the whole log:
  * "first B after first A" needs only min-timestamps, so each stage is
  * a filter + partial-aggregated min, not an ordered scan.
  */
object Behavior {

  /** Strictly-ordered funnel: users whose first `stages(0)` precedes
    * their first later-`stages(1)` precedes ... Output one row per stage
    * (`stage` label prefixed with its ZERO-PADDED 1-based index so the
    * label sort IS the stage order even past 9 stages, `users` count).
    * Caps at 99 stages — the padding width is part of the output
    * contract, so a wider funnel must widen it consciously. */
  def funnel(events: DataFrame, stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    require(stages.size <= 99, "stage label padding is 2 digits")
    def label(i: Int, st: String) = f"${i + 1}%02d_$st"
    val ev = events.select(col("user_id"), col("event_type"), col("ts"))
    // stage 1: first occurrence per user
    var reached = ev.where(col("event_type") === stages.head)
      .groupBy(col("user_id")).agg(min(col("ts")).as("t"))
    var out = reached.agg(count(lit(1)).as("users"))
      .select(lit(label(0, stages.head)).as("stage"), col("users"))
    for ((st, i) <- stages.tail.zipWithIndex) {
      // first `st` strictly after the previous stage's first time;
      // join + groupBy both key on user_id — co-partitioned
      reached = ev.where(col("event_type") === st)
        .join(reached, "user_id")
        .where(col("ts") > col("t"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("t"))
      out = out.unionAll(
        reached.agg(count(lit(1)).as("users"))
          .select(lit(label(i + 1, st)).as("stage"), col("users")))
    }
    out
  }

  /** Day-grain cohort retention: cohort = calendar day of each user's
    * first event, day_offset = whole days from cohort day to activity
    * day, users = distinct active users per (cohort_day, day_offset).
    * One per-user min agg + one user-keyed join back to the log. */
  def retention(events: DataFrame): DataFrame = {
    val first = events.groupBy(col("user_id"))
      .agg(to_date(min(col("ts"))).as("cohort_day"))
    events.select(col("user_id"), to_date(col("ts")).as("day"))
      .join(first, "user_id")
      .groupBy(col("cohort_day"),
        datediff(col("day"), col("cohort_day")).as("day_offset"))
      .agg(countDistinct(col("user_id")).as("users"))
  }
}
