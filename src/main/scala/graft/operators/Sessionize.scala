package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Whale-safe batch sessionization. The classic gaps-and-islands shape
  * (one ordered window per entity — `q_sessionize`) is exact but bounded
  * by the LARGEST entity: a window partition cannot split, so one task
  * sorts the whale account's entire history and AQE cannot help (the
  * measured skew curve shows wall time tracking the hot entity, not the
  * data). This operator removes that bound while staying bit-exact:
  *
  *  1. slab pass — events partition by (entity, time-slab); a local
  *     ordered window per slab counts session STARTS (first event of
  *     the slab, or any in-slab gap > `gapUs`) and records the slab's
  *     first/last event times. The whale's history now splits across
  *     (history span / slab) tasks, each sorting one slab.
  *  2. boundary merge — per entity, ONE ordered pass over the
  *     slab summaries (at most span/slab rows per entity, independent
  *     of event count): a slab whose first event is within `gapUs` of
  *     the previous non-empty slab's last event continues that session,
  *     so its start count drops by one. `lag` over non-empty summaries
  *     handles any run of empty slabs in between.
  *
  * Exactness: a session boundary is an event pair with gap > `gapUs`;
  * every intra-slab pair is examined by pass 1 and every inter-slab
  * adjacent pair (last-of-prev, first-of-next non-empty) by pass 2 —
  * the same set of gaps the single-window formulation examines, so
  * `n_sessions = Σ adjusted starts` is identical, for every slab size.
  *
  * Scale shape: pass 1 is one hash shuffle on (entity, slab) — the
  * whale fans out; pass 2 shuffles only slab SUMMARIES (|entities| ×
  * span/slab rows). Choose `slabUs` ≫ `gapUs` so few sessions cross
  * boundaries and summaries stay small — a day slab against a 30-min
  * gap is the natural default. The streaming twin is the
  * `session_window` stateful aggregation (`q_stream_session`).
  */
object Sessionize {

  /** One row PER SESSION — (user, session_id, start_us, end_us,
    * n_events), numbering and bounds identical to the single-window
    * formulation — via the same slab split: pass 1 aggregates events
    * into LOCAL sessions per (entity, slab) (the event-level heavy lift,
    * whale-split across slabs); pass 2 fuses the chain of local
    * sessions across slab boundaries (the first local session of a slab
    * fuses iff its start is within `gapUs` of the previous non-empty
    * slab's last event) and renumbers with a per-entity running sum.
    *
    * The per-entity ordered pass in pass 2 runs over LOCAL SESSION
    * summaries — at most (#sessions + #non-empty slabs) rows per
    * entity, a structural reduction from the event count. That bound is
    * honest: any operator emitting one row per session materializes
    * #sessions rows; what the slab split removes is the whale's
    * EVENT-level sort, which is the part that grows without bound when
    * a bot account floods the log (sessions grow too, but gap-capped:
    * one session per `gapUs` of silence at most... cannot exceed
    * history span / gap when events are denser than the gap). */
  def chunkedSessions(ev: DataFrame, userCol: String, tsCol: String,
      gapUs: Long = 1800000000L, slabUs: Long = 86400000000L): DataFrame = {
    require(slabUs > 0 && gapUs >= 0, s"bad slab/gap: $slabUs/$gapUs")
    val us = expr(s"unix_micros($tsCol)")
    val slabbed = ev.select(col(userCol), us.as("_us"))
      .withColumn("_slab",
        expr(s"(_us - pmod(_us, ${slabUs}L)) div ${slabUs}L"))
    val wLocal = Window.partitionBy(col(userCol), col("_slab"))
      .orderBy(col("_us"))
    val local = slabbed
      .withColumn("_gap", col("_us") - lag(col("_us"), 1).over(wLocal))
      .withColumn("_new",
        when(col("_gap").isNull || col("_gap") > gapUs, 1L).otherwise(0L))
      .withColumn("_ls", sum(col("_new"))
        .over(wLocal.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(userCol), col("_slab"), col("_ls"))
      .agg(min(col("_us")).as("_start"), max(col("_us")).as("_end"),
        count(lit(1)).as("_n"))
    // previous non-empty slab's last event per (entity, slab)
    val wSlab = Window.partitionBy(col(userCol)).orderBy(col("_slab"))
    val prevEnd = local.groupBy(col(userCol), col("_slab"))
      .agg(max(col("_end")).as("_slab_end"))
      .withColumn("_prev_end", lag(col("_slab_end"), 1).over(wSlab))
      .select(col(userCol), col("_slab"), col("_prev_end"))
    val wSess = Window.partitionBy(col(userCol))
      .orderBy(col("_slab"), col("_ls"))
    local.join(prevEnd, Seq(userCol, "_slab"))
      .withColumn("_fuse",
        when(col("_ls") === 1L && col("_prev_end").isNotNull &&
          col("_start") - col("_prev_end") <= gapUs, 0L).otherwise(1L))
      .withColumn("_gsid", sum(col("_fuse"))
        .over(wSess.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(userCol), col("_gsid").as("session_id"))
      .agg(min(col("_start")).as("start_us"), max(col("_end")).as("end_us"),
        sum(col("_n")).as("n_events"))
  }

  def chunked(ev: DataFrame, userCol: String, tsCol: String,
      gapUs: Long = 1800000000L, slabUs: Long = 86400000000L): DataFrame = {
    require(slabUs > 0 && gapUs >= 0, s"bad slab/gap: $slabUs/$gapUs")
    // integer floor-division via pmod: exact at any epoch magnitude
    // (floor(us / slab) through doubles would wobble past 2^53)
    val us = expr(s"unix_micros($tsCol)")
    val slabbed = ev.select(col(userCol), us.as("_us"))
      .withColumn("_slab",
        expr(s"(_us - pmod(_us, ${slabUs}L)) div ${slabUs}L"))
    val wLocal = Window.partitionBy(col(userCol), col("_slab"))
      .orderBy(col("_us"))
    val summaries = slabbed
      .withColumn("_gap", col("_us") - lag(col("_us"), 1).over(wLocal))
      .withColumn("_start",
        when(col("_gap").isNull || col("_gap") > gapUs, 1L).otherwise(0L))
      .groupBy(col(userCol), col("_slab"))
      .agg(count(lit(1)).as("_cnt"),
        min(col("_us")).as("_first"), max(col("_us")).as("_last"),
        sum(col("_start")).as("_starts"))
    val wSlabs = Window.partitionBy(col(userCol)).orderBy(col("_slab"))
    summaries
      .withColumn("_prev_last", lag(col("_last"), 1).over(wSlabs))
      .withColumn("_adj",
        col("_starts") - when(col("_prev_last").isNotNull &&
          col("_first") - col("_prev_last") <= gapUs, 1L).otherwise(0L))
      .groupBy(col(userCol))
      .agg(sum(col("_adj")).as("n_sessions"), sum(col("_cnt")).as("n_events"))
  }
}
