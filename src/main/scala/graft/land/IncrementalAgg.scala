package graft.land

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental maintenance of a materialized groupBy aggregate from a
  * [[ChangeFeed]] — the materialized-view-maintenance contract that
  * matters at 100 TB: after each table commit, update the aggregate
  * from the DELTA (cost ∝ changes) instead of re-aggregating the
  * corpus (cost ∝ table).
  *
  * Scope: the SELF-INVERTIBLE aggregates, count + sum (avg derives as
  * sum/cnt). Each change row contributes with a sign — `insert` /
  * `update_post` add, `delete` / `update_pre` subtract — so an update
  * is exactly remove-old-image + add-new-image; the signed delta is
  * itself a tiny groupBy (map-side combined, one shuffle of delta-sized
  * data), and the merge with the previous aggregate is a full-outer
  * join on the group keys where both sides SUM (groups whose count
  * reaches zero vanish, matching the batch aggregate exactly). MIN/MAX
  * are deliberately out of scope: they are not invertible — a deleted
  * minimum needs the group's surviving rows re-scanned, turning "cost ∝
  * delta" into "cost ∝ affected groups' data", a different operator
  * with a different contract.
  *
  * NULL measures follow SQL sum semantics exactly: sum skips NULLs and
  * an all-NULL (or empty) set sums to NULL. A signed 0 cannot encode
  * "the group's last non-null value left", so each measure carries a
  * maintained non-null counter `nn_<m>`; the published `sum_<m>` is
  * NULL exactly when that counter is zero — bit-for-bit the batch
  * convention.
  *
  * The invariant `apply(full(v_i), changes(v_i, v_j)) == full(v_j)` for
  * ANY committed span — across appends, merges (incl. value→NULL
  * updates), overwrite deletes, and empty compaction feeds — is pinned
  * by IncrementalAggSpec and value-gated end-to-end by
  * `q_acid_incragg`, whose oracle recomputes the final state's
  * aggregate from the raw table while the Spark side only ever
  * maintains increments.
  */
object IncrementalAgg {

  private def sumCols(measures: Seq[String]): Seq[String] =
    Seq("cnt") ++ measures.flatMap(m => Seq(s"nn_$m", s"sum_$m"))

  /** The batch equivalent: full aggregate of a snapshot —
    * (keys..., cnt, [nn_m, sum_m]...). */
  def full(snapshot: DataFrame, keys: Seq[String], measures: Seq[String]): DataFrame = {
    val aggs = count(lit(1)).as("cnt") +: measures.flatMap(m => Seq(
      sum(when(col(m).isNotNull, 1L).otherwise(0L)).as(s"nn_$m"),
      sum(col(m)).as(s"sum_$m")))
    snapshot.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Signed delta aggregate of a change feed (one delta-sized shuffle). */
  def delta(changes: DataFrame, keys: Seq[String], measures: Seq[String]): DataFrame = {
    val sign = when(col("change_type").isin("insert", "update_post"), 1L)
      .otherwise(-1L)
    val signed = changes.withColumn("_sign", sign)
    val aggs = sum(col("_sign")).as("cnt") +: measures.flatMap(m => Seq(
      sum(when(col(m).isNotNull, col("_sign")).otherwise(0L)).as(s"nn_$m"),
      sum(col("_sign") * coalesce(col(m), lit(0L))).as(s"sum_$m")))
    signed.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** `prev` (a [[full]]-shaped aggregate) advanced by `changes`. */
  def apply(prev: DataFrame, changes: DataFrame, keys: Seq[String],
      measures: Seq[String]): DataFrame = {
    val d = delta(changes, keys, measures)
    val sums = sumCols(measures)
    val merged = prev.select(
        keys.map(col) ++ sums.map(c => col(c).as(s"_p_$c")): _*)
      .join(d.select(
        keys.map(col) ++ sums.map(c => col(c).as(s"_d_$c")): _*),
        keys, "full_outer")
    val combined = sums.foldLeft(merged) { (df, c) =>
      df.withColumn(c,
        coalesce(col(s"_p_$c"), lit(0L)) + coalesce(col(s"_d_$c"), lit(0L)))
    }
    // republish the batch NULL convention from the maintained counters
    val normalized = measures.foldLeft(combined) { (df, m) =>
      df.withColumn(s"sum_$m",
        when(col(s"nn_$m") === 0L, lit(null))
          .otherwise(col(s"sum_$m")))
    }
    normalized
      .filter(col("cnt") > 0L)
      .select(keys.map(col) ++ sums.map(col): _*)
  }

  /** The batch min/max aggregate: (keys..., cnt, [min_m, max_m]...). */
  def fullMinMax(snapshot: DataFrame, keys: Seq[String],
      measures: Seq[String]): DataFrame = {
    val aggs = count(lit(1)).as("cnt") +: measures.flatMap(m => Seq(
      min(col(m)).as(s"min_$m"), max(col(m)).as(s"max_$m")))
    snapshot.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Maintenance for the NON-invertible aggregates (min/max): a deleted
    * minimum cannot be subtracted out, so the contract degrades from
    * "cost ∝ delta" to "cost ∝ AFFECTED GROUPS' data" — untouched
    * groups keep their previous rows verbatim (anti-join against the
    * delta's key set), touched groups are re-aggregated from the new
    * snapshot restricted by a BROADCAST semi-join on that same
    * delta-sized key set, which pushes the group filter into the scan.
    * A fully-deleted group recomputes to zero rows and so vanishes,
    * same rule as [[apply]]. At 100 TB this is the difference between
    * re-reading the table and re-reading the handful of partitions the
    * day's changes touched. */
  def refreshMinMax(prevAgg: DataFrame, snapshot: DataFrame,
      changes: DataFrame, keys: Seq[String], measures: Seq[String]): DataFrame = {
    val touched = changes.select(keys.map(col): _*).distinct()
    val kept = prevAgg.join(broadcast(touched), keys, "left_anti")
    val recomputed = fullMinMax(
      snapshot.join(broadcast(touched), keys, "left_semi"), keys, measures)
    kept.unionByName(recomputed)
  }
}
