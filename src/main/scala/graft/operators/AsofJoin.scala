package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — for each left row, the single most recent right row with
  * the same key and `rTime <= lTime` (inclusive). Spark has no built-in
  * as-of join; the scalable formulation composes built-ins (SURVEY §7.3
  * preference (a)): tag both inputs, UNION them, and carry the latest
  * right payload forward with an ordered `last(_, ignoreNulls)` running
  * window. ONE shuffle on the key, a single ordered pass per key — no
  * per-row binary search, no range cross-product, and at 1000 executors
  * it scales exactly like any windowed aggregation.
  *
  * Determinism: right rows tie-break on `tieCol` (greatest wins); at
  * equal timestamps the right row sorts BEFORE the left row, making the
  * bound inclusive.
  */
object AsofJoin {

  /** Shared mechanics of both directions: tag, union, carry the latest
    * non-null right payload along an ordered per-key pass. Backward scans
    * time ascending ("most recent at or before"); forward scans
    * descending ("earliest at or after"). Right rows with a NULL time
    * are dropped up front — a null timestamp can satisfy neither bound,
    * but under the ordered scan it would sort to an end and be carried
    * as a bogus match. Left rows with a NULL time keep their row and
    * match nothing (they order before any real time in scan order only
    * when no right row precedes them; the carried payload stays null
    * either way because nulls sort first on the ascending scan and the
    * forward scan's nulls-last puts them after every real right row —
    * both yield no-match, same as the SQL comparison's NULL semantics).
    */
  private def asofImpl(left: DataFrame, right: DataFrame, key: String,
      lTime: String, rTime: String, payload: Seq[String],
      tieCol: String, forward: Boolean): DataFrame = {
    val rp = struct((payload :+ tieCol).distinct.map(col): _*)
    val rpType = right.select(rp).schema.head.dataType
    val lRow = struct(left.columns.map(col): _*)
    val lRowType = left.select(lRow).schema.head.dataType

    val rTagged = right
      .filter(col(rTime).isNotNull)
      .select(
        col(key).as("_k"), col(rTime).cast("timestamp").as("_t"),
        lit(0).as("_side"), col(tieCol).cast("long").as("_tie"),
        rp.as("_rp"), lit(null).cast(lRowType).as("_lrow"))
    val lTagged = left.select(
      col(key).as("_k"), col(lTime).cast("timestamp").as("_t"),
      lit(1).as("_side"), lit(Long.MaxValue).as("_tie"),
      lit(null).cast(rpType).as("_rp"), lRow.as("_lrow"))

    // at equal _t the right row (_side 0) sorts before the left row —
    // the bound is inclusive in both directions; among equal-time right
    // rows the GREATEST tie is seen last and therefore carried. The
    // forward scan runs nulls-first so a null-time LEFT row still
    // matches nothing (it would otherwise trail every right row).
    val tOrder =
      if (forward) col("_t").desc_nulls_first else col("_t").asc
    val w = Window.partitionBy(col("_k"))
      .orderBy(tOrder, col("_side").asc, col("_tie").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val carried = rTagged.unionByName(lTagged)
      .withColumn("_asof", last(col("_rp"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)

    val leftCols = left.columns.map(c => col(s"_lrow.$c").as(c))
    val asofCols = payload.map(c => col(s"_asof.$c").as(s"asof_$c"))
    carried.select(leftCols ++ asofCols: _*)
  }

  /** Output: every left row (all its columns) + the matched right payload
    * columns (null when no right row at or before the left time). */
  def asof(left: DataFrame, right: DataFrame, key: String,
      lTime: String, rTime: String, payload: Seq[String],
      tieCol: String): DataFrame =
    asofImpl(left, right, key, lTime, rTime, payload, tieCol, forward = false)

  /** Forward as-of: for each left row, the EARLIEST right row with the
    * same key and `rTime >= lTime` (inclusive). Same union + running
    * window shape scanned in descending time order, so "carry the last
    * non-null right payload" yields the nearest-after match — still one
    * shuffle, one ordered pass per key. Ties at equal `rTime` resolve to
    * the greatest `tieCol`, mirroring [[asof]]. */
  def asofForward(left: DataFrame, right: DataFrame, key: String,
      lTime: String, rTime: String, payload: Seq[String],
      tieCol: String): DataFrame =
    asofImpl(left, right, key, lTime, rTime, payload, tieCol, forward = true)
}
