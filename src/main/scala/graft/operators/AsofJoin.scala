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

  /** Output: every left row (all its columns) + the matched right payload
    * columns (null when no right row at or before the left time). */
  def asof(left: DataFrame, right: DataFrame, key: String,
      lTime: String, rTime: String, payload: Seq[String],
      tieCol: String): DataFrame = {
    val rp = struct((payload :+ tieCol).distinct.map(col): _*)
    val rpType = right.select(rp).schema.head.dataType
    val lRow = struct(left.columns.map(col): _*)
    val lRowType = left.select(lRow).schema.head.dataType

    val rTagged = right.select(
      col(key).as("_k"), col(rTime).cast("timestamp").as("_t"),
      lit(0).as("_side"), col(tieCol).cast("long").as("_tie"),
      rp.as("_rp"), lit(null).cast(lRowType).as("_lrow"))
    val lTagged = left.select(
      col(key).as("_k"), col(lTime).cast("timestamp").as("_t"),
      lit(1).as("_side"), lit(Long.MaxValue).as("_tie"),
      lit(null).cast(rpType).as("_rp"), lRow.as("_lrow"))

    val w = Window.partitionBy(col("_k"))
      .orderBy(col("_t").asc, col("_side").asc, col("_tie").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val carried = rTagged.unionByName(lTagged)
      .withColumn("_asof", last(col("_rp"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)

    val leftCols = left.columns.map(c => col(s"_lrow.$c").as(c))
    val asofCols = payload.map(c => col(s"_asof.$c").as(s"asof_$c"))
    carried.select(leftCols ++ asofCols: _*)
  }

  /** Forward as-of: for each left row, the EARLIEST right row with the
    * same key and `rTime >= lTime` (inclusive). Same union + running
    * window shape scanned in descending time order, so "carry the last
    * non-null right payload" yields the nearest-after match — still one
    * shuffle, one ordered pass per key. Ties at equal `rTime` resolve to
    * the greatest `tieCol`, mirroring [[asof]]. */
  def asofForward(left: DataFrame, right: DataFrame, key: String,
      lTime: String, rTime: String, payload: Seq[String],
      tieCol: String): DataFrame = {
    val rp = struct((payload :+ tieCol).distinct.map(col): _*)
    val rpType = right.select(rp).schema.head.dataType
    val lRow = struct(left.columns.map(col): _*)
    val lRowType = left.select(lRow).schema.head.dataType

    val rTagged = right.select(
      col(key).as("_k"), col(rTime).cast("timestamp").as("_t"),
      lit(0).as("_side"), col(tieCol).cast("long").as("_tie"),
      rp.as("_rp"), lit(null).cast(lRowType).as("_lrow"))
    val lTagged = left.select(
      col(key).as("_k"), col(lTime).cast("timestamp").as("_t"),
      lit(1).as("_side"), lit(Long.MinValue).as("_tie"),
      lit(null).cast(rpType).as("_rp"), lRow.as("_lrow"))

    // descending time: right rows at equal time sort before the left row
    // (inclusive bound); among equal-time right rows the GREATEST tie is
    // seen last and therefore carried
    val w = Window.partitionBy(col("_k"))
      .orderBy(col("_t").desc, col("_side").asc, col("_tie").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val carried = rTagged.unionByName(lTagged)
      .withColumn("_asof", last(col("_rp"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)

    val leftCols = left.columns.map(c => col(s"_lrow.$c").as(c))
    val asofCols = payload.map(c => col(s"_asof.$c").as(s"asof_$c"))
    carried.select(leftCols ++ asofCols: _*)
  }
}
