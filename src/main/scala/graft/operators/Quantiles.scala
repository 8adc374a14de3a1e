package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed quantiles.
  *
  * [[exactDiscrete]] computes exact per-group discrete quantiles (the
  * value at rank max(1, ceil(p*n)) in ascending order) with ONE shuffle:
  * the per-group window sort. Discrete (type-1) quantiles are used
  * instead of interpolating ones deliberately — the selected value is an
  * actual element of the data, so the result is reproducible bit-for-bit
  * across engines, while interpolation formulas (`a + (b-a)*f` vs
  * `(1-f)*a + f*b`) differ in final-ulp rounding between
  * implementations.
  *
  * Scale note: exact quantiles fundamentally require the per-group sort.
  * When error tolerance allows, `approx_percentile` (Greenwald-Khanna
  * sketch: mergeable, map-side partials, no sort) is the 100 TB path —
  * same trade as count-distinct vs HLL in q_approx_distinct.
  */
object Quantiles {

  /** One row per (group, p): the exact discrete p-quantile of
    * `valueCol`. `ps` should be exact binary fractions (0.25, 0.5, ...)
    * so ceil(p*n) is reproducible in IEEE arithmetic. NULL values are
    * excluded (standard quantile semantics) — ranked in, Spark's
    * nulls-first ascending order would hand low quantiles NULL and
    * shift every other rank, where SQL's nulls-last ordering would
    * not. Consequence callers must know: a group whose values are ALL
    * NULL disappears from the output entirely (n = 0 ranks nothing) —
    * right-join the distinct group keys back with a NULL `q` if group
    * presence matters downstream. */
  def exactDiscrete(df: DataFrame, valueCol: String,
      groupCols: Seq[String], ps: Seq[Double]): DataFrame = {
    val part = Window.partitionBy(groupCols.map(col): _*)
    val w = part.orderBy(col(valueCol))
    df.filter(col(valueCol).isNotNull)
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(part))
      .withColumn("p", explode(array(ps.map(lit): _*)))
      .filter(col("rn") ===
        greatest(ceil(col("p") * col("n")).cast("long"), lit(1L)))
      .select(groupCols.map(col) :+ col("p") :+ col(valueCol).as("q"): _*)
  }
}
