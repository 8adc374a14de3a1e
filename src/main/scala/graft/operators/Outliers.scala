package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Robust per-group outlier detection via median absolute deviation —
  * the data-quality screen that, unlike mean/stddev z-scores, is not
  * itself dragged by the outliers it hunts (50% breakdown point), and
  * unlike anything built on `sum(double)` is bit-reproducible: both the
  * median and the MAD are exact discrete quantiles (actual data
  * elements, see [[Quantiles.exactDiscrete]]), and the flag compares
  * `abs(x - med) > k·mad` with single IEEE ops — no order-dependent
  * accumulation anywhere, so a SQL oracle replays it exactly.
  *
  * Scale shape: two per-group window sorts (the exact-quantile floor —
  * `approx_percentile` is the sketch path when tolerance allows) plus
  * joins of |groups|-sized quantile tables back to the data, all keyed
  * on the group columns (broadcast at realistic group counts). Nothing
  * accumulates beyond one row per group.
  */
object Outliers {

  /** One row per group: the discrete median, the MAD, row count and the
    * number of rows with `abs(value - med) > k * mad`. NULL values are
    * excluded (quantile semantics); all-NULL groups vanish. */
  def madOutliers(df: DataFrame, valueCol: String, groupCols: Seq[String],
                  k: Double = 3.0): DataFrame = {
    val vals = df.filter(col(valueCol).isNotNull)
    // med and mad are |groups|-sized and each has TWO consumers below;
    // eager-checkpointing them runs each window sort exactly once —
    // un-materialized, the med sort (the query's dominant stage) would
    // execute twice because window operators above an exchange are not
    // covered by exchange reuse. The checkpoint blocks stay registered
    // until the returned frame's RDD is garbage-collected (Spark's
    // ContextCleaner reclaims them); they cannot be unpersisted here
    // because localCheckpoint TRUNCATES lineage — dropping the blocks
    // before the caller materializes would make the result
    // unrecomputable. |groups|-sized blocks make that residency cheap;
    // long-lived sessions calling this in a tight loop should
    // materialize-and-release each result so the cleaner keeps up
    val med = Quantiles.exactDiscrete(vals, valueCol, groupCols, Seq(0.5))
      .select(groupCols.map(col) :+ col("q").as("med"): _*)
      .localCheckpoint()
    val dev = vals.join(med, groupCols)
      .withColumn("d", abs(col(valueCol) - col("med")))
    val mad = Quantiles.exactDiscrete(dev, "d", groupCols, Seq(0.5))
      .select(groupCols.map(col) :+ col("q").as("mad"): _*)
      .localCheckpoint()
    // final pass recomputes the deviation from the raw scan (one narrow
    // map) instead of reusing `dev`, so the dev window sort also runs
    // exactly once (inside the mad quantile above)
    vals.join(med, groupCols).join(mad, groupCols)
      .groupBy(groupCols.map(col) :+ col("med") :+ col("mad"): _*)
      .agg(count(lit(1)).as("n"),
        sum(when(abs(col(valueCol) - col("med")) > lit(k) * col("mad"), 1L)
          .otherwise(0L)).as("n_outliers"))
  }
}
