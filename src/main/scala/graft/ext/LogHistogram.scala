package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable quantile sketch: a log2-bucketed histogram — the DDSketch
  * idea (Masson, Rim, Lee, VLDB 2019: relative-error quantile sketch
  * with log-spaced buckets) pinned to base 2 so the bucket function is
  * PURE INTEGER and replays bit-identically in any engine: bucket(x) =
  * floor(log2 x) computed as `length(bin(x)) - 1` — a binary-string
  * length, no libm, no float boundary cases (both Spark and DuckDB
  * evaluate `bin` on integers exactly). γ = 2 bounds the relative error
  * of any quantile estimate by 2× (answers are bucket LOWER bounds
  * 2^b ≤ true value < 2^(b+1)); finer γ would need float log — the
  * determinism trade this engine makes everywhere (BM25 idf, rarity
  * scores).
  *
  * Why this exists next to `approx_percentile` (q_approx_quantile) and
  * the exact-quantile row: at 100 TB the quantile state must be
  * (a) bounded — ≤ 63 buckets per group, vs GK/KLL's data-dependent
  * summaries; (b) MERGEABLE BY ADDITION — per-shard/per-day histograms
  * union with `+`, the same property that makes [[CountMin]] buildable
  * per shard (order-free, so the value gate replays it exactly); and
  * (c) deterministic — Spark's approx_percentile summary depends on
  * merge order, so it can only ever be range-gated, never value-gated.
  *
  * Quantile extraction is integer throughout: permille p of n values
  * selects the smallest bucket whose cumulative count reaches
  * `ceil(n·p/1000)` = `(n·p + 999) div 1000` — no doubles anywhere
  * (cross-engine 0.9 parses as DECIMAL in DuckDB; permille arithmetic
  * sidesteps the entire class). The cumulative window runs over the
  * ≤ 63-row histogram, not the data.
  */
object LogHistogram {

  /** floor(log2 x) for x ≥ 1, as a binary-string length (exact in both
    * engines). */
  def bucket(c: Column): Column = (length(bin(c)) - 1).cast("long")

  /** The sketch: (bucket, cnt) for values ≥ 1 of `valueCol`. One
    * map-side-combined aggregate; ≤ 63 output rows regardless of input
    * size. Values < 1 are out of domain and dropped (callers gate NULLs
    * and non-positives upstream, as DDSketch's positive-store does). */
  def sketch(df: DataFrame, valueCol: String): DataFrame =
    df.filter(col(valueCol) >= 1L)
      .groupBy(bucket(col(valueCol)).as("bucket"))
      .agg(count(lit(1)).as("cnt"))

  /** Quantile estimates for the given permilles from a sketch:
    * (permille, bucket, est) with est = 2^bucket, the bucket lower
    * bound (true value < 2·est). The scan is over the tiny histogram. */
  def quantiles(sk: DataFrame, permilles: Seq[Int]): DataFrame = {
    require(permilles.nonEmpty && permilles.forall(p => p >= 1 && p <= 1000),
      s"permilles must be in [1, 1000]: $permilles")
    import org.apache.spark.sql.expressions.Window
    val sp = sk.sparkSession
    import sp.implicits._
    // single-partition windows are fine HERE: they run over the ≤ 63-row
    // histogram, never the data
    val cum = sk
      .withColumn("cum", sum(col("cnt"))
        .over(Window.orderBy(col("bucket"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("total", sum(col("cnt"))
        .over(Window.rowsBetween(Window.unboundedPreceding,
          Window.unboundedFollowing)))
    permilles.toDF("permille")
      .crossJoin(cum)
      .filter(col("cum") >= expr("(total * permille + 999) div 1000"))
      .groupBy(col("permille").cast("long").as("permille"))
      .agg(min(col("bucket")).as("bucket"))
      .withColumn("est",
        expr("shiftleft(cast(1 as bigint), cast(bucket as int))"))
  }
}
