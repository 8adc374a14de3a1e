package graft.stream

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Watermarked stream-stream joins — the Structured Streaming operator
  * that correlates two unbounded inputs with BOUNDED state: both sides
  * declare a watermark and the join condition carries a time-range
  * bound, so Spark can evict left/right state older than
  * `watermark - maxDelay` instead of buffering both streams forever.
  *
  * Inner-join matches are emitted in the micro-batch they form in; the
  * watermark governs only state eviction (and, for outer variants, when
  * an unmatched row is final). On bounded input drained in one
  * AvailableNow batch the result therefore equals the batch interval
  * join exactly — which is how the oracle gates it.
  */
object StreamJoin {

  /** left ⋈ right on `key`, right event within [leftTs, leftTs + maxDelay].
    * Column names must already be disjoint between the two sides except
    * for nothing — the caller renames; `key`/`rightKey` name the join
    * keys on each side. */
  def timeBounded(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTs: String, rightTs: String,
      lateness: String, maxDelay: String): DataFrame =
    left.withWatermark(leftTs, lateness)
      .join(
        right.withWatermark(rightTs, lateness),
        expr(s"$leftKey = $rightKey AND $rightTs >= $leftTs " +
          s"AND $rightTs <= $leftTs + interval $maxDelay"),
        "inner")
}
