package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval (range) join without a cartesian product. Spark plans a
  * non-equi `pt BETWEEN lo AND hi` join as BroadcastNestedLoop (or worse,
  * a cartesian) — O(|points| x |intervals|) comparisons. Here each
  * interval explodes to the fixed-width TIME BUCKETS it covers and each
  * point maps to its single bucket; the bucket equi-join prunes the cross
  * product to bucket-sharing candidates, and the exact bounds filter
  * finishes. A point lives in exactly one bucket, so no dedup is needed.
  * Pick `bucketSeconds` near the typical interval width: wider buckets
  * mean fewer interval replicas, narrower buckets mean tighter candidate
  * sets.
  */
object RangeJoin {

  /** Join `points` (timestamp `ptCol`) to `intervals` ([`loCol`,`hiCol`]
    * closed timestamp bounds). Output: interval columns + point columns
    * for every containment pair. */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
      ptCol: String, loCol: String, hiCol: String,
      bucketSeconds: Long = 3600L): DataFrame = {
    require(bucketSeconds > 0, "bucketSeconds must be positive")
    val iv = intervals.withColumn("_b",
      explode(sequence(
        (unix_timestamp(col(loCol)) / bucketSeconds).cast("long"),
        (unix_timestamp(col(hiCol)) / bucketSeconds).cast("long"))))
    val pt = points.withColumn("_b",
      (unix_timestamp(col(ptCol)) / bucketSeconds).cast("long"))
    iv.join(pt, Seq("_b"))
      .filter(col(ptCol) >= col(loCol) && col(ptCol) <= col(hiCol))
      .drop("_b")
  }
}
