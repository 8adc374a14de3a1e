package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import TextOps.hash60

/** Deterministic sampling operators for training-data curation. Both are
  * built on the engine-stable 60-bit md5 key hash ([[TextOps.hash60]])
  * instead of `rand()`: membership depends only on the key, so samples
  * reproduce across runs, engines, and retries, and are consistent
  * between tables sharing the key — the property a multi-stage pipeline
  * needs so its stages see the SAME sample. (The reference has no
  * sampling at all; this is pipeline-extension surface.)
  */
object Sampling {

  /** Exactly `n` rows per stratum (fewer if the stratum is smaller),
    * chosen by ranking on (hash, key): an unbiased-but-deterministic
    * shuffle order per stratum. One hash-partition window shuffle on the
    * stratum column; at scale the rank stays inside each partition and
    * nothing global sorts. Use for balanced eval-set construction. */
  def stratifiedTopN(df: DataFrame, strataCol: String, keyCol: String,
      n: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val h = hash60(col(keyCol).cast("string"))
    val w = Window.partitionBy(col(strataCol)).orderBy(h.asc, col(keyCol).asc)
    df.withColumn("_rnk", row_number().over(w))
      .filter(col("_rnk") <= n)
      .drop("_rnk")
  }

  /** Weighted sample of `n` rows without replacement — the missing
    * sampling shape between [[stratifiedTopN]] (uniform within stratum)
    * and [[applyMixPct]] (rate-based): pick documents with probability
    * increasing in a per-row weight (quality score, length, dollar
    * value), deterministically.
    *
    * Scheme: PRIORITY SAMPLING (Duffield, Lund, Thorup, JACM 2007) with
    * a hash in place of the random draw — each row gets priority
    * `hash60(key) div weight` and the n SMALLEST priorities win, ties
    * broken by key. hash60 plays u·2^60 for a uniform u, so the rank
    * order matches priority sampling's w/u ranking exactly; inclusion
    * frequency tracks weight (a weight-w row beats a weight-1 row on
    * the same hash budget w× as often) while staying INTEGER-EXACT:
    * one hash, one integer division, no ln/pow whose last-ulp behavior
    * differs across engines — the draw replays bit-for-bit in any
    * engine with md5 and floor division, which the exponential-clock
    * A-ES reservoir (−ln(u)/w doubles) cannot guarantee. Weights clamp
    * to ≥ 1 (a zero/negative weight means "never prefer", not "divide
    * by zero").
    *
    * Scale shape: the rank is a global top-n — Spark executes
    * `orderBy().limit(n)` as TakeOrderedAndProject (per-partition heap
    * of n, then a driver merge of |partitions|·n rows), so the corpus
    * is never globally sorted and the shuffle carries only candidate
    * heaps. One scan, no join, no window. */
  def weightedTopN(df: DataFrame, keyCol: String, weight: Column,
      n: Int): DataFrame =
    df.withColumn("_w", greatest(weight.cast("long"), lit(1L)))
      .withColumn("_h", hash60(col(keyCol).cast("string")))
      .withColumn("_pri", expr("_h div _w"))
      .orderBy(col("_pri").asc, col(keyCol).asc)
      .limit(n)
      .drop("_w", "_h", "_pri")

  /** [[weightedTopN]] within each stratum: exactly `n` rows per stratum
    * (fewer if smaller), drawn with probability tracking `weight` —
    * balanced-by-source AND quality-weighted eval sets in one pass.
    * Same integer-exact priority scheme; the rank is a per-stratum
    * window (one hash-partition shuffle on the stratum column, rank
    * local to each partition), not a global sort. */
  def weightedTopNPerStratum(df: DataFrame, strataCol: String,
      keyCol: String, weight: Column, n: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(strataCol))
      .orderBy(col("_pri").asc, col(keyCol).asc)
    df.withColumn("_w", greatest(weight.cast("long"), lit(1L)))
      .withColumn("_h", hash60(col(keyCol).cast("string")))
      .withColumn("_pri", expr("_h div _w"))
      .withColumn("_rnk", row_number().over(w))
      .filter(col("_rnk") <= n)
      .drop("_w", "_h", "_pri", "_rnk")
  }

  /** Apply a per-stratum sampling rate: keep a row iff
    * `hash60(key) % 100 < pct(stratum)`. `pct` is any integer-percent
    * column expression (a broadcast-joined weights table, a config map,
    * or a formula) — evaluated per row, no shuffle at all: the mix is
    * applied in the same scan that reads the corpus, which is the only
    * shape that works when the corpus is 100 TB and the mix changes
    * per experiment. */
  def applyMixPct(df: DataFrame, keyCol: String, pct: Column): DataFrame =
    df.filter(pmod(hash60(col(keyCol).cast("string")), lit(100)) < pct)
}
