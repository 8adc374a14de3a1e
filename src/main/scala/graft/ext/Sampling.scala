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
    * CONTRACTS the integer scheme imposes: (1) weights are INTEGER
    * units — a fractional weight is ROUNDED half-up before the draw
    * (never truncated: a quality score in (0, 1] would truncate to 0
    * and clamp to 1, degenerating every such row to a uniform draw), so
    * callers with fractional scores must scale them to a meaningful
    * integer resolution first (`score * 1000` for three digits) — the
    * division `hash div weight` quantizes at the weight's integer
    * granularity, and sub-unit differences are invisible by design;
    * (2) `keyCol` must be unique — duplicate keys hash to identical
    * (priority, key) sort tuples and which duplicate survives the
    * limit is engine-dependent.
    *
    * Scale shape: the rank is a global top-n — Spark executes
    * `orderBy().limit(n)` as TakeOrderedAndProject (per-partition heap
    * of n, then a driver merge of |partitions|·n rows), so the corpus
    * is never globally sorted and the shuffle carries only candidate
    * heaps. One scan, no join, no window. */
  def weightedTopN(df: DataFrame, keyCol: String, weight: Column,
      n: Int): DataFrame =
    prioritized(df, keyCol, weight, salt = "")
      .orderBy(col("_pri").asc, col(keyCol).asc)
      .limit(n)
      .drop("_w", "_h", "_pri")

  /** The shared priority columns: integer weight (rounded, clamped ≥ 1),
    * 60-bit key hash (optionally salted — distinct salts give
    * INDEPENDENT deterministic draws, the replication axis the
    * estimation property test averages over), and the priority
    * `hash div weight`. */
  private def prioritized(df: DataFrame, keyCol: String, weight: Column,
      salt: String): DataFrame = {
    val keyed =
      if (salt.isEmpty) col(keyCol).cast("string")
      else concat(col(keyCol).cast("string"), lit(salt))
    df.withColumn("_w", greatest(round(weight).cast("long"), lit(1L)))
      .withColumn("_h", hash60(keyed))
      .withColumn("_pri", expr("_h div _w"))
  }

  /** 2^60 — the hash range; priorities replay `weight / u` with
    * `u = hash / 2^60`, so the inclusion threshold in weight units is
    * `2^60 div p_(n+1)`. */
  private val HashRange: Long = 1L << 60

  /** [[weightedTopN]] PLUS the Horvitz–Thompson estimation weight that
    * makes the sample usable for unbiased subset-sum estimation — the
    * actual theorem of priority sampling (Duffield, Lund, Thorup, JACM
    * 2007): with threshold priority τ = the (n+1)-th smallest priority,
    * each sampled row's estimator weight is `max(w_i, τ_w)` where
    * `τ_w = 2^60 div p_(n+1)` converts the integer priority back to
    * weight units, and `E[Σ_sample est_weight] = Σ_population w` —
    * so `Σ est_weight` estimates the population's total weight, and
    * `Σ y_i · est_weight / w_i` estimates any value column's total,
    * from n rows. When the table has ≤ n rows every row is included
    * with probability 1 and `est_weight = w` exactly.
    *
    * Output: the input columns plus `est_weight` (long). Integer-exact
    * end to end: τ_w is one floor division of 2^60 by the (n+1)-th
    * priority, so the estimate replays bit-for-bit in any engine with
    * md5 and floor division (the floor quantization costs < 1 weight
    * unit per row against the real-valued estimator — deterministic,
    * and negligible at any realistic weight scale). `salt` appended to
    * the key before hashing selects an independent draw; the property
    * test averages estimates over many salts to verify unbiasedness,
    * production leaves it "".
    *
    * Scale shape: ONE corpus scan — `orderBy().limit(n+1)` executes as
    * TakeOrderedAndProject (per-partition heaps of n+1, driver-merged),
    * then the threshold extraction and est computation run on that
    * ≤ n+1-row result (the single-partition window is over n+1 rows,
    * never the corpus). No join, no global sort. */
  def weightedTopNWithEstimate(df: DataFrame, keyCol: String,
      weight: Column, n: Int, salt: String = ""): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val top = prioritized(df, keyCol, weight, salt)
      .orderBy(col("_pri").asc, col(keyCol).asc)
      .limit(n + 1)
    val wAll = Window.partitionBy()
    val wOrd = Window.orderBy(col("_pri").asc, col(keyCol).asc)
    top
      .withColumn("_rnk", row_number().over(wOrd))
      .withColumn("_cnt", count(lit(1)).over(wAll))
      .withColumn("_ptau", max(col("_pri")).over(wAll))
      .where(col("_rnk") <= n)
      .withColumn("est_weight",
        when(col("_cnt") <= n, col("_w")).otherwise(
          greatest(col("_w"),
            expr(s"${HashRange}L div greatest(_ptau, 1L)"))))
      .drop("_w", "_h", "_pri", "_rnk", "_cnt", "_ptau")
  }

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
    prioritized(df, keyCol, weight, salt = "")
      .withColumn("_rnk", row_number().over(w))
      .filter(col("_rnk") <= n)
      .drop("_w", "_h", "_pri", "_rnk")
  }

  /** [[weightedTopNPerStratum]] PLUS the per-stratum Horvitz–Thompson
    * estimation weight — the stratified dual of
    * [[weightedTopNWithEstimate]]: each stratum gets its OWN threshold
    * priority τ_s = the (n+1)-th smallest priority within the stratum,
    * and each sampled row's `est_weight = max(w_i, 2^60 div τ_s)`
    * (or exactly `w_i` when the stratum has ≤ n rows and is included
    * whole). Per stratum, `E[Σ_sample est_weight] = Σ_stratum w`, so a
    * balanced-by-source draw can still drive unbiased per-stratum sums
    * — and their total is an unbiased estimate of the population sum
    * whose relative error shrinks as strata average out (the gate pins
    * the total inside a 15% envelope; a SINGLE stratum's estimate at
    * small n has much higher variance by design — callers wanting tight
    * per-stratum bounds need a larger per-stratum n).
    *
    * Integer-exact end to end exactly as the global version: one md5
    * hash, floor divisions only, so every est_weight replays
    * bit-for-bit in any engine with md5 and floor division. `salt`
    * selects an independent deterministic draw (the unbiasedness
    * property test averages over salts); production leaves it "".
    *
    * Scale shape: ONE hash-partition shuffle on the stratum column; the
    * rank, the (n+1)-row clip, the per-stratum count and τ_s extraction
    * are all windows over the SAME partitioning, so Catalyst reuses the
    * exchange — the second window pass runs over ≤ (n+1)·|strata| rows,
    * never the corpus, and nothing global sorts. */
  def weightedTopNPerStratumWithEstimate(df: DataFrame, strataCol: String,
      keyCol: String, weight: Column, n: Int,
      salt: String = ""): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wOrd = Window.partitionBy(col(strataCol))
      .orderBy(col("_pri").asc, col(keyCol).asc)
    val wStr = Window.partitionBy(col(strataCol))
    prioritized(df, keyCol, weight, salt)
      .withColumn("_rnk", row_number().over(wOrd))
      .filter(col("_rnk") <= n + 1)
      .withColumn("_cnt", count(lit(1)).over(wStr))
      .withColumn("_ptau", max(col("_pri")).over(wStr))
      .where(col("_rnk") <= n)
      .withColumn("est_weight",
        when(col("_cnt") <= n, col("_w")).otherwise(
          greatest(col("_w"),
            expr(s"${HashRange}L div greatest(_ptau, 1L)"))))
      .drop("_w", "_h", "_pri", "_rnk", "_cnt", "_ptau")
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
