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
