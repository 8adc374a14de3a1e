package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The ed ≤ 2 fuzzy-join growth probe — pins the exponent the round-10
  * verdict left open, with COUNTED evidence per scale leg:
  *
  *  - the DENSE leg is the adversarial gate fixture (sequential
  *    zero-padded "Customer#%09d" names): within the 9-digit space,
  *    nearly every ≤ 2-digit variation of a name is another live name,
  *    so the TRUE ed ≤ 2 pair set itself grows super-linearly until the
  *    digit neighborhood saturates (~3k neighbors/name at 10^9 ids —
  *    far beyond any leg here). The probe emits n_pairs alongside wall
  *    time so the super-linear wall is attributed: if wall/n_pairs
  *    stays ~flat while n_pairs explodes, the join is OUTPUT-bound —
  *    it pays for the answer's size, which no algorithm can avoid —
  *    and NOT candidate-wasteful (cand_pairs/n_pairs stays bounded).
  *  - the SPARSE leg is a realistic entity distribution: 9-hex-char
  *    md5-suffixed names (edit-space density ~0) with a planted typo
  *    twin on 2% of keys — the shape of real customer/supplier data,
  *    where near-duplicates are injected errors, not neighbors by
  *    construction. Near-linear wall here is the production claim.
  *  - the VALVED leg re-runs dense with the maxBucket candidate-budget
  *    valve ([[graft.ext.FuzzyJoin.selfJoinEdK]]) and reports recall =
  *    valved pairs / exact pairs — the documented trade for a bounded
  *    worst case.
  *
  * Each leg also carries the signature-bucket census (sig rows,
  * buckets, max bucket, Σ C(b,2) candidate pairs) from
  * [[graft.ext.FuzzyJoin.sigCensus]] — one aggregate, no join — so the
  * sub-linear bucket argument is measured, not asserted.
  *
  * Usage: runMain graft.FuzzyProbe [scales] [maxBucket]
  *   scales    comma list of multipliers of the 15k-name base (sf0.1
  *             customer count), default "1,3,10"
  *   maxBucket valve for the valved leg, default 256
  * Prints ONE JSON line; save as ED2_PROBE_r<N>.json.
  */
object FuzzyProbe {

  private val BaseNames = 15000L // sf0.1 customer row count

  private def dense(spark: SparkSession, n: Long): DataFrame =
    spark.range(1L, BaseNames * n + 1L)
      .select(format_string("Customer#%09d", col("id")).as("name"))

  /** md5-suffixed names + a typo twin (first suffix char -> 'z') for
    * every 50th key: ~2% of entities carry one ed = 1 duplicate. */
  private def sparse(spark: SparkSession, n: Long): DataFrame = {
    val base = spark.range(1L, BaseNames * n + 1L)
      .select(col("id"), concat(lit("Cust#"),
        substring(md5(col("id").cast("string")), 1, 9)).as("name"))
    base.select(col("name"))
      .unionAll(base.where(col("id") % 50 === 0)
        .select(concat(lit("Cust#z"),
          substring(md5(col("id").cast("string")), 2, 8)).as("name")))
  }

  private def time[T](f: => T): (Double, T) = {
    val t0 = System.nanoTime(); val r = f
    ((System.nanoTime() - t0) / 1e9, r)
  }

  def main(args: Array[String]): Unit = {
    val scales = args.headOption.getOrElse("1,3,10")
      .split(",").toSeq.map(_.trim.toLong)
    val maxBucket = args.lift(1).map(_.toLong).getOrElse(256L)
    val spark = Sessions.build(Sessions.cpusFromEnv, "graft-fuzzy-probe")
    spark.sparkContext.setLogLevel("WARN")
    import graft.ext.FuzzyJoin

    def leg(corpus: String, scale: Long, df: DataFrame,
        cap: Option[Long], exactPairs: Option[Long]): (String, Long) = {
      val (wall, nPairs) =
        time(FuzzyJoin.selfJoinEdK(df, "name", 2, cap).count())
      val (sigRows, nBuckets, maxB, candPairs) =
        FuzzyJoin.sigCensus(df, "name", 2)
      val recall = exactPairs
        .map(e => f""","recall":${nPairs.toDouble / e}%.4f""").getOrElse("")
      (s"""{"corpus":"$corpus","scale":$scale,"n_names":${df.count()},""" +
        f""""wall_sec":$wall%.2f,"n_pairs":$nPairs,"sig_rows":$sigRows,""" +
        s""""n_buckets":$nBuckets,"max_bucket":$maxB,""" +
        s""""cand_pairs":$candPairs$recall}""", nPairs)
    }

    val legs = scales.flatMap { s =>
      val (dj, dPairs) = leg("dense", s, dense(spark, s), None, None)
      val (vj, _) = leg("dense_valved", s, dense(spark, s),
        Some(maxBucket), Some(dPairs))
      val (sj, _) = leg("sparse", s, sparse(spark, s), None, None)
      Seq(dj, vj, sj)
    }
    println(s"""{"metric":"ed2_probe","base_names":$BaseNames,""" +
      s""""max_bucket_valve":$maxBucket,"legs":[${legs.mkString(",")}]}""")
    spark.stop()
  }
}
