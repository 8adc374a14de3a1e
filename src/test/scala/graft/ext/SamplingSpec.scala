package graft.ext

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class SamplingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val docs =
    spark.read.parquet(s"${TestSpark.Sf0001}/documents.parquet")

  test("stratifiedTopN: exactly n per stratum, deterministic, nested draws") {
    val s5 = Sampling.stratifiedTopN(docs, "source", "doc_id", 5)
      .select("source", "doc_id").as[(String, Long)].collect().toSet
    val again = Sampling.stratifiedTopN(docs, "source", "doc_id", 5)
      .select("source", "doc_id").as[(String, Long)].collect().toSet
    assert(s5 == again) // reproducible across runs
    val perStratum = s5.groupBy(_._1).map { case (_, v) => v.size }.toSet
    assert(perStratum == Set(5)) // every fixture stratum has >= 5 docs
    // a smaller draw is a PREFIX of a bigger one (same hash order), so
    // shrinking a sample never reshuffles what was already drawn
    val s3 = Sampling.stratifiedTopN(docs, "source", "doc_id", 3)
      .select("source", "doc_id").as[(String, Long)].collect().toSet
    assert(s3.subsetOf(s5))
  }

  test("applyMixPct: hash-gate membership is monotone in the rate") {
    def kept(pct: Int): Set[Long] =
      Sampling.applyMixPct(docs, "doc_id", lit(pct))
        .select("doc_id").as[Long].collect().toSet
    val k10 = kept(10)
    val k30 = kept(30)
    assert(k10.subsetOf(k30)) // raising a source's weight only ADDS docs
    val n = docs.count().toDouble
    assert(math.abs(k30.size / n - 0.30) < 0.1) // rate lands near target
    assert(kept(0).isEmpty && kept(100).size == n.toLong)
  }

  test("weightedTopN: deterministic, n rows, matches a local replay") {
    val got = Sampling.weightedTopN(docs, "doc_id", col("n_chars"), 50)
      .select("doc_id").as[Long].collect().toSet
    assert(got.size == 50)
    // local replay of the exact scheme: hash60 = first 15 md5 hex chars
    val local = docs.select("doc_id", "n_chars").as[(Long, Long)].collect()
      .map { case (id, nc) =>
        (hash60Local(id.toString) / math.max(nc, 1L), id) }
      .sorted.take(50).map(_._2).toSet
    assert(got == local)
    // determinism across invocations
    val again = Sampling.weightedTopN(docs, "doc_id", col("n_chars"), 50)
      .select("doc_id").as[Long].collect().toSet
    assert(got == again)
  }

  test("weightedTopN: inclusion frequency tracks weight") {
    // property over the SCHEME (pure local replay — 200 salted draws of
    // 100 from 1000 keys would be 200 Spark jobs for the same numbers):
    // keys carry weights 1..10; across salts, each weight class's
    // inclusion count must rise monotonically-ish and the heaviest
    // class must dominate the lightest by roughly its weight ratio
    val byWeight = scala.collection.mutable.Map[Long, Int]().withDefaultValue(0)
    for (salt <- 0 until 200) {
      val drawn = (1 to 1000)
        .map { k => val w = 1L + k % 10
          (hash60Local(s"$salt-$k") / w, k, w) }
        .sorted.take(100)
      drawn.foreach { case (_, _, w) => byWeight(w) += 1 }
    }
    val counts = (1L to 10L).map(byWeight)
    assert(counts.last > counts.head * 5,
      s"weight-10 keys should dominate weight-1 ~10x: $counts")
    // monotone in aggregate: each class at least ~its predecessor
    counts.sliding(2).foreach { case Seq(a, b) =>
      assert(b > a * 0.8, s"inclusion not tracking weight: $counts")
    }
  }

  test("weightedTopNWithEstimate: sample = weightedTopN + replayed est_weight") {
    val got = Sampling.weightedTopNWithEstimate(
        docs, "doc_id", col("n_chars"), 50)
      .select("doc_id", "est_weight").as[(Long, Long)].collect().toMap
    // the drawn rows are exactly weightedTopN's
    val plain = Sampling.weightedTopN(docs, "doc_id", col("n_chars"), 50)
      .select("doc_id").as[Long].collect().toSet
    assert(got.keySet == plain)
    // local replay of the threshold rule: p_(n+1) over (pri, key) order,
    // est = max(w, 2^60 div p_(51))
    val all = docs.select("doc_id", "n_chars").as[(Long, Long)].collect()
      .map { case (id, nc) =>
        val w = math.max(nc, 1L)
        ((hash60Local(id.toString) / w, id), w)
      }.sortBy(_._1)
    val ptau = all(50)._1._1
    val expected = all.take(50)
      .map { case ((_, id), w) => id -> math.max(w, (1L << 60) / math.max(ptau, 1L)) }
      .toMap
    assert(got == expected)
  }

  test("weightedTopNWithEstimate: est_weight = weight when n >= table size") {
    val nDocs = docs.count().toInt
    val got = Sampling.weightedTopNWithEstimate(
        docs, "doc_id", col("n_chars"), nDocs + 10)
      .select("doc_id", "n_chars", "est_weight")
      .as[(Long, Long, Long)].collect()
    assert(got.length == nDocs)
    got.foreach { case (id, nc, est) =>
      assert(est == math.max(nc, 1L), s"doc $id: full inclusion must carry w")
    }
  }

  test("weightedTopNWithEstimate: unbiased in expectation over salted draws") {
    // the Duffield-Lund-Thorup theorem, verified empirically on the
    // SCHEME (pure local replay — one Spark job per salt would run the
    // same numbers 300x slower): 1000 keys with weights 1..10, n = 100;
    // each salt is an independent deterministic draw, and the MEAN of
    // the per-draw est sums must converge on the exact population sum
    val keys = (1 to 1000).map(k => (k, 1L + k % 10))
    val exact = keys.map(_._2).sum
    val nSalts = 300
    val estimates = (0 until nSalts).map { salt =>
      val all = keys
        .map { case (k, w) => ((hash60Local(s"$k-s$salt") / w, k), w) }
        .sortBy(_._1)
      val ptau = all(100)._1._1
      all.take(100).map { case (_, w) =>
        math.max(w, (1L << 60) / math.max(ptau, 1L)) }.sum
    }
    // one Spark-side cross-check pins the engine to the replayed scheme
    // (the salt is appended to the STRING key exactly as prioritized does)
    val df = keys.toDF("k", "w")
    val sparkEst = Sampling.weightedTopNWithEstimate(
        df, "k", col("w"), 100, salt = "-s7")
      .agg(sum(col("est_weight"))).as[Long].head()
    assert(sparkEst == estimates(7),
      "Spark draw must replay the local scheme bit-for-bit")
    val mean = estimates.map(_.toDouble).sum / nSalts
    val relErr = math.abs(mean - exact) / exact.toDouble
    assert(relErr < 0.02,
      f"mean of $nSalts est sums $mean%.1f vs exact $exact (rel err $relErr%.4f)")
  }

  test("weightedTopN: fractional weights round half-up, never truncate to 0") {
    // quality scores in (0, 1] must NOT all collapse to the uniform draw:
    // round(0.4) = 0 -> clamp 1, round(2.6) = 3 — the draw must replay
    // with ROUNDED weights, which differs from truncation for 2.6 (2)
    val df = (1 to 500).map(k => (k, if (k % 2 == 0) 0.4 else 2.6))
      .toDF("k", "w")
    val got = Sampling.weightedTopN(df, "k", col("w"), 60)
      .select("k").as[Int].collect().toSet
    val local = (1 to 500)
      .map { k =>
        val w = math.max(math.round(if (k % 2 == 0) 0.4 else 2.6), 1L)
        (hash60Local(k.toString) / w, k)
      }.sorted.take(60).map(_._2).toSet
    assert(got == local)
    // and the heavier class dominates (truncation would make both weight 1)
    val heavy = got.count(_ % 2 == 1)
    assert(heavy > got.size / 2, s"weight-3 keys should dominate: $heavy/60")
  }

  test("weightedTopNPerStratum: n per stratum, weighted order within") {
    val got = Sampling.weightedTopNPerStratum(
        docs, "source", "doc_id", col("n_chars"), 7)
      .select("source", "doc_id").as[(String, Long)].collect()
    assert(got.groupBy(_._1).values.forall(_.length == 7))
    // per-stratum draw = the stratum's own weightedTopN
    val strata = docs.select("source").distinct().as[String].collect()
    strata.foreach { src =>
      val solo = Sampling.weightedTopN(
          docs.filter(col("source") === src), "doc_id", col("n_chars"), 7)
        .select("doc_id").as[Long].collect().toSet
      assert(got.filter(_._1 == src).map(_._2).toSet === solo, s"stratum $src")
    }
  }

  test("weightedTopNPerStratumWithEstimate: per-stratum draw = each " +
      "stratum's own global estimate") {
    // the stratified estimator must be EXACTLY the global estimator run
    // per stratum — same sample, same τ, same est_weight — so every
    // theorem proven for weightedTopNWithEstimate transfers per stratum
    val got = Sampling.weightedTopNPerStratumWithEstimate(
        docs, "source", "doc_id", col("n_chars"), 7)
      .select("source", "doc_id", "est_weight")
      .as[(String, Long, Long)].collect()
    assert(got.groupBy(_._1).values.forall(_.length == 7))
    val strata = docs.select("source").distinct().as[String].collect()
    strata.foreach { src =>
      val solo = Sampling.weightedTopNWithEstimate(
          docs.filter(col("source") === src), "doc_id", col("n_chars"), 7)
        .select("doc_id", "est_weight").as[(Long, Long)].collect().toSet
      assert(got.filter(_._1 == src).map(t => (t._2, t._3)).toSet === solo,
        s"stratum $src")
    }
  }

  test("weightedTopNPerStratumWithEstimate: unbiased per stratum over " +
      "salted draws") {
    // the per-stratum Duffield-Lund-Thorup claim, verified empirically
    // on the SCHEME (local replay — one Spark job per salt would run
    // the same numbers 300x slower): 4 strata x 400 keys with weights
    // 1..10, n = 50 per stratum; for EACH stratum the mean of the
    // per-draw est sums over salts must converge on that stratum's
    // exact sum
    val strata = (0 until 4).map { s =>
      s -> (1 to 400).map(k => (s * 1000 + k, 1L + (s + k) % 10))
    }.toMap
    val nSalts = 300
    val n = 50
    def draw(s: Int, salt: String): Long = {
      val all = strata(s)
        .map { case (k, w) => ((hash60Local(s"$k$salt") / w, k), w) }
        .sortBy(_._1)
      if (all.length <= n) all.map(_._2).sum
      else {
        val ptau = all(n)._1._1
        all.take(n).map { case (_, w) =>
          math.max(w, (1L << 60) / math.max(ptau, 1L)) }.sum
      }
    }
    strata.keys.foreach { s =>
      val exact = strata(s).map(_._2).sum
      val mean = (0 until nSalts).map(salt => draw(s, s"-s$salt"))
        .map(_.toDouble).sum / nSalts
      val relErr = math.abs(mean - exact) / exact.toDouble
      assert(relErr < 0.05,
        f"stratum $s: mean est $mean%.1f vs exact $exact (rel $relErr%.4f)")
    }
    // one Spark-side cross-check pins the engine to the replayed scheme
    // per stratum (salt appended to the STRING key as prioritized does)
    val df = strata.toSeq.flatMap { case (s, ks) =>
      ks.map { case (k, w) => (s"str$s", k, w) } }
      .toDF("stratum", "k", "w")
    val sparkEst = Sampling.weightedTopNPerStratumWithEstimate(
        df, "stratum", "k", col("w"), n, salt = "-s7")
      .groupBy(col("stratum")).agg(sum(col("est_weight")).as("e"))
      .as[(String, Long)].collect().toMap
    strata.keys.foreach { s =>
      assert(sparkEst(s"str$s") == draw(s, "-s7"),
        s"stratum $s: Spark draw must replay the local scheme bit-for-bit")
    }
  }

  /** First 15 hex chars of md5, as a long — TextOps.hash60's contract. */
  private def hash60Local(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.take(8).map("%02x".format(_)).mkString.take(15), 16)
  }
}
