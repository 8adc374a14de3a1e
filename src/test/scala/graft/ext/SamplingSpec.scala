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

  /** First 15 hex chars of md5, as a long — TextOps.hash60's contract. */
  private def hash60Local(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.take(8).map("%02x".format(_)).mkString.take(15), 16)
  }
}
