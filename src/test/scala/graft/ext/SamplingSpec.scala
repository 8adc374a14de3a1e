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
}
