package graft.ext

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class CurationSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("curation funnel: each stage only removes documents") {
    val docs = spark.read.parquet(s"${TestSpark.Sf0001}/documents.parquet")
      .select("doc_id", "text")
    val f = Curation.funnel(docs).orderBy("stage")
      .as[(String, Long)].collect().toSeq
    val counts = f.map(_._2)
    assert(f.map(_._1) == Seq("1_input", "2_after_exact_dedup",
      "3_after_near_dedup", "4_after_quality"))
    assert(counts.zip(counts.tail).forall { case (a, b) => b <= a })
    assert(counts.head == 500)
    assert(counts(1) == 500)      // fixture has no exact dups
    assert(counts(2) < 500)       // planted near-dups removed
    assert(counts.last > 0)
  }

  test("keepBestPerCluster survives the higher-QUALITY doc, not the lower id") {
    // doc 1 and doc 2 are near-dups (one word changed); doc 2 carries a
    // much longer, stopword-rich body -> higher quality score. The min-id
    // policy would keep 1; the best-per-cluster policy must keep 2.
    val base = (1 to 60).map(i => s"tok$i").mkString(" ")
    val enrich = " the a of and in to " * 10
    val d = Seq(
      (1L, base + " endA"),
      (2L, base + " endB" + enrich),
      (9L, "totally unrelated content standing alone far from the cluster")
    ).toDF("doc_id", "text")
    val kept = Curation.keepBestPerCluster(d, threshold = 0.6)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(kept == Seq(2L, 9L))
  }

  test("dropExactDups keeps exactly the min-id survivor per text") {
    val d = Seq((1L, "same text"), (5L, "same text"), (3L, "other"))
      .toDF("doc_id", "text")
    val kept = Curation.dropExactDups(d).select("doc_id")
      .as[Long].collect().sorted
    assert(kept.toSeq == Seq(1L, 3L))
  }

  test("dropNearDups removes the greedy doc_b side of each pair") {
    val docs = spark.read.parquet(s"${TestSpark.Sf0001}/documents.parquet")
      .select("doc_id", "text")
    val pairs = Dedup.minhashNearDupPairs(docs, 0.6)
      .select("doc_b").distinct().as[Long].collect().toSet
    val kept = Curation.dropNearDups(docs, 0.6)
      .select("doc_id").as[Long].collect().toSet
    assert((kept & pairs).isEmpty)
    assert(kept.size == 500 - pairs.size)
  }
}
