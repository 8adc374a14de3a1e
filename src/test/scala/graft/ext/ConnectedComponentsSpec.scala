package graft.ext

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class ConnectedComponentsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Runs BOTH solver paths (driver union-find and distributed
    * star-contraction) and asserts they agree. */
  private def comps(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    val df = pairs.toDF("doc_a", "doc_b")
    val local = ConnectedComponents.components(df)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val dist = ConnectedComponents.components(df, localSolveMax = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(local == dist, "union-find and star-contraction disagree")
    local
  }

  test("chain, star and disjoint components all resolve to the min id") {
    assert(comps(Seq((1L, 2L), (2L, 3L))) ==
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L))                 // chain
    assert(comps(Seq((5L, 1L), (5L, 2L), (5L, 3L))) ==
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 5L -> 1L))       // star onto a leaf min
    assert(comps(Seq((1L, 2L), (10L, 11L), (11L, 12L))) ==
      Map(1L -> 1L, 2L -> 1L, 10L -> 10L, 11L -> 10L, 12L -> 10L))
  }

  test("a long path converges (log-round star contraction, not diameter walks)") {
    val path = (1L to 64L).sliding(2).map(w => (w(0), w(1))).toSeq
    val m = comps(path)
    assert(m.size == 64 && m.values.forall(_ == 1L))
  }

  test("empty pair set yields an empty mapping") {
    assert(comps(Nil).isEmpty)
  }

  /** Planted 3-chain: endpoints overlap the middle doc at word-3-gram
    * Jaccard ≈ 0.74 but each other at ≈ 0.54 — so with threshold 0.6 the
    * verified pair graph is exactly {(1,3), (2,3)} and the two policies
    * diverge: greedy keeps both endpoints, CC collapses the chain. */
  private def chainDocs() = {
    val w = (1 to 130).map(i => s"w$i")
    Seq(
      (1L, w.slice(0, 102).mkString(" ")),   // shingles 1..100
      (2L, w.slice(30, 132).mkString(" ")),  // shingles 31..130
      (3L, w.slice(15, 117).mkString(" ")))  // shingles 16..115 (the middle)
      .toDF("doc_id", "text")
  }

  test("3-chain: exact pair graph is (1,3),(2,3) and NOT (1,2)") {
    val pairs = Dedup.ngramJaccardPairs(chainDocs(), threshold = 0.6)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 3L), (2L, 3L)))
  }

  test("3-chain: greedy keeps both endpoints, CC keeps only the min — the policies diverge") {
    val d = chainDocs()
    val greedy = Curation.dropNearDups(d, 0.6)
      .select("doc_id").as[Long].collect().toSet
    val cc = Curation.dropNearDupsCC(d, 0.6)
      .select("doc_id").as[Long].collect().toSet
    assert(greedy == Set(1L, 2L)) // 2 is never a doc_b, so greedy misses it
    assert(cc == Set(1L))         // {1,2,3} is one component; survivor = min
  }
}
