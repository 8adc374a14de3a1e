package graft.ext

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Reciprocal-rank fusion against a local replay: integer contribution
  * arithmetic, missing-from-one-ranker candidates, tie-breaks, and the
  * top-k cut. */
class RrfFuseSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("rrfFuse matches a local integer replay") {
    // two rankers over two queries; candidate 30 appears in only one
    // ranking, candidates 10/20 swap ranks across rankers (a tie in
    // fused score -> id tie-break)
    val a = Seq((0L, 10L, 1L), (0L, 20L, 2L), (0L, 30L, 3L),
      (1L, 10L, 1L), (1L, 20L, 2L)).toDF("query_id", "id", "rnk")
    val b = Seq((0L, 20L, 1L), (0L, 10L, 2L),
      (1L, 40L, 1L)).toDF("query_id", "id", "rnk")
    val got = Retrieval.rrfFuse(Seq(a, b), k = 3)
      .orderBy("query_id", "rnk")
      .select("query_id", "rnk", "id", "rrf_score")
      .as[(Long, Long, Long, Long)].collect().toSeq

    def c(r: Long) = 1000000000000L / (60L + r)
    // local replay
    val want = Seq(
      // q0: 10 -> c1+c2, 20 -> c2+c1 (tie, id asc), 30 -> c3
      (0L, 1L, 10L, c(1) + c(2)), (0L, 2L, 20L, c(2) + c(1)),
      (0L, 3L, 30L, c(3)),
      // q1: 10 -> c1, 40 -> c1 (tie, id asc), 20 -> c2
      (1L, 1L, 10L, c(1)), (1L, 2L, 40L, c(1)), (1L, 3L, 20L, c(2)))
    assert(got === want)
  }

  test("k cuts after fusion, not before") {
    val a = (1L to 10L).map(i => (0L, i, i)).toDF("query_id", "id", "rnk")
    val b = Seq((0L, 10L, 1L)).toDF("query_id", "id", "rnk")
    // id 10 is rank 10 lexically but rank 1 semantically: fused it must
    // beat ids 3..9 and survive a k=3 cut
    val got = Retrieval.rrfFuse(Seq(a, b), k = 3)
      .select("id").as[Long].collect().toSet
    assert(got.contains(10L))
    assert(got.size === 3)
  }
}
