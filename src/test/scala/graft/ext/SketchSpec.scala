package graft.ext

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

class SketchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def counts(rows: (String, Long)*) = rows.toDF("term", "cnt")

  private def estMap(tc: org.apache.spark.sql.DataFrame, d: Int, w: Int) = {
    val sk = CountMin.sketch(tc, d, w)
    val terms = tc.select(col("term")).distinct()
    CountMin.estimates(terms, sk, d, w)
      .collect().map(r => r.getAs[String]("term") -> r.getAs[Long]("est_count"))
      .toMap
  }

  test("estimates are exact when width makes collisions impossible") {
    // 3 terms, w=64: P(collision) isn't zero in general, but for THESE
    // fixed md5 buckets we assert distinctness first, so exactness is
    // implied (est = exact when no bucket is shared in any row)
    val tc = counts("alpha" -> 3L, "beta" -> 5L, "gamma" -> 2L)
    val d = 4; val w = 64
    val distinctPerRow = (0 until d).forall { i =>
      Seq("alpha", "beta", "gamma").map(CountMin.bucket(_, i, w)).distinct.size == 3
    }
    assume(distinctPerRow) // document the precondition the fixture satisfies
    assert(estMap(tc, d, w) == Map("alpha" -> 3L, "beta" -> 5L, "gamma" -> 2L))
  }

  test("estimates never undercount, and collisions only overcount") {
    // w=2 forces collisions; est >= exact for every term
    val tc = counts("a" -> 10L, "b" -> 7L, "c" -> 1L, "d" -> 4L)
    val exact = Map("a" -> 10L, "b" -> 7L, "c" -> 1L, "d" -> 4L)
    val est = estMap(tc, 3, 2)
    exact.foreach { case (t, x) =>
      assert(est(t) >= x, s"$t undercounted: ${est(t)} < $x")
      assert(est(t) <= 22L) // can never exceed the total stream count
    }
  }

  test("sketch is partition-count invariant (merge is order-free sums)") {
    val tc = (1 to 200).map(i => (s"t${i % 17}", (i % 5 + 1).toLong))
      .toDF("term", "cnt")
    val one = CountMin.sketch(tc.repartition(1), 4, 32)
      .head().getAs[scala.collection.Seq[Long]]("cells").toList
    val many = CountMin.sketch(tc.repartition(13), 4, 32)
      .head().getAs[scala.collection.Seq[Long]]("cells").toList
    assert(one == many)
  }

  test("scala bucket equals the SQL hash60 expression bucket") {
    // the aggregator writes with the JVM md5, estimates read with the
    // Spark SQL md5 — any divergence breaks every estimate silently
    val terms = Seq("alpha", "the", "naïve", "x#y", "").toDF("term")
    val w = 256
    (0 until 4).foreach { i =>
      val sql = terms.select(col("term"),
        pmod(TextOps.hash60(concat(col("term"), lit("#"), lit(i.toString))),
          lit(w.toLong)).cast("int").as("b"))
        .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
      sql.foreach { case (t, b) =>
        assert(CountMin.bucket(t, i, w) == b, s"term '$t' row $i")
      }
    }
  }

  test("fixture corpus: every estimate bounded by exact + row-1 residual") {
    val docs = spark.read.parquet(s"${TestSpark.Sf0001}/documents.parquet")
    val tc = docs.select(
        explode(call_function("word_counts", col("text"))).as("tc"))
      .select(col("tc.term").as("term"), col("tc.cnt").cast("long").as("cnt"))
    val exact = tc.groupBy("term").agg(sum("cnt").as("exact_count"))
    val est = CountMin.estimates(exact, CountMin.sketch(tc, 4, 256), 4, 256)
    val bad = est.filter(col("est_count") < col("exact_count")).count()
    assert(bad == 0L)
  }
}
