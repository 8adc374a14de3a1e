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

  test("estimates are exact when no bucket collides") {
    // deterministically pick 3 terms whose fixed buckets are pairwise
    // distinct in EVERY row — est = exact is then implied
    val d = 4; val w = 64
    val pool = (0 until 50).map(i => s"term$i")
    val chosen = pool.foldLeft(Vector.empty[String]) { (acc, t) =>
      val ok = acc.size < 3 && (0 until d).forall { i =>
        !acc.exists(a => CountMin.bucket(a, i, w) == CountMin.bucket(t, i, w))
      }
      if (ok) acc :+ t else acc
    }
    assert(chosen.size == 3, "pool exhausted without 3 collision-free terms")
    val exact = chosen.zipWithIndex.map { case (t, i) => t -> (i + 2L) }.toMap
    val tc = counts(exact.toSeq: _*)
    assert(estMap(tc, d, w) == exact)
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

  test("scala bucket equals the SQL hash60 + KM-mix expression bucket") {
    // the aggregator writes with the JVM md5 + integer mix, estimates
    // read with the Spark SQL md5 + the same mix — any divergence
    // breaks every estimate silently
    val terms = Seq("alpha", "the", "naïve", "x#y", "").toDF("term")
    val w = 256
    (0 until 4).foreach { i =>
      val sql = terms
        .withColumn("_h", TextOps.hash60(col("term")))
        .select(col("term"), expr(
          s"cast((_h % 1073741824 + $i * (_h div 1073741824)) % $w as int)")
          .as("b"))
        .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
      sql.foreach { case (t, b) =>
        assert(CountMin.bucket(t, i, w) == b, s"term '$t' row $i")
      }
    }
  }

  test("heavy hitters are exact: sketch prefilter loses no true hitter") {
    // w=2 maximizes collisions (worst case for false positives); the
    // exact verification pass must still produce exactly the true
    // > threshold set
    val tc = counts("hot" -> 100L, "warm" -> 40L, "cool" -> 5L,
      "cold" -> 2L, "frozen" -> 1L)
    val hh = CountMin.heavyHitters(tc, d = 3, w = 2, threshold = 30L)
      .collect().map(r => r.getAs[String]("term") -> r.getAs[Long]("n")).toMap
    assert(hh == Map("hot" -> 100L, "warm" -> 40L))
  }

  test("native cms_est equals the SQL estimate path and stays codegen") {
    val tc = counts("alpha" -> 3L, "beta" -> 5L, "gamma" -> 2L, "the" -> 9L)
    val d = 4; val w = 32
    val sk = CountMin.sketch(tc, d, w)
    val sqlEst = CountMin.estimates(tc.select(col("term")), sk, d, w)
      .collect().map(r => r.getAs[String]("term") -> r.getAs[Long]("est_count"))
      .toMap
    val cells = sk.head().getAs[scala.collection.Seq[Long]]("cells").toArray
    val nat = org.apache.spark.sql.GraftShims.column(
      graft.functions.CmsEst(
        org.apache.spark.sql.GraftShims.expression(col("term")),
        new CountMin.Evaluator(cells, d, w)))
    val df = tc.select(col("term"), nat.as("est_count"))
    val natEst = df.collect()
      .map(r => r.getAs[String]("term") -> r.getAs[Long]("est_count")).toMap
    assert(natEst == sqlEst)
    // the filter shape must stay inside whole-stage codegen: no
    // ScalaUDF/BatchEval nodes in the plan (a parquet-backed frame —
    // a local relation would be constant-folded away entirely)
    val docs = spark.read.parquet(s"${TestSpark.Sf0001}/documents.parquet")
    val natDocs = org.apache.spark.sql.GraftShims.column(
      graft.functions.CmsEst(
        org.apache.spark.sql.GraftShims.expression(col("source")),
        new CountMin.Evaluator(cells, d, w)))
    val plan = docs.filter(natDocs > lit(4L))
      .queryExecution.executedPlan.toString
    // the "*(n)" prefix marks a whole-stage-codegen'd operator in
    // executedPlan.toString
    assert(!plan.contains("ScalaUDF") && plan.contains("*(1) Filter"))
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
