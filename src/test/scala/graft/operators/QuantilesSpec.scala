package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class QuantilesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("discrete quantiles select the exact rank-ceil(p*n) element per group") {
    val df = Seq.tabulate(10)(i => ("a", (i + 1).toDouble)) // 1..10
      .toDF("g", "v")
    val q = Quantiles.exactDiscrete(df, "v", Seq("g"), Seq(0.25, 0.5, 0.75, 1.0))
      .orderBy("p").as[(String, Double, Double)].collect().toSeq
    // ceil(.25*10)=3, ceil(.5*10)=5, ceil(.75*10)=8, ceil(1*10)=10
    assert(q == Seq(("a", 0.25, 3.0), ("a", 0.5, 5.0), ("a", 0.75, 8.0), ("a", 1.0, 10.0)))
  }

  test("single-element group: every quantile is that element (rank clamps to 1)") {
    val df = Seq(("solo", 42.0)).toDF("g", "v")
    val q = Quantiles.exactDiscrete(df, "v", Seq("g"), Seq(0.01, 0.5, 1.0))
      .as[(String, Double, Double)].collect()
    assert(q.length == 3 && q.forall(_._3 == 42.0))
  }

  test("groups are independent: each gets its own quantiles") {
    val df = (Seq.tabulate(4)(i => ("x", (i + 1).toDouble)) ++
      Seq.tabulate(100)(i => ("y", (i + 1).toDouble))).toDF("g", "v")
    val q = Quantiles.exactDiscrete(df, "v", Seq("g"), Seq(0.5))
      .orderBy("g").as[(String, Double, Double)].collect().toSeq
    assert(q == Seq(("x", 0.5, 2.0), ("y", 0.5, 50.0)))
  }
}
