package graft.operators

import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.land.Landing

/** Scale plumbing: salted joins/aggregations preserve exact semantics,
  * and bucketed tables join with zero exchanges. */
class ScaleOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val skewed = {
    // one hot key (0) with 5k rows, a tail of 100 normal keys
    val hot = (1 to 5000).map(i => (0L, i.toLong))
    val tail = (1 to 100).flatMap(k => (1 to 10).map(i => (k.toLong, i.toLong)))
    (hot ++ tail).toDF("k", "v")
  }
  private lazy val dim = (0 to 100).map(k => (k.toLong, s"name$k")).toDF("k", "name")

  test("saltedJoin equals the plain join on a skewed key histogram") {
    val plain = skewed.join(dim, "k")
      .groupBy("k", "name").agg(count(lit(1)).as("n"), sum("v").as("s"))
      .orderBy("k").collect().toSeq
    val salted = Skew.saltedJoin(skewed, dim, "k", salts = 8)
      .groupBy("k", "name").agg(count(lit(1)).as("n"), sum("v").as("s"))
      .orderBy("k").collect().toSeq
    assert(salted == plain)
  }

  test("saltedSumCount equals the plain aggregation") {
    val plain = skewed.groupBy("k")
      .agg(sum("v").as("sum_value"), count(lit(1)).as("n"))
      .orderBy("k").collect().toSeq
    val salted = Skew.saltedSumCount(skewed, "k", col("v"), salts = 8)
      .orderBy("k").collect().toSeq
    assert(salted == plain)
  }

  test("bucketed tables equi-join with ZERO shuffle exchanges") {
    val o = graft.Tables.t(spark, TestSpark.Sf0001, "orders")
    val c = graft.Tables.t(spark, TestSpark.Sf0001, "customer")
    Landing.bucketedTable(o, "b_orders", Seq("o_custkey"), 8, Seq("o_custkey"))
    Landing.bucketedTable(c, "b_customer", Seq("c_custkey"), 8, Seq("c_custkey"))
    try {
      val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      try {
        val joined = spark.table("b_orders")
          .join(spark.table("b_customer"),
            col("o_custkey") === col("c_custkey"))
        val plan = joined.queryExecution.executedPlan
        val inner = plan match {
          case a: AdaptiveSparkPlanExec => a.executedPlan
          case p => p
        }
        assert(inner.collect { case s: ShuffleExchangeLike => s }.isEmpty,
          inner.toString) // bucket layout replaces both exchanges
        assert(joined.count() == o.join(c,
          o("o_custkey") === c("c_custkey")).count())
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    } finally {
      spark.sql("drop table if exists b_orders")
      spark.sql("drop table if exists b_customer")
    }
  }
}
