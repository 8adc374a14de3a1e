package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Runtime bloom-filter join pruning: Spark injects a bloom filter built
  * from a selective (filtered) join side into the big side's scan, so a
  * shuffle join at 100 TB reads/shuffles only rows that can match. The
  * feature is ON by default (`spark.sql.optimizer.runtime.bloomFilter
  * .enabled=true`) but gated by size thresholds (application side >=
  * 10 GB scan) that local fixtures never reach — this spec lowers the
  * thresholds to prove the engine's plans ARE the shape the optimizer
  * prunes at cluster scale, and that the filtered result stays correct.
  */
class RuntimeFilterSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def withConf[A](pairs: (String, String)*)(body: => A): A = {
    val prev = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("a selective dim filter injects a bloom runtime filter into the fact scan") {
    withConf(
      // local fixtures are ~MBs; drop the cluster-scale gates so the
      // rewrite fires here exactly as it would on a 100 TB scan
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      // force the shuffle-join shape the bloom filter exists for (a
      // broadcast join already prunes via its build side)
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1") {
      val li = spark.read.parquet(s"${TestSpark.Sf0001}/lineitem.parquet")
      val ord = spark.read.parquet(s"${TestSpark.Sf0001}/orders.parquet")
        .where(col("o_orderpriority") === "1-URGENT")
      val joined = li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("might_contain"),
        s"expected an injected bloom runtime filter (might_contain) in:\n$plan")

      // and the rewrite must not change the answer
      val n = joined.collect().map(_.getLong(1)).sum
      val expect = li.join(
        spark.read.parquet(s"${TestSpark.Sf0001}/orders.parquet")
          .where(col("o_orderpriority") === "1-URGENT"),
        col("l_orderkey") === col("o_orderkey")).count()
      assert(n == expect && n > 0)
    }
  }

  test("an over-threshold creation side blocks injection (the gate actually gates)") {
    withConf(
      // identical shuffle-join setup to the positive test, EXCEPT the
      // creation-side cap is 1 byte — the filtered orders side exceeds
      // it, so building the bloom filter is refused even though the
      // application side qualifies. This fails if the gating logic ever
      // stops being consulted.
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "1",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1") {
      val li = spark.read.parquet(s"${TestSpark.Sf0001}/lineitem.parquet")
      val ord = spark.read.parquet(s"${TestSpark.Sf0001}/orders.parquet")
        .where(col("o_orderpriority") === "1-URGENT")
      val plan = li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .queryExecution.executedPlan.toString
      assert(!plan.contains("might_contain"))
    }
  }
}
