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

  test("targeted salting detects the hot key, salts only it, and stays exact") {
    val plain = skewed.groupBy("k")
      .agg(sum("v").as("sum_value"), count(lit(1)).as("n"))
      .orderBy("k").collect().toSeq
    // full-fraction sample -> detection is exact: k=0 (5000 rows) is the
    // only key past the 1000-row threshold
    val targeted = Skew.saltedSumCountTargeted(skewed, "k", col("v"),
      salts = 8, hotRowThreshold = 1000L, sampleFraction = 1.0)
      .orderBy("k").collect().toSeq
    assert(targeted == plain)
    // no key past the threshold -> single-phase plan, same values
    val untouched = Skew.saltedSumCountTargeted(skewed, "k", col("v"),
      salts = 8, hotRowThreshold = 100000L, sampleFraction = 1.0)
      .orderBy("k").collect().toSeq
    assert(untouched == plain)
    // override path: caller-supplied hot set (warehouse stats), same values
    val overridden = Skew.saltedSumCountTargeted(skewed, "k", col("v"),
      salts = 8, hotRowThreshold = 1000L,
      hotKeysOverride = Some(Seq(0L)))
      .orderBy("k").collect().toSeq
    assert(overridden == plain)
  }

  test("targeted salting spreads ONLY the hot key over salt groups") {
    // observe phase-1 grouping directly: hot key 0 lands in >1 salt
    // group, every tail key stays in exactly one
    val salted = skewed.withColumn("_salt",
        when(col("k").isin(0L),
          pmod(xxhash64(monotonically_increasing_id()), lit(8)))
          .otherwise(lit(0L)))
      .groupBy(col("k"), col("_salt")).agg(count(lit(1)).as("c"))
      .groupBy(col("k")).agg(countDistinct(col("_salt")).as("groups"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(salted(0L) > 1L, "hot key should spread over several salt groups")
    assert((1L to 100L).forall(salted(_) == 1L), "tail keys must not be salted")
  }

  test("AQE splits the skewed sort-merge join partition at runtime (the no-salt path)") {
    val tuned = Map(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1", // force sort-merge
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      // production defaults (256 MB / factor 5) scaled to fixture bytes
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "32KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16KB")
    val prev = tuned.keys.map(k => k -> spark.conf.getOption(k)).toMap
    tuned.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // 90% of the big side lands on key 0 -> one oversized shuffle partition
      val big = spark.range(0, 200000).select(
        when(col("id") % 10 =!= 0, lit(0L)).otherwise(col("id")).as("k"),
        concat(lit("payload-"), col("id")).as("payload"))
      val dim = spark.range(0, 200000).select(col("id").as("k"),
        (col("id") * 2).as("w"))
      val joined = big.join(dim, "k")
      graft.Bench.materialize(joined)
      val aqe = joined.queryExecution.executedPlan
        .collectFirst { case a: AdaptiveSparkPlanExec => a }
        .getOrElse(fail("no adaptive plan"))
      // the final plan nests the join inside query-stage leaves that
      // SparkPlan.collect does not traverse, so assert on the rendered
      // plan: the join node must carry skew=true and the big side's
      // shuffle read must have been split
      val plan = aqe.executedPlan.toString
      assert(plan.contains("SortMergeJoin(skew=true)") ||
        plan.contains("ShuffledHashJoin") && plan.contains("skew=true"),
        s"AQE did not rewrite the skewed join:\n$plan")
      assert(plan.contains("AQEShuffleRead coalesced and skewed"),
        s"skewed shuffle read missing:\n$plan")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("clusteredParquet: files cover disjoint ranges, so min/max stats prune") {
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    import scala.jdk.CollectionConverters._
    val dir = java.nio.file.Files.createTempDirectory("graft-cluster").toString + "/orders"
    val orders = graft.Tables.t(spark, TestSpark.Sf0001, "orders")
    Landing.clusteredParquet(orders, dir, Seq("o_orderkey"), nFiles = 8)

    val conf = spark.sparkContext.hadoopConfiguration
    val ranges = new java.io.File(dir).listFiles
      .filter(_.getName.endsWith(".parquet")).toSeq.map { f =>
        val r = ParquetFileReader.open(HadoopInputFile.fromPath(
          new org.apache.hadoop.fs.Path(f.getPath), conf))
        try {
          val stats = r.getFooter.getBlocks.asScala.map(_.getColumns.asScala
            .find(_.getPath.toDotString == "o_orderkey").get.getStatistics)
          (stats.map(_.genericGetMin.asInstanceOf[java.lang.Long].longValue).min,
            stats.map(_.genericGetMax.asInstanceOf[java.lang.Long].longValue).max)
        } finally r.close()
      }.sortBy(_._1)
    assert(ranges.size == 8)
    // every file's range is disjoint from the next: a predicate on the
    // cluster column can skip whole files on footer stats alone
    ranges.sliding(2).foreach { case Seq((_, aMax), (bMin, _)) =>
      assert(aMax <= bMin, s"overlapping file ranges: $ranges")
    }
    // and the predicate actually reaches the scan
    val q = spark.read.parquet(dir).filter(col("o_orderkey") === 42L)
    val formatted = q.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(formatted.contains("PushedFilters") && formatted.contains("o_orderkey"))
    assert(q.count() <= orders.filter(col("o_orderkey") === 42L).count())
  }

  test("Q6 shape: every predicate reaches the parquet scan, columns pruned") {
    val q = graft.SparkEntry.queries("q_tpch_revenue_gap")(
      spark, TestSpark.Sf0001)
    val formatted = q.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    // all three value predicates pushed — a scan that filters post-read
    // re-reads the whole fact table at 100 TB
    Seq("l_shipdate", "l_discount", "l_quantity").foreach { c =>
      assert(formatted.contains(s"($c,"), s"$c not in PushedFilters:\n$formatted")
    }
    // projection pruning: the 4 referenced columns only
    val read = formatted.linesIterator.find(_.contains("ReadSchema")).get
    assert(!read.contains("l_orderkey") && !read.contains("l_returnflag"),
      s"scan reads unused columns: $read")
  }

  test("runtime bloom filter prunes the fact side of a selective join") {
    val dir = java.nio.file.Files.createTempDirectory("graft-bloom").toString
    // parquet-backed (the injection rule keys off scan statistics)
    spark.range(0, 200000).selectExpr("id AS k", "id * 7 AS payload")
      .write.parquet(s"$dir/fact")
    spark.range(0, 2000).selectExpr("id AS k", "id % 50 AS attr")
      .write.parquet(s"$dir/dim")
    val tuned = Map(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1", // force a shuffle join
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      // production thresholds (10 MB creation / 10 GB application side)
      // scaled down to fixture bytes
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "10MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "1KB")
    val prev = tuned.keys.map(k => k -> spark.conf.getOption(k)).toMap
    tuned.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val fact = spark.read.parquet(s"$dir/fact")
      val dim = spark.read.parquet(s"$dir/dim").filter(col("attr") === 3)
      val joined = fact.join(dim, "k")
      // the injected runtime filter evaluates dim's bloom filter against
      // every fact row BEFORE the shuffle — at 100 TB that's the
      // difference between shuffling the whole fact table and ~1/50 of it
      val optimized = joined.queryExecution.optimizedPlan.toString
      assert(optimized.contains("bloom_filter_agg") ||
        optimized.contains("BloomFilterMightContain") ||
        optimized.contains("might_contain"),
        s"no runtime bloom filter injected:\n$optimized")
      assert(joined.count() == 40L) // 2000/50 dim keys, one fact row each
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
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
