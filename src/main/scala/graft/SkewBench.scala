package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.PartialReducerPartitionSpec
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, AQEShuffleReadExec, QueryStageExec}

/** Skewed-key scale evidence — the companion to [[ScaleBench]]'s
  * uniform replicas. The replica generator keeps every key's frequency
  * flat, so it never exercises the two skew defenses the engine
  * documents ([[graft.operators.Skew]]): AQE's runtime skew-join split
  * for sort-merge joins, and two-phase salted aggregation for hot
  * grouping keys. This bench builds a zipf-hot-key variant of a scaled
  * lineitem — a deterministic 30% of rows remapped onto 3 hot order
  * keys — and demonstrates both defenses ENGAGING, with the evidence in
  * the executed plan, not just wall time:
  *
  *  - join: lineitem ⋈ orders forced to sort-merge (auto-broadcast
  *    off) with the skew-split thresholds sized for the data scale; the
  *    census counts `PartialReducerPartitionSpec`s in the final
  *    adaptive plan's AQEShuffleReads — each one is a piece of a hot
  *    partition the runtime split.
  *  - agg: plain `groupBy(hot key)` vs [[graft.operators.Skew
  *    .saltedSumCount]]; the salted plan's extra exchange spreads each
  *    hot key over `salts` reducers before the final combine. The
  *    record keeps both timings honestly: salting EVERY key multiplies
  *    the pre-aggregation's group cardinality by up to `salts` on the
  *    uniform tail, so at this scale — where map-side partial
  *    aggregation already absorbs the hot keys — salted costs ~2x
  *    plain. It is the defense to reach for only when one key's
  *    partials still flood a single reducer (orders of magnitude
  *    hotter than this fixture), and production salting should target
  *    DETECTED hot keys, not the whole keyspace — the third A/B leg
  *    runs [[graft.operators.Skew.saltedSumCountTargeted]] (sample the
  *    histogram, salt only the flagged keys) to show the tail paying
  *    nothing. Results must stay identical across all three — that part
  *    is asserted.
  *
  * Prints ONE JSON line. Usage:
  * runMain graft.SkewBench [scaledDir] [skewDir] [skewThreshold] [advisorySize]
  * (scaledDir must already hold a ScaleBench-generated replica set;
  * the thresholds default for a 10×-replica dir and should scale with
  * the data — e.g. 32m/16m for a 100× dir.)
  */
object SkewBench {

  /** Deterministic zipf-ish remap: rows whose orderkey lands in 3
    * residue classes mod 10 collapse onto 3 hot keys → those keys each
    * hold ~10% of ALL rows while the rest keep the uniform tail. */
  def skewLineitem(li: DataFrame, hot: Seq[Long]): DataFrame =
    li.withColumn("l_orderkey",
      when(pmod(col("l_orderkey"), lit(10)) === 0, lit(hot(0)))
        .when(pmod(col("l_orderkey"), lit(10)) === 1, lit(hot(1)))
        .when(pmod(col("l_orderkey"), lit(10)) === 2, lit(hot(2)))
        .otherwise(col("l_orderkey")))

  /** Skew-split pieces in the FINAL adaptive plan: AQE replaces a
    * skewed reducer partition with one PartialReducerPartitionSpec per
    * split piece (join side mirrors with replicated full reads), so a
    * nonzero count is the runtime split having fired. */
  def countSkewSplits(df: DataFrame): Int = {
    // query stages are LEAF nodes (collect does not descend into
    // stage.plan), and once the runtime wraps the join subtree in the
    // next stage its AQEShuffleReads live INSIDE that leaf — recurse
    // through both wrappers explicitly
    def walk(p: org.apache.spark.sql.execution.SparkPlan): Int =
      p.collect {
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
        case q: QueryStageExec => walk(q.plan)
        case r: AQEShuffleReadExec =>
          r.partitionSpecs.count(_.isInstanceOf[PartialReducerPartitionSpec])
      }.sum
    walk(df.queryExecution.executedPlan)
  }

  private def time(body: => Unit): Double = {
    val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val scaled = args.headOption.getOrElse("/tmp/graft_sf1")
    val out = if (args.length > 1) args(1) else scaled + "_skew"
    val skewThreshold = if (args.length > 2) args(2) else "1m"
    val advisory = if (args.length > 3) args(3) else "512k"
    val spark = Sessions.build(Sessions.cpusFromEnv, "graft-skewbench")
    spark.sparkContext.setLogLevel("WARN")

    val orders = spark.read.parquet(s"$scaled/orders.parquet")
    val hot = orders.select(col("o_orderkey")).orderBy(col("o_orderkey"))
      .limit(3).collect().map(_.getLong(0)).toSeq
    val liPath = s"$out/lineitem.parquet"
    if (!new java.io.File(s"$out/_GRAFT_COMPLETE").exists()) {
      // scatter replica copies before writing: ScaleBench's explode-based
      // replication leaves the N copies of each base row ADJACENT, and
      // once the remap gives them identical hot keys, lz4 collapses them
      // to ~1 byte/row — the hot partitions then measure light in the
      // map statistics AQE reads, hiding genuine 5x row skew. Real
      // skewed rows are not consecutive duplicates; repartitioning on
      // l_partkey (replica-shifted, so copies scatter) restores a
      // realistic bytes-per-row before the fixture is written.
      skewLineitem(spark.read.parquet(s"$scaled/lineitem.parquet"), hot)
        .repartition(64, col("l_partkey"))
        .write.mode("overwrite").parquet(liPath)
      new java.io.File(s"$out/_GRAFT_COMPLETE").createNewFile()
    }
    val li = spark.read.parquet(liPath)
    val nRows = li.count()
    val hotShare = li.filter(col("l_orderkey").isin(hot: _*)).count().toDouble / nRows

    // ---- the skewed JOIN under AQE skew-split: force sort-merge and
    // size the split thresholds for the fixture (production defaults
    // target 256 MB partitions; the principle — split when a partition
    // is far over the median — is size-relative)
    val joinConf = Map(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> skewThreshold,
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> advisory)
    if (sys.env.contains("GRAFT_SKEW_DEBUG"))
      org.apache.logging.log4j.core.config.Configurator.setLevel(
        "org.apache.spark.sql.execution.adaptive",
        org.apache.logging.log4j.Level.DEBUG)
    val prev = joinConf.keys.map(k => k -> spark.conf.getOption(k)).toMap
    joinConf.foreach { case (k, v) => spark.conf.set(k, v) }
    var lastPlan: Option[org.apache.spark.sql.execution.SparkPlan] = None
    val (joinSec, joinSecNoSplit, nSkewSplits, joinRows) =
      try {
        // the aggregation references a realistic payload (three
        // distinct-valued doubles + a timestamp) so shuffle BYTES track
        // rows: AQE's skew detection reads compressed per-partition map
        // sizes, and a hot partition whose rows are just (constant key,
        // one double) lz4-compresses to under 1 byte/row — 5x the rows
        // measured as 1.3x the bytes, under every sane threshold. Real
        // joins carry real columns; a genuinely narrow hot shuffle needs
        // the salting defense instead (below), not AQE.
        def q() = li.join(orders, col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("n"), sum(col("l_quantity")).as("qty"),
            sum(col("l_extendedprice") * (lit(1.0d) - col("l_discount"))).as("revenue"),
            max(col("l_shipdate")).as("last_ship"))
        Bench.materialize(q()) // warm
        // A/B: same forced-SMJ join with the skew split OFF, so the
        // splits' wall-time effect is in the record, not just their count
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
        val tOff = time(Bench.materialize(q()))
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
        val df = q()
        val t = time(Bench.materialize(df))
        lastPlan = Some(df.queryExecution.executedPlan)
        (t, tOff, countSkewSplits(df), df.count())
      } finally prev.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    if (nSkewSplits == 0) {
      def stages(p: org.apache.spark.sql.execution.SparkPlan): Seq[org.apache.spark.sql.execution.adaptive.ShuffleQueryStageExec] =
        p.collect {
          case a: AdaptiveSparkPlanExec => stages(a.executedPlan)
          case q: org.apache.spark.sql.execution.adaptive.ShuffleQueryStageExec => Seq(q) ++ stages(q.plan)
          case q: QueryStageExec => stages(q.plan)
        }.flatten
      lastPlan.toSeq.flatMap(stages).foreach { s =>
        val bytes = s.mapStats.map(_.bytesByPartitionId).getOrElse(Array.empty[Long])
        System.err.println(s"SKEWBENCH DEBUG stage ${s.id}: nParts=${bytes.length} " +
          s"max=${if (bytes.nonEmpty) bytes.max else -1} " +
          s"sorted top5=${bytes.sorted.reverse.take(5).mkString(",")} " +
          s"median=${if (bytes.nonEmpty) bytes.sorted.apply(bytes.length / 2) else -1}")
      }
      System.err.println("SKEWBENCH DEBUG final plan:\n" +
        lastPlan.map(_.toString).getOrElse("<none>"))
    }
    require(nSkewSplits > 0,
      "AQE skew-join split did not engage — thresholds too high for this data size?")

    // ---- the skewed AGG: plain vs two-phase salted — identical results
    def plainAgg() = li.groupBy(col("l_orderkey"))
      .agg(sum(col("l_quantity")).as("sum_value"), count(lit(1)).as("n"))
    def saltedAgg() = graft.operators.Skew.saltedSumCount(
      li, "l_orderkey", col("l_quantity"), salts = 16)
    // the targeted variant: threshold at 1% of rows flags exactly the 3
    // hot keys (each ~10%), so the uniform tail skips the extra phase
    def targetedAgg() = graft.operators.Skew.saltedSumCountTargeted(
      li, "l_orderkey", col("l_quantity"), salts = 16,
      hotRowThreshold = nRows / 100, sampleFraction = 0.01)
    Bench.materialize(plainAgg()); Bench.materialize(saltedAgg()) // warm
    Bench.materialize(targetedAgg())
    val plainSec = time(Bench.materialize(plainAgg()))
    val saltedSec = time(Bench.materialize(saltedAgg()))
    val targetedSec = time(Bench.materialize(targetedAgg()))
    val targetedHot = targetedAgg().filter(col("l_orderkey") === hot(0))
      .select(col("n")).head().getLong(0)
    val plainHot = plainAgg().filter(col("l_orderkey") === hot(0))
      .select(col("n")).head().getLong(0)
    val saltedHot = saltedAgg().filter(col("l_orderkey") === hot(0))
      .select(col("n")).head().getLong(0)
    require(plainHot == saltedHot,
      s"salted agg diverged on the hot key: $plainHot vs $saltedHot")
    require(plainHot == targetedHot,
      s"targeted agg diverged on the hot key: $plainHot vs $targetedHot")

    // ---- the BEHAVIORAL tier under ENTITY skew: 30% of all events
    // remapped onto one hot user (the whale account / bot shape).
    // retention and funnel are agg+join chains keyed on user_id — the
    // hot user collapses into ONE row after map-side partial
    // aggregation, so their hot timings should track the uniform ones.
    // The per-user ordered WINDOW (the q_sessionize shape) is the
    // honest counter-example: a window partition cannot split, so one
    // task sorts the whale's entire history — wall time bounds by the
    // largest entity, and the production mitigation is capping
    // per-entity history (or sessionizing incrementally in streaming
    // state), not a shuffle trick. Both numbers go in the record.
    val evUniform = Tables.t(spark, scaled, "events")
      .select(col("user_id"), col("event_type"), col("ts"))
    val evHot = evUniform.withColumn("user_id",
      when(pmod(col("user_id"), lit(10)) < 3, lit(0L))
        .otherwise(col("user_id")))
    def sessionWindow(ev: DataFrame) = {
      import org.apache.spark.sql.expressions.Window
      val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"))
      val run = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      ev.withColumn("gap_us",
          expr("unix_micros(ts)") - lag(expr("unix_micros(ts)"), 1).over(byUser))
        .withColumn("new_sess",
          when(col("gap_us").isNull || col("gap_us") > 1800000000L, 1L)
            .otherwise(0L))
        .withColumn("sess_id", sum(col("new_sess")).over(run))
        .groupBy(col("user_id")).agg(max(col("sess_id")).as("n_sessions"))
    }
    // the PRODUCTION output shape — one row PER SESSION (start/end/
    // n_events), not per-entity counts — as a single ordered window:
    // the same whale bound as sessionWindow, measured against its
    // chunked twin below
    def sessionRowsWindow(ev: DataFrame) = {
      import org.apache.spark.sql.expressions.Window
      val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"))
      val run = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      ev.withColumn("us", expr("unix_micros(ts)"))
        .withColumn("gap_us", col("us") - lag(col("us"), 1).over(byUser))
        .withColumn("new_sess",
          when(col("gap_us").isNull || col("gap_us") > 1800000000L, 1L)
            .otherwise(0L))
        .withColumn("sess_id", sum(col("new_sess")).over(run))
        .groupBy(col("user_id"), col("sess_id"))
        .agg(min(col("us")).as("start_us"), max(col("us")).as("end_us"),
          count(lit(1)).as("n_events"))
    }
    val behav = Seq[(String, DataFrame => DataFrame)](
      "retention" -> (ev => graft.ext.Behavior.retention(ev)),
      "funnel" -> (ev =>
        graft.ext.Behavior.funnel(ev, Seq("view", "click", "purchase"))),
      "session_window" -> (ev => sessionWindow(ev)),
      // the whale mitigation: per-(user, day-slab) local windows +
      // summary-level boundary merge — same result, but the hot user's
      // history splits across slabs instead of sorting in one task, so
      // hot_sec should track uniform_sec where session_window's cannot
      "session_chunked" -> (ev =>
        graft.operators.Sessionize.chunked(ev, "user_id", "ts")),
      // the session-OUTPUT pair: same whale A/B for the one-row-per-
      // session production shape (chunkedSessions' local-session merge)
      "session_rows_window" -> (ev => sessionRowsWindow(ev)),
      "session_rows_chunked" -> (ev =>
        graft.operators.Sessionize.chunkedSessions(ev, "user_id", "ts"))
    ).map { case (name, f) =>
      Bench.materialize(f(evUniform)); Bench.materialize(f(evHot)) // warm
      val u = time(Bench.materialize(f(evUniform)))
      val h = time(Bench.materialize(f(evHot)))
      f""""$name":{"uniform_sec":$u%.3f,"hot_sec":$h%.3f}"""
    }.mkString(",")

    println(s"""{"metric":"skew_curve","scaled_dir":"$scaled","rows":$nRows,""" +
      f""""hot_share":$hotShare%.3f,"hot_keys":${hot.size},""" +
      f""""join_sec":$joinSec%.3f,"join_sec_nosplit":$joinSecNoSplit%.3f,""" +
      f""""aqe_skew_splits":$nSkewSplits,"join_groups":$joinRows,""" +
      f""""agg_plain_sec":$plainSec%.3f,"agg_salted_sec":$saltedSec%.3f,""" +
      f""""agg_targeted_sec":$targetedSec%.3f,""" +
      s""""hot_key_rows":$plainHot,""" +
      s""""behavior":{$behav}}""")
    spark.stop()
  }
}
