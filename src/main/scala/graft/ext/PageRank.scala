package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Fixed-iteration PageRank over an edge list — the iterative-graph
  * workload class (crawl-frontier prioritization, domain-authority
  * scoring for web-corpus curation) that no single declarative query
  * expresses: each round is one co-partitioned join + one aggregation,
  * driven by a bounded driver loop.
  *
  * Determinism contract: ranks are SCALED LONGS (fixed point, `scale`
  * units = probability 1.0) and every operation is integer (`div`,
  * `sum(long)`, `*`), so the result is bit-identical regardless of
  * partitioning or summation order — the same trick as the ANN tier's
  * integer-scaled dot products — and a SQL oracle can replay the exact
  * iteration unrolled as CTEs. Formula per round (damping 0.85):
  * rank' = (15·(scale div n)) div 100 + (85·Σ_in (rank div outdeg)) div 100.
  * Dangling mass (nodes with no out-edges) is dropped, not
  * redistributed — the standard simplification, identical in the oracle.
  *
  * Scale shape per iteration: the adjacency (edges ⋈ out-degree) is
  * materialized ONCE, pre-partitioned by `src` and persisted DISK_ONLY —
  * edge sets are corpus-sized, so parking them in executor heap would
  * evict everything else (measured: an in-memory checkpoint of the 60M-
  * edge 100× graph OOM'd an 8g driver; the disk-persisted run holds the
  * heap for the |nodes|-sized state instead). Each round scans the
  * persisted adjacency, joins the rank table (|nodes| rows — broadcast
  * at realistic node/edge ratios, shuffle-on-src otherwise), and
  * aggregates contributions map-side-combined by `dst`. Only the rank
  * table is materialized per round (small; persisted, counted, and the
  * superseded round released immediately), which also truncates
  * effective lineage so iteration count, not plan depth, is the loop's
  * budget (same pattern as [[ConnectedComponents]]'s rounds); on return
  * the adjacency and every round table are unpersisted — the caller
  * holds one eager checkpoint of the final ranks and nothing else.
  */
object PageRank {

  /** (node, rank) for every node appearing in `edges` (columns src, dst;
    * duplicates tolerated), after AT MOST `iters` rounds at fixed-point
    * `scale`. Output unordered — callers sort by node.
    *
    * EARLY TERMINATION: integer fixed-point arithmetic reaches an EXACT
    * fixed point (no epsilon tuning — ranks stop changing at all, which
    * floats never guarantee), and once a round changes nothing every
    * further round is the identity, so the loop exits there with output
    * bit-identical to the full `iters` unroll — `q_pagerank`'s
    * 5-round oracle stays hash-green over the early-exiting loop by
    * construction. The probe is one |nodes|-sized join of two CACHED
    * rank tables per round (state-sized, never edge-sized) feeding
    * `isEmpty` — at 100× graph scale it is noise against the round's
    * adjacency scan, and the rounds it saves are whole edge passes. */
  def ranks(spark: SparkSession, edges: DataFrame, iters: Int,
            scale: Long = 1000000000000L): DataFrame =
    ranksWithRounds(spark, edges, iters, scale)._1

  /** [[ranks]] plus the number of rounds actually executed (the
    * converged-contract form: `rounds < maxIters` is the proof the
    * delta-zero exit engaged; `rounds == maxIters` means the budget,
    * not the fixed point, ended the loop). */
  def ranksWithRounds(spark: SparkSession, edges: DataFrame, maxIters: Int,
            scale: Long = 1000000000000L): (DataFrame, Int) = {
    val e = edges.select(col("src").cast("long"), col("dst").cast("long"))
      .distinct()
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    // adjacency = edges ⋈ outdeg, built once, co-partitioned on src,
    // persisted to DISK (corpus-sized — heap is reserved for state)
    val esrc = e.join(deg, "src").repartition(col("src"))
      .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
    try {
      val nodes = esrc.select(col("src").as("node"))
        .union(esrc.select(col("dst").as("node")))
        .distinct()
        .localCheckpoint()
      val n = nodes.count() // bounded driver scalar: |nodes| for the base term
      require(n > 0, "PageRank over an empty edge set")
      val init = scale / n
      val base = (15L * init) / 100L

      var r = nodes.select(col("node"), lit(init).as("rank"))
      // per-round rank tables are persisted through the CacheManager
      // (not localCheckpoint) so each superseded round can be RELEASED
      // as soon as its successor materializes — checkpoint RDDs have no
      // public unpersist and would pile up in executor storage until GC
      var prev: Option[DataFrame] = None
      var rounds = 0
      var converged = false
      while (rounds < maxIters && !converged) {
        rounds += 1
        val contrib = esrc.join(r, esrc("src") === r("node"))
          .select(col("dst"), expr("rank div outdeg").as("c"))
        val inc = contrib.groupBy(col("dst")).agg(sum(col("c")).as("inc"))
        // ONE job per round (guide §1.2: don't compute things twice):
        // the new rank table is derived from the PREVIOUS round's table
        // (same node set as `nodes` — every round emits exactly one row
        // per node) and carries the old rank as `_prank`, so a single
        // changed-rows count both materializes this round's cache AND
        // answers the exact delta-zero probe — the former shape paid a
        // count() job plus an isEmpty probe job re-joining two
        // |nodes|-sized tables every round.
        val rNew = r.select(col("node"), col("rank").as("_prank"))
          .join(inc, col("node") === inc("dst"), "left")
          .select(col("node"), col("_prank"),
            (lit(base) +
              expr("(85 * coalesce(inc, cast(0 as bigint))) div 100")).as("rank"))
          .persist()
        converged = rNew.where(col("rank") =!= col("_prank")).count() == 0L
        prev.foreach(_.unpersist())
        prev = Some(rNew)
        r = rNew.select(col("node"), col("rank"))
      }
      // the handle returned to the caller must survive the unpersists:
      // one eager checkpoint of the FINAL |nodes|-sized table only
      val out = r.localCheckpoint()
      prev.foreach(_.unpersist())
      (out, rounds)
    } finally esrc.unpersist()
  }
}
