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
  * Scale shape per iteration: edges are pre-partitioned ONCE by `src`
  * and reused each round (the rank side, |nodes| rows, shuffles to meet
  * them); contributions aggregate map-side-combined by `dst`. State is
  * two |nodes|-sized tables, never edge-squared. `localCheckpoint` after
  * each round keeps the plan bounded — iteration count, not lineage
  * depth, is the loop's budget (same pattern as
  * [[ConnectedComponents]]'s large-star/small-star rounds).
  */
object PageRank {

  /** (node, rank) for every node appearing in `edges` (columns src, dst;
    * duplicates tolerated), after `iters` rounds at fixed-point `scale`.
    * Output unordered — callers sort by node. */
  def ranks(spark: SparkSession, edges: DataFrame, iters: Int,
            scale: Long = 1000000000000L): DataFrame = {
    val e = edges.select(col("src").cast("long"), col("dst").cast("long"))
      .distinct()
      .repartition(col("src"))
      .localCheckpoint()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .distinct()
      .localCheckpoint()
    val n = nodes.count() // bounded driver scalar: |nodes| for the base term
    require(n > 0, "PageRank over an empty edge set")
    val init = scale / n
    val base = (15L * init) / 100L
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    // edges ⋈ outdeg once, co-partitioned on src, reused every round
    val esrc = e.join(deg, "src").localCheckpoint()

    var r = nodes.select(col("node"), lit(init).as("rank"))
    for (_ <- 1 to iters) {
      val contrib = esrc.join(r, esrc("src") === r("node"))
        .select(col("dst"), expr("rank div outdeg").as("c"))
      val inc = contrib.groupBy(col("dst")).agg(sum(col("c")).as("inc"))
      r = nodes.join(inc, nodes("node") === inc("dst"), "left")
        .select(col("node"),
          (lit(base) +
            expr("(85 * coalesce(inc, cast(0 as bigint))) div 100")).as("rank"))
        .localCheckpoint()
    }
    r
  }
}
