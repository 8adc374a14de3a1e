package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The composed training-data curation pipeline — what the ext operators
  * exist FOR at 100 TB: exact dedup, near-dup removal, quality filtering,
  * chained as DataFrame transforms so Catalyst plans the whole flow.
  *
  * Near-dup removal policy: from every verified pair (a, b) with a < b,
  * the HIGHER doc_id is dropped — the standard greedy keep-first rule.
  * (Full connected-component clustering is an iterative job; the greedy
  * rule is the common production choice and is deterministic.)
  */
object Curation {

  /** docs minus exact duplicates: one survivor (min doc_id) per distinct
    * text fingerprint. */
  def dropExactDups(docs: DataFrame): DataFrame =
    docs.withColumn("fp", md5(col("text")))
      .withColumn("keep_id",
        min(col("doc_id")).over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("fp"))))
      .filter(col("doc_id") === col("keep_id"))
      .drop("fp", "keep_id")

  /** A precomputed verified near-dup pair set, tagged with the threshold
    * it was verified at. Carrying the threshold makes the reuse contract
    * checkable: [[pairGraph]] rejects a set whose threshold differs from
    * the one the caller asks for, instead of silently yielding wrong
    * survivors. */
  final case class PairSet(pairs: DataFrame, threshold: Double)

  /** The verified pair graph for `docs`: computed fresh, or RESTRICTED
    * from a precomputed set. Sound because LSH band collision is
    * pairwise (two docs share a band bucket independent of the rest of
    * the corpus) and the Jaccard verify is per-pair — so the pair set
    * of a SUB-corpus is exactly the superset's pairs with both ends
    * surviving. Remaining precondition on `pairs`: computed over a
    * SUPERSET of `docs` (the threshold half of the old contract is now
    * enforced by the require). */
  private def pairGraph(docs: DataFrame, threshold: Double,
      pairs: Option[PairSet]): DataFrame =
    pairs.map { ps =>
      require(ps.threshold == threshold,
        s"precomputed pair set was verified at threshold ${ps.threshold}, " +
          s"but this call asks for $threshold — reusing it would yield " +
          "wrong survivors")
      val ids = docs.select(col("doc_id"))
      ps.pairs.select(col("doc_a"), col("doc_b"))
        .join(ids.withColumnRenamed("doc_id", "doc_a"), Seq("doc_a"), "left_semi")
        .join(ids.withColumnRenamed("doc_id", "doc_b"), Seq("doc_b"), "left_semi")
    }.getOrElse(
      Dedup.minhashNearDupPairs(docs, threshold)
        .select(col("doc_a"), col("doc_b")))

  /** docs minus the greedy-dropped side of every near-dup pair.
    * `pairs`: optionally reuse a precomputed pair set (see
    * [[pairGraph]] for the soundness contract). */
  def dropNearDups(docs: DataFrame, threshold: Double,
      pairs: Option[PairSet] = None): DataFrame = {
    val drop = pairGraph(docs, threshold, pairs)
      .select(col("doc_b").as("doc_id")).distinct()
    docs.join(drop, Seq("doc_id"), "left_anti")
  }

  /** docs minus near-dups under the TRANSITIVE policy: connected
    * components over the verified pair graph, survivor = min doc_id per
    * component. Differs from the greedy rule on chains — with pairs
    * (2,3), (1,3) greedy keeps {1, 2} (2 is never a doc_b) while CC
    * clusters {1,2,3} together and keeps only 1. */
  /** Cluster the verified near-dup pair graph. The pair graph is orders
    * of magnitude smaller than the corpus (only verified edges), and
    * each CC round runs ~6 tiny shuffles — at the session's corpus-sized
    * partition count the per-round fixed cost dominates, so the
    * iteration runs at few partitions and the setting is restored after.
    * At true 100 TB pair volumes the caller runs
    * ConnectedComponents.components directly under its own partitioning. */
  private def componentsFewPartitions(pairs: DataFrame): DataFrame = {
    val spark = pairs.sparkSession
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "4")
      ConnectedComponents.components(pairs).localCheckpoint(true)
    } finally spark.conf.set("spark.sql.shuffle.partitions", prevParts)
  }

  def dropNearDupsCC(docs: DataFrame, threshold: Double,
      pairs: Option[PairSet] = None): DataFrame = {
    // materialize the pair graph at FULL parallelism first — the LSH
    // band join is corpus-sized work; only the iteration below is tiny
    val pg = pairGraph(docs, threshold, pairs).localCheckpoint(true)
    val drop = componentsFewPartitions(pg)
      .filter(col("doc_id") =!= col("component"))
      .select(col("doc_id"))
    docs.join(drop, Seq("doc_id"), "left_anti")
  }

  /** Cluster-aware near-dup survival: cluster the verified pair graph
    * with connected components, then keep the HIGHEST-QUALITY doc per
    * cluster (ties → lowest doc_id) instead of the lowest id — the
    * policy a curation pipeline actually wants, since near-dup clusters
    * often mix a clean original with mangled copies. Singletons (docs in
    * no pair) survive untouched. */
  def keepBestPerCluster(docs: DataFrame, threshold: Double,
      pairs: Option[PairSet] = None): DataFrame = {
    val pg = pairGraph(docs, threshold, pairs).localCheckpoint(true)
    val comp = componentsFewPartitions(pg)
    val scored = docs.join(TextStats.qualityScore(docs), Seq("doc_id"))
      .join(comp, Seq("doc_id"), "left_outer")
      // singletons form their own component
      .withColumn("component", coalesce(col("component"), col("doc_id")))
    val best = scored.groupBy(col("component"))
      .agg(max_by(col("doc_id"), struct(col("score"), -col("doc_id")))
        .as("doc_id"))
      .select(col("doc_id"))
    docs.join(best, Seq("doc_id"), "left_semi")
  }

  /** docs at or above the quality bar. */
  def filterQuality(docs: DataFrame, minScore: Double): DataFrame =
    docs.join(
      TextStats.qualityScore(docs).filter(col("score") >= lit(minScore))
        .select("doc_id"),
      Seq("doc_id"))

  /** Run the full chain and return the per-stage corpus sizes (the
    * curation funnel a pipeline operator monitors). `nearDupPolicy`
    * selects greedy (default) or connected-component near-dup removal. */
  def funnel(docs: DataFrame, nearDupThreshold: Double = 0.6,
      minQuality: Double = 0.5,
      nearDupPolicy: (DataFrame, Double) => DataFrame =
        dropNearDups(_, _, None)): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    // each stage is both counted AND fed to the next stage; persist so
    // the four actions don't recompute the whole upstream chain (the
    // near-dup stage re-runs the full LSH pipeline otherwise)
    val afterExact = dropExactDups(docs).persist()
    val afterNear = nearDupPolicy(afterExact, nearDupThreshold).persist()
    val afterQuality = filterQuality(afterNear, minQuality)
    Seq(
      ("1_input", docs.count()),
      ("2_after_exact_dedup", afterExact.count()),
      ("3_after_near_dedup", afterNear.count()),
      ("4_after_quality", afterQuality.count()))
      .toDF("stage", "n_docs")
  }
}
