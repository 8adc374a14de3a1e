package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import TextOps.shingles

/** Benchmark decontamination — the training-data operator that removes
  * corpus documents overlapping an evaluation set, so test questions
  * don't leak into training data.
  *
  * Overlap is counted in distinct word n-gram shingles (the standard
  * n-gram-collision definition). The join is an inverted index with the
  * BENCHMARK side broadcast: eval sets are orders of magnitude smaller
  * than the corpus, so every corpus shingle streams past an in-memory
  * hash of benchmark shingles — one shuffle for the per-(doc, bench)
  * count, no corpus self-join, no all-pairs anything. At 100 TB the
  * corpus side stays fully partitioned; only the benchmark shingle
  * table replicates.
  *
  * Both sides join on `xxhash64(shingle)` rather than the shingle string:
  * the broadcast index carries 8-byte keys instead of ~n-word strings
  * (a several-fold smaller broadcast and a cheaper probe), and distinct
  * counts are unchanged short of a 64-bit collision INSIDE one
  * (doc, bench) pair's shared set — odds ~ s²/2⁶⁵ per pair, immaterial
  * next to the n-gram-overlap heuristic itself.
  */
object Decontaminate {

  /** (doc_id, bench_id, n_shared) for corpus × benchmark pairs sharing
    * at least `minShared` distinct n-gram shingles.
    *
    * `stopTopK > 0` drops the K highest-document-frequency shingles from
    * the BENCHMARK index before the join (tie-break: df desc, hash asc).
    * Boilerplate n-grams ("in the following", license headers) dominate
    * df and generate most of the index's probe hits while carrying no
    * contamination signal; capping them shrinks both the broadcast and
    * the pair-count shuffle. The bench side is small, so the df ranking
    * is a cheap driver-free window over the broadcastable table. */
  private def corpusShingles(corpus: DataFrame, n: Int): DataFrame =
    corpus.select(col("doc_id"),
      explode(shingles(col("text"), n)).as("s"))
      .select(col("doc_id"), xxhash64(col("s")).as("h"))

  private def benchShingles(bench: DataFrame, n: Int,
      stopTopK: Int): DataFrame = {
    val bs0 = bench.select(col("doc_id").as("bench_id"),
      explode(shingles(col("text"), n)).as("s"))
      .select(col("bench_id"), xxhash64(col("s")).as("h"))
    if (stopTopK <= 0) bs0
    else {
      import org.apache.spark.sql.expressions.Window
      val rnk = row_number().over(
        Window.orderBy(col("df").desc, col("h").asc))
      val stops = bs0.groupBy(col("h"))
        .agg(count(lit(1)).as("df"))
        .withColumn("rnk", rnk)
        .filter(col("rnk") <= stopTopK)
        .select(col("h"))
      bs0.join(broadcast(stops), Seq("h"), "left_anti")
    }
  }

  def overlaps(corpus: DataFrame, bench: DataFrame,
      minShared: Int, n: Int = 3, stopTopK: Int = 0): DataFrame =
    corpusShingles(corpus, n)
      .join(broadcast(benchShingles(bench, n, stopTopK)), "h")
      .groupBy(col("doc_id"), col("bench_id"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)

  /** corpus minus every document contaminated by some benchmark doc. */
  def scrub(corpus: DataFrame, bench: DataFrame,
      minShared: Int, n: Int = 3, stopTopK: Int = 0): DataFrame =
    corpus.join(
      overlaps(corpus, bench, minShared, n, stopTopK).select(col("doc_id")).distinct(),
      Seq("doc_id"), "left_anti")

  /** Persist the benchmark shingle index ONCE as an
    * [[graft.land.AtomicLanding]] table of (bench_id, h) rows — the
    * incremental-decontamination build step. The r15 scale probe
    * (DECON_PROBE_r15) showed both inline variants scan-bound: every
    * call re-shingles the WHOLE corpus, 70× wall at 100× data. A
    * training pipeline decontaminates each incoming BATCH, not the
    * standing corpus, so the benchmark side — the small, slowly-moving
    * side — is what deserves to be an index: build it once, then
    * [[overlapsIncremental]] costs one batch shingle pass + a
    * broadcast join, INDEPENDENT of corpus size. `stopTopK` is frozen
    * into the index (the df ranking is a property of the benchmark). */
  def buildBenchIndex(bench: DataFrame, path: String, n: Int = 3,
      stopTopK: Int = 0, batchId: Option[Long] = None): String = {
    graft.land.AtomicLanding.commit(benchShingles(bench, n, stopTopK),
      s"$path/bench", batchId = batchId)
    path
  }

  /** Append NEW benchmark docs to a [[buildBenchIndex]] index — the
    * [[FuzzyJoin.addToSigIndex]] contract verbatim: identified batches
    * (monotone ids) replay as pure no-ops and skip the dedupe scan
    * once a watermark exists; id-less appends anti-join against the
    * live index at (bench_id, h) granularity. */
  def addToBenchIndex(spark: org.apache.spark.sql.SparkSession,
      indexPath: String, bench: DataFrame, n: Int = 3,
      batchId: Option[Long] = None): Unit = {
    import graft.land.AtomicLanding
    val benchT = s"$indexPath/bench"
    if (batchId.exists(b => AtomicLanding.lastBatchId(benchT).exists(_ >= b)))
      return // known-committed replay: data + id durable in one swing
    val delta = (batchId.filter(_ =>
        AtomicLanding.lastBatchId(benchT).isDefined) match {
      case Some(_) => benchShingles(bench, n, 0)
      case _ =>
        val live = AtomicLanding.read(spark, benchT)
          .select(col("bench_id"), col("h"))
        benchShingles(bench, n, 0)
          .join(live, Seq("bench_id", "h"), "left_anti")
          .select(col("bench_id"), col("h"))
    }).persist()
    try if (!delta.isEmpty || batchId.isDefined) {
      AtomicLanding.commit(delta, benchT, append = true,
        batchId = batchId); ()
    } finally delta.unpersist()
  }

  /** [[overlaps]] of a BATCH against a persisted [[buildBenchIndex]]
    * benchmark index: bit-identical to `overlaps(batch, bench, ...)`
    * (same shingle pipeline, shared code — the `q_decontaminate_
    * incremental` hash gate), at a cost that scales with the batch and
    * NOT with the corpus or the benchmark: the benchmark is never
    * re-shingled, its slim (bench_id, h) table broadcasts from parquet. */
  def overlapsIncremental(spark: org.apache.spark.sql.SparkSession,
      indexPath: String, batch: DataFrame, minShared: Int,
      n: Int = 3): DataFrame =
    corpusShingles(batch, n)
      .join(broadcast(
        graft.land.AtomicLanding.read(spark, s"$indexPath/bench")), "h")
      .groupBy(col("doc_id"), col("bench_id"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)

  /** The batch minus its contaminated docs — [[scrub]] against the
    * persisted benchmark index. */
  def scrubIncremental(spark: org.apache.spark.sql.SparkSession,
      indexPath: String, batch: DataFrame, minShared: Int,
      n: Int = 3): DataFrame =
    batch.join(
      overlapsIncremental(spark, indexPath, batch, minShared, n)
        .select(col("doc_id")).distinct(),
      Seq("doc_id"), "left_anti")

  /** [[overlaps]] for benchmark sets TOO BIG TO BROADCAST as a join
    * table: a Bloom sketch of the benchmark shingle hashes (built by the
    * native `bloom_filter_agg`, inlined as a literal — the only
    * driver-side object is the sketch itself, `numBits/8` bytes
    * regardless of benchmark size) pre-filters corpus shingles with the
    * codegen `might_contain` BEFORE the shuffled exact join, so the
    * shuffle carries only probable hits. False positives cost shuffle
    * rows, never correctness — the exact join eliminates them, and the
    * result equals [[overlaps]] row for row (that identity is the
    * `q_decontaminate_bloom` hash gate). The join deliberately has no
    * broadcast hint: this is the path for when the bench side must
    * shuffle too.
    *
    * EAGER, unlike the sibling builders: constructing the frame runs two
    * Spark actions (the bench-shingle localCheckpoint + the sketch
    * `.head()`) and pins the checkpointed shingles in executor storage —
    * the sketch must exist before the corpus filter can be planned.
    * Callers composing lazy pipelines should invoke it once and reuse
    * the returned frame; for a bench side too big even for executor
    * storage, swap the localCheckpoint for a parquet spool (same plan,
    * disk-backed lineage cut). */
  def overlapsBloom(corpus: DataFrame, bench: DataFrame, minShared: Int,
      n: Int = 3, expectedItems: Long = 1L << 20,
      numBits: Long = 1L << 23): DataFrame = {
    val cs = corpus.select(col("doc_id"),
      explode(shingles(col("text"), n)).as("s"))
      .select(col("doc_id"), xxhash64(col("s")).as("h"))
    // materialized once: both the sketch action and the exact join scan
    // the bench shingles, and this path exists precisely because the
    // bench side is big
    val bs = bench.select(col("doc_id").as("bench_id"),
      explode(shingles(col("text"), n)).as("s"))
      .select(col("bench_id"), xxhash64(col("s")).as("h"))
      .localCheckpoint(true)
    val sketch = bs.agg(
      expr(s"bloom_filter_agg(h, ${expectedItems}L, ${numBits}L)").as("bf"))
      .head().getAs[Array[Byte]]("bf")
    cs.filter(call_function("might_contain", lit(sketch), col("h")))
      .join(bs, "h")
      .groupBy(col("doc_id"), col("bench_id"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }
}
