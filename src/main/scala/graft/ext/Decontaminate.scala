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
  */
object Decontaminate {

  /** (doc_id, bench_id, n_shared) for corpus × benchmark pairs sharing
    * at least `minShared` distinct n-gram shingles. */
  def overlaps(corpus: DataFrame, bench: DataFrame,
      minShared: Int, n: Int = 3): DataFrame = {
    val cs = corpus.select(col("doc_id"),
      explode(shingles(col("text"), n)).as("s"))
    val bs = bench.select(col("doc_id").as("bench_id"),
      explode(shingles(col("text"), n)).as("s"))
    cs.join(broadcast(bs), "s")
      .groupBy(col("doc_id"), col("bench_id"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** corpus minus every document contaminated by some benchmark doc. */
  def scrub(corpus: DataFrame, bench: DataFrame,
      minShared: Int, n: Int = 3): DataFrame =
    corpus.join(
      overlaps(corpus, bench, minShared, n).select(col("doc_id")).distinct(),
      Seq("doc_id"), "left_anti")
}
