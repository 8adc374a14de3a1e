package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import TextOps.tokenCount

/** Sequence packing for training — the concat-and-chunk layout LLM
  * pretraining uses: within a stream (here: per source, ordered by
  * doc_id), documents are conceptually concatenated and the token
  * stream is cut into fixed-capacity context windows. Each document's
  * placement is pure integer arithmetic over a running token offset:
  *   offset    = sum of token counts of all earlier docs in the stream
  *   start_bin = offset div C,  end_bin = (offset + n_tok - 1) div C
  * A document spans bins when it crosses a boundary (the standard
  * pretraining behavior — no padding waste, splits allowed).
  *
  * The running offset is computed HIERARCHICALLY, so one giant stream
  * never serializes onto one partition: docs split into contiguous
  * doc_id blocks (`idBlock` ids per block), the cumulative sum runs
  * per (stream, block) — parallel across blocks — and each block's
  * starting offset comes from a per-(stream, block) totals table
  * (corpus_size / idBlock rows, tiny) cumsum'd per stream and joined
  * back on the same (stream, block) key the local window already
  * partitioned by. Same trick as [[Sharding]]'s manifest: the only
  * sequential pass runs over block AGGREGATES, ~10^4-10^6x smaller
  * than the corpus. Block order equals doc order because blocks are
  * doc_id-contiguous (ids are assumed non-negative, as fixture and
  * shard layouts guarantee).
  */
object Packing {

  /** (doc_id, stream, n_tok, offset, start_bin, end_bin) for capacity
    * `c` tokens per context window. Empty docs occupy zero tokens and
    * land at their offset's bin. The token counter is pluggable: the
    * default whitespace count is the oracle-replayable baseline;
    * token-exact budgeting passes [[Bpe.tokenCount]] instead (same
    * plan shape — projections feeding block-local windows). `idBlock`
    * is the doc_id span per cumsum block: any value yields identical
    * results (offsets are associative); it only tunes parallelism. */
  def concatChunk(docs: DataFrame, streamCol: String, c: Int,
      tokens: org.apache.spark.sql.Column = tokenCount(col("text")),
      idBlock: Long = 1L << 16): DataFrame = {
    require(c > 0, "context capacity must be positive")
    require(idBlock > 0, "idBlock must be positive")
    val base = docs.select(col("doc_id"), col(streamCol).as("stream"),
        tokens.cast("long").as("n_tok"))
      .withColumn("_blk", expr(s"doc_id div $idBlock"))
    // local running offset within (stream, block) — parallel across blocks
    val wLoc = Window.partitionBy(col("stream"), col("_blk")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow - 1)
    // block base offsets: cumsum over per-block TOTALS, one row per
    // (stream, block) — the only stream-sequential pass, corpus/idBlock
    // rows (recurse the same trick if even that table ever gets big)
    val wBlk = Window.partitionBy(col("stream")).orderBy(col("_blk"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow - 1)
    val blockBase = base.groupBy(col("stream"), col("_blk"))
      .agg(sum(col("n_tok")).as("_blk_tok"))
      .withColumn("_base", coalesce(sum(col("_blk_tok")).over(wBlk), lit(0L)))
      .select(col("stream"), col("_blk"), col("_base"))
    base
      .withColumn("_loc", coalesce(sum(col("n_tok")).over(wLoc), lit(0L)))
      .join(blockBase, Seq("stream", "_blk"))
      .withColumn("offset", col("_base") + col("_loc"))
      .withColumn("start_bin", expr(s"offset div $c"))
      .withColumn("end_bin",
        expr(s"(offset + greatest(n_tok - 1L, 0L)) div $c"))
      .select(col("doc_id"), col("stream"), col("n_tok"),
        col("offset"), col("start_bin"), col("end_bin"))
  }

  /** The materialized training windows: one row per (stream, bin, doc
    * slice) — exactly which token range of which document fills which
    * fixed-capacity context window, the manifest a loader consumes.
    * Derived from [[concatChunk]] by exploding each doc's bin span;
    * pure integer arithmetic (so the layout replays in any engine):
    *   start_in_doc = max(bin·c − offset, 0)
    *   len          = min((bin+1)·c, offset+n_tok) − max(bin·c, offset)
    * Zero-token docs are dropped — they occupy no window space. Every
    * bin's slice lengths sum to exactly c (the final bin of a stream
    * excepted), and concatenating slices in (bin, offset) order rebuilds
    * the stream: PackingSpec pins both invariants. */
  def windows(docs: DataFrame, streamCol: String, c: Int,
      tokens: org.apache.spark.sql.Column = tokenCount(col("text")),
      idBlock: Long = 1L << 16): DataFrame =
    concatChunk(docs, streamCol, c, tokens, idBlock)
      .filter(col("n_tok") > 0)
      .withColumn("bin", explode(sequence(col("start_bin"), col("end_bin"))))
      .withColumn("start_in_doc",
        greatest(col("bin") * c - col("offset"), lit(0L)))
      .withColumn("len",
        least((col("bin") + 1) * c, col("offset") + col("n_tok"))
          - greatest(col("bin") * c, col("offset")))
      .select(col("stream"), col("bin"), col("doc_id"),
        col("start_in_doc"), col("len"))
}
