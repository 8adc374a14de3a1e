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
  * One ordered-window pass per stream, partitioned by the stream key —
  * at 100 TB each source/shard packs independently and in parallel;
  * the cumulative sum never crosses stream boundaries, so there is no
  * global sequential dependency.
  */
object Packing {

  /** (doc_id, stream, n_tok, offset, start_bin, end_bin) for capacity
    * `c` tokens per context window. Empty docs occupy zero tokens and
    * land at their offset's bin. The token counter is pluggable: the
    * default whitespace count is the oracle-replayable baseline;
    * token-exact budgeting passes [[Bpe.tokenCount]] instead (same
    * plan shape — still a pure projection feeding one ordered window). */
  def concatChunk(docs: DataFrame, streamCol: String, c: Int,
      tokens: org.apache.spark.sql.Column = tokenCount(col("text"))): DataFrame = {
    require(c > 0, "context capacity must be positive")
    val w = Window.partitionBy(col("stream")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow - 1)
    docs.select(col("doc_id"), col(streamCol).as("stream"),
        tokens.cast("long").as("n_tok"))
      .withColumn("offset", coalesce(sum(col("n_tok")).over(w), lit(0L)))
      .withColumn("start_bin", expr(s"offset div $c"))
      .withColumn("end_bin",
        expr(s"(offset + greatest(n_tok - 1L, 0L)) div $c"))
  }
}
