package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Document chunking for training-data and retrieval pipelines: cut each
  * document into sliding windows of `chunk` tokens advancing by `stride`
  * tokens (overlap = chunk - stride), the splitter shape behind context
  * -window pretraining corpora and RAG indexes. Contrast
  * [[Packing.concatChunk]], which packs token STREAMS across document
  * boundaries — chunking keeps each window inside one document and
  * re-emits the overlapped text.
  *
  * One narrow map-side projection: the [[graft.functions.WordChunks]]
  * byte scan emits each window as a verbatim byte slice of the original
  * string (no token arrays, no interpreted transform chain), then a
  * generator explodes windows to rows. No shuffle at all — at 100 TB
  * the output is partition-local and ~(chunk/stride)× the corpus bytes,
  * which is the floor for overlapped chunking.
  */
object Chunking {

  /** (doc_id, chunk_id, chunk_text, n_tok): 0-based chunk ids in document
    * order; the final chunk clamps at the document end and windows stop
    * once one reaches the last token (no suffix-duplicate chunks).
    * Tokens are single-space `split` segments — the text tier's
    * cross-engine contract. */
  def chunk(docs: DataFrame, chunk: Int, stride: Int): DataFrame =
    docs.select(col("doc_id"),
        posexplode(call_function("word_chunks", col("text"),
          lit(chunk), lit(stride))).as(Seq("chunk_id", "chunk_text")))
      // tokens = separators + 1, counted arithmetically (translate strips
      // the separator) so the projection stays in whole-stage codegen
      .withColumn("n_tok",
        length(col("chunk_text"))
          - length(translate(col("chunk_text"), " ", "")) + lit(1))

  /** The SPAN MANIFEST: (doc_id, chunk_id, start_tok, n_tok, start_byte,
    * len_bytes) — the same windows as [[chunk]], emitted as byte-offset
    * spans instead of materialized text. This is the form a training
    * loader actually consumes (slice the source at load time), and the
    * scale-path default: [[chunk]]'s output is ~(chunk/stride)× the
    * corpus BYTES (every overlapped window re-emits its text — the r17
    * scale curve priced that at 79× wall at 100× data), while the
    * manifest is 16 bytes per window — METADATA-sized, invariant in
    * document length. Rebuild identity: slicing the document's UTF-8
    * bytes at [start_byte, start_byte+len_bytes) reproduces [[chunk]]'s
    * chunk_text bit-for-bit (ChunkingSpec proves it, multi-byte
    * included). Same no-shuffle plan shape: one codegen byte scan, one
    * generator. */
  def spans(docs: DataFrame, chunk: Int, stride: Int): DataFrame =
    docs.select(col("doc_id"),
        posexplode(call_function("word_chunk_spans", col("text"),
          lit(chunk), lit(stride))).as(Seq("chunk_id", "sp")))
      .select(col("doc_id"), col("chunk_id"),
        col("sp.start_tok").as("start_tok"), col("sp.n_tok").as("n_tok"),
        col("sp.start_byte").as("start_byte"),
        col("sp.len_bytes").as("len_bytes"))
}
