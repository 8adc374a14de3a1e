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
}
