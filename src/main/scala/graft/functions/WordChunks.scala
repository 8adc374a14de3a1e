package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** `word_chunks(text, chunk, stride)` — sliding-window document chunking
  * for training-data / retrieval pipelines: token windows of `chunk`
  * words starting every `stride` words, clamped at the document end,
  * stopping after the first window that reaches the last token (so no
  * emitted chunk is a suffix of its predecessor). A doc of `m` tokens
  * yields `1` chunk when `m <= chunk`, else
  * `floor((m - chunk + stride - 1) / stride) + 1` — the count the
  * DuckDB oracle replays with integer arithmetic.
  *
  * Tokens are `split(text, ' ')` segments (empty tokens included, the
  * cross-engine contract of the text tier), and each chunk is the
  * tokens rejoined by a single space — which, by the [[ShingleHash]]
  * byte-range identity, is a verbatim byte slice of the original
  * string: one copy per chunk, no token array, no per-window transform
  * chain. `stride > chunk` (gapped sampling) is allowed.
  */
case class WordChunks(child: Expression, chunk: Int, stride: Int)
    extends UnaryExpression {

  require(chunk >= 1, s"word_chunks needs chunk >= 1, got $chunk")
  require(stride >= 1, s"word_chunks needs stride >= 1, got $stride")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"word_chunks expects string, got ${other.simpleString}")
  }

  override def nullSafeEval(tv: Any): Any =
    WordChunks.compute(tv.asInstanceOf[UTF8String], chunk, stride)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.functions.WordChunks$$.MODULE$$.compute($t, $chunk, $stride);")

  override protected def withNewChildInternal(newChild: Expression): WordChunks =
    copy(child = newChild)
}

object WordChunks {
  def compute(s: UTF8String, chunk: Int, stride: Int): ArrayData = {
    val bytes = s.numBytes()
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val (starts, ends, m) = WordChunkSpans.boundaries(s)
    val nChunks =
      if (m <= chunk) 1 else (m - chunk + stride - 1) / stride + 1
    val out = new Array[Any](nChunks)
    var k = 0
    while (k < nChunks) {
      val first = k * stride
      val last = math.min(first + chunk - 1, m - 1)
      val s0 = starts(first)
      val len = ends(last) - s0
      val b = new Array[Byte](len)
      Platform.copyMemory(base, off + s0, b, Platform.BYTE_ARRAY_OFFSET, len)
      out(k) = UTF8String.fromBytes(b)
      k += 1
    }
    new GenericArrayData(out)
  }
}

/** `word_chunk_spans(text, chunk, stride)` — the SPAN MANIFEST dual of
  * [[WordChunks]]: the same sliding windows, emitted as
  * `(start_tok, n_tok, start_byte, len_bytes)` offset structs instead
  * of materialized byte slices. [[WordChunks]]' output is inherently
  * ~(chunk/stride)× the corpus bytes (every overlapped window carries a
  * verbatim copy — the floor for chunking that RE-EMITS text); the span
  * manifest is what a training loader actually consumes (slice the
  * source bytes at load time), and its output is METADATA-sized: 16
  * bytes per window regardless of document size, the same move
  * [[graft.ext.Packing.windows]] made for sequence packing.
  *
  * Rebuild identity (spec'd in ChunkingSpec, and the contract the
  * q_chunk_spans oracle leans on): for every emitted span,
  * `text.bytes[start_byte, start_byte + len_bytes)` is bit-for-bit the
  * corresponding [[WordChunks]] chunk — offsets are BYTE offsets into
  * the UTF-8 encoding (multi-byte-safe), not character offsets.
  */
case class WordChunkSpans(child: Expression, chunk: Int, stride: Int)
    extends UnaryExpression {

  require(chunk >= 1, s"word_chunk_spans needs chunk >= 1, got $chunk")
  require(stride >= 1, s"word_chunk_spans needs stride >= 1, got $stride")

  override def dataType: DataType =
    ArrayType(WordChunkSpans.spanType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"word_chunk_spans expects string, got ${other.simpleString}")
  }

  override def nullSafeEval(tv: Any): Any =
    WordChunkSpans.compute(tv.asInstanceOf[UTF8String], chunk, stride)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.functions.WordChunkSpans$$.MODULE$$.compute($t, $chunk, $stride);")

  override protected def withNewChildInternal(newChild: Expression): WordChunkSpans =
    copy(child = newChild)
}

object WordChunkSpans {

  val spanType: StructType = StructType(Seq(
    StructField("start_tok", IntegerType, nullable = false),
    StructField("n_tok", IntegerType, nullable = false),
    StructField("start_byte", IntegerType, nullable = false),
    StructField("len_bytes", IntegerType, nullable = false)))

  /** Single-space token boundaries of `s`: (starts, exclusive ends, m).
    * One byte scan; shared by the slice and span kernels so the two can
    * never disagree about where a token begins. */
  def boundaries(s: UTF8String): (Array[Int], Array[Int], Int) = {
    val bytes = s.numBytes()
    var spaces = 0
    var i = 0
    while (i < bytes) {
      if (s.getByte(i) == 0x20) spaces += 1
      i += 1
    }
    val m = spaces + 1
    val starts = new Array[Int](m)
    val ends = new Array[Int](m)
    var t = 0
    i = 0
    while (i < bytes) {
      if (s.getByte(i) == 0x20) { ends(t) = i; t += 1; starts(t) = i + 1 }
      i += 1
    }
    ends(t) = bytes
    (starts, ends, m)
  }

  def compute(s: UTF8String, chunk: Int, stride: Int): ArrayData = {
    val (starts, ends, m) = boundaries(s)
    val nChunks =
      if (m <= chunk) 1 else (m - chunk + stride - 1) / stride + 1
    val out = new Array[Any](nChunks)
    var k = 0
    while (k < nChunks) {
      val first = k * stride
      val last = math.min(first + chunk - 1, m - 1)
      val s0 = starts(first)
      out(k) = org.apache.spark.sql.catalyst.InternalRow(
        first, last - first + 1, s0, ends(last) - s0)
      k += 1
    }
    new GenericArrayData(out)
  }
}
