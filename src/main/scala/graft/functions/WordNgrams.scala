package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** `word_ngrams(text, n)` — ALL word n-grams of a document (one entry
  * per window position, NOT deduplicated), each the n tokens joined by a
  * single space, in document order. A doc with fewer than n words yields
  * an EMPTY array — the occurrence-counting semantics of
  * [[graft.ext.TextStats.collocations]]'s bigram stage (contrast
  * [[ShingleHash]], which clamps short docs to one whole-text shingle
  * because the SET semantics of Jaccard want every doc represented).
  *
  * Same byte-range trick as [[ShingleHash]]: `split(text, " ")` tokens
  * rejoined with `" "` reconstruct the input verbatim, so each n-gram is
  * a byte slice of the original string, copied out once — no interpreted
  * transform/slice/concat_ws chain, no per-window struct. The strings
  * themselves must exist here (they are downstream groupBy keys), so
  * this is one allocation per window, the floor for a string-keyed
  * aggregation.
  */
case class WordNgrams(child: Expression, n: Int) extends UnaryExpression {

  require(n >= 1, s"word_ngrams needs n >= 1, got $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"word_ngrams expects string, got ${other.simpleString}")
  }

  override def nullSafeEval(tv: Any): Any =
    WordNgrams.compute(tv.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.functions.WordNgrams$$.MODULE$$.compute($t, $n);")

  override protected def withNewChildInternal(newChild: Expression): WordNgrams =
    copy(child = newChild)
}

object WordNgrams {
  def compute(s: UTF8String, n: Int): ArrayData = {
    val bytes = s.numBytes()
    val base = s.getBaseObject
    val off = s.getBaseOffset
    var spaces = 0
    var i = 0
    while (i < bytes) {
      if (s.getByte(i) == 0x20) spaces += 1
      i += 1
    }
    val m = spaces + 1
    if (m < n) return new GenericArrayData(Array.empty[Any])
    val starts = new Array[Int](m)
    val ends = new Array[Int](m)
    var t = 0
    i = 0
    while (i < bytes) {
      if (s.getByte(i) == 0x20) { ends(t) = i; t += 1; starts(t) = i + 1 }
      i += 1
    }
    ends(t) = bytes
    val nWin = m - n + 1
    val out = new Array[Any](nWin)
    var w = 0
    while (w < nWin) {
      val s0 = starts(w)
      val len = ends(w + n - 1) - s0
      val b = new Array[Byte](len)
      Platform.copyMemory(base, off + s0, b, Platform.BYTE_ARRAY_OFFSET, len)
      out(w) = UTF8String.fromBytes(b)
      w += 1
    }
    new GenericArrayData(out)
  }
}
