package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `ngram_counts(text, n)` — per-document word-n-gram OCCURRENCE counts
  * in ONE byte scan: `array<struct<term string, cnt int>>` where `term`
  * is the n tokens joined by a single space, value-equivalent to
  * exploding [[WordNgrams]] and grouping — but without materializing one
  * string per window position, and without the corpus-wide exchange an
  * `explode -> groupBy(doc_id, b)` formulation forces (Spark cannot know
  * doc rows never span partitions). `ngram_counts(text, 1)` agrees with
  * [[WordCounts]]; a doc with fewer than n tokens yields an EMPTY array
  * (the occurrence semantics — contrast [[ShingleHash]]'s whole-text
  * clamp for SET semantics).
  *
  * This is the map-side half of the n-gram language model
  * ([[graft.ext.LmScore]]): per-doc n-gram counts need no
  * cross-partition data, so both training (corpus counts = one shuffle
  * over the per-doc rows) and scoring (join per-doc rows to the model)
  * start from one row per distinct n-gram per doc instead of one row per
  * window position of the corpus.
  *
  * Mechanics: single-space token boundaries (= `split(text, ' ')`,
  * empty tokens from separator runs are tokens) collected in one pass;
  * each window is then a CONTIGUOUS byte slice of the original string
  * (tokens rejoined with the same separator reconstruct the input —
  * the [[WordNgrams]]/[[ShingleHash]] identity), hashed and counted in
  * an open-addressing table of (start, len) ranges with byte-compare on
  * collision; each distinct n-gram's bytes are copied out once, in
  * first-occurrence order. Null text => NULL array.
  */
case class NgramCounts(child: Expression, n: Int) extends UnaryExpression {

  require(n >= 1, s"ngram_counts needs n >= 1, got $n")

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("term", StringType, nullable = false),
      StructField("cnt", IntegerType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"ngram_counts expects string, got ${other.simpleString}")
  }

  override def nullSafeEval(tv: Any): Any =
    NgramCounts.compute(tv.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.functions.NgramCounts$$.MODULE$$.compute($t, $n);")

  override protected def withNewChildInternal(newChild: Expression): NgramCounts =
    copy(child = newChild)
}

object NgramCounts {
  def compute(s: UTF8String, n: Int): GenericArrayData = {
    val bytes = s.getBytes
    val nb = bytes.length
    // pass 1: token starts (a token begins at 0 and after every space)
    var spaces = 0
    var i = 0
    while (i < nb) {
      if (bytes(i) == 0x20) spaces += 1
      i += 1
    }
    val m = spaces + 1
    val wins = m - n + 1
    if (wins <= 0) return new GenericArrayData(new Array[Any](0))

    val starts = new Array[Int](m)
    starts(0) = 0
    var tok = 1
    i = 0
    while (i < nb) {
      if (bytes(i) == 0x20) { starts(tok) = i + 1; tok += 1 }
      i += 1
    }
    // token j ends at starts(j+1)-1 (the space) or nb for the last;
    // window w spans [starts(w), end(w+n-1))
    @inline def tokEnd(j: Int): Int = if (j == m - 1) nb else starts(j + 1) - 1

    var cap = 4
    while (cap < wins * 2) cap <<= 1
    val mask = cap - 1
    val packed = new Array[Long](cap)
    java.util.Arrays.fill(packed, -1L)
    val cnt = new Array[Int](cap)
    val order = new Array[Int](wins)
    var nUniq = 0

    var w = 0
    while (w < wins) {
      val start = starts(w)
      val end = tokEnd(w + n - 1)
      val len = end - start
      var h = 0x811c9dc5
      var b = start
      while (b < end) { h = (h ^ (bytes(b) & 0xff)) * 0x01000193; b += 1 }
      var slot = h & mask
      var done = false
      while (!done) {
        val p = packed(slot)
        if (p == -1L) {
          packed(slot) = (start.toLong << 32) | (len.toLong & 0xffffffffL)
          cnt(slot) = 1
          order(nUniq) = slot
          nUniq += 1
          done = true
        } else {
          val os = (p >>> 32).toInt
          val ol = (p & 0xffffffffL).toInt
          if (ol == len) {
            var b2 = 0
            while (b2 < len && bytes(os + b2) == bytes(start + b2)) b2 += 1
            if (b2 == len) { cnt(slot) += 1; done = true }
            else slot = (slot + 1) & mask
          } else slot = (slot + 1) & mask
        }
      }
      w += 1
    }

    val out = new Array[Any](nUniq)
    var j = 0
    while (j < nUniq) {
      val slot = order(j)
      val p = packed(slot)
      val os = (p >>> 32).toInt
      val ol = (p & 0xffffffffL).toInt
      // copy out: `bytes` may alias a reusable scan buffer
      out(j) = new GenericInternalRow(Array[Any](
        UTF8String.fromBytes(java.util.Arrays.copyOfRange(bytes, os, os + ol)),
        cnt(slot)))
      j += 1
    }
    new GenericArrayData(out)
  }
}
