package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `word_counts(text)` — per-document term frequencies in ONE byte scan:
  * `array<struct<term string, cnt int>>`, value-equivalent to
  *
  * {{{ SELECT term, count(*) FROM unnest(split(text, ' ')) GROUP BY term }}}
  *
  * in first-occurrence order (deterministic for a given text; row order
  * is irrelevant downstream — every consumer explodes and re-aggregates
  * or re-sorts). Single-space split semantics (= DuckDB
  * `string_split(text, ' ')`): empty tokens from separator runs count
  * like any other term.
  *
  * This is the map-side half of every corpus term statistic: per-doc
  * term counts need no cross-partition data, yet the
  * `explode -> groupBy(doc_id, term)` formulation it replaces funneled
  * every token OCCURRENCE through a corpus-wide exchange (Spark cannot
  * know doc rows never span partitions). With `word_counts` the tf table
  * materializes shuffle-free, and downstream aggregations (document
  * frequency, corpus unigram counts) start from one row per distinct
  * term per doc instead of one row per token.
  *
  * Mechanics mirror [[WordProfile]]: tokens are (start,len) byte ranges
  * in an open-addressing table (FNV-1a probe, byte-compare on
  * collision), so nothing is materialized until output, where each
  * distinct term is copied out once. Null text => NULL array, matching
  * `split`'s null propagation.
  */
case class WordCounts(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("term", StringType, nullable = false),
      StructField("cnt", IntegerType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"word_counts expects string, got ${other.simpleString}")
  }

  override def nullSafeEval(tv: Any): Any = counts(tv.asInstanceOf[UTF8String])

  def counts(s: UTF8String): GenericArrayData = {
    val bytes = s.getBytes
    val n = bytes.length
    // pass 1: spaces -> token count m = spaces + 1 sizes the table
    var spaces = 0
    var i = 0
    while (i < n) {
      if (bytes(i) == 0x20) spaces += 1
      i += 1
    }
    val m = spaces + 1
    var cap = 4
    while (cap < m * 2) cap <<= 1
    val mask = cap - 1
    // packed (start << 32 | len), -1 = empty; counts and first-occurrence
    // order in parallel arrays
    val packed = new Array[Long](cap)
    java.util.Arrays.fill(packed, -1L)
    val cnt = new Array[Int](cap)
    val order = new Array[Int](m)
    var nUniq = 0

    var start = 0
    i = 0
    while (i <= n) {
      if (i == n || bytes(i) == 0x20) {
        val len = i - start
        var h = 0x811c9dc5
        var b = start
        while (b < i) { h = (h ^ (bytes(b) & 0xff)) * 0x01000193; b += 1 }
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
        start = i + 1
      }
      i += 1
    }

    val out = new Array[Any](nUniq)
    var j = 0
    while (j < nUniq) {
      val slot = order(j)
      val p = packed(slot)
      val os = (p >>> 32).toInt
      val ol = (p & 0xffffffffL).toInt
      // copy the term bytes out: `bytes` may alias a reusable scan buffer
      // (UTF8String.getBytes returns the backing array when exactly
      // positioned), so the emitted rows must own their storage
      out(j) = new GenericInternalRow(Array[Any](
        UTF8String.fromBytes(java.util.Arrays.copyOfRange(bytes, os, os + ol)),
        cnt(slot)))
      j += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("wordCounts", this, classOf[WordCounts].getName)
    nullSafeCodeGen(ctx, ev, t => s"${ev.value} = $ref.counts($t);")
  }

  override protected def withNewChildInternal(newChild: Expression): WordCounts =
    copy(child = newChild)
}
