package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `bpe_encode(word)` — merges-table byte-pair encoding of one
  * pretokenized word into subword tokens (`array<string>`).
  *
  * The merges table is constructor state (fixed at plan time, like
  * [[MinHashSig]]'s seeds); the algorithm is the standard BPE encoder:
  * split to characters, then repeatedly find the LOWEST-RANK adjacent
  * token pair present in the table and merge every (non-overlapping,
  * left-to-right) occurrence of that one pair, until no adjacent pair is
  * in the table. [[graft.ext.BpeTable]] rejects rules with left == right,
  * which makes each merge pass conflict-free — the property that lets the
  * `q_bpe_tokens` oracle replay the loop as a parallel list rewrite.
  *
  * The loop is inherently imperative, so codegen emits one call into the
  * table object (kept inside the whole-stage-codegen span, like Spark's
  * own regexp expressions) rather than inlining it.
  */
case class BpeEncode(child: Expression, table: graft.ext.BpeTable)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bpe_encode expects string, got ${other.simpleString}")
  }

  override def nullSafeEval(wv: Any): Any =
    table.encodeArrayData(wv.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, w => {
      val tableRef = ctx.addReferenceObj("bpeTable", table,
        classOf[graft.ext.BpeTable].getName)
      s"${ev.value} = $tableRef.encodeArrayData($w);"
    })

  override protected def withNewChildInternal(newChild: Expression): BpeEncode =
    copy(child = newChild)
}

object BpeEncode {
  /** `new GenericArrayData` helper kept here so [[graft.ext.BpeTable]]
    * stays free of codegen imports. */
  def toArrayData(tokens: Array[String]): GenericArrayData =
    new GenericArrayData(tokens.map(t => UTF8String.fromString(t): Any))
}
