package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `cms_est(term)` — Count-Min point estimate of a term's stream count
  * against a plan-time sketch ([[graft.ext.CountMin.Evaluator]] is
  * constructor state, like [[BpeEncode]]'s merges table: a sketch is a
  * small bounded summary MEANT to be shipped into the plan).
  *
  * This is the native replacement for the typed UDF the heavy-hitter
  * candidate filter first used: same JVM md5 + KM-mix code path as the
  * sketch-building aggregator (writer/reader agreement stays
  * structural), but evaluated directly on the UTF8String's bytes — no
  * ScalaUDF row conversion, no String allocation — and codegen emits
  * one call into the evaluator object, keeping the filter inside the
  * whole-stage-codegen span (the same shape Spark's own regexp
  * expressions use).
  */
case class CmsEst(child: Expression, eval: graft.ext.CountMin.Evaluator)
    extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"cms_est expects string, got ${other.simpleString}")
  }

  override def nullSafeEval(v: Any): Any =
    eval.est(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t => {
      val ref = ctx.addReferenceObj("cmsEval", eval,
        classOf[graft.ext.CountMin.Evaluator].getName)
      s"${ev.value} = $ref.est($t);"
    })

  override protected def withNewChildInternal(newChild: Expression): CmsEst =
    copy(child = newChild)
}
