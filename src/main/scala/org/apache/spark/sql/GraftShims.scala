package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Spark 4 moved the Expression <-> Column bridge behind `private[sql]`
  * (`classic/columnNodeSupport.scala`); graft needs it to plan custom
  * expressions whose constructor state only exists at RUNTIME — a trained
  * [[graft.ext.BpeTable]], where the registry-bound `bpe_encode` is pinned
  * to the Standard table at session-extension time. This is the
  * ecosystem-standard re-export shim (frameless / delta use the same
  * trick); nothing else in graft may reach through it.
  */
object GraftShims {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
