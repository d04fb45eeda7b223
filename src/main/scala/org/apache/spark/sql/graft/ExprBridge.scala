package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Compile-checked access to the `private[sql]` Column↔Expression
  * converters. Lets the library construct its native expressions
  * (TokenRuns/ShingleRuns) directly into a Column instead of routing
  * through `call_function`, which resolves by NAME in whatever session is
  * active at ANALYSIS time — a Column built on a thread with no active
  * session, analyzed in a session not covered by `Tables.t` or
  * GraftExtensions, would fail with an unresolved function. Direct
  * construction has no registry dependency at all.
  */
object ExprBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
