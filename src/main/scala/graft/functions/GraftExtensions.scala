package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point: registers the engine's native
  * expressions at session build time, so a cluster deployment enables them
  * with
  *
  * {{{
  * spark.sql.extensions=graft.functions.GraftExtensions
  * }}}
  *
  * (or `SparkSession.builder().withExtensions(new GraftExtensions)`).
  * The imperative `ArrayDot.ensureRegistered` path remains for sessions
  * the library does not construct — both routes resolve the same
  * expression.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(
      (
        FunctionIdentifier(ArrayDot.name),
        new ExpressionInfo(classOf[ArrayDot].getName, null, ArrayDot.name),
        (exprs: Seq[Expression]) => ArrayDot(exprs.head, exprs(1))
      )
    )
  }
}
