package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge for custom Catalyst expressions: Column ⇄ Expression conversion is
  * private[sql] in Spark 4 (Column wraps a ColumnNode), so extension
  * libraries expose it through a shim in the sql package — the standard
  * pattern for third-party native expressions.
  */
object ColumnShim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Eager ColumnNode → Expression conversion. [[expression]] wraps the
    * node lazily (fine inside DataFrame plans, which convert during
    * analysis), but a FunctionBuilder must RETURN a real Expression tree —
    * a lazy wrapper surfaces as an uncompilable `columnnodeexpression`
    * at codegen. This runs the session converter up front, yielding the
    * same (possibly unresolved) tree the DataFrame API would produce.
    */
  def expressionNow(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter(c.node)
}
