package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into `private[sql]` surface needed by the graft engine's custom
  * Catalyst expressions (Spark 4 removed the public
  * `new Column(expr)` constructor in the Spark Connect refactor; classic
  * mode exposes the conversion via `classic.ExpressionUtils`, which is
  * package-private). Standard extension-library pattern.
  */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
