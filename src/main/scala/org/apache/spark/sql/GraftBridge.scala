package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal bridge into the `sql` package: Column ⇄ Expression conversion
  * is `private[sql]` in Spark 4 (classic.ExpressionUtils), and custom
  * Catalyst expressions (SURVEY.md §2.8) need it to surface as Columns.
  * Public-API-only passthrough, no behavior. */
object GraftBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
