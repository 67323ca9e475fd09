package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into `org.apache.spark.sql.classic.ExpressionUtils` (which is
  * `private[sql]` at the Scala level but public bytecode). Lets graft
  * build Columns directly from its native Catalyst expressions —
  * [[graft.expressions.WordTokens]], [[graft.expressions.WordNGrams]] —
  * without a per-session function-registry round trip, so the operator
  * API works with ANY session (or before one exists), exactly like the
  * composed-Column formulations it replaced. The SQL-name surface
  * (`graft_tokens`, `graft_ngrams`, …) is still registered separately via
  * `GraftFunctions.register` / `GraftExtensions`.
  *
  * Standard third-party-extension technique (a single `org.apache.spark.
  * sql` package object shim); contains no logic of its own.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
