package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge: Spark 4's `Column` wraps a ColumnNode
  * and the converters live behind `private[sql]`, so direct-Column
  * native expressions need one accessor inside the sql package — the
  * same well-known pattern open-source Spark extensions use (an
  * sql-package accessor object; see SNIPPETS.md [2], Qbeast's
  * DatasetFactory). Lets `graft.functions` build native expressions as
  * Columns without the per-session function-registry round-trip.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
