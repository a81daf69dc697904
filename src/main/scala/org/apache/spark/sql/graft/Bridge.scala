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

  /** Neutral view of a Column's predicate structure. Spark 4 keeps a
    * user-built Column as a `private[sql]` ColumnNode tree until
    * resolution, so outside-package consumers (Layout.toStatPred's
    * stats-pruning compiler) get this minimal public mirror instead:
    * functions with their argument trees, attribute names, literal
    * values (already external Scala values at this layer), and an
    * opaque marker for everything else.
    */
  sealed trait PredNode
  final case class PredFunc(name: String, args: Seq[PredNode]) extends PredNode
  final case class PredAttr(name: String) extends PredNode
  final case class PredLit(value: Any) extends PredNode
  case object PredOpaque extends PredNode

  def predicateTree(c: Column): PredNode = walk(c.node)

  private def walk(n: org.apache.spark.sql.internal.ColumnNode): PredNode =
    n match {
      case f: org.apache.spark.sql.internal.UnresolvedFunction =>
        PredFunc(f.functionName, f.arguments.map(walk))
      case a: org.apache.spark.sql.internal.UnresolvedAttribute =>
        PredAttr(a.nameParts.mkString("."))
      case l: org.apache.spark.sql.internal.Literal =>
        PredLit(l.value)
      case _ => PredOpaque
    }
}
