package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Hilbert-curve clustering values — the locality-preserving sibling
  * of [[Layout]]'s Z-order (`zValue`): both linearize 2D keys for
  * sorted/range-partitioned layouts, but the Hilbert curve's unit-step
  * property (consecutive indices are ALWAYS grid-adjacent — no Z-curve
  * jumps across the plane) gives tighter per-file bounding boxes and
  * therefore better min/max pruning on both dimensions. The published
  * xy2d/d2xy algorithm (the rot-and-reflect form in Hamilton's and
  * Wikipedia's presentation).
  *
  * Spark-first: [[hilbertValue]] is the loop UNROLLED into pure Column
  * arithmetic — `order` levels of when/bitwise ops, no UDF — so the
  * whole computation fuses into whole-stage codegen and is usable
  * directly as a repartitionByRange/sortWithinPartitions key at any
  * scale. The Scala [[xy2d]]/[[d2xy]] pair backs the spec's exhaustive
  * property proof (bijection + unit steps = a Hilbert curve) and range
  * planning on the read side.
  */
object Hilbert {

  /** Pure-Scala forward map (grid of 2^order per side). */
  def xy2d(order: Int, x0: Int, y0: Int): Long =
    xy2dLong(order, x0.toLong, y0.toLong)

  /** The kernel the codegen'd expression calls per row. */
  def xy2dLong(order: Int, x0: Long, y0: Long): Long = {
    require(order >= 1 && order <= 31, s"order $order out of range")
    val n = 1L << order
    require(x0 >= 0 && x0 < n && y0 >= 0 && y0 < n,
      s"point ($x0,$y0) outside the $n x $n grid")
    var x = x0
    var y = y0
    var d = 0L
    var s = n >>> 1
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val t = x; x = y; y = t
      }
      s >>>= 1
    }
    d
  }

  /** Pure-Scala inverse map. */
  def d2xy(order: Int, d0: Long): (Int, Int) = {
    require(order >= 1 && order <= 31, s"order $order out of range")
    val n = 1 << order
    require(d0 >= 0 && d0 < n.toLong * n, s"index $d0 outside the curve")
    var x = 0
    var y = 0
    var t = d0
    var s = 1
    while (s < n) {
      val rx = (1L & (t / 2)).toInt
      val ry = (1L & (t ^ rx)).toInt
      if (ry == 0) {
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val tmp = x; x = y; y = tmp
      }
      x += s * rx
      y += s * ry
      t /= 4
      s <<= 1
    }
    (x, y)
  }

  /** The forward map as a Column — a NATIVE codegen expression (one
    * JIT-ed while-loop per row). An unrolled when/bitwise Column form
    * re-references x and y several times per level, so its expression
    * TREE grows ~5^order nodes and analysis/codegen time explodes;
    * the native expression is constant-size regardless of order.
    */
  def hilbertValue(order: Int, xCol: Column, yCol: Column): Column = {
    require(order >= 1 && order <= 31, s"order $order out of range")
    val b = org.apache.spark.sql.graft.Bridge
    b.column(graft.plans.HilbertExpression(
      b.expression(xCol.cast("long")), b.expression(yCol.cast("long")),
      order))
  }
}
