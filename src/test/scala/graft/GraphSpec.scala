package graft

import graft.operators.Graph
import org.scalatest.funsuite.AnyFunSuite

class GraphSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  /** Local reference power iteration with the operator's exact update
    * rule (teleport + damped in-sums, dangling mass leaks).
    */
  private def refRanks(n: Int, edges: Seq[(Long, Long)], iters: Int,
                       d: Double): Map[Long, Double] = {
    val out = edges.groupBy(_._1).view.mapValues(_.size).toMap
    var r = (0 until n).map(i => i.toLong -> 1.0 / n).toMap
    for (_ <- 1 to iters) {
      val in = edges.groupBy(_._2).view.mapValues { es =>
        es.map { case (s, _) => r(s) / out(s) }.sum
      }.toMap
      r = (0 until n).map { i =>
        i.toLong -> ((1 - d) / n + d * in.getOrElse(i.toLong, 0.0))
      }.toMap
    }
    r
  }

  test("pageRank matches the reference power iteration on a hand graph") {
    import spark.implicits._
    // 0 is a hub (3 in-links), 3 has none; 2 dangles mass through 0.
    val edges = Seq((0L, 1L), (1L, 0L), (2L, 0L), (3L, 0L), (3L, 2L))
    val nodes = (0L to 3L).toDF("id")
    val got = Graph.pageRank(nodes, edges.toDF("src", "dst"), iterations = 5)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val exp = refRanks(4, edges, 5, 0.85)
    assert(got.keySet == exp.keySet)
    got.foreach { case (id, v) => assert(math.abs(v - exp(id)) < 1e-12, s"node $id") }
    // hub ranks highest; the no-in-link node holds only teleport mass
    assert(got(0L) == got.values.max)
    assert(math.abs(got(3L) - 0.15 / 4) < 1e-12)
  }

  test("triangleCounts: K4 membership, star is triangle-free, reverse dups collapse") {
    import spark.implicits._
    val k4 = for { a <- 0 to 3; b <- 0 to 3 if a < b } yield (a.toLong, b.toLong)
    val star = (10L to 15L).map(i => (9L, i))
    val edges = (k4 ++ star ++ Seq((1L, 0L), (0L, 1L))).toDF("src", "dst")
    val got = Graph.triangleCounts(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // every K4 node sits in C(3,2)=3 triangles; star nodes in none
    assert(got == Map(0L -> 3L, 1L -> 3L, 2L -> 3L, 3L -> 3L), s"got $got")
  }

  test("pageRank on a cycle is uniform (mass conserved, no dangling)") {
    import spark.implicits._
    val nodes = (0L to 4L).toDF("id")
    val edges = (0L to 4L).map(i => (i, (i + 1) % 5)).toDF("src", "dst")
    val got = Graph.pageRank(nodes, edges, iterations = 3)
      .collect().map(_.getDouble(1))
    got.foreach(v => assert(math.abs(v - 0.2) < 1e-12))
  }
}
