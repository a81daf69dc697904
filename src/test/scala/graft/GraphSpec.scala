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

  private def refPersonalized(n: Int, edges: Seq[(Long, Long)],
                              seeds: Set[Long], iters: Int,
                              d: Double): Map[Long, Double] = {
    val out = edges.groupBy(_._1).view.mapValues(_.size).toMap
    val p = (0 until n).map(i =>
      i.toLong -> (if (seeds(i.toLong)) 1.0 / seeds.size else 0.0)).toMap
    var r = p
    for (_ <- 1 to iters) {
      val in = edges.groupBy(_._2).view.mapValues(_.map { case (u, _) =>
        r(u) / out(u) }.sum).toMap
      r = (0 until n).map { i =>
        i.toLong -> ((1 - d) * p(i.toLong) + d * in.getOrElse(i.toLong, 0.0))
      }.toMap
    }
    r
  }

  test("personalizedPageRank matches the seeded reference; mass stays near seeds") {
    import spark.implicits._
    // path 0->1->2->3 plus a disconnected pair 10->11; seed = {0}
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 3L), (10L, 11L))
    val nodes = (Seq(0L, 1L, 2L, 3L, 10L, 11L)).toDF("id")
    val seeds = Seq(0L).toDF("id")
    val got = Graph.personalizedPageRank(nodes, edges.toDF("src", "dst"),
      seeds, iterations = 5)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val exp = refPersonalized(4, edges.take(3), Set(0L), 5, 0.85)
    Seq(0L, 1L, 2L, 3L).foreach(id =>
      assert(math.abs(got(id) - exp(id)) < 1e-12, s"node $id"))
    // nodes unreachable from the seed set hold ZERO personalized rank
    assert(got(10L) == 0.0 && got(11L) == 0.0)
    // rank decays with distance from the seed along the path
    assert(got(0L) > got(1L) && got(1L) > got(2L) && got(2L) > got(3L))
  }

  test("labelPropagation: two planted cliques converge to two labels, ties go small") {
    import spark.implicits._
    // two K4 cliques {0..3} and {10..13} joined by ONE bridge edge —
    // LPA must keep them as separate communities labeled by each
    // clique's smallest id
    val cliqueA = for { a <- 0 to 3; b <- 0 to 3 if a < b } yield (a.toLong, b.toLong)
    val cliqueB = for { a <- 10 to 13; b <- 10 to 13 if a < b } yield (a.toLong, b.toLong)
    val edges = (cliqueA ++ cliqueB ++ Seq((3L, 10L))).toDF("src", "dst")
    val got = Graph.labelPropagation(edges, iterations = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((0L to 3L).map(got).toSet.size == 1, s"clique A split: $got")
    assert((10L to 13L).map(got).toSet.size == 1, s"clique B split: $got")
    assert(got(0L) != got(11L), s"cliques merged: $got")
    // determinism: same inputs, same labeling
    val again = Graph.labelPropagation(edges, iterations = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(again == got)
  }

  test("labelPropagation round semantics: synchronous update, min-label ties") {
    import spark.implicits._
    // path 0-1-2: after ONE synchronous round every node adopts its
    // neighbors' min initial label: 0<-1, 1<-0 (ties 0,2 -> 0), 2<-1
    val edges = Seq((0L, 1L), (1L, 2L)).toDF("src", "dst")
    val got = Graph.labelPropagation(edges, iterations = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(0L -> 1L, 1L -> 0L, 2L -> 1L), s"got $got")
  }

  test("bfsDistances: hop distances, depth cap, unreachable absent") {
    import spark.implicits._
    // a path 0-1-2-3-4-5-6 plus an isolated pair 100-101
    val edges = ((0L to 5L).map(i => (i, i + 1)) ++ Seq((100L, 101L)))
      .toDF("src", "dst")
    val sources = Seq(0L).toDF("doc_id")
    val got = Graph.bfsDistances(edges, sources, idCol = "doc_id",
      maxDepth = 4).collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    // distances 0..4 present; 5,6 beyond the cap; 100/101 unreachable
    assert(got == Map(0L -> 0, 1L -> 1, 2L -> 2, 3L -> 3, 4L -> 4), s"got $got")
    // multi-source: nearest seed wins
    val got2 = Graph.bfsDistances(edges, Seq(0L, 6L).toDF("doc_id"),
      idCol = "doc_id", maxDepth = 4)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got2(3L) == 3 && got2(4L) == 2 && got2(5L) == 1 && got2(6L) == 0)
    // early exhaustion: a tiny component stops before maxDepth
    val got3 = Graph.bfsDistances(edges, Seq(100L).toDF("doc_id"),
      idCol = "doc_id", maxDepth = 50)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got3 == Map(100L -> 0, 101L -> 1))
  }

  test("kCore: cascade peels the tail, core survives with within-core degrees") {
    import spark.implicits._
    // K4 core {0..3} with a pendant chain 3-20-21: degree-1 nodes 21
    // then 20 peel in CASCADE (k=2, two rounds needed); the K4 keeps
    // within-core degree 3
    val k4 = for { a <- 0 to 3; b <- 0 to 3 if a < b } yield (a.toLong, b.toLong)
    val chain = Seq((3L, 20L), (20L, 21L))
    val edges = (k4 ++ chain).toDF("src", "dst")
    val got = Graph.kCore(edges, k = 2, rounds = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(0L -> 3L, 1L -> 3L, 2L -> 3L, 3L -> 3L), s"got $got")
    // one round only: 21 peels but 20 still had degree 2 at round
    // start — synchronous semantics
    val oneRound = Graph.kCore(edges, k = 2, rounds = 1)
      .collect().map(r => r.getLong(0)).toSet
    assert(oneRound == Set(0L, 1L, 2L, 3L, 20L), s"got $oneRound")
    // k above the max degree empties the graph
    assert(Graph.kCore(edges, k = 10, rounds = 4).count() == 0)
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
