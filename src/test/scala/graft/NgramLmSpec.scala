package graft

import graft.operators.Corpus
import org.scalatest.funsuite.AnyFunSuite

class NgramLmSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("bigram LM score matches a hand computation") {
    import spark.implicits._
    val docs = Seq((1L, "a b a b"), (2L, "b a c")).toDF("doc_id", "text")
    val got = Corpus.ngramLmScore(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // unigrams a:3 b:3 c:1, V=3; c12: (a,b)=2 (b,a)=2 (a,c)=1
    // terms: (a,b) = 2e6 div 6 = 333333; (b,a) = 333333; (a,c) = 166666
    assert(got(1L) == (2 * 333333L + 333333L, 3L)) // a b, a b, b a
    assert(got(2L) == (333333L + 166666L, 2L))     // b a, a c
  }

  test("documents with fewer than two tokens contribute no rows") {
    import spark.implicits._
    val docs = Seq((1L, "solo"), (2L, ""), (3L, "x y")).toDF("doc_id", "text")
    val ids = Corpus.ngramLmScore(docs, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    assert(ids == Set(3L))
  }

  test("rank order penalizes out-of-model-ish (rare) bigrams") {
    import spark.implicits._
    // "a b" dominates the corpus; doc 9's bigrams are one-off
    val docs = (1L to 8L).map(i => (i, "a b a b a b"))
      .:+((9L, "q r q s q t")).toDF("doc_id", "text")
    val rows = Corpus.ngramLmScore(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(rows(9L) < rows(1L), s"rare-bigram doc should score lower: $rows")
  }

  test("the only nested-loop join is the broadcast 1-row vocab size") {
    import spark.implicits._
    val docs = Seq((1L, "a b c"), (2L, "b c d")).toDF("doc_id", "text")
    val plan = Corpus.ngramLmScore(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), s"cartesian in plan:\n$plan")
    // scoring joins are equi-joins (hash-based), not nested loops
    val bnlj = "BroadcastNestedLoopJoin".r.findAllIn(plan).size
    assert(bnlj <= 1, s"unexpected nested-loop joins:\n$plan")
  }
}
