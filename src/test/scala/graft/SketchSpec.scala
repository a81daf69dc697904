package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Sketch aggregates can't hash-match a foreign engine (different sketch
  * internals), so q47 emits exact values + boolean within-bounds flags
  * (q101 pattern). This spec pins the flag semantics: every flag true on
  * real data, and the exact columns agree with an independent exact
  * aggregation.
  */
class SketchSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("q47: sketch flags all true; exact columns match a direct exact agg") {
    val li = Tables.lineitem(spark, sf)
    val rows = SparkEntry.queries("q47_sketches")(spark, sf)
      .collect().map(r => r.getString(0) -> r).toMap
    val exact = li.groupBy("l_returnflag")
      .agg(countDistinct(col("l_partkey")).as("n"),
        round(expr("percentile(l_extendedprice, 0.5)"), 4).as("p50x"),
        round(expr("percentile(l_extendedprice, 0.99)"), 4).as("p99x"))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(rows.keySet == exact.keySet)
    exact.foreach { case (flag, e) =>
      val a = rows(flag)
      assert(a.getLong(1) == e.getLong(1), s"$flag exact_parts")
      assert(a.getDouble(2) == e.getDouble(2), s"$flag p50_exact")
      assert(a.getDouble(3) == e.getDouble(3), s"$flag p99_exact")
      assert(a.getBoolean(4), s"$flag hll_ok")
      assert(a.getBoolean(5), s"$flag p50_ok")
      assert(a.getBoolean(6), s"$flag p99_ok")
    }
  }

  test("cmsHeavyHitters is exact even under an aggressively lossy sketch") {
    import spark.implicits._
    // skewed synthetic corpus: token tN appears ~1000/N times
    val docs = (1 to 60).flatMap(n => Seq.fill(1000 / n)(s"t$n"))
      .grouped(37).map(_.mkString(" ")).toSeq.toDF("text")
      .repartition(8)
    val exact = docs.select(explode(graft.functions.TextFunctions.tokens(col("text"))).as("t"))
      .groupBy("t").count().filter(col("count") >= 25)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // eps=0.5 -> width ~6: massive collisions, many false positives —
    // the exact-confirm pass must still produce exactly the true set
    val got = graft.operators.Corpus.cmsHeavyHitters(docs, "text",
        minCount = 25, eps = 0.5, confidence = 0.9)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(exact.nonEmpty && got == exact)
  }

  test("cmsHeavyHitters shingle form matches a relational recount") {
    import spark.implicits._
    val docs = Seq("a b c a b c a b c", "a b c d e", "x y", "").toDF("text")
    val got = graft.operators.Corpus.cmsHeavyHitters(docs, "text",
        minCount = 2, shingleN = 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // "a b c" occurs 3x in doc1 + 1x in doc2; "b c a"/"c a b" 2x each
    assert(got == Map("a b c" -> 4L, "b c a" -> 2L, "c a b" -> 2L))
  }
}
