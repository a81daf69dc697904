package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Sketch aggregates can't hash-match a foreign engine (different sketch
  * internals), so their accuracy is asserted against exact values here.
  */
class SketchSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("approx_count_distinct within 5% of exact; p50/p99 within the value range") {
    val li = Tables.lineitem(spark, sf)
    val approx = SparkEntry.queries("q47_sketches")(spark, sf)
      .collect().map(r => r.getString(0) -> r).toMap
    val exact = li.groupBy("l_returnflag")
      .agg(countDistinct(col("l_partkey")).as("n"),
        expr("percentile(l_extendedprice, 0.5)").as("p50x"))
      .collect().map(r => r.getString(0) -> r).toMap
    exact.foreach { case (flag, e) =>
      val a = approx(flag)
      val rel = math.abs(a.getLong(1).toDouble - e.getLong(1)) / e.getLong(1)
      assert(rel < 0.05, s"$flag HLL error $rel")
      val p50 = a.getDouble(2)
      assert(math.abs(p50 - e.getDouble(2)) / e.getDouble(2) < 0.05,
        s"$flag p50 $p50 vs ${e.getDouble(2)}")
      assert(a.getDouble(3) >= p50) // p99 >= p50
    }
  }
}
