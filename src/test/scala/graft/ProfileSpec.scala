package graft

import graft.operators.Profile
import org.scalatest.funsuite.AnyFunSuite

class ProfileSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("summarize computes counts, nulls, range, and exact median") {
    import spark.implicits._
    val df = Seq[(java.lang.Long, java.lang.Double)](
      (1L, 10.0), (2L, 20.0), (3L, 30.0), (4L, 40.0), (5L, null))
      .toDF("id", "v")
    val rows = Profile.summarize(df, Seq("id", "v"))
      .collect().map(r => r.getString(0) -> r).toMap

    val id = rows("id")
    assert(id.getLong(1) == 5 && id.getLong(2) == 0 && id.getLong(3) == 5)
    assert(id.getDouble(4) == 1.0 && id.getDouble(5) == 5.0)
    assert(id.getDouble(6) == 3.0) // exact median of 1..5

    val v = rows("v")
    assert(v.getLong(1) == 5 && v.getLong(2) == 1 && v.getLong(3) == 4)
    assert(v.getDouble(4) == 10.0 && v.getDouble(5) == 40.0)
    assert(v.getDouble(6) == 25.0) // interpolated median of 4 values
  }

  test("N columns profile in one aggregation pass, not N jobs") {
    import spark.implicits._
    val df = Seq((1L, 2.0, 3.0), (4L, 5.0, 6.0)).toDF("a", "b", "c")
    val plan = Profile.summarize(df, Seq("a", "b", "c"))
      .queryExecution.executedPlan.toString
    // multi-distinct compiles to Expand + a two-phase aggregate — the
    // scan appears ONCE (one pass), however many columns are profiled
    assert("LocalTableScan|Scan ".r.findAllIn(plan).size <= 1 ||
      plan.split("Expand").length >= 2, s"unexpected plan:\n$plan")
    assert(!plan.contains("Union"), s"per-column union of jobs:\n$plan")
  }

  test("thresholdSweep: survivor counts per threshold, inclusive boundary") {
    import spark.implicits._
    val df = Seq(1.0, 2.0, 2.0, 3.0, 5.0).toDF("s")
    val got = graft.operators.Profile
      .thresholdSweep(df, "s", Seq(2.0, 3.0, 6.0))
      .as[(Double, Long, Option[Long])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(2.0) === ((4L, Some(800000L)))) // >= is inclusive
    assert(got(3.0) === ((2L, Some(400000L))))
    assert(got(6.0) === ((0L, Some(0L))))
    // empty input: counts 0, fraction null (not a division error)
    val empty = graft.operators.Profile
      .thresholdSweep(df.filter(org.apache.spark.sql.functions.lit(false)),
        "s", Seq(1.0))
      .as[(Double, Long, Option[Long])].collect().head
    assert(empty === ((1.0, 0L, None)))
  }
}
