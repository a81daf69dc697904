package graft

import graft.operators.Joins
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class JoinsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("rangeJoinBinned equals the naive range join, including bin edges") {
    import spark.implicits._
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000)
    // points straddling bin boundaries (bin = 600 s) and interval edges
    val points = (0L until 40L).map(i => (i, "u" + (i % 3), ts(i * 137)))
      .toDF("event_id", "user_id", "ts")
    val intervals = Seq(
      ("u0", ts(0), ts(600)),     // exactly one bin
      ("u1", ts(599), ts(601)),   // crosses a bin boundary
      ("u2", ts(1200), ts(4000)), // many bins
      ("u0", ts(5000), ts(5100))  // empty interval (no points)
    ).toDF("user_id", "s", "e")
    val binned = Joins.rangeJoinBinned(points, "ts", intervals, "s", "e",
      "user_id", binSeconds = 600)
      .select("event_id", "s").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1))).toSet
    val naive = points.join(intervals, Seq("user_id"))
      .filter(col("ts") >= col("s") && col("ts") <= col("e"))
      .select("event_id", "s").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1))).toSet
    assert(binned == naive && naive.nonEmpty)
  }

  test("intervalOverlapJoin equals the naive overlap join, one row per pair") {
    import spark.implicits._
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000)
    // long intervals spanning MANY shared bins — dedup-by-first-bin must
    // still emit each overlapping pair exactly once
    val left = Seq(
      ("u0", 1L, ts(0), ts(5000)),
      ("u0", 2L, ts(6000), ts(7000)),
      ("u1", 3L, ts(100), ts(200))
    ).toDF("user_id", "lid", "ls", "le")
    val right = Seq(
      ("u0", 10L, ts(4000), ts(6500)), // overlaps 1 AND 2
      ("u0", 11L, ts(9000), ts(9100)), // overlaps none
      ("u1", 12L, ts(150), ts(400))    // overlaps 3
    ).toDF("user_id", "rid", "rs", "re")
    val binned = Joins.intervalOverlapJoin(left, "ls", "le", right, "rs", "re",
      "user_id", binSeconds = 600)
      .select("lid", "rid").collect().map(r => (r.getLong(0), r.getLong(1)))
    val naive = left.join(right, Seq("user_id"))
      .filter(col("ls") <= col("re") && col("rs") <= col("le"))
      .select("lid", "rid").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(binned.sorted.toSeq == naive.sorted.toSeq) // exact multiset equality
    assert(binned.toSet == Set((1L, 10L), (2L, 10L), (3L, 12L)))
  }

  test("asOfJoin: hand-computed backward matches, ties, and no-match nulls") {
    import spark.implicits._
    val left = Seq(
      (1L, "u1", 100L), // after r@50 → matches 50
      (2L, "u1", 50L),  // equal time → matches 50
      (3L, "u1", 10L),  // before any right row → null
      (4L, "u2", 99L)   // u2 has no right rows at all → null
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      ("u1", 50L, 500L, 1.5),
      ("u1", 70L, 700L, 2.5) // later than event 1? no: 70 <= 100 → wins for event 1
    ).toDF("user_id", "ts", "purchase_id", "purchase_value")

    val out = Joins.asOfJoin(left, right, "user_id", "ts", "ts",
      Seq("purchase_id", "purchase_value"))
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(3)) -1L else r.getLong(3))).toMap

    assert(out(1L) == 700L) // latest at-or-before 100
    assert(out(2L) == 500L) // equal-time match
    assert(out(3L) == -1L)
    assert(out(4L) == -1L)
  }

  test("saltedJoin equals the plain join") {
    import spark.implicits._
    val skewed = (1 to 500).map(i => (i % 3 + 1, s"row$i")).toDF("k", "v")
    val dim = Seq((1, "a"), (2, "b"), (3, "c"), (4, "unused")).toDF("k", "name")
    val salted = Joins.saltedJoin(skewed, dim, "k", saltFactor = 5)
      .groupBy("name").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val plain = skewed.join(dim, "k")
      .groupBy("name").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == plain)
  }

  test("bucketed tables join without a shuffle exchange") {
    import spark.implicits._
    // orphaned warehouse dirs from a previous JVM (fresh in-memory
    // catalog doesn't know them) block saveAsTable — clear first
    for (t <- Seq("bkt_a", "bkt_b")) {
      spark.sql(s"DROP TABLE IF EXISTS $t")
      graft.queries.Fixtures.fresh(s"spark-warehouse/$t")
    }
    val a = (1 to 1000).map(i => (i.toLong, s"a$i")).toDF("k", "va")
    val b = (1 to 1000).map(i => (i.toLong, s"b$i")).toDF("k", "vb")
    a.write.mode("overwrite").bucketBy(4, "k").sortBy("k").saveAsTable("bkt_a")
    b.write.mode("overwrite").bucketBy(4, "k").sortBy("k").saveAsTable("bkt_b")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("bkt_a").join(spark.table("bkt_b"), "k")
      joined.count()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan.take(600))
      // co-located bucketed join: no hash-partitioning exchange on either side
      assert(!plan.contains("Exchange hashpartitioning"), plan.take(1500))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    }
  }

  test("depthCurve: tiled carry algebra matches the plain per-key window, any tile width") {
    import spark.implicits._
    import graft.operators.Joins
    // hostile shape: overlapping, nested, touching ([10,20)+[20,30)
    // must not double-count at 20), duplicate intervals, and a second
    // key with its own geometry
    val iv = Seq(
      ("chr1", 10L, 20L), ("chr1", 20L, 30L), ("chr1", 12L, 28L),
      ("chr1", 12L, 28L), ("chr1", 5L, 100L), ("chr1", 95L, 96L),
      ("chr2", 0L, 64L), ("chr2", 63L, 65L), ("chr2", 64L, 70L)
    ).toDF("contig", "s", "e")
    // reference: one plain window per key (the form that serializes a
    // hot chromosome at scale — exact at test size)
    val ref = {
      val ev = iv.select(col("contig"), col("s").as("pos"), lit(1L).as("d"))
        .unionAll(iv.select(col("contig"), col("e").as("pos"), lit(-1L).as("d")))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("contig").orderBy("pos")
      ev.groupBy("contig", "pos").agg(sum("d").as("net"))
        .filter(col("net") =!= 0)
        .withColumn("depth", sum("net").over(w))
        .select("contig", "pos", "depth")
        .as[(String, Long, Long)].collect().toSet
    }
    // tiny tiles force cross-tile carries; huge tiles degenerate to one
    // tile per key — both must land on the identical curve
    for (bits <- Seq(2, 6, 30)) {
      val got = Joins.depthCurve(iv, "contig", "s", "e", tileBits = bits)
        .as[(String, Long, Long)].collect().toSet
      assert(got === ref, s"tileBits=$bits")
    }
    // depth returns to zero after the last boundary of each key
    val byKey = ref.groupBy(_._1).map { case (k, rows) =>
      k -> rows.toSeq.sortBy(_._2).last._3
    }
    assert(byKey.values.forall(_ == 0L), s"non-closing curve: $byKey")
  }

  test("liftOver: strand arithmetic, block boundaries, unmapped nulls") {
    import spark.implicits._
    val chain = Seq(
      ("c0", 100L, 200L, "d0", 5000L, "+"),
      ("c0", 300L, 400L, "d1", 9000L, "-"),
      ("c1", 100L, 200L, "d2", 100L, "+")
    ).toDF("src_chrom", "src_start", "src_end",
      "dst_chrom", "dst_start", "strand")
    val pos = Seq(
      (1L, "c0", 150L),  // -> d0 5050
      (2L, "c0", 399L),  // '-' block end: 9000 + (400-1-399) = 9000
      (3L, "c0", 300L),  // '-' block start: 9000 + 99 = 9099
      (4L, "c0", 250L),  // gap between blocks -> unmapped
      (5L, "c0", 200L),  // half-open end is OUTSIDE the block
      (6L, "c1", 100L),  // inclusive start -> d2 100
      (7L, "c9", 150L)   // chrom with no chain -> unmapped
    ).toDF("id", "chrom", "pos")
    // tiny tiles (64 bp) force every block across multiple tiles
    val got = graft.operators.Joins
      .liftOver(pos, "chrom", "pos", chain, tileBits = 6)
      .as[(Long, String, Long, Option[String], Option[Long])]
      .collect().map(r => r._1 -> ((r._4, r._5))).toMap
    assert(got(1L) === ((Some("d0"), Some(5050L))))
    assert(got(2L) === ((Some("d1"), Some(9000L))))
    assert(got(3L) === ((Some("d1"), Some(9099L))))
    assert(got(4L) === ((None, None)))
    assert(got(5L) === ((None, None)))
    assert(got(6L) === ((Some("d2"), Some(100L))))
    assert(got(7L) === ((None, None)))
    assert(got.size === 7, "multi-tile blocks must not duplicate matches")
  }
test("interpolateLinear fills interior buckets exactly; edges stay null") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val events = Seq(
      (1L, 0L, 10.0), (1L, 100L, 30.0), // linear ramp 10 -> 30 over 100 s
      (2L, 50L, 5.0)                    // single observation: no interior
    ).toDF("user_id", "es", "value")
      .withColumn("ts", to_timestamp(col("es")))
    val got = graft.operators.Joins
      .interpolateLinear(events, "user_id", "ts", "value", stepSeconds = 20L)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    for ((t, v) <- Seq(0L -> 10.0, 20L -> 14.0, 40L -> 18.0,
        60L -> 22.0, 80L -> 26.0, 100L -> 30.0))
      assert(got((1L, t)) == Some(v), s"bucket $t")
    // key 2: spine = [40, 40]; no PAST observation at 40 -> strict null
    assert(got((2L, 40L)).isEmpty)
    assert(got.size == 7)
  }
}
