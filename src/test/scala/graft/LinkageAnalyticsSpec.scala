package graft

import graft.operators.{Corpus, Dedup, EntityResolution, Joins, Similarity}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Hand-computable edge cases for the linkage/analytics batch
  * (q186, q190-q208) — the oracle rows prove corpus-scale agreement;
  * these pin the semantics the oracles can't isolate: blocking
  * boundaries, zero-weight timelines, view-group retirement, the MMR
  * redundancy penalty, and the miss path of MRR.
  */
class LinkageAnalyticsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("entity resolution: typo dup matches; identical name outside the block never meets") {
    import spark.implicits._
    import EntityResolution._
    val recs = Seq(
      (1L, "Ada Lovelace", 1, 100.00, "A"),
      (2L, "Ada Lovelaze", 1, 100.05, "A"), // typo dup, same block
      (3L, "Ada Lovelace", 2, 100.00, "A"), // identical name, other block
      (4L, "Zz Unrelated", 1, 500.00, "A")
    ).toDF("id", "name", "nation", "bal", "segment")
    val out = resolve(recs, "id", Seq("nation", "segment"),
      Seq(exactRule("name", 4), fuzzyRule("name", 3, 2),
        numericRule("bal", 2, 0.10)),
      threshold = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // (1,2): lev 1 (+3) + bal 0.05 (+2) = 5 — match.
    // (1,3): would score 4+2=6 but blocks differ — never compared.
    assert(out == Set((1L, 2L, 5)))
  }

  test("entity resolution: exact and fuzzy name tiers are mutually exclusive") {
    import spark.implicits._
    import EntityResolution._
    val recs = Seq(
      (1L, "Same Name", 1, 0.0, "A"),
      (2L, "Same Name", 1, 0.0, "A")
    ).toDF("id", "name", "nation", "bal", "segment")
    val out = resolve(recs, "id", Seq("nation"),
      Seq(exactRule("name", 4), fuzzyRule("name", 3, 2),
        numericRule("bal", 2, 0.10)), threshold = 1).collect()
    // exact 4 + bal 2 = 6; the fuzzy tier must NOT add its 3 (lev = 0).
    assert(out.map(_.getInt(2)).toSeq == Seq(6))
  }

  test("TWA: holds-until-next integration; single-event keys drop") {
    import spark.implicits._
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000)
    val ev = Seq(
      (1L, 1L, ts(0), 10.0),   // 10 for 30 s
      (2L, 1L, ts(30), 40.0),  // 40 for 10 s
      (3L, 1L, ts(40), 99.0),  // last event: zero weight
      (4L, 2L, ts(0), 7.0)     // single event: no elapsed time
    ).toDF("event_id", "user_id", "ts", "value")
    val out = Joins.timeWeightedAvg(ev, "user_id", "ts", "event_id", "value")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    assert(out.length == 1)
    val (u, n, span, twa) = out.head
    // (10*30 + 40*10) / 40 = 700/40 = 17.5
    assert(u == 1L && n == 2 && span == 40000000L && twa == 17.5)
  }

  test("delta-agg IVM: retired groups drop, new groups appear") {
    import spark.implicits._
    val prev = Seq(("a", 2L, 30L), ("b", 1L, 5L))
      .toDF("source", "n", "total")
    val changes = Seq(
      ("D", "b", Some(5L), None: Option[Long]),     // b retires (n -> 0)
      ("U", "a", Some(10L), Some(12L)),             // a: total 30 -> 32
      ("I", "c", None: Option[Long], Some(7L))      // c is born
    ).toDF("op", "source", "v_old", "v_new")
    val out = graft.operators.Layout
      .deltaAggMaintain(prev, changes, "source", "op", "v_old", "v_new")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(out == Set(("a", 2L, 32L), ("c", 1L, 7L)))
  }

  test("MMR: the redundancy penalty beats pure relevance") {
    import spark.implicits._
    // query 0 at e1; 1 and 2 are near-duplicates of each other, 3 is
    // equally relevant to the query but far from 1 — the case where
    // redundancy must decide (a near-dup that is ALSO more relevant
    // legitimately wins MMR; that is not this fixture).
    val vecs = Seq(
      (0L, Seq(1f, 0f, 0f, 0f)),
      (1L, Seq(0.9f, 0.436f, 0f, 0f)),
      (2L, Seq(0.89f, 0.44f, 0f, 0f)),  // rel slightly below 1's, sim~1
      (3L, Seq(0.9f, -0.436f, 0f, 0f))  // same rel as 1, sim(3,1) ~ 0.62
    ).toDF("id", "embedding")
    val picks = Similarity.mmrSelect(vecs, 0L, poolK = 3, k = 2, lambda = 0.5)
      .orderBy("rank").collect().map(_.getLong(1)).toSeq
    // pure top-2 relevance would take (1, 2); MMR's second pick must be 3.
    assert(picks == Seq(1L, 3L))
  }

  test("MRR: miss scores 0, hit scores 1/first-hit-rank") {
    import spark.implicits._
    val truth = Seq((1L, 10L, 1), (1L, 11L, 2), (2L, 20L, 1))
      .toDF("query_id", "neighbor_id", "rank")
    val retrieved = Seq(
      (1L, 99L, 1), (1L, 11L, 2), // first hit at rank 2
      (2L, 98L, 1), (2L, 97L, 2)  // total miss
    ).toDF("query_id", "neighbor_id", "rank")
    val out = Similarity.mrrAtK(retrieved, truth)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(out == Map(1L -> 0.5, 2L -> 0.0))
  }

  test("PSI: identical halves score 0, a shifted distribution scores > 0") {
    import spark.implicits._
    val ref = (1 to 200).map(i => i % 100 * 10).toDF("v")
    val same = Corpus.psiDrift(ref, ref, "v", binWidth = 100, nBins = 9)
      .select("psi").head().getDouble(0)
    assert(same == 0.0)
    val shifted = (1 to 200).map(i => i % 100 * 10 + 300).toDF("v")
    val drift = Corpus.psiDrift(ref, shifted, "v", binWidth = 100, nBins = 9)
      .select("psi").head().getDouble(0)
    assert(drift > 0.1, s"expected drift, got $drift")
  }

  test("skip-grams: hand counts and the reused positional exchange") {
    import spark.implicits._
    val docs = Seq((1L, "a b c a b"), (2L, "a b")).toDF("doc_id", "text")
    val df = Corpus.skipgramPairs(docs, "doc_id", "text",
      window = 2, minCount = 2)
    val out = df.collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    // (a,b): doc1 pos1->2, pos4->5, doc2 -> 3; (b,c): 1; (a,c) skip: 1 ...
    assert(out == Map(("a", "b") -> 3L))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ReusedExchange"),
      "lead branches must share the positional exchange:\n" + plan.take(1500))
  }

  test("containment: a planted excerpt scores ~1 while its Jaccard stays low") {
    import spark.implicits._
    val long = (1 to 40).map(i => s"w$i").mkString(" ")
    val short = (1 to 10).map(i => s"w$i").mkString(" ")
    val docs = Seq((1L, long), (2L, short)).toDF("doc_id", "text")
    val cont = Dedup.containmentPairs(docs, "doc_id", "text",
      shingleN = 3, threshold = 0.8).collect()
    assert(cont.length == 1)
    val r = cont.head
    // 8 of the short doc's 8 shingles appear in the long doc.
    assert(r.getLong(0) == 1L && r.getLong(1) == 2L)
    assert(r.getDouble(3) == 1.0) // cont_ba: short fully inside long
    val jac = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
      shingleN = 3, threshold = 0.0).collect()
    assert(jac.head.getDouble(2) < 0.25, "Jaccard must miss the excerpt")
  }

  test("gap-fill: every day between first and last is present, value carried forward") {
    import spark.implicits._
    def ts(day: Int, sec: Int) =
      java.sql.Timestamp.valueOf(f"2024-01-${day}%02d 00:00:${sec}%02d")
    val ev = Seq(
      (1L, ts(1, 10), 1.0), (2L, ts(1, 20), 2.0), // day 1 ends at 2.0
      (3L, ts(4, 0), 9.0)                          // days 2,3 carry 2.0
    ).toDF("event_id", "ts", "value").withColumn("user_id", lit(7L))
    val out = graft.operators.Joins
      .gapFillDaily(ev, "user_id", "ts", "value")
      .orderBy("day").collect()
      .map(r => (r.getDate(1).toString, r.getDouble(2)))
    assert(out.toSeq == Seq(
      ("2024-01-01", 2.0), ("2024-01-02", 2.0),
      ("2024-01-03", 2.0), ("2024-01-04", 9.0)))
  }

  test("path mining: routes never cross key boundaries") {
    import spark.implicits._
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000)
    val ev = Seq(
      (1L, 1L, ts(0), "a"), (2L, 1L, ts(1), "b"), (3L, 1L, ts(2), "c"),
      (4L, 2L, ts(0), "x"), (5L, 2L, ts(1), "y"), (6L, 2L, ts(2), "z")
    ).toDF("event_id", "user_id", "ts", "event_type")
    val out = graft.operators.Joins.pathCounts(ev, "user_id", "ts",
      "event_id", "event_type", steps = 3, k = 10)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    // exactly one complete 3-path per user; no a>b>x style cross-user mix
    assert(out == Set(("a>b>c", 1L), ("x>y>z", 1L)))
  }

  test("transitions: probabilities sum to 1 per source state") {
    import spark.implicits._
    def ts(sec: Long) = new java.sql.Timestamp(sec * 1000)
    val ev = Seq(
      (1L, 1L, ts(0), "a"), (2L, 1L, ts(1), "b"), (3L, 1L, ts(2), "a"),
      (4L, 2L, ts(0), "a"), (5L, 2L, ts(1), "c")
    ).toDF("event_id", "user_id", "ts", "event_type")
    val out = Joins.transitionCounts(ev, "user_id", "ts", "event_id",
      "event_type")
    val byFrom = out.groupBy("from_type").agg(sum("p").as("sp"))
      .collect().map(r => (r.getString(0), r.getDouble(1))).toMap
    assert(byFrom("a") == 1.0 && byFrom("b") == 1.0)
    val ab = out.filter(col("from_type") === "a" && col("next_type") === "b")
      .head()
    assert(ab.getLong(2) == 1L && ab.getDouble(3) == 0.5)
  }

  test("embedding outliers: a planted stray flags; tight-cluster members don't") {
    import spark.implicits._
    val rng = new scala.util.Random(13)
    val d = 64
    // two tight clusters around orthogonal axes + one stray pointing
    // into the (negated) first axis — far from BOTH centroids
    def around(axis: Int, eps: Double): Seq[Float] =
      Seq.tabulate(d)(j => ((if (j == axis) 1.0 else 0.0) +
        eps * rng.nextGaussian()).toFloat)
    // interleaved ids: the k lowest-id seeds (0, 1) land in DIFFERENT
    // clusters, so the assignment recovers the two real groups
    val rows = (0L until 40L).map(i =>
      (i, around((i % 2).toInt, 0.05))) :+
      ((99L, Seq.tabulate(d)(j => if (j == 0) -1.0f else 0.0f)))
    val out = Similarity.embeddingOutliers(
      rows.toDF("id", "embedding"), k = 2, iters = 2, outlierFrac = 0.06)
      .collect().map(r => r.getLong(0) ->
        ((r.getDouble(2), r.getBoolean(4)))).toMap
    assert(out(99L)._2, s"stray not flagged: ${out(99L)}")
    assert(out(99L)._1 < 0.5, "stray must score far from its centroid")
    // at most the per-cluster bottom band flags (pr < 0.06 admits the
    // lowest couple of ranks per ~20-member cluster)
    assert(out.count(_._2._2) <= 4, s"${out.filter(_._2._2)}")
    assert(out.filterNot(_._1 == 99L).values.forall(_._1 > 0.9),
      "tight members sit near their centroid")
  }

  test("margin mining: mutual matching, planted identical pair mined, deterministic") {
    import spark.implicits._
    val rng = new scala.util.Random(7)
    val d = 64
    def vec(): Seq[Float] = Seq.fill(d)(rng.nextGaussian().toFloat)
    // even ids/labels = source side, odd = target side; plant one
    // IDENTICAL cross-side pair (ids 100/101) that must be mined
    val planted = vec()
    val rows = (0L until 60L).map(i => (i, vec(), i.toInt % 2)) ++
      Seq((100L, planted, 0), (101L, planted, 1))
    val out = Similarity.marginMinePairs(
      rows.toDF("id", "embedding", "label"), k = 4, threshold = 1.0)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getDouble(2), r.getDouble(3)))
    // mutual best-margin matching: a partial matching — no side repeats
    assert(out.map(_._1).distinct.length == out.length, "src repeated")
    assert(out.map(_._2).distinct.length == out.length, "tgt repeated")
    val p = out.find(r => r._1 == 100L)
    assert(p.exists(_._2 == 101L), s"planted identical pair not mined: $out")
    assert(p.exists(_._3 == 1.0), "identical vectors must score cos 1.0")
    assert(p.exists(_._4 > 1.0), "identical pair's margin must clear 1")
    // deterministic: an identical second run mines the identical set
    val again = Similarity.marginMinePairs(
      rows.toDF("id", "embedding", "label"), k = 4, threshold = 1.0)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        r.getDouble(2), r.getDouble(3)))
    assert(again.toSet == out.toSet)
  }
}
