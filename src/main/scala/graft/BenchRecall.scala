package graft

import graft.operators.Similarity
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Recall-vs-cost sweep for the ANN funnels — the tuning evidence
  * behind the published defaults ("measure, don't guess"): top-3
  * recall of each (knob point) against the exact brute-force
  * neighbors, one JSON line per point, with wall time so the curve
  * prices the knob. Run on SPARK_GRAFT_SF_DIR like [[Bench]]:
  *
  *  - `ivfAdcRerankTopK` over nProbe × shortlist (the two funnel
  *    knobs: how many cells a query probes, how many ADC candidates
  *    reach the exact re-rank);
  *  - `binaryPrefilterTopK` over its Hamming shortlist.
  *
  * The BASELINE.md "ANN recall curves" table is this output.
  */
object BenchRecall {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val e = Tables.embeddings(spark, sfDir)
      .select(col("vec_id").as("id"), col("embedding"))
    val exact = Similarity.bruteForceTopK(e, e, 3)
      .select("query_id", "neighbor_id").localCheckpoint()
    val nExact = exact.count().toDouble

    def point(ann: => DataFrame, method: String, knobs: String): Unit = {
      val t0 = System.nanoTime()
      val hits = ann.select("query_id", "neighbor_id")
        .join(exact, Seq("query_id", "neighbor_id"), "left_semi").count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(s"""{"method":"$method",$knobs,"recall":${
        BigDecimal(hits / nExact).setScale(4, BigDecimal.RoundingMode.HALF_UP)
      },"sec":${BigDecimal(sec).setScale(2, BigDecimal.RoundingMode.HALF_UP)}}""")
    }

    for (np <- Seq(1, 2, 4, 6, 8); sl <- Seq(64, 160))
      point(Similarity.ivfAdcRerankTopK(e, 3, nCells = 8, nProbe = np,
        shortlist = sl), "ivf_adc_rerank",
        s""""nCells":8,"nProbe":$np,"shortlist":$sl""")
    for (np <- Seq(6, 8); sl <- Seq(256, 320))
      point(Similarity.ivfAdcRerankTopK(e, 3, nCells = 8, nProbe = np,
        shortlist = sl), "ivf_adc_rerank",
        s""""nCells":8,"nProbe":$np,"shortlist":$sl""")
    for (np <- Seq(8, 12); sl <- Seq(160, 256))
      point(Similarity.ivfAdcRerankTopK(e, 3, nCells = 16, nProbe = np,
        shortlist = sl), "ivf_adc_rerank",
        s""""nCells":16,"nProbe":$np,"shortlist":$sl""")
    for (sl <- Seq(64, 160, 320))
      point(Similarity.binaryPrefilterTopK(e, 3, shortlist = sl),
        "binary_prefilter", s""""shortlist":$sl""")
    spark.stop()
  }
}
