package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Stage-attribution probe for the composed IVFADC funnel (q128 — the
  * bench set's most expensive query): times each rung of the
  * composition separately so "where do the seconds go" is measured,
  * not guessed (the BenchScalars doctrine applied at operator
  * granularity). Prints one JSON line.
  *
  * The stages overlap by construction (each later stage re-runs its
  * predecessors — Spark recomputes lineage), so the numbers attribute
  * MARGINAL cost: adc ≈ shortlist-free funnel, funnel − adc ≈ the
  * shortlist window + re-rank join.
  */
object BenchFunnel {
  private def timed(f: => Unit): Double = {
    val t0 = System.nanoTime()
    f
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val emb = Tables.embeddings(spark, sfDir)
      .select(col("vec_id").as("id"), col("embedding"))
    val n = emb.count()

    // warm (JIT, codegen, parquet footers)
    Similarity.ivfAdcRerankTopK(emb, 3, nCells = 8, nProbe = 2,
      shortlist = 16).count()

    val full = timed {
      Similarity.ivfAdcRerankTopK(emb, 3, nCells = 8, nProbe = 2,
        shortlist = 16).count()
    }
    val train = timed(Similarity.pqTrainCodebooks(emb, 8, 16, 1))
    val encode = timed(Similarity.pqEncode(emb, 8, 16, 1).count())
    val ivfOnly = timed(Similarity.ivfTopK(emb, 3, nCells = 8).count())
    val adcNoGate = timed(Similarity.pqAdcTopK(emb, 3).count())

    println(s"""{"metric":"funnel_breakdown","n_vectors":$n,"unit":"sec","full_funnel":$full,"pq_train":$train,"pq_encode":$encode,"ivf_only":$ivfOnly,"adc_ungated":$adcNoGate,"sf":"$sfDir"}""")
    spark.stop()
  }
}
