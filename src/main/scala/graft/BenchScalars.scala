package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scalar-kernel micro-bench: native codegen expressions vs the HOF
  * forms they replaced, on synthetic 1M-row tables ("measure, don't
  * guess" — the WSCG-fusion claims in NativeExpressions.scala get
  * numbers here). Prints one JSON line; recorded in BASELINE.md.
  */
object BenchScalars {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val n = sys.env.getOrElse("SPARK_GRAFT_SCALAR_ROWS", "1000000").toLong
    // parquet-backed inputs (literal ranges constant-fold; scans don't)
    val txtDir = "/tmp/graft_scalar_bench/text"
    val qualDir = "/tmp/graft_scalar_bench/qual"
    if (!new java.io.File(txtDir + "/_SUCCESS").exists()) {
      spark.range(n).select(
        concat_ws(" ",
          (0 until 30).map(i => concat(lit(s"w$i"), pmod(col("id") + i, lit(1000)))): _*)
          .as("text"))
        .write.mode("overwrite").parquet(txtDir)
      spark.range(n).select(
        rpad(concat(lit("II"), pmod(col("id"), lit(40)) + 33), 100, "I").as("q"))
        .write.mode("overwrite").parquet(qualDir)
    }
    val text = spark.read.parquet(txtDir)
    val qual = spark.read.parquet(qualDir)

    def timed(f: => Unit): Double = {
      def once(): Double = {
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      val first = once(); math.min(first, once())
    }
    import graft.functions.{DnaFunctions, TextFunctions}
    val results = Seq(
      "tokens_native" -> timed(
        text.select(sum(size(TextFunctions.tokens(col("text"))))).collect()),
      "tokens_hof" -> timed(
        text.select(sum(size(TextFunctions.tokensHof(col("text"))))).collect()),
      "avg_quality_native" -> timed(
        qual.select(sum(DnaFunctions.avgQualityCol(col("q")))).collect()),
      "avg_quality_hof" -> timed(
        qual.select(sum(DnaFunctions.avgQualityHof(col("q")))).collect()),
      "low_qual_native" -> timed(
        qual.select(sum(DnaFunctions.lowQualityCountCol(col("q"), 40))).collect()),
      "low_qual_hof" -> timed(
        qual.select(sum(DnaFunctions.lowQualityCountHof(col("q"), 40))).collect()))
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    println(s"""{"metric":"scalar_kernels","unit":"sec","rows":$n,"queries":$qs}""")
    spark.stop()
  }
}
