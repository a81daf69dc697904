package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off IO benchmark: quantifies the DataSourceV2 column-pruning win
  * ("measure, don't guess"). Generates a multi-hundred-MB uncompressed
  * FASTQ once under /tmp, then times `select(sequence)` through
  *  - the v1 reader (RDD-boundary parse: every name/sequence/quality
  *    String materializes regardless of projection), and
  *  - the v2 reader (pruning reaches the byte scanner: quality and name
  *    bytes are framed but never allocated).
  * Also times the full-schema read on both paths (parity cost check —
  * v2 should not LOSE when nothing is pruned). Prints one JSON line;
  * results are recorded in BASELINE.md, not BENCH (file-format scans
  * are capability probes, not the headline query set).
  */
object BenchIo {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val nReads = sys.env.getOrElse("SPARK_GRAFT_IO_READS", "2000000").toInt
    val dir = s"/tmp/graft_io_bench/fastq_$nReads"
    val marker = new java.io.File(s"$dir/_done")
    if (!marker.exists()) {
      // deterministic synthetic reads: 100 bp, Illumina-style headers
      val df = spark.range(nReads.toLong).select(
        concat(lit("M01:"), col("id"), lit(":FC1:2:1101:"), col("id"),
          lit(":1 1:N:0:ACGT")).as("key"),
        translate(lpad(col("id").cast("string"), 100, "0123456789"),
          "0123456789", "ACGTACGTAC").as("sequence"),
        lpad(lit(""), 100, "IJKLMNOPQH").as("quality"))
      graft.io.Fastq.write(df, dir)
      marker.createNewFile()
    }
    val bytes = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("part")).map(_.length()).sum

    def timed(f: => Unit): Double = {
      def once(): Double = {
        val t0 = System.nanoTime()
        f
        (System.nanoTime() - t0) / 1e9
      }
      val first = once()
      math.min(first, once())
    }
    def v1 = graft.io.Fastq.readSplittable(spark, dir)
    def v2 = spark.read.format("fastq").load(dir)

    val results = Seq(
      "v1_seq_only" -> timed(v1.select(sum(length(col("sequence")))).collect()),
      "v2_seq_only" -> timed(v2.select(sum(length(col("sequence")))).collect()),
      "v1_full" -> timed(v1.select(sum(length(col("sequence"))),
        sum(length(col("quality"))), sum(length(col("key")))).collect()),
      "v2_full" -> timed(v2.select(sum(length(col("sequence"))),
        sum(length(col("quality"))), sum(length(col("key")))).collect()))
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    println(s"""{"metric":"io_scan","unit":"sec","reads":$nReads,"bytes":$bytes,"queries":$qs}""")
    spark.stop()
  }
}
