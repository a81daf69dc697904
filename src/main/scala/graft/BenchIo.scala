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

    // ---- parquet codec probe: the storage-cost lever at 100 TB ----
    // Same corpus written under each codec; measures write time, bytes
    // on disk, and a full-scan aggregate. The tradeoff being measured:
    // zstd buys real bytes (≈ network + storage + scan-IO at scale) for
    // CPU at write time; snappy is the decode-cheap default. Recorded
    // in BASELINE.md next to the scan probes.
    val nDocs = sys.env.getOrElse("SPARK_GRAFT_IO_DOCS", "1000000").toInt
    val corpus = spark.range(nDocs.toLong).select(
      col("id").as("doc_id"),
      concat_ws(" ",
        (0 until 40).map(i =>
          concat(lit(s"tok$i"), pmod(col("id") + i * 31, lit(997)))): _*)
        .as("text"))
      .localCheckpoint()
    val codecRows = Seq("uncompressed", "snappy", "zstd").map { codec =>
      val cdir = s"/tmp/graft_io_bench/codec_$codec"
      val w = timed {
        corpus.write.mode("overwrite")
          .option("compression", codec).parquet(cdir)
      }
      val cbytes = new java.io.File(cdir).listFiles()
        .filter(_.getName.endsWith(".parquet")).map(_.length()).sum
      val r = timed {
        spark.read.parquet(cdir)
          .select(sum(length(col("text")))).collect()
      }
      (codec, w, cbytes, r)
    }
    val cs = codecRows.map { case (c, w, b, r) =>
      s""""$c":{"write_sec":$w,"bytes":$b,"scan_sec":$r}"""
    }.mkString("{", ",", "}")
    println(s"""{"metric":"io_codec","unit":"sec","docs":$nDocs,"codecs":$cs}""")
    spark.stop()
  }
}
