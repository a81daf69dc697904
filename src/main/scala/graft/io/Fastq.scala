package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** FASTQ source/sink (SURVEY.md S1/K1; reference reads via hadoop-bam's
  * FastqInputFormat at SQLQueryFastq.java:69 and writes via
  * FastqOutputFormat at SQLQueryFastq.java:105).
  *
  * Record = 4 lines: `@name`, bases, `+`, quality. The Illumina header
  * `instrument:run:flowcell:lane:tile:x:y read:filter:control:index` is
  * parsed into typed columns exactly like the reference's projection
  * (SQLQueryFastq.java:71-89).
  *
  * Splitting strategy: a FASTQ file cannot be split at an arbitrary byte
  * offset by local inspection alone ('@' legally starts quality lines), so
  *  - [[read]] keeps one task per file (`wholetext`) — zero-shuffle, and
  *    at cluster scale FASTQ corpora arrive as many files (the
  *    reference's own model: per-sample pairs), so per-file parallelism
  *    is the natural partitioning;
  *  - [[readSplittable]] handles the single-huge-file case: splittable
  *    line scan + global line numbering + groupBy(line/4). One extra
  *    shuffle, but every byte range of the file is read in parallel.
  */
object Fastq {

  val schema: StructType = StructType(Seq(
    StructField("key", StringType),
    StructField("sequence", StringType),
    StructField("quality", StringType),
    StructField("read", IntegerType),
    StructField("instrument", StringType),
    StructField("runNumber", IntegerType),
    StructField("flowcellId", StringType),
    StructField("lane", IntegerType),
    StructField("tile", IntegerType),
    StructField("xpos", IntegerType),
    StructField("ypos", IntegerType),
    StructField("indexSequence", StringType),
    StructField("filterPassed", BooleanType)))

  /** Project (key, sequence, quality) into the full typed Read schema by
    * parsing the Illumina header fields out of `key`.
    */
  private def project(raw: DataFrame): DataFrame = {
    val head = split(col("key"), " ").getItem(0)
    val tailCol = split(col("key"), " ").getItem(1)
    val h = split(head, ":")
    val t = split(tailCol, ":")
    raw.select(
      col("key"),
      col("sequence"),
      col("quality"),
      t.getItem(0).cast("int").as("read"),
      h.getItem(0).as("instrument"),
      h.getItem(1).cast("int").as("runNumber"),
      h.getItem(2).as("flowcellId"),
      h.getItem(3).cast("int").as("lane"),
      h.getItem(4).cast("int").as("tile"),
      h.getItem(5).cast("int").as("xpos"),
      h.getItem(6).cast("int").as("ypos"),
      t.getItem(3).as("indexSequence"),
      when(t.getItem(1) === "N", true)
        .when(t.getItem(1) === "Y", false)
        .otherwise(lit(null).cast("boolean")).as("filterPassed"))
  }

  /** One JVM String per file caps wholetext at 2 GiB and spikes task
    * memory; past this size [[read]] auto-routes to [[readSplittable]].
    */
  val WholetextMaxBytes: Long = 256L * 1024 * 1024

  /** Whole-file read: one task per file, records assembled by a single
    * linear pass over the file's lines (typed flatMap — per-file parsing
    * is inherently imperative, and a flatMap guarantees one O(n) pass;
    * an expression-tree formulation risks re-evaluating the whole-file
    * split inside a HOF lambda, which is quadratic).
    *
    * Auto-routing: if any input file exceeds [[WholetextMaxBytes]] the
    * read dispatches to [[readSplittable]] — wholetext holds each file
    * as ONE JVM String (2 GiB hard ceiling, per-task memory spike), so
    * big single files take the parallel line-scan path instead; callers
    * never have to know which is which.
    */
  def read(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    if (maxInputFileBytes(spark, path) > WholetextMaxBytes)
      return readSplittable(spark, path)
    val raw = spark.read.option("wholetext", "true").text(path).as[String]
    val records = raw.flatMap { content =>
      content.linesIterator.filter(_.nonEmpty).grouped(4).flatMap {
        case Seq(name, seq, _, qual) =>
          Some((name.stripPrefix("@"), seq, qual))
        case _ => None // trailing partial record
      }
    }.toDF("key", "sequence", "quality")
    project(records)
  }

  /** Largest single file under `path` (glob, dir, or file) — driver-side
    * listing only, no data read.
    */
  private def maxInputFileBytes(spark: SparkSession, path: String): Long = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val top = Option(fs.globStatus(p)).map(_.toSeq).getOrElse(Seq.empty)
    val files = top.flatMap { st =>
      if (st.isDirectory) fs.listStatus(st.getPath).toSeq.filter(_.isFile)
      else Seq(st)
    }
    if (files.isEmpty) 0L else files.map(_.getLen).max
  }

  /** Splittable read for single huge files: parallel line scan, global
    * line index, group each 4-line frame. Costs one shuffle on lineNo/4;
    * correct for any split boundary because indices are global.
    */
  def readSplittable(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val lines = spark.sparkContext.textFile(path)
      .zipWithIndex()
      .map { case (l, i) => (i / 4, i % 4, l) }
      .toDF("rec", "pos", "line")
    val raw = lines.groupBy("rec").agg(
      max(when(col("pos") === 0, regexp_replace(col("line"), "^@", ""))).as("key"),
      max(when(col("pos") === 1, col("line"))).as("sequence"),
      max(when(col("pos") === 3, col("line"))).as("quality"))
    project(raw.select("key", "sequence", "quality"))
  }

  /** FASTQ sink: 4-line text records (K1). Unlike the reference's writer
    * (which replaces every read name with the literal string "key",
    * SQLQueryFastq.java:115-125 — SURVEY.md §7.4 quirk T4), real names
    * are preserved.
    */
  def write(df: DataFrame, path: String, compression: Option[String] = None): Unit = {
    val w = df.select(concat(
      lit("@"), col("key"), lit("\n"),
      col("sequence"), lit("\n+\n"),
      col("quality")).as("value"))
      .write.mode("overwrite")
    compression.fold(w)(c => w.option("compression", c)).text(path)
  }
}
