package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** FASTA source/sink (SURVEY.md S3/K4; reference reads `>`-delimited
  * records via `textinputformat.record.delimiter=">"`, SplitFasta.java:41-43,
  * and writes `">"+id+"\n"+seq`, RenameContigsUniq.java:61-67).
  *
  * The read is genuinely splittable: the text source's `lineSep` option
  * delegates to Hadoop's delimiter-aware line reader, which resolves
  * record boundaries across split edges — so one 1 TB FASTA still scans
  * in parallel with no shuffle.
  */
object Fasta {

  /** `Dataset`-shaped contigs: (id = header token before first space,
    * description = rest of header, sequence = body lines joined).
    * Empty records (F11 guard) are dropped.
    */
  def read(spark: SparkSession, path: String): DataFrame = {
    val rec = spark.read.option("lineSep", ">").text(path)
      .filter(length(trim(col("value"))) > 0)
    val headerAndBody = split(col("value"), "\n", 2)
    val header = headerAndBody.getItem(0)
    rec.select(
      split(header, " ").getItem(0).as("id"),
      when(instr(header, " ") > 0,
        header.substr(instr(header, " ") + 1, length(header)))
        .otherwise("").as("description"),
      regexp_replace(coalesce(headerAndBody.getItem(1), lit("")), "\n", "")
        .as("sequence"))
      .filter(length(col("id")) > 0)
  }

  /** FASTA sink; wraps sequences at `wrap` chars per line when > 0 (the
    * reference writes unwrapped single-line bodies).
    */
  def write(df: DataFrame, path: String, wrap: Int = 0): Unit = {
    val body =
      if (wrap <= 0) col("sequence")
      else when(length(col("sequence")) === 0, lit(""))
        .otherwise(concat_ws("\n", transform(
          sequence(lit(1), ceil(length(col("sequence")) / wrap.toDouble).cast("int")),
          i => col("sequence").substr((i - 1) * wrap + 1, lit(wrap)))))
    df.select(concat(lit(">"), col("id"), lit("\n"), body).as("value"))
      .write.mode("overwrite").text(path)
  }

  /** T5: uniquify contig ids (RenameContigsUniq.java:52-62) — built-in
    * uuid() appended exactly like the reference.
    */
  def renameContigsUniq(df: DataFrame): DataFrame =
    df.withColumn("id", concat(col("id"), lit("_"), expr("uuid()")))
}
