package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** BED / GFF3 interval text sources — the annotation formats the
  * genomic range-join family consumes (UCSC BED: 0-based half-open
  * `[start, end)`; GFF3 (gmod.org spec): 1-based CLOSED `[start, end]`
  * with `key=value;` attribute column). Both scans are plain
  * `spark.read.text` line filters — SPLITTABLE, no driver preamble
  * parse, same discipline as [[Vcf]].
  *
  * Coordinate honesty: the two formats disagree by design, so the
  * readers return each format's NATIVE coordinates plus a shared
  * `start0`/`end0` pair normalized to BED convention (0-based
  * half-open) — the join key [[graft.operators.Joins.liftOver]] and
  * the depth/overlap operators expect, so a BED⋈GFF composition never
  * silently off-by-ones.
  */
object Bed {

  /** BED scan: track/browser/comment lines skip; the first 3 columns
    * are required, name/score/strand surface when present (null
    * otherwise, `.` is null).
    */
  def read(spark: SparkSession, path: String): DataFrame = {
    val f = split(col("value"), "\t")
    def opt(i: Int) = {
      val c = element_at(f, i + 1) // element_at is 1-based
      when(c.isNull || c === "." || c === "", lit(null)).otherwise(c)
    }
    spark.read.text(path)
      .filter(!col("value").startsWith("#") &&
        !col("value").startsWith("track") &&
        !col("value").startsWith("browser") &&
        length(trim(col("value"))) > 0)
      .select(
        f.getItem(0).as("chrom"),
        f.getItem(1).cast("long").as("start"),
        f.getItem(2).cast("long").as("end"),
        opt(3).as("name"),
        opt(4).cast("double").as("score"),
        opt(5).as("strand"))
      .withColumn("start0", col("start"))
      .withColumn("end0", col("end"))
  }

  /** BED sink: `.` for nulls, tab-separated, score as an integer when
    * integral (the convention genome browsers expect).
    */
  def write(df: DataFrame, path: String): Unit = {
    val score = when(col("score").isNull, lit("."))
      .when(col("score") === col("score").cast("long").cast("double"),
        col("score").cast("long").cast("string"))
      .otherwise(col("score").cast("string"))
    df.select(concat_ws("\t",
        col("chrom"), col("start").cast("string"),
        col("end").cast("string"),
        coalesce(col("name"), lit(".")),
        score,
        coalesce(col("strand"), lit("."))).as("value"))
      .write.mode("overwrite").text(path)
  }

  /** GFF3 scan: `##` directives and comments skip; the 9 fixed columns
    * surface typed (`.` is null), and the attribute column parses to a
    * map (`ID=x;Parent=y` — flag-less keys carry null). Native 1-based
    * CLOSED coordinates stay in `start`/`end`; `start0`/`end0` carry
    * the BED-normalized half-open pair (`start-1`, `end`).
    */
  def readGff3(spark: SparkSession, path: String): DataFrame = {
    val f = split(col("value"), "\t")
    def dot(c: org.apache.spark.sql.Column) =
      when(c === "." || c === "", lit(null)).otherwise(c)
    spark.read.text(path)
      .filter(!col("value").startsWith("#") &&
        length(trim(col("value"))) > 0)
      .select(
        f.getItem(0).as("seqid"),
        dot(f.getItem(1)).as("source"),
        dot(f.getItem(2)).as("type"),
        f.getItem(3).cast("long").as("start"),
        f.getItem(4).cast("long").as("end"),
        dot(f.getItem(5)).cast("double").as("score"),
        dot(f.getItem(6)).as("strand"),
        dot(f.getItem(7)).cast("int").as("phase"),
        when(dot(f.getItem(8)).isNull,
          map_from_arrays(array(), array()))
          .otherwise(expr(
            "str_to_map(split(value, '\t')[8], ';', '=')"))
          .as("attributes"))
      .withColumn("start0", col("start") - 1)
      .withColumn("end0", col("end"))
  }
}
