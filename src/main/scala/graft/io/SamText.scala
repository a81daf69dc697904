package graft.io

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SAM-text source/sink (SURVEY.md S2/K5 decision: the BAM binary codec
  * is out of scope — SAM text carries identical query semantics; every
  * `MyAlignment` field, SQLQueryBAM.java:66, derives from SAM columns).
  *
  * SAM is TSV with 11 fixed columns + optional tags; header lines start
  * with '@'. Plain `spark.read.text` keeps the scan splittable.
  */
object SamText {

  /** FLAG bit tests (SAM spec; reference uses htsjdk's accessors). */
  def flagBit(flag: Column, bit: Int): Column = (flag.bitwiseAND(bit)) =!= 0

  /** Read SAM text into the typed alignment shape (readName, flag,
    * referenceName, start, mapq, cigar, bases, quality + derived
    * readUnmapped/duplicateRead/firstOfPair/secondOfPair).
    */
  def read(spark: SparkSession, path: String): DataFrame = {
    val f = split(col("value"), "\t")
    spark.read.text(path)
      .filter(!col("value").startsWith("@") && length(trim(col("value"))) > 0)
      .select(
        f.getItem(0).as("readName"),
        f.getItem(1).cast("int").as("flag"),
        f.getItem(2).as("referenceName"),
        f.getItem(3).cast("int").as("start"),
        f.getItem(4).cast("int").as("mapq"),
        f.getItem(5).as("cigar"),
        f.getItem(9).as("bases"),
        f.getItem(10).as("quality"))
      .withColumn("length", length(col("bases")))
      .withColumn("readUnmapped", flagBit(col("flag"), 4))
      .withColumn("duplicateRead", flagBit(col("flag"), 1024))
      .withColumn("firstOfPair", flagBit(col("flag"), 64))
      .withColumn("secondOfPair", flagBit(col("flag"), 128))
  }

  /** SAM-text sink: 11 fixed columns, '*' fillers for unused fields. */
  def write(df: DataFrame, path: String): Unit =
    df.select(concat_ws("\t",
      col("readName"), col("flag"), col("referenceName"), col("start"),
      coalesce(col("mapq"), lit(0)), coalesce(col("cigar"), lit("*")),
      lit("*"), lit(0), lit(0), col("bases"), col("quality")).as("value"))
      .write.mode("overwrite").text(path)

  /** T3: SAM → FASTQ projection (SamToFastq.java:47-68): mate suffix
    * /1 · /2 from the pair flags, bases + qualities out.
    */
  def toFastq(df: DataFrame): DataFrame =
    df.select(
      concat(col("readName"),
        when(flagBit(col("flag"), 64), "/1")
          .when(flagBit(col("flag"), 128), "/2")
          .otherwise("")).as("key"),
      col("bases").as("sequence"),
      col("quality"))
}
