package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** BLAST outfmt-6 tabular source/sink (SURVEY.md S4/K3; reference parse
  * with per-field null guards at SQLQueryBlast.java:74-97, manual TSV
  * write at SQLQueryBlast.java:129-153 — the built-in csv writer keeps
  * column order, so the reference's workaround is unnecessary).
  */
object BlastTsv {

  val schema: StructType = StructType(Seq(
    StructField("qseqid", StringType),
    StructField("sseqid", StringType),
    StructField("pident", DoubleType),
    StructField("length", IntegerType),
    StructField("mismatch", IntegerType),
    StructField("gapopen", IntegerType),
    StructField("qstart", LongType),
    StructField("qend", LongType),
    StructField("sstart", LongType),
    StructField("send", LongType),
    StructField("evalue", DoubleType),
    StructField("bitscore", DoubleType)))

  /** Splittable TSV scan with the fixed 12-column schema; malformed
    * fields become nulls (PERMISSIVE), matching the reference's guards.
    */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.option("sep", "\t").schema(schema).csv(path)

  def write(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("sep", "\t").csv(path)
}
