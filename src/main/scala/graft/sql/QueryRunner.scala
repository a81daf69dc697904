package graft.sql

import graft.io.{BlastTsv, Fasta, Fastq, SamText}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The reference's three generic SQL tools (SQLQueryFastq.java,
  * SQLQueryBAM.java, SQLQueryBlast.java) as ONE library entry point:
  * load a domain source, register it as a temp view, run arbitrary user
  * SQL, and hand back the frame for show/write — the full §3.1 query
  * lifecycle (scan → project → registerTempTable → sqlContext.sql →
  * sink), with Catalyst owning parse/analyze/optimize/execute exactly
  * as the reference delegated it.
  */
object QueryRunner {

  sealed trait Source
  case object FastqSource extends Source
  case object FastaSource extends Source
  case object SamSource extends Source
  case object BlastSource extends Source
  case object ParquetSource extends Source

  def load(spark: SparkSession, source: Source, path: String): DataFrame =
    source match {
      case FastqSource => Fastq.read(spark, path)
      case FastaSource => Fasta.read(spark, path)
      case SamSource => SamText.read(spark, path)
      case BlastSource => BlastTsv.read(spark, path)
      case ParquetSource => spark.read.parquet(path)
    }

  /** Register + query (reference default table name "records",
    * SQLQueryFastq.java:43).
    */
  def run(spark: SparkSession, source: Source, path: String, query: String,
          tableName: String = "records"): DataFrame = {
    load(spark, source, path).createOrReplaceTempView(tableName)
    spark.sql(query)
  }

  /** Query + write in one go (the reference's `-out -format` flags):
    * format ∈ parquet | fastq | fasta | sam | tsv.
    */
  def runAndWrite(spark: SparkSession, source: Source, path: String,
                  query: String, outPath: String, outFormat: String,
                  tableName: String = "records"): Unit = {
    val df = run(spark, source, path, query, tableName)
    outFormat match {
      case "parquet" => df.write.mode("overwrite").parquet(outPath)
      case "fastq" => Fastq.write(df, outPath)
      case "fasta" => Fasta.write(df, outPath)
      case "sam" => SamText.write(df, outPath)
      case "tsv" => BlastTsv.write(df, outPath)
      case other => throw new IllegalArgumentException(s"unknown format: $other")
    }
  }
}
