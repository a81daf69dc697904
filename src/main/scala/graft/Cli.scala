package graft

import graft.sql.QueryRunner
import org.apache.spark.sql.SparkSession

/** Thin CLI over the library — the replacement for the reference's ~30
  * spark-submit entry-point classes (SURVEY.md §7.1: "One SparkSession
  * library + thin CLI"). A ViraPipe user's `spark-submit --class
  * SQLQueryFastq ... -in X -query Q -out Y` becomes
  * `... --class graft.Cli query fastq X "Q" Y parquet`.
  *
  * Subcommands:
  *   query <fastq|fasta|sam|blast|parquet> <in> <sql> [out] [format]
  *   interleave <r1> <r2> <out>          (DecompressInterleave)
  *   normalize <in> <out> <k> <minc> <maxc>  (NormalizeRDD)
  *   group <in> <out>                    (FastqGroupper)
  */
object Cli {

  private def session(): SparkSession = {
    val s = SparkSession.builder()
      .appName("virapipespark")
      // spark-submit injects spark.master; default local for direct runs
      .master(sys.props.getOrElse("spark.master", "local[*]"))
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    functions.DnaFunctions.register(s)
    plans.NativeFunctions.register(s)
    s
  }

  private val sources = Map(
    "fastq" -> QueryRunner.FastqSource,
    "fasta" -> QueryRunner.FastaSource,
    "sam" -> QueryRunner.SamSource,
    "blast" -> QueryRunner.BlastSource,
    "parquet" -> QueryRunner.ParquetSource)

  def main(args: Array[String]): Unit = args.toList match {
    case "query" :: src :: in :: sql :: rest =>
      val spark = session()
      rest match {
        case out :: fmt :: Nil =>
          QueryRunner.runAndWrite(spark, sources(src), in, sql, out, fmt)
        case _ =>
          QueryRunner.run(spark, sources(src), in, sql).show(100, truncate = false)
      }
    case "interleave" :: r1 :: r2 :: out :: Nil =>
      val spark = session()
      io.Fastq.write(operators.Pipeline.interleave(
        io.Fastq.read(spark, r1), io.Fastq.read(spark, r2))
        .select("key", "sequence", "quality"), out)
    case "normalize" :: in :: out :: k :: minc :: maxc :: Nil =>
      val spark = session()
      io.Fastq.write(operators.ViraPipeline.digitalNormalize(
        io.Fastq.read(spark, in), k.toInt, minc.toLong, maxc.toLong)
        .select("key", "sequence", "quality"), out)
    case "group" :: in :: out :: Nil =>
      val spark = session()
      operators.Pipeline.writeGroupedBySample(io.Fastq.read(spark, in), out)
    case other =>
      System.err.println(s"unknown command: ${other.mkString(" ")}")
      System.err.println("usage: query|interleave|normalize|group ...")
      sys.exit(2)
  }
}
