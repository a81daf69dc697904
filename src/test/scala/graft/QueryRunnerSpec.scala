package graft

import graft.sql.QueryRunner
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** The reference's SQL-tool lifecycle (§3.1): domain source → temp view
  * → user SQL → sink, replicating SQLQueryFastq's canonical invocation.
  */
class QueryRunnerSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val fastq =
    """@s1:1:FC:1:1:5:6 1:N:0:ACGT
      |ACGTACGT
      |+
      |IIIIIIII
      |@s1:1:FC:1:1:5:7 2:N:0:ACGT
      |GGGGCCCC
      |+
      |@@@@@@@@
      |""".stripMargin

  test("fastq → records view → user SQL → ordered result (SQLQueryFastq.java:22)") {
    val dir = Files.createTempDirectory("qr")
    Files.writeString(dir.resolve("r.fq"), fastq)
    val out = QueryRunner.run(spark, QueryRunner.FastqSource, dir.toString,
      "SELECT key, sequence FROM records WHERE read = 1 ORDER BY key ASC")
    val rows = out.collect()
    assert(rows.length == 1)
    assert(rows(0).getString(1) == "ACGTACGT")
  }

  test("query + fastq write round-trips through the sink") {
    val dir = Files.createTempDirectory("qr2")
    Files.writeString(dir.resolve("r.fq"), fastq)
    val outDir = dir.resolve("out").toString
    QueryRunner.runAndWrite(spark, QueryRunner.FastqSource, dir.toString,
      "SELECT key, sequence, quality FROM records", outDir, "fastq")
    val back = graft.io.Fastq.read(spark, outDir)
    assert(back.count() == 2)
  }
}
