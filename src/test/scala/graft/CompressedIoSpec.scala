package graft

import graft.io.{Fastq, WholeFiles}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.io.FileOutputStream
import java.nio.file.Files
import java.util.zip.GZIPOutputStream

/** S5: gz inputs decompress transparently through the Hadoop codec layer
  * (the reference needed a whole Decompress pipeline stage); S7: whole-
  * file scans keep one file per partition with glob/empty filtering.
  */
class CompressedIoSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val fastq =
    """@r1:1:FC:1:1:10:20 1:N:0:ACGT
      |ACGTACGT
      |+
      |IIIIIIII
      |@r2:1:FC:1:1:11:21 2:N:0:ACGT
      |TTTTGGGG
      |+
      |IIIIIIII
      |""".stripMargin

  test("Fastq.read handles gzip-compressed input transparently") {
    val dir = Files.createTempDirectory("graft_gz")
    val out = new GZIPOutputStream(new FileOutputStream(dir.resolve("reads.fq.gz").toFile))
    out.write(fastq.getBytes("UTF-8"))
    out.close()
    val df = Fastq.read(spark, dir.toString)
    assert(df.count() == 2)
    assert(df.filter(col("read") === 2).select("sequence").first().getString(0) == "TTTTGGGG")
  }

  test("WholeFiles.read: one row per file, glob + empty filtering") {
    val dir = Files.createTempDirectory("graft_wf")
    Files.writeString(dir.resolve("a.fa"), ">c1\nACGT\n")
    Files.writeString(dir.resolve("b.fa"), ">c2\nTTTT\n")
    Files.writeString(dir.resolve("skip.txt"), "nope")
    Files.writeString(dir.resolve("_SUCCESS"), "")
    val df = WholeFiles.read(spark, dir.toString, glob = "*.fa")
    assert(df.count() == 2)
    val paths = df.select("path").collect().map(_.getString(0))
    assert(paths.forall(_.endsWith(".fa")))
  }

  test("WholeFiles.readText content matches the file bytes") {
    val dir = Files.createTempDirectory("graft_wt")
    Files.writeString(dir.resolve("x.txt"), "line1\nline2\n")
    val df = WholeFiles.readText(spark, dir.toString, glob = "*.txt")
    val row = df.first()
    assert(row.getString(0).endsWith("x.txt"))
    assert(row.getString(1) == "line1\nline2\n")
  }
}
