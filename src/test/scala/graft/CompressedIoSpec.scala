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

  test("expandArchives: zip members become rows") {
    val dir = Files.createTempDirectory("graft_zip")
    val zos = new java.util.zip.ZipOutputStream(
      new FileOutputStream(dir.resolve("pair.zip").toFile))
    zos.putNextEntry(new java.util.zip.ZipEntry("sample_R1.fq"))
    zos.write("@a/1\nACGT\n+\nIIII\n".getBytes("UTF-8")); zos.closeEntry()
    zos.putNextEntry(new java.util.zip.ZipEntry("sample_R2.fq"))
    zos.write("@a/2\nTTTT\n+\nIIII\n".getBytes("UTF-8")); zos.closeEntry()
    zos.close()
    val rows = WholeFiles.expandArchives(spark, dir.toString, "*.zip")
      .collect().map(r => (r.getString(1), new String(r.getAs[Array[Byte]](2), "UTF-8")))
      .sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq("sample_R1.fq", "sample_R2.fq"))
    assert(rows(0)._2.startsWith("@a/1") && rows(1)._2.startsWith("@a/2"))
  }

  test("expandArchives: tar members become rows (system tar as fixture)") {
    val dir = Files.createTempDirectory("graft_tar")
    Files.writeString(dir.resolve("one.txt"), "first file\n")
    Files.writeString(dir.resolve("two.txt"), "second file content\n")
    // System tar writes the fixture, so the ustar parser is tested
    // against an independent producer, not our own encoder.
    val proc = new ProcessBuilder("tar", "-cf", "bundle.tar", "one.txt", "two.txt")
      .directory(dir.toFile).start()
    assert(proc.waitFor() == 0)
    val rows = WholeFiles.expandArchives(spark, dir.toString, "*.tar")
      .collect().map(r => (r.getString(1), new String(r.getAs[Array[Byte]](2), "UTF-8")))
      .sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq("one.txt", "two.txt"))
    assert(rows(0)._2 == "first file\n" && rows(1)._2 == "second file content\n")
  }

  test("expandArchives: bz2 single-file decompression") {
    val dir = Files.createTempDirectory("graft_bz2")
    val codec = new org.apache.hadoop.io.compress.BZip2Codec()
    codec.setConf(new org.apache.hadoop.conf.Configuration())
    val out = codec.createOutputStream(new FileOutputStream(dir.resolve("doc.txt.bz2").toFile))
    out.write("bzip2 payload\n".getBytes("UTF-8")); out.close()
    val rows = WholeFiles.expandArchives(spark, dir.toString, "*.bz2").collect()
    assert(rows.length == 1)
    assert(rows(0).getString(1) == "doc.txt")
    assert(new String(rows(0).getAs[Array[Byte]](2), "UTF-8") == "bzip2 payload\n")
  }

  test("pairByListing pairs adjacent files in sorted order") {
    val dir = Files.createTempDirectory("graft_pair")
    Seq("s1_R1.fq.gz", "s1_R2.fq.gz", "s2_R1.fq.gz", "s2_R2.fq.gz").foreach { n =>
      Files.writeString(dir.resolve(n), "x")
    }
    val pairs = WholeFiles.pairByListing(spark, dir.toString, "*.fq.gz")
    assert(pairs.length == 2)
    assert(pairs(0)._1.endsWith("s1_R1.fq.gz") && pairs(0)._2.endsWith("s1_R2.fq.gz"))
    assert(pairs(1)._1.endsWith("s2_R1.fq.gz") && pairs(1)._2.endsWith("s2_R2.fq.gz"))
  }
}
