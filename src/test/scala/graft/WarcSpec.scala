package graft

import graft.io.Warc
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.charset.StandardCharsets.UTF_8

/** WARC source/sink: gzip-member round-trip, HTTP envelope parsing,
  * warcinfo exposure, uncompressed input, truncation tolerance, and
  * multi-partition writes.
  */
class WarcSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def writeFixture(dir: String, n: Int, parts: Int = 1): Unit = {
    import spark.implicits._
    val df = (0 until n).map { i =>
      (s"http://t.example/$i", "2020-01-01T00:00:00Z", "text/html",
        s"<html><body><p>doc $i</p></body></html>".getBytes(UTF_8))
    }.toDF("uri", "date", "contentType", "body").repartition(parts)
    Warc.write(df, dir)
  }

  test("round-trip: response records parse envelope, warcinfo surfaces") {
    val dir = java.nio.file.Files.createTempDirectory("warc").toString
    writeFixture(dir, 5)
    val back = Warc.read(spark, dir)
    val resp = back.filter(col("warcType") === "response")
      .select("targetUri", "httpStatus", "httpContentType", "body")
      .collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2),
        new String(r.getAs[Array[Byte]](3), UTF_8)))
      .sortBy(_._1)
    assert(resp.length == 5)
    assert(resp(0) == ("http://t.example/0", 200, "text/html",
      "<html><body><p>doc 0</p></body></html>"))
    val info = back.filter(col("warcType") === "warcinfo").collect()
    assert(info.length == 1)
    assert(info(0).isNullAt(info(0).fieldIndex("httpStatus")))
    assert(new String(info(0).getAs[Array[Byte]]("body"), UTF_8)
      .contains("software: graft"))
  }

  test("multi-partition write yields one file each; read unions all") {
    val dir = java.nio.file.Files.createTempDirectory("warc").toString
    writeFixture(dir, 20, parts = 4)
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".warc.gz"))
    assert(files.length == 4)
    val back = Warc.read(spark, dir)
    assert(back.filter(col("warcType") === "response").count() == 20)
    assert(back.filter(col("warcType") === "warcinfo").count() == 4)
  }

  test("uncompressed .warc parses identically") {
    val dir = java.nio.file.Files.createTempDirectory("warc").toString
    writeFixture(dir, 3)
    // gunzip the file to a sibling .warc
    val gz = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".warc.gz")).head
    val in = new java.util.zip.GZIPInputStream(
      new java.io.FileInputStream(gz))
    val plainBytes = in.readAllBytes(); in.close()
    val recs = Warc.parseFile("mem.warc", plainBytes).toSeq
    assert(recs.count(_._3 == "response") == 3)
    assert(recs.count(_._3 == "warcinfo") == 1)
  }

  test("truncated file keeps the records parsed before the cut") {
    val dir = java.nio.file.Files.createTempDirectory("warc").toString
    writeFixture(dir, 3)
    val gz = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".warc.gz")).head
    val in = new java.util.zip.GZIPInputStream(
      new java.io.FileInputStream(gz))
    val plain = in.readAllBytes(); in.close()
    // cut mid-way through the last record's payload
    val cut = java.util.Arrays.copyOfRange(plain, 0, plain.length - 20)
    val recs = Warc.parseFile("mem.warc", cut).toSeq
    assert(recs.count(_._3 == "response") == 2)
    // garbage-prefixed stream yields nothing rather than throwing
    assert(Warc.parseFile("g.warc", "not a warc at all".getBytes(UTF_8))
      .isEmpty)
  }
}
