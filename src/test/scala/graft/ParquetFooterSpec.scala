package graft

import graft.io.ParquetFooter
import org.scalatest.funsuite.AnyFunSuite

/** Thrift compact walker + parquet footer extraction: hand-built
  * compact-protocol vectors (the second implementation), real
  * Spark-written files cross-checked against Spark's own aggregates,
  * unknown-field skipping, refusal sweep.
  */
class ParquetFooterSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("compact walker: zigzag, long field headers, nested skip") {
    // struct { 1: i64 = 300; 100: string "hi" (long field header);
    //          101: struct { 1: double }; STOP }
    val b2 = Array[Int](
      0x16, 0xD8, 0x04, // id=1 i64 600(zz)=300
      0x08, 0xC8, 0x01, 0x02, 'h', 'i', // id=100 binary "hi"
      0x1C, // id=101 (delta 1) struct
      0x17, 0, 0, 0, 0, 0, 0, 0, 0x40, // inner id=1 double
      0x00, // inner STOP
      0x00 // outer STOP
    ).map(_.toByte)
    var i64 = 0L
    var str = ""
    val c = new ParquetFooter.Compact(b2, 0)
    c.struct { (id, t) =>
      (id, t) match {
        case (1, 6) => i64 = c.zigzag()
        case (100, 8) => str = new String(c.binary(), "UTF-8")
        case (_, tt) => c.skip(tt)
      }
    }
    assert(i64 == 300L)
    assert(str == "hi")
    assert(c.pos == b2.length)
  }

  test("spark-written files: footer agrees with Spark's own aggregates") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_pqfooter").toString
    val df = (0L until 1000L).map(i => (i, s"row $i")).toDF("doc_id", "t")
    df.repartition(3).write.mode("overwrite").parquet(dir)
    val scanned = ParquetFooter
      .scanDir(spark, dir, "doc_id").collect()
    assert(scanned.length == 3)
    assert(scanned.map(_.getAs[Long]("num_rows")).sum == 1000L)
    assert(scanned.forall(_.getAs[Int]("n_row_groups") == 1))
    // global stats from footers == true min/max
    assert(scanned.map(_.getAs[Long]("min_stat")).min == 0L)
    assert(scanned.map(_.getAs[Long]("max_stat")).max == 999L)
    // per-file: footer num_rows equals an actual read of that file
    scanned.foreach { r =>
      val file = r.getAs[String]("file")
      val actual = spark.read.parquet(file)
      assert(r.getAs[Long]("num_rows") == actual.count())
      val mm = actual.agg(
        org.apache.spark.sql.functions.min("doc_id"),
        org.apache.spark.sql.functions.max("doc_id")).collect()(0)
      assert(r.getAs[Long]("min_stat") == mm.getLong(0))
      assert(r.getAs[Long]("max_stat") == mm.getLong(1))
    }
  }

  test("multi-row-group files sum their groups") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_pqrg").toString
    val hconf = spark.sparkContext.hadoopConfiguration
    hconf.setInt("parquet.block.size", 4096)
    try {
      val df = (0L until 50000L).map(i => (i, "x" * 50)).toDF("doc_id", "t")
      df.repartition(1).write.mode("overwrite").parquet(dir)
      val r = ParquetFooter.scanDir(spark, dir, "doc_id").collect()(0)
      assert(r.getAs[Long]("num_rows") == 50000L)
      assert(r.getAs[Int]("n_row_groups") > 1,
        s"expected multiple row groups, got ${r.getAs[Int]("n_row_groups")}")
      assert(r.getAs[Long]("min_stat") == 0L)
      assert(r.getAs[Long]("max_stat") == 49999L)
    } finally hconf.unset("parquet.block.size")
  }

  test("corrupt footers refuse loudly") {
    intercept[IllegalArgumentException] {
      ParquetFooter.parse("tooshort".getBytes)
    }
    intercept[IllegalArgumentException] {
      ParquetFooter.parse(("x" * 40 + "PAR2").getBytes)
    }
    // valid magic, absurd footer length
    val bad = new Array[Byte](32)
    "PAR1".getBytes.copyToArray(bad, 28)
    bad(24) = 0x70 // footer length 0x70 > 32-12
    intercept[IllegalArgumentException] { ParquetFooter.parse(bad) }
  }
}
