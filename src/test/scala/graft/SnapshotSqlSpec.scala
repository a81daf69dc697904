package graft

import graft.io.SnapshotFileIndex
import graft.operators.Layout
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.datasources.HadoopFsRelation
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The `snapshot` format provider: registered-table SQL must reach the
  * manifest's planning-time file pruning — the kept-file set a plain
  * `spark.sql(... WHERE ...)` resolves must be IDENTICAL to
  * `Layout.snapshotFilesWhere`, the scan must report exactly that many
  * files, and results must match the Scala-API read bit for bit.
  */
class SnapshotSqlSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def freshDir(tag: String): String = {
    val d = java.nio.file.Files
      .createTempDirectory(s"graft_snapsql_$tag").toFile
    d.delete()
    d.getAbsolutePath
  }

  /** 500 rows clustered on k (8 tight-range files), stats on k and tag. */
  private def writeTable(dir: String): Unit = {
    import spark.implicits._
    val df = (0 until 500)
      .map(i => (i.toLong, s"doc_$i", (i % 7).toString, i * 2L))
      .toDF("k", "name", "tag", "v")
      .repartitionByRange(8, col("k"))
      .sortWithinPartitions("k")
    Layout.snapshotWrite(df, dir, statsCols = Seq("k", "tag"))
  }

  private def scanOf(df: DataFrame): FileSourceScanExec =
    df.queryExecution.executedPlan.collectLeaves().collectFirst {
      case s: FileSourceScanExec => s
    }.getOrElse(fail("no FileSourceScanExec in plan"))

  private def indexOf(scan: FileSourceScanExec): SnapshotFileIndex =
    scan.relation.location match {
      case i: SnapshotFileIndex => i
      case other => fail(s"scan reads ${other.getClass}, not the snapshot index")
    }

  test("format(snapshot) read returns the committed content") {
    val dir = freshDir("basic")
    writeTable(dir)
    val got = spark.read.format("snapshot").option("path", dir).load()
    assert(got.count() === 500)
    val expect = Layout.snapshotRead(spark, dir)
    assert(got.orderBy("k").collect().toSeq ===
      expect.orderBy("k").collect().toSeq)
  }

  test("SQL WHERE over a registered view prunes files exactly like snapshotFilesWhere") {
    val dir = freshDir("prune")
    writeTable(dir)
    spark.sql(
      s"CREATE OR REPLACE TEMPORARY VIEW snap_t USING snapshot OPTIONS (path '$dir')")
    val q = spark.sql(
      "SELECT k, name FROM snap_t WHERE k BETWEEN 100 AND 160 AND tag IN ('1','2','3')")
    val rows = q.collect()
    // content: exact row-level equality with a plain-parquet replay
    assert(rows.length === (100 to 160).count(i => Set(1, 2, 3)(i % 7)))
    // planning: the index's last listing == snapshotFilesWhere
    val scan = scanOf(q)
    val idx = indexOf(scan)
    val expected = Layout.snapshotFilesWhere(spark, dir,
      col("k").between(100, 160) && col("tag").isin("1", "2", "3"))
      .map(_.path).sorted
    assert(idx.lastKept.map(_.path).sorted === expected)
    assert(expected.nonEmpty && expected.size < 8,
      s"test premise: the band must prune some of the 8 files, kept $expected")
    assert(scan.metrics("numFiles").value === expected.size)
  }

  test("non-compilable conjuncts drop soundly; compilable ones still prune") {
    val dir = freshDir("partial")
    writeTable(dir)
    val df = spark.read.format("snapshot").option("path", dir).load()
      .filter(col("k") < 80 && md5(col("name")).startsWith("a"))
    val got = df.collect()
    val expect = Layout.snapshotRead(spark, dir)
      .filter(col("k") < 80 && md5(col("name")).startsWith("a"))
      .collect()
    assert(got.toSet === expect.toSet)
    val idx = indexOf(scanOf(df))
    val kept = idx.lastKept.map(_.path).sorted
    assert(kept === Layout.snapshotFilesWhere(spark, dir, col("k") < 80)
      .map(_.path).sorted)
    assert(kept.size < 8, "k < 80 must prune on an 8-file range layout")
  }

  test("IN over >10 literals (optimizer InSet) still compiles and prunes") {
    val dir = freshDir("inset")
    writeTable(dir)
    val vals = (0L to 30L).toSeq // all inside the first file's range
    val df = spark.read.format("snapshot").option("path", dir).load()
      .filter(col("k").isin(vals: _*))
    assert(df.count() === 31)
    val idx = indexOf(scanOf(df))
    assert(idx.lastKept.size === 1,
      s"31-value IN inside one file's range kept ${idx.lastKept.map(_.path)}")
  }

  test("snapshotId option time-travels; zero-survivor predicate yields empty, not error") {
    val dir = freshDir("tt")
    import spark.implicits._
    val v1 = (0 until 100).map(i => (i.toLong, s"a$i")).toDF("k", "name")
    val v2 = (0 until 50).map(i => (i.toLong, s"b$i")).toDF("k", "name")
    Layout.snapshotWrite(v1.repartition(2), dir, statsCols = Seq("k"))
    Layout.snapshotWrite(v2.repartition(2), dir, statsCols = Seq("k"))
    val pinned = spark.read.format("snapshot")
      .option("path", dir).option("snapshotId", "1").load()
    assert(pinned.count() === 100)
    assert(spark.read.format("snapshot").option("path", dir).load()
      .count() === 50)
    val none = spark.read.format("snapshot").option("path", dir).load()
      .filter(col("k") > 1000000)
    assert(none.count() === 0)
  }

  test("mergeSchema option surfaces widened columns with nulls on old files") {
    val dir = freshDir("widen")
    import spark.implicits._
    Layout.snapshotWrite(Seq((1L, "x")).toDF("k", "name"), dir)
    Layout.snapshotAppend(Seq((2L, "y", 9L)).toDF("k", "name", "extra"), dir)
    val df = spark.read.format("snapshot")
      .option("path", dir).option("mergeSchema", "true").load()
    assert(df.columns.toSet === Set("k", "name", "extra"))
    val byK = df.collect().map(r => r.getLong(0) -> r).toMap
    assert(byK(1L).isNullAt(df.columns.indexOf("extra")))
    assert(byK(2L).getLong(df.columns.indexOf("extra")) === 9L)
  }

  test("manifest bytes feed the index: no per-file stat needed, sizes correct") {
    val dir = freshDir("bytes")
    writeTable(dir)
    val entries = Layout.snapshotFiles(spark, dir)
    assert(entries.forall(_.bytes.isDefined), "post-r10 commits record bytes")
    entries.foreach { e =>
      val real = new java.io.File(s"$dir/${e.path}").length()
      assert(e.bytes.get === real, s"${e.path}: manifest ${e.bytes.get} vs $real")
    }
  }
}
