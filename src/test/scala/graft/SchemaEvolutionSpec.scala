package graft

import graft.operators.Layout
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Field-id schema evolution: rename is metadata-only and serves
  * pre-rename files under the new name; drop + re-add never resurrects
  * old data; pruning translates names per file; maintenance heals the
  * table back to uniform names.
  */
class SchemaEvolutionSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def freshDir(tag: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft_evo_$tag").toFile
    d.delete(); d.getAbsolutePath
  }

  test("renameColumn is metadata-only: old files serve the new name, ids stable") {
    val dir = freshDir("rename")
    val v1 = (0 until 100).map(i => (i.toLong, s"d$i")).toDF("k", "body")
    Layout.snapshotWrite(v1.repartition(2), dir, statsCols = Seq("k"))
    val filesBefore = Layout.snapshotFiles(spark, dir).map(_.path).toSet
    Layout.renameColumn(spark, dir, "body", "text")
    // zero data movement
    assert(Layout.snapshotFiles(spark, dir).map(_.path).toSet === filesBefore)
    val df = Layout.snapshotRead(spark, dir)
    assert(df.columns.toSeq === Seq("k", "text"))
    assert(df.filter(col("text") === "d42").select("k").as[Long].head() === 42L)
    // the field kept its id across the rename
    val schemas = Layout.snapshotSchemas(spark, dir)
    assert(schemas.size === 2)
    val idOf = (s: Layout.SchemaInfo, n: String) =>
      s.fields.find(_.name == n).get.id
    assert(idOf(schemas.head, "body") === idOf(schemas.last, "text"))
    // time travel to snapshot 1 still shows the OLD name
    assert(Layout.snapshotRead(spark, dir, snapshotId = 1L)
      .columns.toSeq === Seq("k", "body"))
  }

  test("append after rename: one table, both eras readable, stats keep collecting") {
    val dir = freshDir("appendren")
    Layout.snapshotWrite(
      (0 until 100).map(i => (i.toLong, s"old$i")).toDF("k", "body")
        .repartitionByRange(2, col("k")).sortWithinPartitions("k"),
      dir, statsCols = Seq("k"))
    Layout.renameColumn(spark, dir, "body", "text")
    Layout.snapshotAppend(
      (100 until 200).map(i => (i.toLong, s"new$i")).toDF("k", "text")
        .repartitionByRange(2, col("k")).sortWithinPartitions("k"), dir)
    val df = Layout.snapshotRead(spark, dir)
    assert(df.count() === 200)
    assert(df.columns.toSeq === Seq("k", "text"))
    assert(df.filter(col("text").startsWith("old")).count() === 100)
    assert(df.filter(col("text").startsWith("new")).count() === 100)
    // new files collected stats under the carried (translated) column set
    val newEntries = Layout.snapshotFiles(spark, dir)
      .filter(_.path.contains("snap-3"))
    assert(newEntries.nonEmpty && newEntries.forall(_.stats.contains("k")))
  }

  test("pruning on a renamed column translates to each file's stats names") {
    val dir = freshDir("prune")
    Layout.snapshotWrite(
      (0 until 400).map(i => (i.toLong, s"d$i")).toDF("k", "body")
        .repartitionByRange(8, col("k")).sortWithinPartitions("k"),
      dir, statsCols = Seq("k", "body"))
    Layout.renameColumn(spark, dir, "k", "key")
    // band on the NEW name must prune pre-rename files via their OLD stats
    val kept = Layout.snapshotFilesWhere(spark, dir,
      col("key").between(0, 40))
    assert(kept.size === 1, s"kept ${kept.map(_.path)}")
    val rows = Layout.snapshotReadWhere(spark, dir, col("key").between(0, 40))
    assert(rows.count() === 41)
    assert(rows.columns.toSeq === Seq("key", "body"))
  }

  test("drop + re-add same name gets a fresh id: old data never resurrects") {
    val dir = freshDir("drop")
    Layout.snapshotWrite(
      (0 until 50).map(i => (i.toLong, s"secret$i", i * 10)).toDF("k", "v", "w"),
      dir)
    Layout.dropColumn(spark, dir, "v")
    assert(Layout.snapshotRead(spark, dir).columns.toSeq === Seq("k", "w"))
    // re-add "v" via an append carrying the name
    Layout.snapshotAppend(
      (50 until 60).map(i => (i.toLong, i * 10, s"fresh$i")).toDF("k", "w", "v"),
      dir)
    val df = Layout.snapshotRead(spark, dir)
    assert(df.columns.sorted.toSeq === Seq("k", "v", "w"))
    val oldRows = df.filter(col("k") < 50).select("v").distinct().collect()
    assert(oldRows.map(_.isNullAt(0)).forall(identity),
      s"dropped data resurrected: ${oldRows.mkString(",")}")
    assert(df.filter(col("k") >= 50 && col("v").startsWith("fresh")).count() === 10)
    // fresh id, not the dropped field's
    val schemas = Layout.snapshotSchemas(spark, dir)
    val firstV = schemas.head.fields.find(_.name == "v").get.id
    val lastV = schemas.last.fields.find(_.name == "v").get.id
    assert(firstV !== lastV)
  }

  test("compactSnapshot heals an evolved table back to uniform current names") {
    val dir = freshDir("heal")
    Layout.snapshotWrite(
      (0 until 100).map(i => (i.toLong, s"d$i")).toDF("k", "body")
        .repartition(4), dir, statsCols = Seq("k"))
    Layout.renameColumn(spark, dir, "body", "text")
    intercept[IllegalArgumentException] {
      spark.read.format("snapshot").option("path", dir).load().collect()
    }
    Layout.compactSnapshot(spark, dir, targetBytes = 64L << 20)
    // post-compact: SQL access restored, content intact under new names
    val df = spark.read.format("snapshot").option("path", dir).load()
    assert(df.columns.toSeq === Seq("k", "text"))
    assert(df.count() === 100)
    assert(df.filter(col("text") === "d7").count() === 1)
  }

  test("deleteWhere and mergeInto on an evolved table use current names") {
    val dir = freshDir("dml")
    Layout.snapshotWrite(
      (0 until 100).map(i => (i.toLong, s"d$i")).toDF("k", "body")
        .repartitionByRange(4, col("k")).sortWithinPartitions("k"),
      dir, statsCols = Seq("k"))
    Layout.renameColumn(spark, dir, "k", "key")
    val (_, rewritten) = Layout.deleteWhere(spark, dir,
      Layout.StatPred.Between("key", 0L, 24L))
    assert(rewritten === 1, "band delete must touch exactly the first file")
    val afterDelete = Layout.snapshotRead(spark, dir)
    assert(afterDelete.count() === 75)
    assert(afterDelete.columns.toSeq === Seq("key", "body"))
    val source = Seq((30L, "updated30"), (200L, "new200")).toDF("key", "body")
    Layout.mergeInto(spark, dir, source, Seq("key"))
    val merged = Layout.snapshotRead(spark, dir)
    assert(merged.count() === 76)
    assert(merged.filter(col("key") === 30L).select("body").as[String]
      .head() === "updated30")
    assert(merged.filter(col("key") === 200L).count() === 1)
  }

  test("evolution ops refuse schema-less legacy tables loudly") {
    val dir = freshDir("legacy")
    // forge a legacy manifest: write then strip schemas by rewriting a
    // v1-style bare path list
    Layout.snapshotWrite(Seq((1L, "a")).toDF("k", "v"), dir)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val entries = Layout.snapshotFiles(spark, dir)
      .map(e => Layout.FileEntry(e.path)) // no stats, bytes, schemaId
    Layout.writeManifest(fs, dir, 2L, entries)
    val ex = intercept[IllegalArgumentException] {
      Layout.renameColumn(spark, dir, "v", "w")
    }
    assert(ex.getMessage.contains("schema"))
  }
}
