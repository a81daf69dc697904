package graft.io

import graft.operators.Layout
import graft.operators.Layout.{FileEntry, StatPred}
import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.{SparkSession, SQLContext}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.execution.datasources.{FileIndex, HadoopFsRelation, PartitionDirectory}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.sources.{BaseRelation, DataSourceRegister, RelationProvider}
import org.apache.spark.sql.types.StructType

/** SQL/DataFrame-reader access to the manifest snapshot table format —
  * the registration → arbitrary-SQL lifecycle the reference is built
  * around (SQLQueryFastq.java:99 registers a table then runs free-form
  * SQL), extended to the engine's own storage layer:
  *
  * {{{
  *   spark.read.format("snapshot").option("path", dir).load()
  *   // or, SQL-only:
  *   spark.sql(s"CREATE TEMPORARY VIEW t USING snapshot OPTIONS (path '$dir')")
  *   spark.sql("SELECT ... FROM t WHERE n_chars BETWEEN 150 AND 350")
  * }}}
  *
  * and the WHERE prunes manifest-listed files at PLANNING time: Spark
  * hands the scan's data filters to [[SnapshotFileIndex.listFiles]],
  * which compiles them through the same PredNode → StatPred pipeline
  * `snapshotReadWhere` uses, so the kept-file set is IDENTICAL to
  * `Layout.snapshotFilesWhere` (SnapshotSqlSpec pins the equality).
  *
  * Architecture note — why a `FileIndex` and not a hand-rolled
  * DataSourceV2 `PartitionReader`: the physical scan stays Spark's own
  * vectorized parquet reader inside WholeStageCodegen, with its
  * parquet-level PushedFilters/ReadSchema intact — a custom
  * `SupportsPushDownFilters` Batch reader would have to reimplement
  * (or row-wrap) that reader and lose all of it. The manifest tier
  * only decides WHICH files the scan opens, which is precisely the
  * `FileIndex.listFiles(partitionFilters, dataFilters)` contract —
  * the same seam Delta Lake's data skipping uses. Options: `path`
  * (required), `snapshotId` (time travel; default latest),
  * `mergeSchema` (union schema across widening appends).
  *
  * Scale shape: planning cost is one manifest read (the entries carry
  * byte sizes, so NO per-file round trips — at object-store latency a
  * per-file HEAD across 10⁵ files is minutes before the first task);
  * pruning is an in-memory fold over entries; the scan itself opens
  * only surviving files.
  */
class SnapshotSource extends RelationProvider with DataSourceRegister {
  override def shortName(): String = "snapshot"

  override def createRelation(sqlContext: SQLContext,
                              parameters: Map[String, String]): BaseRelation = {
    val spark = sqlContext.sparkSession
    // DSv1 hands options through CaseInsensitiveMap, but be explicit
    val opts = parameters.map { case (k, v) => k.toLowerCase -> v }
    val dir = opts.getOrElse("path",
      throw new IllegalArgumentException(
        "snapshot source needs .option(\"path\", <table dir>)"))
    val snapId = opts.get("snapshotid").map(_.toLong).getOrElse(-1L)
    val mergeSchema = opts.get("mergeschema").exists(_.toBoolean)
    val entries = Layout.snapshotFiles(spark, dir, snapId)
    // Rename/drop history can leave files whose parquet column names
    // differ from the current schema; a HadoopFsRelation resolves
    // strictly by name, so serving those files here would silently
    // null-fill renamed columns. Refuse loudly — Layout.snapshotRead
    // resolves by field id, and compactSnapshot/optimizeClustered
    // rewrite to current names, restoring SQL access.
    val schemas = Layout.snapshotSchemas(spark, dir, snapId)
    schemas.lastOption.foreach { cur =>
      val curSet = cur.fields.map(f => (f.id, f.name)).toSet
      // by-name reading is safe iff every file's fields are a SUBSET of
      // the current (id, name) pairs: widening appends qualify (old
      // files just null-fill the added columns), renames (same id,
      // different name) and drops (field gone from current) do not
      val byNameSafe = entries.forall(e =>
        e.schemaId.forall(id => schemas.find(_.id == id)
          .forall(_.fields.map(f => (f.id, f.name)).toSet.subsetOf(curSet))))
      require(byNameSafe,
        s"snapshot table at $dir has files written under renamed/dropped " +
          "column names; read via Layout.snapshotRead (field-id " +
          "resolution) or heal with Layout.compactSnapshot, then re-register")
    }
    // Schema from a BOUNDED file subset, mirroring snapshotRead: one
    // file plain, one per data directory under mergeSchema (schema can
    // only change between commits, and each commit writes one dir).
    val schemaFiles =
      (if (!mergeSchema) entries.take(1)
       else entries.groupBy(e => e.path.take(e.path.lastIndexOf('/') max 0))
         .values.map(_.head).toSeq)
        .map(e => s"$dir/${e.path}")
    require(schemaFiles.nonEmpty, s"empty snapshot under $dir")
    val reader =
      if (mergeSchema) spark.read.option("mergeSchema", "true")
      else spark.read
    val dataSchema = reader.parquet(schemaFiles: _*).schema
    val index = new SnapshotFileIndex(spark, dir, entries)
    HadoopFsRelation(
      location = index,
      partitionSchema = new StructType(),
      dataSchema = dataSchema,
      bucketSpec = None,
      fileFormat = new ParquetFileFormat,
      options = opts)(spark)
  }
}

/** The planning seam: Spark calls [[listFiles]] with the scan's pushed
  * data filters (resolved catalyst Expressions); each compiles through
  * [[Bridge.predicateTree]] → [[Layout.fromPredNode]] into the manifest
  * StatPred algebra, and files whose range/bloom stats prove they hold
  * no matching row are never opened. Non-compilable conjuncts drop
  * soundly (pruning with a subset only widens the kept set; the full
  * filter still runs row-level in the scan).
  *
  * The entry list is pinned at construction — a snapshot is immutable
  * by contract, so [[refresh]] is a no-op and concurrent commits never
  * shift a running query's view (the same isolation `snapshotRead`
  * gives the Scala API).
  */
class SnapshotFileIndex(spark: SparkSession, dir: String,
                        entries: Seq[FileEntry]) extends FileIndex {
  private val root = new Path(dir)
  private val fs =
    root.getFileSystem(spark.sparkContext.hadoopConfiguration)
  private val qualifiedRoot = fs.makeQualified(root)

  // Manifest bytes when recorded (every post-r10 commit); one stat per
  // file only for legacy manifests that predate size recording.
  private val statuses: Seq[(FileEntry, FileStatus)] = entries.map { e =>
    val p = fs.makeQualified(new Path(s"$dir/${e.path}"))
    val st = e.bytes match {
      case Some(len) => new FileStatus(len, false, 1, 128L << 20, 0L, p)
      case None => fs.getFileStatus(p)
    }
    (e, st)
  }

  /** The most recent listing's kept entries — the observable planning
    * decision SnapshotSqlSpec compares against `snapshotFilesWhere`.
    */
  @volatile var lastKept: Seq[FileEntry] = entries

  override def rootPaths: Seq[Path] = Seq(qualifiedRoot)
  override def partitionSchema: StructType = new StructType()
  override def refresh(): Unit = ()
  override def inputFiles: Array[String] =
    statuses.map(_._2.getPath.toString).toArray
  override def sizeInBytes: Long = statuses.map(_._2.getLen).sum

  override def listFiles(partitionFilters: Seq[Expression],
                         dataFilters: Seq[Expression])
      : Seq[PartitionDirectory] = {
    val preds = dataFilters.flatMap(e =>
      Layout.fromPredNode(Bridge.predicateTree(e)))
    val kept =
      if (preds.isEmpty) statuses
      else {
        val p = if (preds.size == 1) preds.head else StatPred.And(preds)
        statuses.filter { case (e, _) => Layout.mayMatch(e, p) }
      }
    lastKept = kept.map(_._1)
    Seq(PartitionDirectory(InternalRow.empty, kept.map(_._2).toArray))
  }
}
