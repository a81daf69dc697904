package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout operators — HOW 100 TB gets arranged on disk so that
  * the next thousand queries prune instead of scan.
  *
  * Z-ordering (multi-dimensional clustering): a single sort key cannot
  * serve two filter dimensions — parquet min/max stats on the second
  * dimension span the whole domain in every file. Interleaving the bits
  * of both dimensions (the Morton/Z curve) makes file- and row-group-
  * level [min,max] ranges tight on EVERY participating column at once,
  * so a stats-aware reader prunes on any of them. This is the layout
  * strategy Delta/Iceberg expose as `OPTIMIZE ZORDER BY`; here it is
  * built from Spark primitives: a codegen'd shift/mask projection (no
  * UDF, no HOF), `repartitionByRange` on the z-value (range exchange =
  * contiguous curve segments per file), and a partition-local sort.
  *
  * Scale notes: the range exchange samples the z-value to pick
  * boundaries (one extra narrow pass), the sort is per-partition
  * (spillable, no global sort), and nothing touches the driver. The
  * write is the expensive one-time step that every subsequent scan
  * amortizes — the standard compaction/layout job shape.
  */
object Layout {

  /** Morton z-value of the given (column, bits) dimensions as ONE
    * codegen-friendly Column: bit j of dimension i lands at the j-th
    * interleave slot (round-robin over dimensions that still have bits
    * left — unequal widths pack the leftovers consecutively). Values are
    * masked into their bit budget; callers bucket or normalize skewed
    * domains first (rank-bucketing keeps the curve meaningful when a
    * raw domain overflows its bits).
    */
  def zValue(dims: Seq[(Column, Int)]): Column = {
    require(dims.nonEmpty, "zValue needs at least one dimension")
    require(dims.forall(_._2 > 0), "every dimension needs bits > 0")
    require(dims.map(_._2).sum <= 63,
      s"total bits ${dims.map(_._2).sum} > 63 do not fit a long z-value")
    val masked = dims.map { case (c, b) =>
      (c.cast("long").bitwiseAND(lit((1L << b) - 1)), b)
    }
    val terms = scala.collection.mutable.ArrayBuffer.empty[Column]
    var outPos = 0
    val maxBits = dims.map(_._2).max
    var j = 0
    while (j < maxBits) {
      masked.foreach { case (c, b) =>
        if (j < b) {
          terms += shiftleft(shiftright(c, j).bitwiseAND(lit(1L)), outPos)
          outPos += 1
        }
      }
      j += 1
    }
    terms.reduce(_ bitwiseOR _)
  }

  /** Write `df` as parquet clustered along the z-curve of `dims`:
    * range-partition into `numFiles` contiguous curve segments, sort
    * each segment, drop the helper key (the clustering benefit lives in
    * the DATA columns' min/max stats, which the sort tightens). Extra
    * parquet options (e.g. a small `parquet.block.size` to get many
    * row groups per file) pass through.
    */
  def zorderWrite(df: DataFrame, dims: Seq[(String, Int)], path: String,
                  numFiles: Int,
                  options: Map[String, String] = Map.empty): Unit =
    df.withColumn("_zkey", zValue(dims.map { case (n, b) => (col(n), b) }))
      .repartitionByRange(numFiles, col("_zkey"))
      .sortWithinPartitions("_zkey")
      .drop("_zkey")
      .write.mode("overwrite").options(options).parquet(path)

  /** Bucketed-table write: hash-partition rows into `numBuckets` files
    * per key AND record that layout in the catalog, so every later join
    * or aggregation on `keyCol` between same-bucketed tables runs with
    * ZERO exchange — the shuffle is paid once at write time, amortized
    * over every subsequent query (the canonical fact⋈dim co-location
    * strategy at 100 TB, where re-shuffling the fact table per query is
    * the dominant cost). Buckets are also key-sorted: modern Spark only
    * trusts that ordering behind the legacy
    * `bucketedTableScan.outputOrdering` flag, so a PARTITION-LOCAL sort
    * remains in merge joins — a cheap pass over pre-sorted runs, no
    * exchange. LayoutSpec asserts exactly that plan shape.
    */
  def bucketWrite(df: DataFrame, table: String, keyCol: String,
                  numBuckets: Int): Unit = {
    val spark = df.sparkSession
    // `overwrite` only replaces tables the CATALOG knows about. With the
    // default in-memory catalog, a previous JVM's warehouse directory
    // survives while its catalog entry does not, and saveAsTable then
    // refuses the "new" table because the location exists. Drop both.
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), table.toLowerCase)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    // Pre-partition on the SAME hash the bucketing uses so each task
    // holds exactly one bucket → ONE file per bucket. With multiple
    // files per bucket Spark keeps per-bucket sortedness unknown and
    // re-sorts under every merge join; one file per bucket is what lets
    // the read side trust sortBy and skip the sort entirely.
    df.repartition(numBuckets, col(keyCol))
      .write.mode("overwrite").format("parquet")
      .bucketBy(numBuckets, keyCol).sortBy(keyCol)
      .saveAsTable(table)
  }

  /** Small-file compaction — the table-maintenance pass every long-run
    * ingestion needs: streaming sinks and per-batch appends accumulate
    * files far below the efficient scan size (vs
    * `spark.sql.files.maxPartitionBytes`), and at 100 TB the resulting
    * task-per-tiny-file overhead dominates scan time. Rewrites `path`
    * to `out` in `ceil(totalBytes / targetBytes)` files.
    *
    * Scale shape: `coalesce`, not `repartition` — compaction does not
    * need a shuffle, only fewer output tasks; coalesce merges existing
    * partitions narrowly (each output task reads several input files
    * sequentially). The tradeoff (coalesced file sizes track the input
    * distribution rather than balancing perfectly) is the right one
    * for maintenance passes; a layout CHANGE (clustering) is
    * [[zorderWrite]]/[[linearWrite]]'s job, which do pay the shuffle.
    */
  def compact(spark: org.apache.spark.sql.SparkSession, path: String,
              targetBytes: Long, out: String): Int = {
    require(targetBytes > 0, s"bad target size $targetBytes")
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val totalBytes = fs.listFiles(p, true) match {
      case it =>
        var s = 0L
        while (it.hasNext) {
          val f = it.next()
          if (f.getPath.getName.endsWith(".parquet")) s += f.getLen
        }
        s
    }
    val n = math.max(1L, (totalBytes + targetBytes - 1) / targetBytes).toInt
    spark.read.parquet(path).coalesce(n)
      .write.mode("overwrite").parquet(out)
    n
  }

  /** Snapshot DIFF — change-data capture between two committed
    * snapshots of a [[snapshotWrite]] table: one row per changed key,
    * labeled insert / delete / update (the Delta-CDF-style feed a
    * downstream incremental pipeline consumes instead of re-reading
    * the whole table). Keys are assumed unique per snapshot (the
    * [[graft.operators.Corpus.snapshotMerge]] invariant).
    *
    * Scale shape: each side collapses to a skinny (key, row-hash)
    * projection at the scan (the md5 runs map-side, full rows never
    * shuffle), then ONE full-outer equi-join on the key decides the
    * label: only-right = insert, only-left = delete, hash-mismatch =
    * update, hash-equal rows drop. NULL column values hash via a
    * sentinel so NULL vs 'null' vs absent stay distinct.
    */
  def snapshotDiff(spark: org.apache.spark.sql.SparkSession, dir: String,
                   fromId: Long, toId: Long, keyCol: String): DataFrame = {
    val from = snapshotRead(spark, dir, fromId)
    val to = snapshotRead(spark, dir, toId)
    require(from.columns.sorted.sameElements(to.columns.sorted),
      "snapshot schemas differ — diff is defined per column set")
    val dataCols = from.columns.sorted.filter(_ != keyCol)
    def hashed(df: DataFrame): DataFrame = df.select(
      col(keyCol).as("key"),
      md5(concat_ws("\u0001", dataCols.toIndexedSeq.map(c =>
        coalesce(col(c).cast("string"), lit("\u0000"))): _*)).as("h"))
    hashed(from).as("f")
      .join(hashed(to).as("t"), col("f.key") === col("t.key"), "full_outer")
      .select(coalesce(col("f.key"), col("t.key")).as("key"),
        when(col("f.key").isNull, "insert")
          .when(col("t.key").isNull, "delete")
          .when(col("f.h") =!= col("t.h"), "update").as("change_type"))
      .filter(col("change_type").isNotNull)
  }

  /** Parquet BLOOM-FILTER layout: write with a split-block bloom filter
    * per requested column (parquet-mr's native feature — public format
    * spec), so point lookups on high-cardinality UNSORTED columns can
    * skip whole row groups that min/max statistics cannot prune (on a
    * random key every row group's [min, max] spans the whole domain —
    * stats pruning is useless exactly where bloom filters shine).
    * `expectedNdv` sizes each filter (parquet-mr derives bits from the
    * target fpp); readers need no opt-in — Spark's parquet scan probes
    * footers' bloom offsets during row-group filtering whenever a
    * pushed equality predicate matches a filtered column.
    *
    * `rowGroupBytes` bounds the row-group size so a table yields MANY
    * groups per file — the skipping unit; one giant row group per file
    * would make the filter decorative. LayoutSpec proves the skip with
    * task input metrics: the same point lookup reads far fewer records
    * from the bloom layout than from a plain copy (dictionary encoding
    * disabled on both so dictionary-page pruning can't mask the
    * effect).
    */
  def bloomWrite(df: DataFrame, bloomCols: Seq[String], path: String,
                 expectedNdv: Long, rowGroupBytes: Long = 1L << 20): Unit = {
    require(bloomCols.nonEmpty, "need at least one bloom column")
    val w0 = df.write.mode("overwrite")
      .option("parquet.block.size", rowGroupBytes.toString)
      .option("parquet.enable.dictionary", "false")
    bloomCols.foldLeft(w0) { (w, c) =>
      w.option(s"parquet.bloom.filter.enabled#$c", "true")
        .option(s"parquet.bloom.filter.expected.ndv#$c", expectedNdv.toString)
    }.parquet(path)
  }

  /** Comparison baseline: the same write clustered on a SINGLE column —
    * what a one-dimensional `ORDER BY` layout gives you.
    */
  def linearWrite(df: DataFrame, sortCol: String, path: String,
                  numFiles: Int,
                  options: Map[String, String] = Map.empty): Unit =
    df.repartitionByRange(numFiles, col(sortCol))
      .sortWithinPartitions(sortCol)
      .write.mode("overwrite").options(options).parquet(path)

  /** Manifest-committed snapshot write — the core trick of every table
    * format (Iceberg/Delta/Hudi) reduced to its primitive: data files
    * land under `dir/data/` with unique names, then ONE manifest file
    * (the atomic unit) lists exactly the files of this snapshot.
    * Readers resolve the manifest first and read only its files, so
    *  - a writer crash mid-job leaves orphan data files but NO torn
    *    table (the manifest never referenced them);
    *  - overwrite is atomic: the new manifest replaces the old in one
    *    rename, and in-flight readers of the old manifest keep a
    *    consistent old view (their files are still on disk until a
    *    vacuum);
    *  - time travel falls out: old manifests name old snapshots.
    * On an object store this is the ONLY way to get atomic multi-file
    * commits — directory listings are neither atomic nor consistent.
    * Returns the snapshot id.
    */
  def snapshotWrite(df: DataFrame, dir: String): Long = {
    val spark = df.sparkSession
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val snapId = {
      // next id = max existing + 1 (single-writer assumption; a real
      // catalog arbitrates concurrent committers)
      val existing = Option(fs.globStatus(
        new org.apache.hadoop.fs.Path(dir, "manifest-*.json")))
        .getOrElse(Array.empty)
        .map(_.getPath.getName.stripPrefix("manifest-").stripSuffix(".json").toLong)
      if (existing.isEmpty) 1L else existing.max + 1L
    }
    val dataDir = s"$dir/data/snap-$snapId"
    df.write.mode("overwrite").parquet(dataDir)
    val files = fs.listStatus(new org.apache.hadoop.fs.Path(dataDir))
      .map(_.getPath)
      .filter(_.getName.endsWith(".parquet"))
      .map(p => s"data/snap-$snapId/${p.getName}")
      .sorted
    val manifest = files.map(f => "\"" + f + "\"").mkString("[", ",", "]")
    // write-then-rename: the manifest appears atomically or not at all
    val tmp = new org.apache.hadoop.fs.Path(dir, s".manifest-$snapId.json.tmp")
    val out = fs.create(tmp, true)
    try out.write(manifest.getBytes("UTF-8")) finally out.close()
    fs.rename(tmp, new org.apache.hadoop.fs.Path(dir, s"manifest-$snapId.json"))
    snapId
  }

  /** Read a manifest-committed snapshot: latest by default, or a pinned
    * `snapshotId` (time travel). Only manifest-listed files are read —
    * orphans from crashed writers and files of other snapshots are
    * invisible, whatever the directory listing says.
    */
  def snapshotRead(spark: org.apache.spark.sql.SparkSession, dir: String,
                   snapshotId: Long = -1L): DataFrame = {
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val manifests = Option(fs.globStatus(
      new org.apache.hadoop.fs.Path(dir, "manifest-*.json")))
      .getOrElse(Array.empty)
      .map(_.getPath.getName.stripPrefix("manifest-").stripSuffix(".json").toLong)
    require(manifests.nonEmpty, s"no snapshot manifest under $dir")
    val snap = if (snapshotId > 0) snapshotId else manifests.max
    require(manifests.contains(snap), s"snapshot $snap not found under $dir")
    val in = fs.open(new org.apache.hadoop.fs.Path(dir, s"manifest-$snap.json"))
    val body = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    val files = body.stripPrefix("[").stripSuffix("]").split(",")
      .filter(_.nonEmpty).map(_.trim.stripPrefix("\"").stripSuffix("\""))
      .map(f => s"$dir/$f")
    spark.read.parquet(files.toIndexedSeq: _*)
  }

  /** Vacuum a manifest-committed table: delete every data file NOT
    * referenced by the `keep` most recent manifests, and the dropped
    * manifests themselves. The reason vacuum is safe here and unsafe
    * with directory-listing tables: readers resolve a manifest first,
    * so the reachable-file set is exact — crashed-writer orphans and
    * retired snapshots are provably dead. `keep >= 1`; in production
    * the keep horizon is a TIME bound covering the longest-running
    * reader, since a reader pinned to a vacuumed snapshot loses its
    * files. Returns the number of data files deleted.
    */
  def vacuum(spark: org.apache.spark.sql.SparkSession, dir: String,
             keep: Int = 1): Int = {
    require(keep >= 1, s"must keep at least 1 snapshot, got $keep")
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val manifests = Option(fs.globStatus(
      new org.apache.hadoop.fs.Path(dir, "manifest-*.json")))
      .getOrElse(Array.empty)
      .map(_.getPath.getName.stripPrefix("manifest-").stripSuffix(".json").toLong)
      .sorted
    require(manifests.nonEmpty, s"no snapshot manifest under $dir")
    val keepIds = manifests.takeRight(keep).toSet
    val live: Set[String] = keepIds.flatMap { snap =>
      val in = fs.open(new org.apache.hadoop.fs.Path(dir, s"manifest-$snap.json"))
      val body = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      body.stripPrefix("[").stripSuffix("]").split(",")
        .filter(_.nonEmpty).map(_.trim.stripPrefix("\"").stripSuffix("\"")).toSet
    }
    var deleted = 0
    val dataRoot = new org.apache.hadoop.fs.Path(dir, "data")
    if (fs.exists(dataRoot)) {
      val it = fs.listFiles(dataRoot, true)
      val dead = scala.collection.mutable.ArrayBuffer.empty[org.apache.hadoop.fs.Path]
      while (it.hasNext) {
        val f = it.next()
        val rel = f.getPath.toString.stripPrefix(
          fs.makeQualified(root).toString + "/")
        if (f.isFile && !live.contains(rel)) dead += f.getPath
      }
      dead.foreach { p => if (fs.delete(p, false)) deleted += 1 }
    }
    manifests.dropRight(keep).foreach { snap =>
      fs.delete(new org.apache.hadoop.fs.Path(dir, s"manifest-$snap.json"), false)
    }
    deleted
  }

  /** Hive-style partitioned write — the COARSEST pruning lever: rows
    * land in `col=value/` directories, and a later filter on a
    * partition column eliminates whole directories during PLANNING
    * (`PartitionFilters` on the scan node — zero files opened, zero
    * footers read), strictly stronger than row-group stats pruning.
    * The canonical 100 TB layout for low-cardinality query dimensions:
    * date, language, source.
    *
    * Rows are pre-shuffled on the partition columns so each task holds
    * complete partition values — without it, every one of T tasks can
    * hold rows of every one of P values and the write emits up to T×P
    * files (the classic partitioned-write small-file explosion). The
    * tradeoff: a genuinely hot partition value serializes into one
    * task's file; callers with known-hot values add a salt column to
    * the repartition (not the directory layout) to split those writes.
    */
  def partitionedWrite(df: DataFrame, partCols: Seq[String],
                       path: String): Unit = {
    require(partCols.nonEmpty, "partitionedWrite needs partition columns")
    df.repartition(partCols.map(col): _*)
      .write.mode("overwrite").partitionBy(partCols: _*).parquet(path)
  }

  /** Incremental view maintenance for an algebraic (count + sum)
    * aggregate: apply a CDC change feed ([[snapshotDiff]]'s consumer
    * side) to the previous materialized aggregate instead of
    * recomputing from the table. Inserts add (+1, +new), deletes
    * subtract (−1, −old), updates contribute the value delta
    * (new − old). Groups whose maintained count reaches zero drop out
    * of the view, exactly as a recompute would drop them.
    *
    * Why it matters at 100 TB: a full recompute scans the table; this
    * maintains the view in O(|changes|) — the delta feed aggregates to
    * at most |touched groups| rows, and the merge is one full-outer
    * equi-join against the (already small) materialized aggregate.
    * Correctness rests on the aggregate being algebraic (count/sum —
    * and avg as their ratio); holistic aggregates (exact median)
    * still need the recompute path.
    *
    * `changes` columns: `op` ('I' | 'D' | 'U'), the group key, `valOld`
    * (null for inserts), `valNew` (null for deletes). `prevAgg` must
    * hold the materialized view as (keyCol, countCol, sumCol) —
    * `countCol`/`sumCol` name its count and sum columns (default
    * `n`/`total`) and the maintained output reuses the same names.
    */
  def deltaAggMaintain(prevAgg: DataFrame, changes: DataFrame,
                       keyCol: String, opCol: String, oldCol: String,
                       newCol: String, countCol: String = "n",
                       sumCol: String = "total"): DataFrame = {
    require(prevAgg.columns.contains(countCol) &&
      prevAgg.columns.contains(sumCol),
      s"prevAgg must carry the view's ($countCol, $sumCol) aggregate " +
        s"columns; has ${prevAgg.columns.mkString(", ")}")
    val delta = changes.groupBy(keyCol).agg(
      sum(when(col(opCol) === "I", 1L)
        .when(col(opCol) === "D", -1L).otherwise(0L)).as("_dn"),
      sum(when(col(opCol) === "I", col(newCol))
        .when(col(opCol) === "D", -col(oldCol))
        .otherwise(col(newCol) - col(oldCol))).as("_dsum"))
    prevAgg.join(delta, Seq(keyCol), "full_outer")
      .select(col(keyCol),
        (coalesce(col(countCol), lit(0L)) + coalesce(col("_dn"), lit(0L)))
          .as(countCol),
        (coalesce(col(sumCol), lit(0L)) + coalesce(col("_dsum"), lit(0L)))
          .as(sumCol))
      .filter(col(countCol) > 0)
  }
}
