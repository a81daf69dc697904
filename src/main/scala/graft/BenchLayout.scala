package graft

import graft.operators.Layout
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measured evidence for the manifest-stats story ("measure, don't
  * guess"): a 2M-row z-clustered snapshot table, then the same
  * two-band query answered three ways —
  *
  *  - `full_scan_filter`: read every manifest file, filter rows
  *    (parquet row-group stats still apply, but every footer is
  *    opened and every file becomes a task);
  *  - `stats_pruned`: [[Layout.snapshotRead]] with the StatPred —
  *    non-matching files dropped at PLANNING time, before any
  *    per-file round trip;
  *  - `count_star`: full count vs [[Layout.snapshotCount]]'s
  *    metadata-only answer.
  *
  * One JSON line per measurement (files opened + wall seconds,
  * min-of-2); the BASELINE.md "Round-8 layout probe" table is this
  * output. At 100 TB the files_opened column IS the cost model: each
  * opened file is an object-store GET + footer parse + task.
  */
object BenchLayout {

  private def timed(f: => Long): (Double, Long) = {
    def once: (Double, Long) = {
      val t0 = System.nanoTime()
      val v = f
      ((System.nanoTime() - t0) / 1e9, v)
    }
    val a = once; val b = once
    (math.min(a._1, b._1), b._2)
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val dir = java.nio.file.Files.createTempDirectory("graft_benchlayout").toString
    val n = 2000000L
    val df = spark.range(n)
      .select(col("id"),
        pmod(col("id") * 2654435761L, lit(4096L)).as("x"),
        pmod(col("id") * 40503L + 7, lit(4096L)).as("y"),
        md5(col("id").cast("string")).as("payload"))
      .withColumn("_z", Layout.zValue(Seq((col("x"), 12), (col("y"), 12))))
      .repartitionByRange(64, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
    Layout.snapshotWrite(df, dir, statsCols = Seq("x", "y"))

    val pred = Layout.StatPred.And(Seq(
      Layout.StatPred.Between("x", 0L, 255L),
      Layout.StatPred.Between("y", 0L, 255L)))
    val allFiles = Layout.snapshotFiles(spark, dir).size
    val prunedFiles = Layout.snapshotFiles(spark, dir, prune = Some(pred)).size

    // warm (footer cache, codegen)
    Layout.snapshotRead(spark, dir).count()

    val (tFull, nFull) = timed(
      Layout.snapshotRead(spark, dir)
        .filter(Layout.toColumn(pred)).count())
    val (tPruned, nPruned) = timed(
      Layout.snapshotRead(spark, dir, prune = Some(pred)).count())
    assert(nFull == nPruned, s"pruning changed the answer: $nFull vs $nPruned")
    val (tCountScan, c1) = timed(Layout.snapshotRead(spark, dir).count())
    val (tCountMeta, c2) = timed(Layout.snapshotCount(spark, dir))
    assert(c1 == c2 && c1 == n)

    def r3(v: Double) = BigDecimal(v).setScale(3, BigDecimal.RoundingMode.HALF_UP)
    println(s"""{"probe":"full_scan_filter","files_opened":$allFiles,"rows":$nFull,"sec":${r3(tFull)}}""")
    println(s"""{"probe":"stats_pruned","files_opened":$prunedFiles,"rows":$nPruned,"sec":${r3(tPruned)}}""")
    println(s"""{"probe":"count_star_scan","files_opened":$allFiles,"rows":$c1,"sec":${r3(tCountScan)}}""")
    println(s"""{"probe":"count_star_metadata","files_opened":0,"rows":$c2,"sec":${r3(tCountMeta)}}""")

    // ---- manifest blooms: point lookup on a HASH-SCATTERED key ----
    // ids scattered across 64 files by an unrelated hash: every file's
    // [min,max] spans ~the whole id domain, so range stats keep all 64
    // files and the bloom tier is the ONLY planning-time pruner.
    val bDir = java.nio.file.Files.createTempDirectory("graft_benchbloom").toString
    spark.range(n)
      .select(col("id"), md5(col("id").cast("string")).as("payload"))
      .repartition(64, col("payload"))
      .write.mode("overwrite").parquet(s"$bDir/raw") // just to reuse files
    Layout.snapshotWrite(
      spark.read.parquet(s"$bDir/raw"), bDir,
      statsCols = Seq("id"), bloomCols = Seq("id"))
    Layout.snapshotRead(spark, bDir).count() // warm
    val probeId = 1234567L
    val eq = Layout.StatPred.Eq("id", probeId)
    val bloomKept = Layout.snapshotFiles(spark, bDir,
      prune = Some(eq)).size
    val (tPoint, nPoint) = timed(
      Layout.snapshotRead(spark, bDir)
        .filter(Layout.toColumn(eq)).count())
    val (tBloom, nBloom) = timed(
      Layout.snapshotRead(spark, bDir, prune = Some(eq)).count())
    assert(nPoint == nBloom && nPoint == 1L,
      s"bloom pruning changed the answer: $nPoint vs $nBloom")
    println(s"""{"probe":"point_lookup_scan","files_opened":64,"rows":$nPoint,"sec":${r3(tPoint)}}""")
    println(s"""{"probe":"point_lookup_bloom","files_opened":$bloomKept,"rows":$nBloom,"sec":${r3(tBloom)}}""")
    spark.stop()
  }
}
