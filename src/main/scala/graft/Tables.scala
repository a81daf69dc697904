package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated TPC-H-ish parquet tables (TESTDATA.md).
  *
  * All queries in this engine receive an `sfDir` (scale-factor directory) and
  * pull tables through here, so the read path is uniform: vectorized parquet
  * scan, column pruning + predicate pushdown decided by Catalyst. At cluster
  * scale the same loaders work against any FS the Hadoop conf supports; no
  * code change needed for HDFS/S3 paths.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(spark: SparkSession, d: String): DataFrame = load(spark, d, "region")
  def nation(spark: SparkSession, d: String): DataFrame = load(spark, d, "nation")
  def customer(spark: SparkSession, d: String): DataFrame = load(spark, d, "customer")
  def supplier(spark: SparkSession, d: String): DataFrame = load(spark, d, "supplier")
  def part(spark: SparkSession, d: String): DataFrame = load(spark, d, "part")
  def orders(spark: SparkSession, d: String): DataFrame = load(spark, d, "orders")
  def lineitem(spark: SparkSession, d: String): DataFrame = load(spark, d, "lineitem")
  /** The events table's `ts` physical type has varied across driver
    * testdata generations: TIMESTAMP(NANOS) (a parquet type Spark
    * refuses outright — PARQUET_TYPE_ILLEGAL — unless read as a raw
    * long) in some, TIMESTAMP(MICROS) in others. Adapt to whichever is
    * on disk: nanos-as-long is truncated to micros (identical to
    * DuckDB's ns→us handling); a real timestamp is cast straight to
    * timestamp_ntz (session TZ is pinned to UTC everywhere, so the
    * wall-clock value is unchanged).
    */
  def events(spark: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(spark, d, "events")
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts",
          timestamp_micros(expr("ts div 1000")).cast("timestamp_ntz"))
      case _ =>
        raw.withColumn("ts", col("ts").cast("timestamp_ntz"))
    }
  }
  def documents(spark: SparkSession, d: String): DataFrame = load(spark, d, "documents")
  def embeddings(spark: SparkSession, d: String): DataFrame = load(spark, d, "embeddings")

  /** Register every table as a temp view (the reference's
    * `registerTempTable` surface, SQLQueryFastq.java:92) so arbitrary
    * user SQL can run against them via `spark.sql`.
    */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach { n =>
      val df = if (n == "events") events(spark, sfDir) else load(spark, sfDir, n)
      df.createOrReplaceTempView(n)
    }
}
