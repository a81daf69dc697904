package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** S7: whole-file-as-partition scans (reference: driver-built file list +
  * `parallelize(list, list.size)`, Assemble.java:84-108) and S5:
  * compressed inputs (Decompress.java:79-126 — Hadoop codecs make .gz
  * transparent to every text-based reader here, so the reference's
  * manual decompress stage disappears).
  */
object WholeFiles {

  /** One row per file: (path, modificationTime, length, content bytes).
    * binaryFile keeps each file in ONE partition — the contract the
    * per-file pipe stages (P1-P4) need. `pathGlobFilter` replaces the
    * reference's driver-side extension filtering (F12).
    */
  def read(spark: SparkSession, dir: String, glob: String = "*"): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(dir)
      .filter(col("length") > 0) // F12: skip empty files/_SUCCESS markers

  /** Whole files as (path, text) — for text formats headed into a pipe. */
  def readText(spark: SparkSession, dir: String, glob: String = "*"): DataFrame =
    spark.read.option("wholetext", "true")
      .option("pathGlobFilter", glob)
      .text(dir)
      .select(input_file_name().as("path"), col("value").as("content"))
}
