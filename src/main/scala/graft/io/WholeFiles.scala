package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import java.io.ByteArrayInputStream
import java.util.zip.{GZIPInputStream, ZipInputStream}

/** S7: whole-file-as-partition scans (reference: driver-built file list +
  * `parallelize(list, list.size)`, Assemble.java:84-108) and S5:
  * compressed inputs (Decompress.java:79-126 — Hadoop codecs make .gz
  * transparent to every text-based reader here, so the reference's
  * manual decompress stage disappears; [[expandArchives]] covers the
  * container formats codecs can't: .zip / .tar / .tar.gz / .bz2).
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

  /** S5 complete: expand archive/compressed containers into one row per
    * member file — (archive, entry, content). Each archive expands
    * inside ITS OWN task (no driver-side staging, unlike the reference's
    * Decompress.java:79-126 which shells out per file on copied local
    * paths): .zip and .tar(.gz) yield their members, .gz/.bz2 yield the
    * single decompressed file, anything else passes through unchanged.
    */
  def expandArchives(spark: SparkSession, dir: String, glob: String = "*"): DataFrame = {
    import spark.implicits._
    read(spark, dir, glob)
      .select(col("path"), col("content")).as[(String, Array[Byte])]
      .flatMap { case (path, bytes) => expandOne(path, bytes) }
      .toDF("archive", "entry", "content")
  }

  private[graft] def expandOne(path: String, bytes: Array[Byte])
      : Iterator[(String, String, Array[Byte])] = {
    val lower = path.toLowerCase
    val baseName = path.substring(path.lastIndexOf('/') + 1)
    if (lower.endsWith(".zip")) {
      val zin = new ZipInputStream(new ByteArrayInputStream(bytes))
      Iterator.continually(zin.getNextEntry).takeWhile(_ != null)
        .filter(e => !e.isDirectory)
        .map(e => (path, e.getName, zin.readAllBytes()))
    } else if (lower.endsWith(".tar.gz") || lower.endsWith(".tgz")) {
      untar(path, new GZIPInputStream(new ByteArrayInputStream(bytes)).readAllBytes())
    } else if (lower.endsWith(".tar")) {
      untar(path, bytes)
    } else if (lower.endsWith(".gz")) {
      Iterator.single((path, baseName.stripSuffix(".gz"),
        new GZIPInputStream(new ByteArrayInputStream(bytes)).readAllBytes()))
    } else if (lower.endsWith(".bz2")) {
      val codec = new org.apache.hadoop.io.compress.BZip2Codec()
      codec.setConf(new org.apache.hadoop.conf.Configuration())
      Iterator.single((path, baseName.stripSuffix(".bz2"),
        codec.createInputStream(new ByteArrayInputStream(bytes)).readAllBytes()))
    } else Iterator.single((path, baseName, bytes))
  }

  /** Minimal ustar reader (POSIX tar: 512-byte headers, octal size at
    * offset 124, typeflag at 156; '0'/NUL = regular file).
    */
  private def untar(path: String, raw: Array[Byte]): Iterator[(String, String, Array[Byte])] = {
    val out = Vector.newBuilder[(String, String, Array[Byte])]
    var off = 0
    var done = false
    while (!done && off + 512 <= raw.length) {
      if ((0 until 512).forall(i => raw(off + i) == 0)) done = true // end-of-archive blocks
      else {
        var nameEnd = 0
        while (nameEnd < 100 && raw(off + nameEnd) != 0) nameEnd += 1
        val name0 = new String(raw, off, nameEnd, java.nio.charset.StandardCharsets.US_ASCII)
        // ustar long paths split into prefix (offset 345, 155 bytes) + name
        val name =
          if (new String(raw, off + 257, 5, java.nio.charset.StandardCharsets.US_ASCII) == "ustar") {
            var pEnd = 0
            while (pEnd < 155 && raw(off + 345 + pEnd) != 0) pEnd += 1
            if (pEnd == 0) name0
            else new String(raw, off + 345, pEnd,
              java.nio.charset.StandardCharsets.US_ASCII) + "/" + name0
          } else name0
        // POSIX permits leading spaces (bsdtar/star emit them) and NULs in
        // numeric fields — strip them BEFORE the octal scan, or a space-
        // padded size parses as 0 and desyncs the whole header walk.
        val sizeField = new String(raw, off + 124, 12, java.nio.charset.StandardCharsets.US_ASCII)
        val size = java.lang.Long.parseLong(
          sizeField.dropWhile(c => c == ' ' || c == 0)
            .takeWhile(c => c >= '0' && c <= '7') match {
            case "" => "0"
            case s => s
          }, 8).toInt
        val typeflag = raw(off + 156)
        val dataStart = off + 512
        if (typeflag == '0'.toByte || typeflag == 0.toByte)
          out += ((path, name, raw.slice(dataStart, dataStart + size)))
        off = dataStart + ((size + 511) / 512) * 512
      }
    }
    out.result().iterator
  }

  /** S5/T9: (R1, R2) pairing by sorted listing order — the reference's
    * file-pairing model (DecompressInterleave.java:78-139 walks the
    * sorted listing and takes adjacent files as a mate pair; standard
    * `_R1`/`_R2` and `_1`/`_2` naming sorts adjacent). Driver-side
    * listing only — O(#files), no data read.
    */
  def pairByListing(spark: SparkSession, dir: String, glob: String = "*"): Seq[(String, String)] = {
    val p = new org.apache.hadoop.fs.Path(dir, glob)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = Option(fs.globStatus(p)).map(_.toSeq).getOrElse(Seq.empty)
      .filter(st => st.isFile && st.getLen > 0)
      .map(_.getPath.toString).sorted
    files.grouped(2).collect { case Seq(a, b) => (a, b) }.toSeq
  }
}
