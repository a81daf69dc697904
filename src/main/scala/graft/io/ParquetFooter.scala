package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}

import java.nio.{ByteBuffer, ByteOrder}

/** Parquet footer inspector — metadata-only file triage. At 100 TB the
  * planning decision (which files can this query skip?) must come from
  * footers, never data pages: this reads the last few KB of each file
  * and surfaces num_rows, row-group structure, and per-column min/max
  * statistics for INT64 columns.
  *
  * The parser is built from the published format only (apache/parquet-
  * format: PAR1 magic + u32-LE footer length, FileMetaData as a Thrift
  * COMPACT-protocol struct): a generic compact-protocol walker — short
  * and long field headers, zigzag varints, all 12 wire types, unknown
  * fields skipped recursively (the Thrift forward-compat rule) — with
  * targeted extraction of FileMetaData.num_rows (field 3), the
  * RowGroup list (4), ColumnChunk.meta_data (3), ColumnMetaData.
  * path_in_schema (3) and Statistics.min_value/max_value (6/5,
  * INT64 plain little-endian). It deliberately shares NOTHING with
  * Spark's own parquet reader, so it cross-checks the writer.
  */
object ParquetFooter {

  // ------------------------------------------------------------------
  // Thrift compact protocol walker
  // ------------------------------------------------------------------

  private[graft] final class Compact(b: Array[Byte], var pos: Int) {
    def u8(): Int = {
      require(pos < b.length, "truncated thrift payload")
      val v = b(pos) & 0xFF
      pos += 1
      v
    }
    def varint(): Long = {
      var shift = 0
      var v = 0L
      var more = true
      while (more) {
        require(shift < 64, "over-long thrift varint")
        val x = u8()
        v |= (x & 0x7FL) << shift
        shift += 7
        more = (x & 0x80) != 0
      }
      v
    }
    def zigzag(): Long = {
      val v = varint()
      (v >>> 1) ^ -(v & 1)
    }
    def binary(): Array[Byte] = {
      val len = varint()
      require(len >= 0 && pos + len <= b.length,
        s"thrift binary of $len bytes overruns the buffer")
      val out = java.util.Arrays.copyOfRange(b, pos, pos + len.toInt)
      pos += len.toInt
      out
    }
    /** (size, elemType) of a list/set header. */
    def listHeader(): (Int, Int) = {
      val h = u8()
      val short = (h >> 4) & 0x0F
      val t = h & 0x0F
      val size = if (short == 15) varint().toInt else short
      require(size >= 0, "negative thrift list size")
      (size, t)
    }
    def skip(t: Int): Unit = t match {
      case 1 | 2 => () // bool encoded in the field header
      case 3 => u8()
      case 4 | 5 | 6 => zigzag()
      case 7 =>
        require(pos + 8 <= b.length, "truncated double"); pos += 8
      case 8 => binary()
      case 9 | 10 =>
        val (n, et) = listHeader()
        var i = 0
        while (i < n) { skipElem(et); i += 1 }
      case 11 =>
        val size = varint().toInt
        if (size > 0) {
          val kv = u8()
          var i = 0
          while (i < size) {
            skipElem((kv >> 4) & 0x0F); skipElem(kv & 0x0F); i += 1
          }
        }
      case 12 => skipStruct()
      case other =>
        throw new IllegalArgumentException(s"unknown thrift type $other")
    }
    /** List/set/map ELEMENTS encode bools as a full byte. */
    private def skipElem(t: Int): Unit =
      if (t == 1 || t == 2) { u8(); () } else skip(t)
    def skipStruct(): Unit = {
      var lastId = 0
      var stop = false
      while (!stop) {
        val h = u8()
        if (h == 0) stop = true
        else {
          val delta = (h >> 4) & 0x0F
          val t = h & 0x0F
          lastId = if (delta != 0) lastId + delta else zigzag().toInt
          skip(t)
        }
      }
    }
    /** Walk one struct, calling `field(id, type)` per field; the
      * callback must consume the value (or call skip).
      */
    def struct(field: (Int, Int) => Unit): Unit = {
      var lastId = 0
      var stop = false
      while (!stop) {
        val h = u8()
        if (h == 0) stop = true
        else {
          val delta = (h >> 4) & 0x0F
          val t = h & 0x0F
          lastId = if (delta != 0) lastId + delta else zigzag().toInt
          field(lastId, t)
        }
      }
    }
  }

  // ------------------------------------------------------------------
  // FileMetaData extraction
  // ------------------------------------------------------------------

  final case class ColumnFooter(path: Seq[String], numValues: Long,
    minInt64: Option[Long], maxInt64: Option[Long])
  final case class RowGroupFooter(numRows: Long,
    columns: Seq[ColumnFooter])
  final case class FileFooter(numRows: Long,
    rowGroups: Seq[RowGroupFooter])

  private def le64(b: Array[Byte]): Option[Long] =
    if (b.length == 8)
      Some(ByteBuffer.wrap(b).order(ByteOrder.LITTLE_ENDIAN).getLong)
    else None

  private def parseStatistics(c: Compact): (Option[Long], Option[Long]) = {
    var mn: Option[Long] = None
    var mx: Option[Long] = None
    c.struct { (id, t) =>
      (id, t) match {
        case (5, 8) => mx = le64(c.binary()) // max_value
        case (6, 8) => mn = le64(c.binary()) // min_value
        case _ => c.skip(t)
      }
    }
    (mn, mx)
  }

  private def parseColumnMeta(c: Compact): ColumnFooter = {
    var path = Seq.empty[String]
    var numValues = -1L
    var mn: Option[Long] = None
    var mx: Option[Long] = None
    c.struct { (id, t) =>
      (id, t) match {
        case (3, 9) => // path_in_schema: list<string>
          val (n, et) = c.listHeader()
          require(et == 8, s"path_in_schema element type $et")
          path = (0 until n).map(_ => new String(c.binary(), "UTF-8"))
        case (5, 6) => numValues = c.zigzag()
        case (12, 12) => // statistics
          val (a, b) = parseStatistics(c)
          mn = a; mx = b
        case _ => c.skip(t)
      }
    }
    ColumnFooter(path, numValues, mn, mx)
  }

  private def parseColumnChunk(c: Compact): Option[ColumnFooter] = {
    var meta: Option[ColumnFooter] = None
    c.struct { (id, t) =>
      (id, t) match {
        case (3, 12) => meta = Some(parseColumnMeta(c))
        case _ => c.skip(t)
      }
    }
    meta
  }

  private def parseRowGroup(c: Compact): RowGroupFooter = {
    var numRows = -1L
    var cols = Seq.empty[ColumnFooter]
    c.struct { (id, t) =>
      (id, t) match {
        case (1, 9) => // columns: list<ColumnChunk>
          val (n, et) = c.listHeader()
          require(et == 12, s"ColumnChunk element type $et")
          cols = (0 until n).flatMap(_ => parseColumnChunk(c))
        case (3, 6) => numRows = c.zigzag()
        case _ => c.skip(t)
      }
    }
    require(numRows >= 0, "RowGroup without num_rows")
    RowGroupFooter(numRows, cols)
  }

  /** Parse a whole parquet file's footer (pass the full file bytes or
    * at least a tail window containing the footer).
    */
  def parse(bytes: Array[Byte]): FileFooter = {
    val n = bytes.length
    require(n >= 12, "file too short for a parquet footer")
    require(new String(bytes, n - 4, 4, "ASCII") == "PAR1",
      "missing trailing PAR1 magic")
    val footerLen = ByteBuffer.wrap(bytes, n - 8, 4)
      .order(ByteOrder.LITTLE_ENDIAN).getInt
    require(footerLen > 0 && footerLen <= n - 12,
      s"footer length $footerLen outside file of $n bytes")
    val c = new Compact(bytes, n - 8 - footerLen)
    var numRows = -1L
    var groups = Seq.empty[RowGroupFooter]
    c.struct { (id, t) =>
      (id, t) match {
        case (3, 6) => numRows = c.zigzag()
        case (4, 9) =>
          val (k, et) = c.listHeader()
          require(et == 12, s"RowGroup element type $et")
          groups = (0 until k).map(_ => parseRowGroup(c))
        case _ => c.skip(t)
      }
    }
    require(numRows >= 0, "FileMetaData without num_rows")
    require(groups.map(_.numRows).sum == numRows,
      s"row-group rows ${groups.map(_.numRows).sum} != file num_rows $numRows")
    FileFooter(numRows, groups)
  }

  // ------------------------------------------------------------------
  // Spark operator
  // ------------------------------------------------------------------

  /** Footer-scan every parquet part-file under `path` (recursively):
    * one task per file, emitting per-file num_rows, row-group count,
    * and the named INT64 column's min/max from the footer statistics.
    * Only footers are read — the scan is metadata-proportional.
    */
  def scanDir(spark: SparkSession, path: String,
    statsCol: String): DataFrame = {
    import spark.implicits._
    val conf = spark.sparkContext.hadoopConfiguration
    val hPath = new org.apache.hadoop.fs.Path(path)
    val fs = hPath.getFileSystem(conf)
    val it = fs.listFiles(hPath, true)
    val files = scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
    while (it.hasNext) {
      val f = it.next()
      if (f.isFile && f.getPath.getName.endsWith(".parquet"))
        files += ((f.getPath.toString, f.getLen))
    }
    require(files.nonEmpty, s"no .parquet files under $path")
    val confBc = spark.sparkContext.broadcast(new HadoopConfCarrier(conf))
    spark.sparkContext
      .parallelize(files.sortBy(_._1).toIndexedSeq, files.length)
      .map { case (file, len) =>
        val fsr = new org.apache.hadoop.fs.Path(file)
          .getFileSystem(confBc.value.toConf)
        // footer tail window: 1 MB covers any metadata these sizes emit
        val window = math.min(len, 1L << 20).toInt
        val buf = new Array[Byte](window)
        val in = fsr.open(new org.apache.hadoop.fs.Path(file))
        try {
          in.seek(len - window)
          in.readFully(buf)
        } finally in.close()
        val footer = parse(buf)
        val stats = footer.rowGroups.flatMap(_.columns)
          .filter(_.path == Seq(statsCol))
        (file, footer.numRows, footer.rowGroups.length,
          stats.flatMap(_.minInt64).reduceOption(_ min _),
          stats.flatMap(_.maxInt64).reduceOption(_ max _))
      }
      .toDF("file", "num_rows", "n_row_groups", "min_stat", "max_stat")
  }
}
