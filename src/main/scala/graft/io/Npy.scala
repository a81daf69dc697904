package graft.io

import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Row, SparkSession}

import java.nio.{ByteBuffer, ByteOrder}

/** NPY shard I/O — the embedding interchange format training and ANN
  * pipelines actually ship (NumPy's `.npy` v1.0: magic, little-endian
  * header-length, a Python-dict header with dtype/order/shape, raw
  * array bytes). Each Spark partition writes a PAIR of shards —
  * `part-NNNNN-ids.npy` (int64, shape (n,)) and `part-NNNNN-vec.npy`
  * (float32, shape (n, d)) — the ids+embeddings sidecar convention, so
  * any NumPy consumer `np.load`s them directly. The read side parses
  * the header for real (magic check, dict fields, shape agreement
  * between the pair) and streams rows back, one task per shard pair.
  *
  * Scale shape: write is narrow (each task streams its own partition
  * through one Hadoop FS stream, no shuffle); read parallelizes over
  * shard pairs. Same pattern as [[Avro]].
  *
  * Cross-validated against NumPy itself (2026-08-15): `np.load` on
  * engine-written shards returns dtype float32/int64, the declared
  * shapes, and the exact values — the writer is not merely
  * self-consistent (NpySpec additionally byte-pins the v1.0 header).
  */
object Npy {

  private val Magic: Array[Byte] =
    Array(0x93.toByte) ++ "NUMPY".getBytes("US-ASCII")

  /** v1.0 header: magic + version + uint16 LE length + dict padded with
    * spaces to a 64-byte-aligned total, '\n'-terminated (the NumPy
    * layout rule, keeping the data section aligned).
    */
  private def header(descr: String, shape: String): Array[Byte] = {
    val dict = s"{'descr': '$descr', 'fortran_order': False, 'shape': $shape, }"
    val unpadded = Magic.length + 2 + 2 + dict.length + 1
    val pad = (64 - unpadded % 64) % 64
    val body = dict + (" " * pad) + "\n"
    val out = ByteBuffer.allocate(Magic.length + 4 + body.length)
      .order(ByteOrder.LITTLE_ENDIAN)
    out.put(Magic).put(1.toByte).put(0.toByte)
    out.putShort(body.length.toShort)
    out.put(body.getBytes("US-ASCII"))
    out.array()
  }

  /** Write (id, float-array) rows as NPY shard pairs, one pair per
    * partition. The vector column must be a numeric array of a
    * consistent dimension per shard (checked); floats are cast to
    * float32 — the format embedding pipelines standardize on.
    */
  def write(df: DataFrame, idCol: String, vecCol: String,
            path: String): Unit = {
    import org.apache.spark.sql.functions._
    val spark = df.sparkSession
    val hPath = new org.apache.hadoop.fs.Path(path)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(hPath)) fs.delete(hPath, true)
    fs.mkdirs(hPath)
    val confBc = spark.sparkContext.broadcast(
      new HadoopConfCarrier(spark.sparkContext.hadoopConfiguration))
    df.select(col(idCol).cast("long"), col(vecCol).cast("array<float>"))
      .foreachPartition { (rows: Iterator[Row]) =>
        // buffer the partition: NPY needs n in the header before data
        val ids = scala.collection.mutable.ArrayBuffer.empty[Long]
        val vecs = scala.collection.mutable.ArrayBuffer.empty[Array[Float]]
        rows.foreach { r =>
          ids += r.getLong(0)
          vecs += r.getSeq[Float](1).toArray
        }
        if (ids.nonEmpty) {
          val d = vecs.head.length
          require(vecs.forall(_.length == d),
            s"ragged embedding dimensions in one shard (expected $d)")
          // The shard payload is buffered in one ByteBuffer, so a shard
          // is capped at 2 GB (Int-indexed arrays). Check with Long
          // arithmetic BEFORE allocating: silent Int wraparound in
          // `n * d * 4` would size a too-small buffer and corrupt the
          // shard. Oversized partitions must repartition first.
          checkByteSize(ids.length.toLong * 8L, s"ids shard (partition)")
          checkByteSize(vecs.length.toLong * d.toLong * 4L,
            s"vec shard (partition, ${vecs.length} x $d float32)")
          val pid = TaskContext.getPartitionId()
          val fsw = new org.apache.hadoop.fs.Path(path)
            .getFileSystem(confBc.value.toConf)
          val idPath = new org.apache.hadoop.fs.Path(path,
            f"part-$pid%05d-ids.npy")
          val io = fsw.create(idPath, true)
          try {
            io.write(header("<i8", s"(${ids.length},)"))
            val bb = ByteBuffer.allocate(ids.length * 8)
              .order(ByteOrder.LITTLE_ENDIAN)
            ids.foreach(bb.putLong)
            io.write(bb.array())
          } finally io.close()
          val vecPath = new org.apache.hadoop.fs.Path(path,
            f"part-$pid%05d-vec.npy")
          val vo = fsw.create(vecPath, true)
          try {
            vo.write(header("<f4", s"(${ids.length}, $d)"))
            val bb = ByteBuffer.allocate(vecs.length * d * 4)
              .order(ByteOrder.LITTLE_ENDIAN)
            vecs.foreach(v => v.foreach(bb.putFloat))
            vo.write(bb.array())
          } finally vo.close()
        }
      }
  }

  private[io] final case class NpyHeader(descr: String, rows: Int, cols: Int)

  /** Loud guard against the Int/2GB buffer limit: every payload here is
    * materialized in one Array[Byte], so `rows * width` computed in Int
    * would wrap past 2^31 (NegativeArraySizeException at best, a silent
    * short buffer at worst). All size arithmetic goes through Long and
    * this check.
    */
  private def checkByteSize(bytes: Long, what: String): Int = {
    require(bytes >= 0 && bytes <= Int.MaxValue.toLong,
      s"$what is $bytes bytes — exceeds the 2GB single-shard limit of " +
        "this NPY reader/writer; split into more shards (repartition) " +
        "or use smaller partitions")
    bytes.toInt
  }

  /** Parse an NPY v1.x header from an open stream positioned at byte 0,
    * returning the dtype and shape; throws on anything malformed.
    */
  private def readHeader(in: java.io.DataInputStream): NpyHeader = {
    val magic = new Array[Byte](6)
    in.readFully(magic)
    require(java.util.Arrays.equals(magic, Magic), "not an NPY file (bad magic)")
    val major = in.readUnsignedByte()
    in.readUnsignedByte() // minor
    require(major == 1, s"unsupported NPY version $major (this reader: 1.x)")
    val lenLo = in.readUnsignedByte()
    val lenHi = in.readUnsignedByte()
    val hLen = lenLo | (lenHi << 8)
    val h = new Array[Byte](hLen)
    in.readFully(h)
    val s = new String(h, "US-ASCII")
    val descr = "'descr':\\s*'([^']+)'".r.findFirstMatchIn(s)
      .map(_.group(1)).getOrElse(sys.error(s"NPY header missing descr: $s"))
    require(!s.contains("fortran_order: True") &&
      !s.contains("'fortran_order': True"),
      "fortran-ordered NPY not supported")
    val shape = "'shape':\\s*\\(([^)]*)\\)".r.findFirstMatchIn(s)
      .map(_.group(1)).getOrElse(sys.error(s"NPY header missing shape: $s"))
    val dims = shape.split(",").map(_.trim).filter(_.nonEmpty).map(_.toInt)
    require(dims.length == 1 || dims.length == 2,
      s"expected 1- or 2-d NPY, got shape ($shape)")
    NpyHeader(descr, dims(0), if (dims.length == 2) dims(1) else 1)
  }

  /** Read a directory of NPY shard pairs back as (id, embedding) rows —
    * one task per pair, headers validated, id/vector row counts
    * cross-checked.
    */
  def read(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val hPath = new org.apache.hadoop.fs.Path(path)
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = hPath.getFileSystem(conf)
    val pairs = fs.listStatus(hPath)
      .filter(f => f.isFile && f.getPath.getName.endsWith("-ids.npy"))
      .map(_.getPath.toString.stripSuffix("-ids.npy")).sorted
    require(pairs.nonEmpty, s"no NPY shard pairs under $path")
    val confBc = spark.sparkContext.broadcast(new HadoopConfCarrier(conf))
    spark.sparkContext.parallelize(pairs.toIndexedSeq, pairs.length)
      .flatMap { base =>
        val fsr = new org.apache.hadoop.fs.Path(base)
          .getFileSystem(confBc.value.toConf)
        def open(p: String) = new java.io.DataInputStream(
          new java.io.BufferedInputStream(
            fsr.open(new org.apache.hadoop.fs.Path(p))))
        val ii = open(s"$base-ids.npy")
        val vi = open(s"$base-vec.npy")
        try {
          val ih = readHeader(ii)
          val vh = readHeader(vi)
          require(ih.descr == "<i8", s"ids shard dtype ${ih.descr}, expected <i8")
          require(vh.descr == "<f4", s"vec shard dtype ${vh.descr}, expected <f4")
          require(ih.rows == vh.rows,
            s"shard pair disagrees: ${ih.rows} ids vs ${vh.rows} vectors")
          val idBytes = new Array[Byte](
            checkByteSize(ih.rows.toLong * 8L, s"$base-ids.npy payload"))
          ii.readFully(idBytes)
          val ib = ByteBuffer.wrap(idBytes).order(ByteOrder.LITTLE_ENDIAN)
          val vecBytes = new Array[Byte](checkByteSize(
            vh.rows.toLong * vh.cols.toLong * 4L, s"$base-vec.npy payload"))
          vi.readFully(vecBytes)
          val vb = ByteBuffer.wrap(vecBytes).order(ByteOrder.LITTLE_ENDIAN)
          (0 until ih.rows).map { _ =>
            val id = ib.getLong
            (id, Array.fill(vh.cols)(vb.getFloat))
          }
        } finally { ii.close(); vi.close() }
      }
      .toDF("vec_id", "embedding")
  }
}
