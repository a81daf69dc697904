package graft.io

import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Row, SparkSession}

import java.nio.{ByteBuffer, ByteOrder}

/** SafeTensors shard I/O — the training-stack interchange format
  * (huggingface/safetensors file layout, public spec): an 8-byte
  * little-endian u64 header length, a UTF-8 JSON header mapping tensor
  * names to `{"dtype", "shape", "data_offsets"}` (offsets relative to
  * the byte buffer that follows, which the spec requires to be
  * contiguous and non-overlapping), then the raw little-endian tensor
  * bytes. Each Spark partition writes one `part-NNNNN.safetensors`
  * shard carrying the ids+embeddings sidecar pair as two tensors —
  * `ids` (I64, shape [n]) and `embedding` (F32, shape [n, d]) — plus a
  * `__metadata__` block recording the producing partition.
  *
  * The read side is a real parser, not a mirror of the writer: it
  * validates the header length bound, parses the JSON with json4s,
  * checks dtype/shape/offset consistency (contiguity, buffer-size
  * agreement — the checks the reference Rust implementation performs),
  * and streams rows back one task per shard. NpySpec's sibling,
  * SafeTensorsSpec, byte-pins a tiny shard and cross-checks the header
  * grammar; the q385 oracle pins values end-to-end.
  *
  * Scale shape: identical to [[Npy]] — narrow per-partition writes (no
  * shuffle), reads parallel over shards; a 1000-executor job writes
  * 1000 shards concurrently.
  */
object SafeTensors {

  /** 2 GB single-shard cap (payloads pass through Int-indexed arrays);
    * Long arithmetic first so wraparound can't size a short buffer.
    */
  private def checkByteSize(bytes: Long, what: String): Int = {
    require(bytes >= 0 && bytes <= Int.MaxValue.toLong,
      s"$what is $bytes bytes — exceeds the 2GB single-shard limit; " +
        "repartition into more shards")
    bytes.toInt
  }

  private def headerJson(n: Int, d: Int, idsBytes: Long, vecBytes: Long,
                         partition: Int): String = {
    // data layout: ids first, then embedding (offsets contiguous)
    s"""{"__metadata__":{"producer":"graft","partition":"$partition"},""" +
      s""""ids":{"dtype":"I64","shape":[$n],"data_offsets":[0,$idsBytes]},""" +
      s""""embedding":{"dtype":"F32","shape":[$n,$d],""" +
      s""""data_offsets":[$idsBytes,${idsBytes + vecBytes}]}}"""
  }

  /** Write (id, float-array) rows as one safetensors shard per
    * partition. Vectors must share one dimension per shard (checked);
    * floats are stored as little-endian F32 per the spec.
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
        // buffer the partition: the header needs n and the offsets first
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
          val idsBytes = checkByteSize(ids.length.toLong * 8L, "ids tensor")
          val vecBytes = checkByteSize(
            vecs.length.toLong * d.toLong * 4L, "embedding tensor")
          val pid = TaskContext.getPartitionId()
          val header =
            headerJson(ids.length, d, idsBytes.toLong, vecBytes.toLong, pid)
              .getBytes("UTF-8")
          val fsw = new org.apache.hadoop.fs.Path(path)
            .getFileSystem(confBc.value.toConf)
          val shard = new org.apache.hadoop.fs.Path(path,
            f"part-$pid%05d.safetensors")
          val out = fsw.create(shard, true)
          try {
            val lenBuf = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
            lenBuf.putLong(header.length.toLong)
            out.write(lenBuf.array())
            out.write(header)
            val ib = ByteBuffer.allocate(idsBytes)
              .order(ByteOrder.LITTLE_ENDIAN)
            ids.foreach(ib.putLong)
            out.write(ib.array())
            val vb = ByteBuffer.allocate(vecBytes)
              .order(ByteOrder.LITTLE_ENDIAN)
            vecs.foreach(v => v.foreach(vb.putFloat))
            out.write(vb.array())
          } finally out.close()
        }
      }
  }

  private[graft] final case class TensorMeta(dtype: String, shape: Seq[Long],
                                          begin: Long, end: Long)

  /** Parse and validate a safetensors header (the JSON after the u64
    * length): every tensor needs dtype/shape/data_offsets, offsets must
    * be within the buffer, and elementCount * dtypeWidth must equal the
    * offset span — the reference implementation's invariants.
    */
  private[graft] def parseHeader(json: String,
                              bufferLen: Long): Map[String, TensorMeta] = {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    val parsed = JsonMethods.parse(json) match {
      case JObject(fields) => fields
      case other => throw new IllegalArgumentException(
        s"safetensors header is not a JSON object: $other")
    }
    val widths = Map("F64" -> 8L, "F32" -> 4L, "F16" -> 2L, "BF16" -> 2L,
      "I64" -> 8L, "I32" -> 4L, "I16" -> 2L, "I8" -> 1L, "U8" -> 1L,
      "BOOL" -> 1L)
    val tensors = parsed.collect {
      case (name, JObject(body)) if name != "__metadata__" =>
        val m = body.toMap
        val dtype = m.get("dtype") match {
          case Some(JString(s)) => s
          case other => throw new IllegalArgumentException(
            s"tensor $name: bad dtype $other")
        }
        val width = widths.getOrElse(dtype, throw new IllegalArgumentException(
          s"tensor $name: unsupported dtype $dtype"))
        val shape = m.get("shape") match {
          case Some(JArray(dims)) => dims.map {
            case JInt(v) => v.toLong
            case other => throw new IllegalArgumentException(
              s"tensor $name: bad shape element $other")
          }
          case other => throw new IllegalArgumentException(
            s"tensor $name: bad shape $other")
        }
        require(shape.forall(_ >= 0), s"tensor $name: negative dimension")
        val (begin, end) = m.get("data_offsets") match {
          case Some(JArray(List(JInt(b), JInt(e)))) => (b.toLong, e.toLong)
          case other => throw new IllegalArgumentException(
            s"tensor $name: bad data_offsets $other")
        }
        require(0 <= begin && begin <= end && end <= bufferLen,
          s"tensor $name: offsets [$begin,$end) outside buffer of $bufferLen")
        val elems = shape.foldLeft(1L)(_ * _)
        require(elems * width == end - begin,
          s"tensor $name: $elems x${width}B != span ${end - begin}")
        name -> TensorMeta(dtype, shape, begin, end)
    }.toMap
    // spec: tensors must tile the buffer contiguously without overlap
    val sorted = tensors.values.toSeq.sortBy(_.begin)
    sorted.sliding(2).foreach {
      case Seq(a, b) => require(a.end == b.begin,
        s"non-contiguous tensors: [${a.begin},${a.end}) then [${b.begin},${b.end})")
      case _ =>
    }
    if (sorted.nonEmpty) {
      require(sorted.head.begin == 0L, "buffer does not start at offset 0")
      require(sorted.last.end == bufferLen,
        s"buffer tail past last tensor (${sorted.last.end} != $bufferLen)")
    } else require(bufferLen == 0L, "tensorless shard with a nonempty buffer")
    tensors
  }

  /** Read a directory of safetensors shards (as written by [[write]])
    * back as (vec_id, embedding) rows — one task per shard, headers
    * fully validated.
    */
  def read(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val hPath = new org.apache.hadoop.fs.Path(path)
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = hPath.getFileSystem(conf)
    val shards = fs.listStatus(hPath)
      .filter(f => f.isFile && f.getPath.getName.endsWith(".safetensors"))
      .map(f => (f.getPath.toString, f.getLen)).sortBy(_._1)
    require(shards.nonEmpty, s"no .safetensors shards under $path")
    val confBc = spark.sparkContext.broadcast(new HadoopConfCarrier(conf))
    spark.sparkContext
      .parallelize(shards.toIndexedSeq, shards.length)
      .flatMap { case (shard, fileLen) =>
        val fsr = new org.apache.hadoop.fs.Path(shard)
          .getFileSystem(confBc.value.toConf)
        val in = new java.io.DataInputStream(
          new java.io.BufferedInputStream(
            fsr.open(new org.apache.hadoop.fs.Path(shard))))
        try {
          val lenBytes = new Array[Byte](8)
          in.readFully(lenBytes)
          val hLen = ByteBuffer.wrap(lenBytes)
            .order(ByteOrder.LITTLE_ENDIAN).getLong
          require(hLen > 0 && hLen <= fileLen - 8,
            s"$shard: header length $hLen outside file of $fileLen bytes")
          val hBytes = new Array[Byte](checkByteSize(hLen, "header"))
          in.readFully(hBytes)
          val bufferLen = fileLen - 8 - hLen
          val tensors =
            parseHeader(new String(hBytes, "UTF-8"), bufferLen)
          val idsMeta = tensors.getOrElse("ids",
            throw new IllegalArgumentException(s"$shard: no 'ids' tensor"))
          val vecMeta = tensors.getOrElse("embedding",
            throw new IllegalArgumentException(
              s"$shard: no 'embedding' tensor"))
          require(idsMeta.dtype == "I64",
            s"$shard: ids dtype ${idsMeta.dtype}, expected I64")
          require(vecMeta.dtype == "F32",
            s"$shard: embedding dtype ${vecMeta.dtype}, expected F32")
          require(idsMeta.shape.length == 1 && vecMeta.shape.length == 2,
            s"$shard: expected shapes [n] and [n,d]")
          val n = idsMeta.shape.head
          require(vecMeta.shape.head == n,
            s"$shard: $n ids vs ${vecMeta.shape.head} vectors")
          val d = vecMeta.shape(1).toInt
          val buf = new Array[Byte](checkByteSize(bufferLen, "buffer"))
          in.readFully(buf)
          val ib = ByteBuffer.wrap(buf, idsMeta.begin.toInt,
            (idsMeta.end - idsMeta.begin).toInt)
            .order(ByteOrder.LITTLE_ENDIAN)
          val vb = ByteBuffer.wrap(buf, vecMeta.begin.toInt,
            (vecMeta.end - vecMeta.begin).toInt)
            .order(ByteOrder.LITTLE_ENDIAN)
          (0L until n).map { _ =>
            val id = ib.getLong
            (id, Array.fill(d)(vb.getFloat))
          }
        } finally in.close()
      }
      .toDF("vec_id", "embedding")
  }
}
