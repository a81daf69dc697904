package graft.io

import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Row, SparkSession}

import java.nio.{ByteBuffer, ByteOrder}

/** TFRecord shard I/O — the TensorFlow training-data interchange
  * format (public spec: tensorflow/core/lib/io/record_writer and the
  * tf.train.Example proto). Each record is framed as
  *
  *   u64-LE length · u32-LE masked-crc32c(length bytes) ·
  *   payload · u32-LE masked-crc32c(payload)
  *
  * with CRC32C (Castagnoli, reflected 0x82F63B78) and TensorFlow's
  * mask `rot15(crc) + 0xa282ead8`. The payload is a `tf.train.Example`
  * protobuf: Features (field 1) → map entries of name → Feature, where
  * a Feature carries one of bytes_list (1) / float_list (2) /
  * int64_list (3), numeric lists packed. Ids+embeddings travel as
  * `vec_id` (int64_list) and `embedding` (float_list) per record.
  *
  * The read side is a real parser: BOTH checksums are verified per
  * record (a flipped bit anywhere fails loudly), the proto walk
  * decodes varints/tags itself and SKIPS unknown fields by wire type
  * (the protobuf forward-compatibility rule), and packed and unpacked
  * numeric encodings are both accepted (proto3 parsers must).
  *
  * Scale shape: identical to [[SafeTensors]] — narrow per-partition
  * shard writes, reads parallel one task per shard.
  */
object TfRecord {

  // ------------------------------------------------------------------
  // CRC32C + TensorFlow masking
  // ------------------------------------------------------------------

  private val CrcTable: Array[Int] = {
    val t = new Array[Int](256)
    var n = 0
    while (n < 256) {
      var c = n
      var k = 0
      while (k < 8) {
        c = if ((c & 1) != 0) 0x82F63B78 ^ (c >>> 1) else c >>> 1
        k += 1
      }
      t(n) = c
      n += 1
    }
    t
  }

  private[graft] def crc32c(b: Array[Byte], off: Int, len: Int): Int = {
    var c = 0xFFFFFFFF
    var i = off
    val end = off + len
    while (i < end) {
      c = CrcTable((c ^ b(i)) & 0xFF) ^ (c >>> 8)
      i += 1
    }
    c ^ 0xFFFFFFFF
  }

  /** TensorFlow's CRC mask: rotate right 15, add the mask delta. */
  private[graft] def maskCrc(crc: Int): Int =
    ((crc >>> 15) | (crc << 17)) + 0xA282EAD8

  // ------------------------------------------------------------------
  // Protobuf wire helpers
  // ------------------------------------------------------------------

  private def writeVarint(out: java.io.ByteArrayOutputStream, v0: Long): Unit = {
    var v = v0
    while ((v & ~0x7FL) != 0L) {
      out.write(((v & 0x7F) | 0x80).toInt)
      v >>>= 7
    }
    out.write((v & 0x7F).toInt)
  }

  private def lenDelimited(out: java.io.ByteArrayOutputStream,
    fieldTag: Int, payload: Array[Byte]): Unit = {
    writeVarint(out, ((fieldTag << 3) | 2).toLong)
    writeVarint(out, payload.length.toLong)
    out.write(payload, 0, payload.length)
  }

  /** Encode one tf.train.Example carrying vec_id (int64_list) and
    * embedding (float_list, packed). Map entries in lexicographic key
    * order ("embedding" < "vec_id") so shards are byte-deterministic.
    */
  private[graft] def encodeExample(id: Long, vec: Array[Float]): Array[Byte] = {
    def bytes(f: java.io.ByteArrayOutputStream => Unit): Array[Byte] = {
      val b = new java.io.ByteArrayOutputStream()
      f(b)
      b.toByteArray
    }
    // FloatList { repeated float value = 1 [packed] }
    val floatList = bytes { b =>
      val payload = ByteBuffer.allocate(vec.length * 4)
        .order(ByteOrder.LITTLE_ENDIAN)
      vec.foreach(payload.putFloat)
      lenDelimited(b, 1, payload.array())
    }
    // Int64List { repeated int64 value = 1 [packed] }
    val int64List = bytes { b =>
      lenDelimited(b, 1, bytes(writeVarint(_, id)))
    }
    def feature(kindField: Int, list: Array[Byte]): Array[Byte] =
      bytes(lenDelimited(_, kindField, list))
    def mapEntry(key: String, feat: Array[Byte]): Array[Byte] =
      bytes { b =>
        lenDelimited(b, 1, key.getBytes("UTF-8"))
        lenDelimited(b, 2, feat)
      }
    val features = bytes { b =>
      lenDelimited(b, 1, mapEntry("embedding", feature(2, floatList)))
      lenDelimited(b, 1, mapEntry("vec_id", feature(3, int64List)))
    }
    bytes(lenDelimited(_, 1, features))
  }

  private final class ProtoReader(b: Array[Byte], var pos: Int,
    val end: Int) {
    def hasMore: Boolean = pos < end
    def varint(): Long = {
      var shift = 0
      var v = 0L
      var more = true
      while (more) {
        require(pos < end, "truncated varint in tf.train.Example")
        require(shift < 64, "over-long varint in tf.train.Example")
        val x = b(pos)
        pos += 1
        v |= (x & 0x7FL) << shift
        shift += 7
        more = (x & 0x80) != 0
      }
      v
    }
    def lenPayload(): (Int, Int) = { // (start, end) of a wiretype-2 field
      val len = varint()
      require(len >= 0 && pos + len <= end,
        s"length-delimited field of $len bytes overruns the message")
      val s = pos
      pos += len.toInt
      (s, s + len.toInt)
    }
    def skip(wireType: Int): Unit = wireType match {
      case 0 => varint()
      case 1 =>
        require(pos + 8 <= end, "truncated fixed64"); pos += 8
      case 2 => lenPayload()
      case 5 =>
        require(pos + 4 <= end, "truncated fixed32"); pos += 4
      case other => throw new IllegalArgumentException(
        s"unsupported protobuf wire type $other")
    }
  }

  /** Decode one tf.train.Example: returns (vec_id, embedding). Unknown
    * feature names and unknown fields are skipped; missing vec_id or
    * embedding fails loudly.
    */
  private[graft] def decodeExample(rec: Array[Byte]): (Long, Array[Float]) = {
    var id: Option[Long] = None
    var vec: Option[Array[Float]] = None

    def parseFloatList(s: Int, e: Int): Array[Float] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[Float]
      val r = new ProtoReader(rec, s, e)
      while (r.hasMore) {
        val tag = r.varint()
        (tag >> 3, (tag & 7).toInt) match {
          case (1, 2) => // packed
            val (ps, pe) = r.lenPayload()
            require((pe - ps) % 4 == 0, "packed float payload not 4-aligned")
            val bb = ByteBuffer.wrap(rec, ps, pe - ps)
              .order(ByteOrder.LITTLE_ENDIAN)
            while (bb.hasRemaining) out += bb.getFloat
          case (1, 5) => // unpacked single float
            require(r.pos + 4 <= r.end, "truncated float")
            out += ByteBuffer.wrap(rec, r.pos, 4)
              .order(ByteOrder.LITTLE_ENDIAN).getFloat
            r.pos += 4
          case (_, wt) => r.skip(wt)
        }
      }
      out.toArray
    }

    def parseInt64List(s: Int, e: Int): Seq[Long] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[Long]
      val r = new ProtoReader(rec, s, e)
      while (r.hasMore) {
        val tag = r.varint()
        (tag >> 3, (tag & 7).toInt) match {
          case (1, 2) => // packed
            val (ps, pe) = r.lenPayload()
            val pr = new ProtoReader(rec, ps, pe)
            while (pr.hasMore) out += pr.varint()
          case (1, 0) => out += r.varint() // unpacked
          case (_, wt) => r.skip(wt)
        }
      }
      out.toSeq
    }

    def parseFeature(name: String, s: Int, e: Int): Unit = {
      val r = new ProtoReader(rec, s, e)
      while (r.hasMore) {
        val tag = r.varint()
        (tag >> 3, (tag & 7).toInt) match {
          case (2, 2) if name == "embedding" =>
            val (ps, pe) = r.lenPayload()
            vec = Some(parseFloatList(ps, pe))
          case (3, 2) if name == "vec_id" =>
            val (ps, pe) = r.lenPayload()
            val vals = parseInt64List(ps, pe)
            require(vals.length == 1,
              s"vec_id int64_list has ${vals.length} values, expected 1")
            id = Some(vals.head)
          case (_, wt) => r.skip(wt)
        }
      }
    }

    def parseMapEntry(s: Int, e: Int): Unit = {
      val r = new ProtoReader(rec, s, e)
      var key: Option[String] = None
      var fs = -1
      var fe = -1
      while (r.hasMore) {
        val tag = r.varint()
        (tag >> 3, (tag & 7).toInt) match {
          case (1, 2) =>
            val (ps, pe) = r.lenPayload()
            key = Some(new String(rec, ps, pe - ps, "UTF-8"))
          case (2, 2) =>
            val (ps, pe) = r.lenPayload()
            fs = ps; fe = pe
          case (_, wt) => r.skip(wt)
        }
      }
      key.foreach { k => if (fs >= 0) parseFeature(k, fs, fe) }
    }

    val top = new ProtoReader(rec, 0, rec.length)
    while (top.hasMore) {
      val tag = top.varint()
      (tag >> 3, (tag & 7).toInt) match {
        case (1, 2) => // features
          val (fs, fe) = top.lenPayload()
          val fr = new ProtoReader(rec, fs, fe)
          while (fr.hasMore) {
            val ftag = fr.varint()
            (ftag >> 3, (ftag & 7).toInt) match {
              case (1, 2) =>
                val (ms, me) = fr.lenPayload()
                parseMapEntry(ms, me)
              case (_, wt) => fr.skip(wt)
            }
          }
        case (_, wt) => top.skip(wt)
      }
    }
    (id.getOrElse(throw new IllegalArgumentException(
      "tf.train.Example has no vec_id feature")),
      vec.getOrElse(throw new IllegalArgumentException(
        "tf.train.Example has no embedding feature")))
  }

  // ------------------------------------------------------------------
  // Record framing
  // ------------------------------------------------------------------

  private[graft] def frameRecord(payload: Array[Byte]): Array[Byte] = {
    val out = ByteBuffer.allocate(8 + 4 + payload.length + 4)
      .order(ByteOrder.LITTLE_ENDIAN)
    val lenBytes = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
      .putLong(payload.length.toLong).array()
    out.put(lenBytes)
    out.putInt(maskCrc(crc32c(lenBytes, 0, 8)))
    out.put(payload)
    out.putInt(maskCrc(crc32c(payload, 0, payload.length)))
    out.array()
  }

  // ------------------------------------------------------------------
  // Spark I/O
  // ------------------------------------------------------------------

  /** Write (id, float-array) rows as one .tfrecord shard per
    * partition, one tf.train.Example per row.
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
        if (rows.hasNext) {
          val pid = TaskContext.getPartitionId()
          val fsw = new org.apache.hadoop.fs.Path(path)
            .getFileSystem(confBc.value.toConf)
          val shard = new org.apache.hadoop.fs.Path(path,
            f"part-$pid%05d.tfrecord")
          val out = fsw.create(shard, true)
          try {
            rows.foreach { r =>
              val rec = encodeExample(r.getLong(0),
                r.getSeq[Float](1).toArray)
              out.write(frameRecord(rec))
            }
          } finally out.close()
        }
      }
  }

  /** Read a directory of .tfrecord shards back as (vec_id, embedding)
    * rows — one task per shard, both checksums verified per record.
    */
  def read(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val hPath = new org.apache.hadoop.fs.Path(path)
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = hPath.getFileSystem(conf)
    val shards = fs.listStatus(hPath)
      .filter(f => f.isFile && f.getPath.getName.endsWith(".tfrecord"))
      .map(_.getPath.toString).sorted
    require(shards.nonEmpty, s"no .tfrecord shards under $path")
    val confBc = spark.sparkContext.broadcast(new HadoopConfCarrier(conf))
    spark.sparkContext
      .parallelize(shards.toIndexedSeq, shards.length)
      .flatMap { shard =>
        val fsr = new org.apache.hadoop.fs.Path(shard)
          .getFileSystem(confBc.value.toConf)
        val in = new java.io.DataInputStream(
          new java.io.BufferedInputStream(
            fsr.open(new org.apache.hadoop.fs.Path(shard))))
        try {
          val out =
            scala.collection.mutable.ArrayBuffer.empty[(Long, Array[Float])]
          val lenBytes = new Array[Byte](8)
          var eof = false
          while (!eof) {
            val first = in.read()
            if (first < 0) eof = true
            else {
              lenBytes(0) = first.toByte
              in.readFully(lenBytes, 1, 7)
              val lenCrc = java.lang.Integer.reverseBytes(in.readInt())
              require(lenCrc == maskCrc(crc32c(lenBytes, 0, 8)),
                s"$shard: length checksum mismatch")
              val len = ByteBuffer.wrap(lenBytes)
                .order(ByteOrder.LITTLE_ENDIAN).getLong
              require(len >= 0 && len <= Int.MaxValue.toLong,
                s"$shard: record of $len bytes exceeds the 2GB limit")
              val payload = new Array[Byte](len.toInt)
              in.readFully(payload)
              val dataCrc = java.lang.Integer.reverseBytes(in.readInt())
              require(dataCrc == maskCrc(crc32c(payload, 0, payload.length)),
                s"$shard: payload checksum mismatch")
              out += decodeExample(payload)
            }
          }
          out
        } finally in.close()
      }
      .toDF("vec_id", "embedding")
  }
}
