package graft

import graft.io.TfRecord
import org.scalatest.funsuite.AnyFunSuite

/** TFRecord framing + tf.train.Example wire format: CRC32C pinned to
  * the published check value, a byte-pinned Example against an
  * independent hand derivation, unknown-field skipping, unpacked
  * encodings, corruption refusals, Spark shard round trip.
  */
class TfRecordSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("crc32c matches the published Castagnoli check value") {
    val v = "123456789".getBytes("ASCII")
    assert(TfRecord.crc32c(v, 0, v.length) == 0xE3069283)
    assert(TfRecord.crc32c(Array.emptyByteArray, 0, 0) == 0)
  }

  test("maskCrc is TensorFlow's rot15 + delta") {
    // independent recomputation of the mask formula
    val crc = 0xE3069283
    val rot = (crc >>> 15) | (crc << 17)
    assert(TfRecord.maskCrc(crc) == rot + 0xA282EAD8)
  }

  test("encodeExample is byte-identical to the hand-derived wire form") {
    // Example{features{ embedding: FloatList[1.0], vec_id: Int64List[1] }}
    val expected: Array[Byte] = Array(
      0x0A, 0x28, // Example.features, 40 bytes
      0x0A, 0x15, // map entry "embedding", 21 bytes
      0x0A, 0x09, 'e', 'm', 'b', 'e', 'd', 'd', 'i', 'n', 'g',
      0x12, 0x08, // Feature, 8 bytes
      0x12, 0x06, // float_list, 6 bytes
      0x0A, 0x04, 0x00, 0x00, 0x80, 0x3F, // packed [1.0f]
      0x0A, 0x0F, // map entry "vec_id", 15 bytes
      0x0A, 0x06, 'v', 'e', 'c', '_', 'i', 'd',
      0x12, 0x05, // Feature, 5 bytes
      0x1A, 0x03, // int64_list, 3 bytes
      0x0A, 0x01, 0x01 // packed [1]
    ).map(_.toByte)
    assert(TfRecord.encodeExample(1L, Array(1.0f)).sameElements(expected))
  }

  test("encode → decode round-trips ids and vectors exactly") {
    val vec = Array(0.5f, -2.25f, 3.75e-2f, 0f)
    val (id, v) = TfRecord.decodeExample(TfRecord.encodeExample(9876543210L, vec))
    assert(id == 9876543210L)
    assert(v.sameElements(vec))
  }

  test("decoder skips unknown features and fields, accepts unpacked forms") {
    def b(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray
    def lenDel(tag: Int, payload: Array[Byte]): Array[Byte] =
      b((tag << 3) | 2, payload.length) ++ payload
    // Feature{bytes_list{value:"zz"}} under an unknown name
    val extraEntry = lenDel(1,
      lenDel(1, "extra".getBytes) ++
        lenDel(2, lenDel(1, lenDel(1, "zz".getBytes))))
    // vec_id as an UNPACKED int64_list (tag wiretype 0)
    val vidEntry = lenDel(1,
      lenDel(1, "vec_id".getBytes) ++
        lenDel(2, lenDel(3, b(0x08, 0x2A)))) // field1 varint 42
    // embedding as an UNPACKED float (tag wiretype 5)
    val embEntry = lenDel(1,
      lenDel(1, "embedding".getBytes) ++
        lenDel(2, lenDel(2, b(0x0D, 0x00, 0x00, 0x80, 0x3F))))
    val example = lenDel(1, extraEntry ++ vidEntry ++ embEntry)
    val (id, v) = TfRecord.decodeExample(example)
    assert(id == 42L)
    assert(v.sameElements(Array(1.0f)))
  }

  test("missing features fail loudly") {
    val e1 = intercept[IllegalArgumentException] {
      TfRecord.decodeExample(Array[Byte](0x0A, 0x00)) // empty features
    }
    assert(e1.getMessage.contains("vec_id"))
  }

  test("framing: a flipped bit anywhere fails a checksum") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_tfrec").toString
    val df = Seq((1L, Array(1.0f, 2.0f)), (2L, Array(3.0f, 4.0f)))
      .toDF("vec_id", "embedding").repartition(1)
    TfRecord.write(df, "vec_id", "embedding", dir)
    val shard = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".tfrecord")).head
    val bytes = java.nio.file.Files.readAllBytes(shard.toPath)
    // corrupt one payload byte of the first record
    bytes(14) = (bytes(14) ^ 0x01).toByte
    java.nio.file.Files.write(shard.toPath, bytes)
    // drop Hadoop's local-FS .crc sidecar so OUR record checksum is
    // the one that trips, not the transport's
    new java.io.File(shard.getParentFile, "." + shard.getName + ".crc")
      .delete()
    val e = intercept[Exception] {
      TfRecord.read(spark, dir).collect()
    }
    def messages(t: Throwable): String =
      if (t == null) "" else t.getMessage + "|" + messages(t.getCause)
    assert(messages(e).contains("checksum mismatch"))
  }

  test("truncated shard fails loudly") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_tftrunc").toString
    val df = Seq((5L, Array(1.0f))).toDF("vec_id", "embedding")
      .repartition(1)
    TfRecord.write(df, "vec_id", "embedding", dir)
    val shard = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".tfrecord")).head
    val bytes = java.nio.file.Files.readAllBytes(shard.toPath)
    java.nio.file.Files.write(shard.toPath,
      java.util.Arrays.copyOf(bytes, bytes.length - 2))
    val e = intercept[Exception] { TfRecord.read(spark, dir).collect() }
    assert(e != null)
  }

  test("Spark shard round trip across partitions is value-exact") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_tfrt").toString
    val rows = (0 until 40)
      .map(i => (i.toLong, Array.tabulate(8)(j => i * 0.25f + j)))
    val df = rows.toDF("vec_id", "embedding").repartition(4)
    TfRecord.write(df, "vec_id", "embedding", dir)
    val back = TfRecord.read(spark, dir)
      .as[(Long, Array[Float])].collect().sortBy(_._1)
    assert(back.length == 40)
    rows.zip(back).foreach { case ((id, v), (bid, bv)) =>
      assert(id == bid)
      assert(v.sameElements(bv))
    }
  }
}
