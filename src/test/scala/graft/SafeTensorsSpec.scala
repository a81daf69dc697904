package graft

import org.scalatest.funsuite.AnyFunSuite

/** SafeTensors shard I/O under byte-level test: the file layout is
  * pinned against the published safetensors format (u64 LE header
  * length, JSON header with dtype/shape/data_offsets, contiguous
  * little-endian tensor buffer) — not just self-roundtripped — and the
  * reader enforces the reference implementation's invariants
  * (offset bounds, shape-vs-span agreement, contiguity).
  */
class SafeTensorsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("write → read round-trips ids and float32 vectors exactly") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_st").toString
    val rng = new scala.util.Random(11)
    val rows = (1L to 100L).map(i => (i, Array.fill(6)(rng.nextFloat())))
    graft.io.SafeTensors.write(
      rows.toDF("vec_id", "embedding").repartition(3),
      "vec_id", "embedding", s"$dir/t")
    val back = graft.io.SafeTensors.read(spark, s"$dir/t")
      .as[(Long, Array[Float])].collect().toMap
    assert(back.size == 100)
    rows.foreach { case (id, v) =>
      assert(java.util.Arrays.equals(back(id), v), s"vec $id")
    }
  }

  test("the written shard is byte-exact safetensors") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_st2").toString
    graft.io.SafeTensors.write(
      Seq((5L, Array(1.0f, 2.0f))).toDF("vec_id", "embedding")
        .repartition(1),
      "vec_id", "embedding", s"$dir/t")
    val f = new java.io.File(s"$dir/t").listFiles()
      .filter(_.getName.endsWith(".safetensors")).head
    val bytes = java.nio.file.Files.readAllBytes(f.toPath)
    val hLen = java.nio.ByteBuffer.wrap(bytes, 0, 8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).getLong.toInt
    val json = new String(bytes, 8, hLen, "UTF-8")
    assert(json.startsWith("{") && json.endsWith("}"))
    assert(json.contains(""""ids":{"dtype":"I64","shape":[1],"data_offsets":[0,8]}"""))
    assert(json.contains(""""embedding":{"dtype":"F32","shape":[1,2],"data_offsets":[8,16]}"""))
    assert(json.contains(""""__metadata__""""))
    // buffer: one LE i64 then two LE f32s, exactly 16 bytes
    assert(bytes.length == 8 + hLen + 16)
    val bb = java.nio.ByteBuffer.wrap(bytes, 8 + hLen, 16)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    assert(bb.getLong == 5L)
    assert(bb.getFloat == 1.0f && bb.getFloat == 2.0f)
  }

  test("header validation: offsets, spans, contiguity, dtypes") {
    import graft.io.SafeTensors
    // valid two-tensor header
    val ok = SafeTensors.parseHeader(
      """{"ids":{"dtype":"I64","shape":[2],"data_offsets":[0,16]},
         "embedding":{"dtype":"F32","shape":[2,3],"data_offsets":[16,40]}}""",
      40L)
    assert(ok("ids").shape == Seq(2L) && ok("embedding").shape == Seq(2L, 3L))
    // span disagrees with shape*width
    intercept[IllegalArgumentException](SafeTensors.parseHeader(
      """{"ids":{"dtype":"I64","shape":[2],"data_offsets":[0,8]}}""", 8L))
    // gap between tensors (non-contiguous)
    intercept[IllegalArgumentException](SafeTensors.parseHeader(
      """{"a":{"dtype":"U8","shape":[2],"data_offsets":[0,2]},
         "b":{"dtype":"U8","shape":[2],"data_offsets":[4,6]}}""", 6L))
    // offsets past the buffer
    intercept[IllegalArgumentException](SafeTensors.parseHeader(
      """{"a":{"dtype":"U8","shape":[4],"data_offsets":[0,4]}}""", 2L))
    // unknown dtype
    intercept[IllegalArgumentException](SafeTensors.parseHeader(
      """{"a":{"dtype":"F128","shape":[1],"data_offsets":[0,16]}}""", 16L))
    // buffer tail past the last tensor
    intercept[IllegalArgumentException](SafeTensors.parseHeader(
      """{"a":{"dtype":"U8","shape":[2],"data_offsets":[0,2]}}""", 5L))
  }

  test("malformed shards and ragged dimensions fail loudly") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_st3").toString
    val e = intercept[org.apache.spark.SparkException](
      graft.io.SafeTensors.write(
        Seq((1L, Array(1.0f)), (2L, Array(1.0f, 2.0f)))
          .toDF("vec_id", "embedding").repartition(1),
        "vec_id", "embedding", s"$dir/rag"))
    assert(e.getMessage != null)
    // corrupt header length → loud read failure
    graft.io.SafeTensors.write(
      Seq((1L, Array(1.0f))).toDF("vec_id", "embedding"),
      "vec_id", "embedding", s"$dir/ok")
    val shard = new java.io.File(s"$dir/ok").listFiles()
      .filter(_.getName.endsWith(".safetensors")).head
    val b = java.nio.file.Files.readAllBytes(shard.toPath)
    b(0) = 0xff.toByte; b(7) = 0x7f.toByte
    java.nio.file.Files.write(shard.toPath, b)
    val e2 = intercept[org.apache.spark.SparkException](
      graft.io.SafeTensors.read(spark, s"$dir/ok").collect())
    assert(e2.getMessage != null)
  }
}
