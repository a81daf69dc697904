package graft

import org.scalatest.funsuite.AnyFunSuite

/** NPY shard I/O under byte-level test: the header layout is pinned
  * against the published NumPy v1.0 format (magic, LE header length,
  * 64-byte alignment) — not just self-roundtripped — and malformed
  * inputs fail loudly. A one-off `np.load` cross-validation of
  * engine-written shards is recorded in the Scaladoc of io/Npy.scala.
  */
class NpySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("write → read round-trips ids and float32 vectors exactly") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_npy").toString
    val rng = new scala.util.Random(7)
    val rows = (1L to 100L).map(i => (i, Array.fill(8)(rng.nextFloat())))
    graft.io.Npy.write(rows.toDF("vec_id", "embedding").repartition(3),
      "vec_id", "embedding", s"$dir/t")
    val back = graft.io.Npy.read(spark, s"$dir/t")
      .as[(Long, Array[Float])].collect().toMap
    assert(back.size == 100)
    rows.foreach { case (id, v) =>
      assert(java.util.Arrays.equals(back(id), v), s"vec $id")
    }
  }

  test("the written header is byte-exact NumPy v1.0") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_npy2").toString
    graft.io.Npy.write(
      Seq((5L, Array(1.0f, 2.0f))).toDF("vec_id", "embedding")
        .repartition(1),
      "vec_id", "embedding", s"$dir/t")
    val f = new java.io.File(s"$dir/t").listFiles()
      .filter(_.getName.endsWith("-vec.npy")).head
    val bytes = java.nio.file.Files.readAllBytes(f.toPath)
    // magic + version 1.0
    assert(bytes.slice(0, 6).sameElements(
      Array(0x93.toByte) ++ "NUMPY".getBytes("US-ASCII")))
    assert(bytes(6) == 1 && bytes(7) == 0)
    val hLen = (bytes(8) & 0xff) | ((bytes(9) & 0xff) << 8)
    // total header (magic+version+len+dict) is 64-byte aligned and
    // '\n'-terminated
    assert((10 + hLen) % 64 == 0, s"header total ${10 + hLen}")
    val dict = new String(bytes, 10, hLen, "US-ASCII")
    assert(dict.endsWith("\n"))
    assert(dict.contains("'descr': '<f4'"))
    assert(dict.contains("'fortran_order': False"))
    assert(dict.contains("'shape': (1, 2)"))
    // payload: two LE float32s right after the header
    val bb = java.nio.ByteBuffer.wrap(bytes, 10 + hLen, 8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    assert(bb.getFloat == 1.0f && bb.getFloat == 2.0f)
  }

  test("malformed shards and ragged dimensions fail loudly") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_npy3").toString
    // ragged vectors in one shard
    val e = intercept[org.apache.spark.SparkException](
      graft.io.Npy.write(
        Seq((1L, Array(1.0f)), (2L, Array(1.0f, 2.0f)))
          .toDF("vec_id", "embedding").repartition(1),
        "vec_id", "embedding", s"$dir/rag"))
    assert(e.getMessage != null)
    // corrupt magic
    graft.io.Npy.write(Seq((1L, Array(1.0f))).toDF("vec_id", "embedding"),
      "vec_id", "embedding", s"$dir/ok")
    val ids = new java.io.File(s"$dir/ok").listFiles()
      .filter(_.getName.endsWith("-ids.npy")).head
    val b = java.nio.file.Files.readAllBytes(ids.toPath)
    b(0) = 'X'.toByte
    java.nio.file.Files.write(ids.toPath, b)
    val e2 = intercept[org.apache.spark.SparkException](
      graft.io.Npy.read(spark, s"$dir/ok").collect())
    assert(e2.getMessage.contains("NPY") || e2.getCause != null)
  }
}
