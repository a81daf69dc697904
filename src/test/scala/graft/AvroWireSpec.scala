package graft

import graft.io.AvroWire
import org.scalatest.funsuite.AnyFunSuite

/** Avro container + binary encoding: schema AST, zigzag vectors, a
  * hand-built container as the second implementation, both codecs,
  * sync-marker corruption refusal, array block forms, Spark round
  * trip.
  */
class AvroWireSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val docSchemaJson =
    """{"type":"record","name":"Doc","fields":[
      |{"name":"doc_id","type":"long"},
      |{"name":"text","type":"string"}]}""".stripMargin

  test("schema parser covers the subset and refuses the rest") {
    val s = AvroWire.parseSchema(docSchemaJson)
    assert(s == AvroWire.ARecord("Doc",
      Seq("doc_id" -> AvroWire.ALong, "text" -> AvroWire.AString)))
    val u = AvroWire.parseSchema("""["null","double"]""")
    assert(u == AvroWire.AUnion(Seq(AvroWire.ANull, AvroWire.ADouble)))
    val arr = AvroWire.parseSchema("""{"type":"array","items":"float"}""")
    assert(arr == AvroWire.AArray(AvroWire.AFloat))
    intercept[IllegalArgumentException] {
      AvroWire.parseSchema("""{"type":"map","values":"long"}""")
    }
    intercept[IllegalArgumentException] { AvroWire.parseSchema("\"fixed\"") }
  }

  test("zigzag longs match the published examples") {
    // spec: 0→0, -1→1, 1→2, -2→3, 2→4
    def enc(n: Long): Seq[Int] = {
      val b = new java.io.ByteArrayOutputStream()
      AvroWire.writeLong(b, n)
      b.toByteArray.map(_ & 0xFF).toSeq
    }
    assert(enc(0) == Seq(0))
    assert(enc(-1) == Seq(1))
    assert(enc(1) == Seq(2))
    assert(enc(-2) == Seq(3))
    assert(enc(64) == Seq(0x80, 0x01))
    val d = new AvroWire.Decoder(Array(0x80.toByte, 0x01.toByte), 0)
    assert(d.readLong() == 64L)
  }

  test("hand-built container (second implementation) parses exactly") {
    // null codec, one block of two records, built byte by byte
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array[Byte]('O', 'b', 'j', 1))
    def wl(n: Long): Unit = AvroWire.writeLong(out, n)
    def wb(b: Array[Byte]): Unit = { wl(b.length.toLong); out.write(b) }
    wl(2)
    wb("avro.schema".getBytes); wb(docSchemaJson.getBytes("UTF-8"))
    wb("avro.codec".getBytes); wb("null".getBytes)
    wl(0)
    val sync = Array.tabulate[Byte](16)(_.toByte)
    out.write(sync)
    val block = new java.io.ByteArrayOutputStream()
    def rec(id: Long, text: String): Unit = {
      AvroWire.writeLong(block, id)
      val tb = text.getBytes("UTF-8")
      AvroWire.writeLong(block, tb.length.toLong)
      block.write(tb)
    }
    rec(7, "hello avro")
    rec(-3, "café 中")
    wl(2); wl(block.size.toLong)
    block.writeTo(out)
    out.write(sync)
    val (schema, records) = AvroWire.parseContainer(out.toByteArray)
    assert(schema == AvroWire.ARecord("Doc",
      Seq("doc_id" -> AvroWire.ALong, "text" -> AvroWire.AString)))
    assert(records == Seq(Seq(7L, "hello avro"), Seq(-3L, "café 中")))
  }

  test("render → parse round-trips both codecs and multiple blocks") {
    val schema = AvroWire.parseSchema(docSchemaJson)
    val recs = (0 until 25).map(i => Seq[Any](i.toLong, s"text $i"))
    val sync = Array.tabulate[Byte](16)(i => (i * 3).toByte)
    Seq("null", "deflate").foreach { codec =>
      val bytes = AvroWire.renderContainer(docSchemaJson, schema, recs,
        codec, sync, blockSize = 10) // 3 blocks
      val (_, back) = AvroWire.parseContainer(bytes)
      assert(back == recs)
    }
  }

  test("union and array values round-trip; negative array block form decodes") {
    val sj = """{"type":"record","name":"R","fields":[
      |{"name":"v","type":{"type":"array","items":"float"}},
      |{"name":"opt","type":["null","string"]}]}""".stripMargin
    val schema = AvroWire.parseSchema(sj)
    val recs = Seq(Seq[Any](Seq(1.5f, -2.0f), "present"),
      Seq[Any](Seq.empty[Float], null))
    val sync = new Array[Byte](16)
    val bytes = AvroWire.renderContainer(sj, schema, recs, "null", sync)
    val (_, back) = AvroWire.parseContainer(bytes)
    assert(back == recs)
    // hand-encode an array using the NEGATIVE (count,bytesize) form
    val raw = new java.io.ByteArrayOutputStream()
    AvroWire.writeLong(raw, -2L) // block of 2 items, size follows
    AvroWire.writeLong(raw, 8L)
    raw.write(Array[Byte](0, 0, 0x80.toByte, 0x3F.toByte)) // 1.0f
    raw.write(Array[Byte](0, 0, 0, 0x40.toByte)) // 2.0f
    AvroWire.writeLong(raw, 0L)
    AvroWire.writeLong(raw, 0L) // union branch 0 = null
    val d = new AvroWire.Decoder(raw.toByteArray, 0)
    // decode via a single-record container? decode directly: reuse the
    // record schema by decoding the two fields in order
    val one = AvroWire.parseSchema(sj) match {
      case r @ AvroWire.ARecord(_, _) => r
      case other => fail(s"unexpected $other")
    }
    assert(one.fields.map(_._2) ==
      Seq(AvroWire.AArray(AvroWire.AFloat), AvroWire.AUnion(Seq(AvroWire.ANull, AvroWire.AString))))
    val bytesAll = raw.toByteArray
    val container = AvroWire.renderContainer(sj, one,
      Seq.empty, "null", new Array[Byte](16))
    // splice: one block of 1 record with the hand payload
    val out = new java.io.ByteArrayOutputStream()
    out.write(container) // header + sync, zero blocks
    AvroWire.writeLong(out, 1L)
    AvroWire.writeLong(out, bytesAll.length.toLong)
    out.write(bytesAll)
    out.write(new Array[Byte](16))
    val (_, back2) = AvroWire.parseContainer(out.toByteArray)
    assert(back2 == Seq(Seq(Seq(1.0f, 2.0f), null)))
  }

  test("sync corruption and unknown codecs refuse loudly") {
    val schema = AvroWire.parseSchema(docSchemaJson)
    val sync = new Array[Byte](16)
    val bytes = AvroWire.renderContainer(docSchemaJson, schema,
      Seq(Seq[Any](1L, "x")), "deflate", sync)
    val corrupt = bytes.clone()
    corrupt(corrupt.length - 1) = 0x55 // last sync byte
    val e = intercept[IllegalArgumentException] {
      AvroWire.parseContainer(corrupt)
    }
    assert(e.getMessage.contains("sync marker"))
    intercept[IllegalArgumentException] {
      AvroWire.renderContainer(docSchemaJson, schema, Seq.empty, "snappy", sync)
    }
    intercept[IllegalArgumentException] {
      AvroWire.parseContainer("NotAvro".getBytes)
    }
  }

  test("Spark shard round trip is value-exact") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_avro").toString
    val rows = (0L until 60L).map(i => (i, s"document $i café"))
    AvroWire.writeDocs(rows.toDF("doc_id", "text").repartition(4), dir)
    val back = AvroWire.readDocs(spark, dir)
      .as[(Long, String)].collect().sortBy(_._1)
    assert(back.toSeq == rows)
  }

  test("cross-validation: the avro-jar writer's files parse byte-exactly") {
    // graft.io.Avro sits on the PUBLIC Avro Java API — a genuinely
    // independent implementation of the same spec. Its containers
    // (random sync markers, [null,T] union schema, jar-chosen deflate
    // framing) must decode identically through OUR wire parser.
    val dir = java.nio.file.Files
      .createTempDirectory("graft_avrox").toString
    val rows = (0L until 25L).map(i => (i, s"jar row $i"))
    graft.io.Avro.write(rows.toDF("doc_id", "text").repartition(2), dir)
    val shard = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".avro")).sortBy(_.getName).head
    val (schema, records) = AvroWire.parseContainer(
      java.nio.file.Files.readAllBytes(shard.toPath))
    schema match {
      case AvroWire.ARecord(_, Seq((f1, _), (f2, _))) =>
        assert(f1 == "doc_id" && f2 == "text")
      case other => fail(s"unexpected schema $other")
    }
    assert(records.nonEmpty)
    records.foreach {
      case Seq(id: Long, text: String) =>
        assert(text == s"jar row $id")
      case other => fail(s"unexpected record $other")
    }
  }

  test("cross-validation: our shards read back through the avro jar") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_avroy").toString
    val rows = (0L until 30L).map(i => (i, s"wire row $i"))
    AvroWire.writeDocs(rows.toDF("doc_id", "text").repartition(3), dir)
    val back = graft.io.Avro.read(spark, dir)
      .as[(Long, String)].collect().sortBy(_._1)
    assert(back.toSeq == rows)
  }
}
