package graft

import graft.operators.Mp4
import org.scalatest.funsuite.AnyFunSuite

import java.nio.ByteBuffer

/** ISO-BMFF box walk: language packing, round trip, a hand-assembled
  * out-of-order second fixture with unknown boxes, refusal sweep,
  * distributed extraction.
  */
class Mp4Spec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def be32(v: Int): Array[Byte] =
    ByteBuffer.allocate(4).putInt(v).array()
  private def be16(v: Int): Array[Byte] =
    ByteBuffer.allocate(2).putShort(v.toShort).array()
  private def box(kind: String, payload: Array[Byte]*): Array[Byte] = {
    val total = 8 + payload.map(_.length).sum
    val b = ByteBuffer.allocate(total).putInt(total)
      .put(kind.getBytes("ASCII"))
    payload.foreach(b.put)
    b.array()
  }

  test("language packs to the published 5-bit form and back") {
    assert(Mp4.packLang("und") == 0x55C4)
    assert(Mp4.unpackLang(0x55C4) == "und")
    Seq("eng", "fra", "deu", "jpn").foreach { l =>
      assert(Mp4.unpackLang(Mp4.packLang(l)) == l)
    }
    intercept[IllegalArgumentException] { Mp4.packLang("EN") }
    intercept[IllegalArgumentException] { Mp4.unpackLang(0) }
  }

  test("encode → decode round-trips every metadata field") {
    val m = Mp4.VideoMeta(frames = 30, delta = 25, timescale = 900,
      width = 320, height = 240, lang = "fra")
    val meta = Mp4.decode(Mp4.encode(m))
    assert(meta.brand == "isom")
    assert(meta.timescale == 900)
    assert(meta.frames == 30)
    assert(meta.durationMs == 30L * 25 * 1000 / 900)
    assert(meta.width == 320 && meta.height == 240)
    assert(meta.lang == "fra")
    assert(meta.sampleBytes == (0 until 30).map(Mp4.sampleSize).sum.toLong)
  }

  test("zero-frame file (metadata-only) decodes") {
    val meta = Mp4.decode(Mp4.encode(
      Mp4.VideoMeta(0, 24, 600, 160, 120, "eng")))
    assert(meta.frames == 0 && meta.durationMs == 0 &&
      meta.sampleBytes == 0)
  }

  test("hand-assembled out-of-order file with unknown boxes decodes") {
    // mdat BEFORE moov; free + udta boxes sprinkled in; uniform stsz
    val mdhd = box("mdhd", be32(0), be32(0), be32(0), be32(600),
      be32(48), be16(Mp4.packLang("jpn")), be16(0))
    val hdlr = box("hdlr", be32(0), be32(0), "vide".getBytes,
      new Array[Byte](12), Array[Byte](0))
    val stts = box("stts", be32(0), be32(2),
      be32(1), be32(24), be32(2), be32(12)) // 3 frames, 48 ticks
    val stsz = box("stsz", be32(0), be32(10), be32(3)) // uniform 10 x 3
    val stbl = box("stbl", stts, stsz)
    val minf = box("minf", box("free"), stbl)
    val tkhd = {
      val fixed = new Array[Byte](72) // version..matrix zeroed
      box("tkhd", fixed, be32(64 << 16), be32(48 << 16))
    }
    val trak = box("trak", tkhd, box("mdia", mdhd, hdlr, minf))
    val moov = box("moov",
      box("mvhd", be32(0), be32(0), be32(0), be32(1000), be32(80),
        new Array[Byte](80)),
      box("udta", "opaque user data".getBytes), trak)
    val file = box("mdat", new Array[Byte](30)) ++
      box("ftyp", "mp42".getBytes, be32(0)) ++
      box("free", new Array[Byte](5)) ++ moov
    val meta = Mp4.decode(file)
    assert(meta.brand == "mp42")
    assert(meta.frames == 3)
    assert(meta.timescale == 600 && meta.durationMs == 80)
    assert(meta.width == 64 && meta.height == 48)
    assert(meta.lang == "jpn")
    assert(meta.sampleBytes == 30)
  }

  test("corruption and out-of-scope structures refuse loudly") {
    val good = Mp4.encode(Mp4.VideoMeta(4, 24, 600, 160, 120, "eng"))
    // truncated
    intercept[IllegalArgumentException] {
      Mp4.decode(java.util.Arrays.copyOf(good, good.length - 3))
    }
    // largesize marker
    val largesize = good.clone()
    ByteBuffer.wrap(largesize, 0, 4).putInt(1)
    intercept[IllegalArgumentException] { Mp4.decode(largesize) }
    // mdat payload shrunk by one byte vs stsz accounting
    val shrunk = {
      val g = Mp4.encode(Mp4.VideoMeta(1, 24, 600, 160, 120, "eng"))
      // the final box is mdat: cut its last byte and fix its size
      val out = java.util.Arrays.copyOf(g, g.length - 1)
      val mdatStart = g.length - (8 + Mp4.sampleSize(0))
      ByteBuffer.wrap(out, mdatStart, 4).putInt(8 + Mp4.sampleSize(0) - 1)
      out
    }
    val e = intercept[IllegalArgumentException] { Mp4.decode(shrunk) }
    assert(e.getMessage.contains("stsz accounting"))
    // version-1 mdhd
    val v1 = good.clone()
    val idx = {
      var i = -1
      var p = 0
      while (i < 0 && p + 4 <= v1.length) {
        if (new String(v1, p, 4, "ASCII") == "mdhd") i = p + 4
        p += 1
      }
      i
    }
    v1(idx) = 1
    intercept[IllegalArgumentException] { Mp4.decode(v1) }
  }

  test("asVideoDocs → extractMeta: distributed fixture rule end to end") {
    val docs = Seq((6L, "a b c"), (7L, "x")).toDF("doc_id", "text")
    val out = Mp4.extractMeta(Mp4.asVideoDocs(docs))
      .collect().sortBy(_.doc_id)
    assert(out(0).n_frames == 3 && out(1).n_frames == 1)
    assert(out(0).timescale == 600) // 6%3=0
    assert(out(1).timescale == 900) // 7%3=1
    assert(out(0).lang == "fra") // 6%4=2
    assert(out(1).lang == "deu") // 7%4=3
    assert(out(0).width == 160 + (6 % 5) * 32)
    assert(out(0).duration_ms == 3L * (24 + 6 % 7) * 1000 / 600)
    assert(out(0).sample_bytes ==
      (0 until 3).map(Mp4.sampleSize).sum.toLong)
  }
}
