package graft

import graft.operators.Ogg
import org.scalatest.funsuite.AnyFunSuite

/** Ogg page walk + Vorbis headers: CRC pinned to the published
  * non-reflected form, lacing spans, hand-built page vectors,
  * corruption refusals, fixture end to end.
  */
class OggSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("ogg CRC is the non-reflected 0x04C11DB7, init 0, no xor-out") {
    // CRC-32/POSIX's check value is the complement of this form's:
    // posix("123456789") = 0x765E7680 = ~0x89A1897F
    val v = "123456789".getBytes("ASCII")
    assert(Ogg.crc(v, 0, v.length) == 0x89A1897F)
    assert(Ogg.crc(Array.emptyByteArray, 0, 0) == 0)
  }

  test("encode → decode round-trips metadata, granules, and pages") {
    val m = Ogg.OggMeta(serial = 77, channels = 2, sampleRate = 16000,
      vendor = "graft-0.1",
      comments = Seq("TITLE=t", "ARTIST=a", "PAD=" + "x" * 300),
      lastGranule = 0, pages = 0)
    val back = Ogg.decode(Ogg.encode(m, audioPages = 4,
      granuleStep = 1024))
    assert(back.serial == 77)
    assert(back.channels == 2 && back.sampleRate == 16000)
    assert(back.vendor == "graft-0.1")
    assert(back.comments == m.comments)
    assert(back.lastGranule == 4096)
    assert(back.pages == 6) // ident + comment + 4 audio
  }

  test("a >255-byte packet spans lacing segments and reassembles") {
    val big = "PAD=" + "y" * 600 // comment packet far over 2 segments
    val m = Ogg.OggMeta(1, 1, 8000, "v", Seq(big), 0, 0)
    val back = Ogg.decode(Ogg.encode(m, 1, 64))
    assert(back.comments == Seq(big))
  }

  test("an exact-255-multiple packet needs its zero lacing terminator") {
    // craft a comment whose PACKET length is an exact multiple of 255:
    // packet = 7 (header) + 4+len(vendor) + 4 + 4+len(c) + 1
    // vendor "v" → 7+5+4+1 = 17 fixed; want 17+4+len(c) ≡ 0 (mod 255)
    // → len(c) = 234
    val c = "K=" + "z" * 232
    val m = Ogg.OggMeta(1, 1, 8000, "v", Seq(c), 0, 0)
    val bytes = Ogg.encode(m, 1, 64)
    val back = Ogg.decode(bytes)
    assert(back.comments == Seq(c))
  }

  test("corruption refuses loudly") {
    val m = Ogg.OggMeta(5, 1, 8000, "v", Seq("A=b"), 0, 0)
    val good = Ogg.encode(m, 2, 64)
    // flip one payload byte → that page's CRC fails
    val bad = good.clone()
    bad(good.length - 1) = (bad(good.length - 1) ^ 1).toByte
    val e = intercept[IllegalArgumentException] { Ogg.decode(bad) }
    assert(e.getMessage.contains("CRC"))
    // truncation
    intercept[IllegalArgumentException] {
      Ogg.decode(java.util.Arrays.copyOf(good, good.length - 3))
    }
    // bad capture pattern
    val cap = good.clone(); cap(0) = 'X'
    intercept[IllegalArgumentException] { Ogg.decode(cap) }
    // missing EOS: cut the last page entirely — walk must refuse
    val lastPageStart = {
      // find the final "OggS" marker
      var p = -1
      var i = good.length - 4
      while (p < 0 && i >= 0) {
        if (good(i) == 'O' && good(i + 1) == 'g' && good(i + 2) == 'g' &&
          good(i + 3) == 'S') p = i
        i -= 1
      }
      p
    }
    val noEos = java.util.Arrays.copyOf(good, lastPageStart)
    val e2 = intercept[IllegalArgumentException] { Ogg.decode(noEos) }
    assert(e2.getMessage.contains("EOS"))
  }

  test("asOggDocs → extractMeta: fixture rule end to end") {
    val docs = Seq((9L, (0 until 33).map(i => s"w$i").mkString(" ")),
      (10L, "a")).toDF("doc_id", "text")
    val out = Ogg.extractMeta(Ogg.asOggDocs(docs))
      .collect().sortBy(_.doc_id)
    assert(out(0).channels == 2) // 9%2=1 → 1+1
    assert(out(0).sample_rate == 8000 * (1 + 9 % 5))
    assert(out(0).n_pages == 2 + 3) // 33 words → 3 audio pages
    assert(out(0).last_granule == 3L * 64 * 16)
    assert(out(0).n_comments == 4)
    assert(out(1).n_pages == 3)
    assert(out(1).serial == 10)
    val comments = Seq("TITLE=doc 9", "ARTIST=writer 2", "LANGUAGE=und",
      "PAD=" + "x" * 300)
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(comments.mkString("\n").getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString
    assert(out(0).comments_md5 == md)
  }
}
