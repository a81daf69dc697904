package graft

import graft.operators.Mime
import org.scalatest.funsuite.AnyFunSuite

/** MIME machinery: quoted-printable both directions (soft breaks,
  * trailing whitespace, non-ASCII), header folding, a hand-written
  * real-world EML as the second implementation, refusals.
  */
class MimeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("quoted-printable round-trips hard cases exactly") {
    val cases = Seq(
      "plain ascii",
      "equals = sign",
      "café über 中文 emoji  control",
      "ends with space ",
      "ends with tab\t",
      "x" * 300, // forces soft breaks
      ("word " * 40).trim, // soft breaks around spaces
      "")
    cases.foreach { s =>
      val enc = Mime.qpEncode(s)
      enc.split("\n", -1).foreach(l => assert(l.length <= 76,
        s"QP line over 76 chars: '$l'"))
      assert(Mime.qpDecode(enc) == s, s"round trip failed for '$s'")
    }
  }

  test("qpDecode handles CRLF soft breaks and refuses bad escapes") {
    assert(Mime.qpDecode("ab=\r\ncd") == "abcd")
    assert(Mime.qpDecode("=41=42") == "AB")
    intercept[IllegalArgumentException] { Mime.qpDecode("bad =zz") }
    intercept[IllegalArgumentException] { Mime.qpDecode("trunc =4") }
  }

  test("header folding joins continuation lines with one space") {
    val h = Mime.parseHeaders(
      "Subject: a long\n  folded subject\n\tmore\nFrom: x@y")
    assert(h("subject") == "a long folded subject more")
    assert(h("from") == "x@y")
    intercept[IllegalArgumentException] {
      Mime.parseHeaders("  orphan continuation")
    }
  }

  test("renderEmail → parse round-trips both alternative bodies") {
    val text = "hello café — this = text has specials\tand unicode 中"
    val e = Mime.parse(Mime.renderEmail(42L, text))
    assert(e.subject == "doc 42")
    assert(e.from == "writer-0@example.com")
    assert(e.foldedTag == "alpha beta gamma delta epsilon")
    assert(e.parts.size == 2)
    assert(e.parts(0).body == text)
    assert(e.parts(1).body == "<p>" + text + "</p>")
  }

  test("hand-written EML (second implementation) parses exactly") {
    val eml =
      "Return-Path: <bounce@ex.com>\r\n" +
        "From: Alice <alice@ex.com>\r\n" +
        "Subject: Re: meeting\r\n" +
        "Content-Type: multipart/alternative;\r\n" +
        "  boundary=XYZ\r\n" +
        "\r\n" +
        "--XYZ\r\n" +
        "Content-Type: text/plain\r\n" +
        "Content-Transfer-Encoding: quoted-printable\r\n" +
        "\r\n" +
        "Caf=C3=A9 at nine=2C ok?\r\n" +
        "--XYZ\r\n" +
        "Content-Type: text/html\r\n" +
        "Content-Transfer-Encoding: base64\r\n" +
        "\r\n" +
        java.util.Base64.getEncoder.encodeToString(
          "<b>Café at nine, ok?</b>".getBytes("UTF-8")) + "\r\n" +
        "--XYZ--\r\n"
    val e = Mime.parse(eml)
    assert(e.subject == "Re: meeting")
    assert(e.from == "Alice <alice@ex.com>")
    assert(e.parts.size == 2)
    assert(e.parts(0).body == "Café at nine, ok?")
    assert(e.parts(1).body == "<b>Café at nine, ok?</b>")
  }

  test("malformed messages refuse loudly") {
    intercept[IllegalArgumentException] { Mime.parse("no separator") }
    intercept[IllegalArgumentException] {
      Mime.parse("Content-Type: multipart/mixed\n\nbody") // no boundary
    }
    intercept[IllegalArgumentException] {
      Mime.parse("Content-Type: multipart/mixed; boundary=Q\n\n" +
        "--Q\nContent-Type: text/plain\n\nx\n") // no closing --Q--
    }
    intercept[IllegalArgumentException] {
      Mime.parse("Content-Transfer-Encoding: uuencode\n\nbody")
    }
  }

  test("asEmailDocs → extractEmails: fixture rule end to end") {
    val docs = Seq((14L, "alpha beta"), (15L, "")).toDF("doc_id", "text")
    val out = Mime.extractEmails(Mime.asEmailDocs(docs))
      .collect().sortBy(_.doc_id)
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
    assert(out(0).subject == "doc 14")
    assert(out(0).from == "writer-0@example.com")
    assert(out(0).n_parts == 2)
    assert(out(0).plain_md5 == md5hex("alpha beta"))
    assert(out(0).html_md5 == md5hex("<p>alpha beta</p>"))
    assert(out(1).plain_md5 == md5hex(""))
  }
}
