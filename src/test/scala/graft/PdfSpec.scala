package graft

import graft.operators.Pdf
import org.scalatest.funsuite.AnyFunSuite

/** PDF text extraction under byte-level test. The reader is validated
  * two independent ways: (a) round-trips through our own writer in all
  * three show-operator styles, compressed and not; (b) a SECOND
  * hand-assembled fixture built in this spec (its own offset
  * bookkeeping, indirect /Length, nested page tree, multi-stream
  * /Contents, comments, name escapes, string edge cases) so writer and
  * reader cannot share a structural bug. `pdftotext` is absent from
  * this container, so external cross-validation is replaced by the
  * hand fixture's byte-pinned expectations (documented in Pdf.scala).
  */
class PdfSpec extends AnyFunSuite {

  test("encode → extractText round-trips all styles × compression × structure") {
    val pages = Seq(
      Seq("the quick brown fox", "jumps over the lazy dog"),
      Seq("second page line one", "and line two"))
    for (style <- 0 to 2; compress <- Seq(false, true);
         (xs, pred) <- Seq((false, false), (true, false), (true, true))) {
      val pdf = Pdf.encode(pages, style, compress, xrefStream = xs,
        predictor = pred)
      val got = Pdf.extractText(pdf)
      assert(got == pages.map(_.mkString("\n")),
        s"style=$style compress=$compress xrefStream=$xs predictor=$pred")
    }
  }

  test("1.5 structure: the object stream and xref stream actually exist") {
    val pdf = Pdf.encode(Seq(Seq("structural check body")), 0,
      compress = false, xrefStream = true, predictor = true)
    val s = new String(pdf, "ISO-8859-1")
    assert(s.contains("/Type /ObjStm"), "no object stream emitted")
    assert(s.contains("/Type /XRef"), "no cross-reference stream emitted")
    assert(s.contains("/Predictor 12"), "no predictor parms emitted")
    assert(!s.contains("trailer"), "1.5 files carry no trailer keyword")
    // the catalog dictionary must NOT appear as a top-level object
    assert(!s.contains("1 0 obj\n<< /Type /Catalog"),
      "catalog should live inside the ObjStm")
    // corrupting the predicted xref data fails loudly (inflate or
    // row-shape check), never a silent wrong offset
    val at = s.indexOf("stream\n", s.indexOf("/Type /XRef"))
    val bad = pdf.clone()
    bad(at + 10) = (bad(at + 10) ^ 0x55).toByte
    intercept[Exception](Pdf.extractText(bad))
  }

  test("WinAnsi high bytes survive octal escapes and hex strings") {
    val lines = Seq("café touché", "em—dash €10 œuvre")
    for (style <- 0 to 2) {
      val pdf = Pdf.encode(Seq(lines), style, compress = false)
      assert(Pdf.extractText(pdf) == Seq(lines.mkString("\n")), s"style=$style")
    }
  }

  test("string edge cases: nested parens, escapes, continuations, odd hex") {
    // build one content stream by hand and run the text machine on it
    val content =
      "BT /F1 12 Tf 72 720 Td\n" +
        "(paren (nested) pair) Tj\n" +
        "0 -14 Td (esc \\( \\) \\\\ oct \\101\\102) Tj\n" +
        "0 -14 Td (split\\\nline) Tj\n" +          // continuation: no break
        "0 -14 Td <48656C6C6F2> Tj\n" +            // odd digit count pads 0
        "ET"
    val got = Pdf.extractFromContent(content.getBytes("US-ASCII"))
    assert(got ==
      "paren (nested) pair\nesc ( ) \\ oct AB\nsplitline\nHello ")
  }

  test("TJ kern rule: deep kerns are word breaks, shallow ones are not") {
    val content =
      "BT [(Hel) -20 (lo) -250 (world) -179 (!)] TJ ET"
    assert(Pdf.extractFromContent(content.getBytes("US-ASCII")) ==
      "Hello world!")
    // exactly at the threshold is a break
    val at = "BT [(a) -180 (b)] TJ ET"
    assert(Pdf.extractFromContent(at.getBytes("US-ASCII")) == "a b")
    // consecutive deep kerns (an empty show between them) carry
    // consecutive source spaces — each survives
    val dbl = "BT [(a) -250 () -250 (b)] TJ ET"
    assert(Pdf.extractFromContent(dbl.getBytes("US-ASCII")) == "a  b")
  }

  test("crafted cycles refuse loudly instead of overflowing the stack") {
    // a /Kids cycle: object 2 lists itself as its own kid
    val good = new String(Pdf.encode(Seq(Seq("hello")), 0, false),
      "ISO-8859-1")
    val cyc = good.replace("/Kids [4 0 R]", "/Kids [2 0 R]")
    assert(cyc.contains("/Kids [2 0 R]"), "kids replace missed")
    val e = intercept[IllegalArgumentException](
      Pdf.extractText(cyc.getBytes("ISO-8859-1")))
    assert(e.getMessage.contains("cycle"))
  }

  /** Hand-assembled PDF: independent offset bookkeeping, nested page
    * tree (Pages → Pages → Page), /Contents as an ARRAY of two streams,
    * an INDIRECT /Length, a #xx name escape, comments, and a second
    * xref section chained via /Prev that replaces the content stream.
    */
  private def handFixture(withUpdate: Boolean): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    def ascii(s: String): Unit = out.write(s.getBytes("US-ASCII"))
    val offsets = scala.collection.mutable.Map.empty[Int, Long]
    def obj(num: Int)(body: String): Unit = {
      offsets(num) = out.size().toLong
      ascii(s"$num 0 obj\n$body\nendobj\n")
    }
    ascii("%PDF-1.4\n% a comment line\n")
    obj(1)("<< /Type /Catalog /Pages 2 0 R >>")
    obj(2)("<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
    obj(3)("<< /Type /Pages /Kids [4 0 R] /Count 1 /Parent 2 0 R >>")
    obj(4)("<< /Type /Page /Parent 3 0 R /MediaBox [0 0 612 792] " +
      "/Resources << /Fo#6et << /F1 7 0 R >> >> /Contents [5 0 R 6 0 R] >>")
    val s1 = "BT /F1 12 Tf 72 720 Td (first stream) Tj ET"
    offsets(5) = out.size().toLong
    ascii(s"5 0 obj\n<< /Length 8 0 R >>\nstream\n$s1\nendstream\nendobj\n")
    val s2 = "BT 72 700 Td (second stream) Tj ET"
    obj(6)(s"<< /Length ${s2.length} >>\nstream\n$s2\nendstream")
    obj(7)("<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    obj(8)(s"${s1.length}")
    val xref1 = out.size().toLong
    ascii(s"xref\n0 9\n0000000000 65535 f \n")
    (1 to 8).foreach(n => ascii(f"${offsets(n)}%010d 00000 n \n"))
    ascii(s"trailer\n<< /Size 9 /Root 1 0 R >>\nstartxref\n$xref1\n%%EOF\n")
    if (withUpdate) {
      // incremental update: object 6 replaced
      val s2b = "BT 72 700 Td (updated stream) Tj ET"
      offsets(6) = out.size().toLong
      ascii(s"6 0 obj\n<< /Length ${s2b.length} >>\nstream\n$s2b\n" +
        "endstream\nendobj\n")
      val xref2 = out.size().toLong
      ascii(s"xref\n6 1\n")
      ascii(f"${offsets(6)}%010d 00000 n \n")
      ascii(s"trailer\n<< /Size 9 /Root 1 0 R /Prev $xref1 >>\n" +
        s"startxref\n$xref2\n%%EOF\n")
    }
    out.toByteArray
  }

  test("hand-assembled fixture: nested tree, stream array, indirect length") {
    assert(Pdf.extractText(handFixture(withUpdate = false)) ==
      Seq("first stream\nsecond stream"))
  }

  test("incremental update via /Prev: the newer xref section wins") {
    assert(Pdf.extractText(handFixture(withUpdate = true)) ==
      Seq("first stream\nupdated stream"))
  }

  test("out-of-scope constructs refuse loudly") {
    val good = Pdf.encode(Seq(Seq("hello")), 0, compress = false)
    // encrypted — the swap shifts no offsets (trailer sits after xref)
    val enc = new String(good, "ISO-8859-1").replace(
      "/Size 6 /Root 1 0 R", "/Size 6 /Root 1 0 R /Encrypt 9 0 R")
    assert(enc.contains("/Encrypt"), "trailer replace missed")
    val e1 = intercept[IllegalArgumentException](
      Pdf.extractText(enc.getBytes("ISO-8859-1")))
    assert(e1.getMessage.contains("encrypted"))
    // startxref pointing at a NON-stream object (object 1, offset 15):
    // the 1.5 dispatch tries the xref-stream path and refuses loudly
    val xs = new String(good, "ISO-8859-1")
    val sx = xs.lastIndexOf("startxref")
    val hacked = xs.substring(0, sx) + "startxref\n15\n%%EOF\n"
    val e2 = intercept[IllegalArgumentException](
      Pdf.extractText(hacked.getBytes("ISO-8859-1")))
    assert(e2.getMessage.contains("non-stream"))
    // unsupported filter: same-length name swap keeps every offset
    val bad = new String(Pdf.encode(Seq(Seq("hi")), 0, compress = true),
      "ISO-8859-1").replace("/FlateDecode", "/FlateXecode")
    assert(bad.contains("/FlateXecode"), "filter replace missed")
    val e3 = intercept[IllegalArgumentException](
      Pdf.extractText(bad.getBytes("ISO-8859-1")))
    assert(e3.getMessage.contains("filter"), e3.getMessage)
    // inline image operator in a content stream
    val e4 = intercept[IllegalArgumentException](
      Pdf.extractFromContent("BT BI /W 1 ID x EI ET".getBytes("US-ASCII")))
    assert(e4.getMessage.contains("inline images"))
    // not a PDF at all
    intercept[IllegalArgumentException](
      Pdf.extractText("plain text".getBytes("US-ASCII")))
    // truncated: no startxref
    intercept[IllegalArgumentException](
      Pdf.extractText(good.take(good.length / 2)))
  }

  test("asPdfMedia → extractTexts: distributed layout rule end to end") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val docs = Seq(
      (0L, "alpha beta gamma delta epsilon zeta eta"),
      (1L, (1 to 30).map(i => s"t$i").mkString(" ")),
      (2L, "one two"))
      .toDF("doc_id", "text")
    val rows = Pdf.extractTexts(Pdf.asPdfMedia(docs)).collect()
      .map(r => r.doc_id -> r).toMap
    // doc 1: 30 words → 5 lines → 2 pages
    assert(rows(1L).n_pages == 2)
    val words = (1 to 30).map(i => s"t$i")
    val expect = words.grouped(6).map(_.mkString(" ")).mkString("\n")
    assert(rows(1L).text == expect)
    assert(rows(2L).n_pages == 1 && rows(2L).text == "one two")
  }
}
