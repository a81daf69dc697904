package graft

import graft.operators.Docx
import org.scalatest.funsuite.AnyFunSuite

/** DOCX (OPC/WordprocessingML) writer/reader: round trips through the
  * real ZIP container, a hand-written document.xml as the second
  * implementation (so writer and reader cannot share a markup bug),
  * entity/tab/break vectors, and loud refusals.
  */
class DocxSpec extends AnyFunSuite {

  test("encode → extractText round-trips paragraphs exactly") {
    val paras = Seq(
      "the quick brown fox jumps over the lazy dog",
      "a second paragraph with several words in it",
      "short one",
      "specials & <angles> and \"quotes\" survive 'escaping'")
    for (run <- Seq(1, 3, 5)) {
      val got = Docx.extractText(Docx.encode(paras, wordsPerRun = run))
      assert(got == paras.toVector, s"wordsPerRun=$run")
    }
  }

  test("the package is a real ZIP the JDK reads, with the OPC parts") {
    val docx = Docx.encode(Seq("zip container check"))
    val zip = new java.util.zip.ZipInputStream(
      new java.io.ByteArrayInputStream(docx))
    val names = Iterator.continually(zip.getNextEntry).takeWhile(_ != null)
      .map(_.getName).toSet
    zip.close()
    assert(names == Set("[Content_Types].xml", "_rels/.rels",
      "word/document.xml"))
  }

  test("hand-written document.xml: runs, preserve-space, tab, br, entities") {
    val xml =
      """<?xml version="1.0"?>
        |<w:document xmlns:w="x"><w:body>
        |<w:p><w:r><w:t>Hel</w:t></w:r><w:r><w:t>lo</w:t></w:r>
        |  <w:r><w:t xml:space="preserve"> world</w:t></w:r></w:p>
        |<w:p><w:pPr><w:jc w:val="center"/></w:pPr>
        |  <w:r><w:t>a</w:t><w:tab/><w:t>b</w:t><w:br/><w:t>c</w:t></w:r></w:p>
        |<w:p><w:r><w:t>x &amp; y &lt;z&gt; &#65;&#x42;</w:t></w:r></w:p>
        |<w:p><w:r><w:t/></w:r></w:p>
        |</w:body></w:document>""".stripMargin
    val got = Docx.parseDocumentXml(xml)
    assert(got == Vector(
      "Hello world",
      "a\tb\nc",
      "x & y <z> AB",
      ""))
  }

  test("malformed packages and markup fail loudly") {
    // not a zip at all
    intercept[IllegalArgumentException](
      Docx.extractText("plain bytes".getBytes("US-ASCII")))
    // a zip without word/document.xml
    val bos = new java.io.ByteArrayOutputStream()
    val z = new java.util.zip.ZipOutputStream(bos)
    z.putNextEntry(new java.util.zip.ZipEntry("other.txt"))
    z.write("hi".getBytes); z.closeEntry(); z.close()
    val e = intercept[IllegalArgumentException](
      Docx.extractText(bos.toByteArray))
    assert(e.getMessage.contains("word/document.xml"))
    // CDATA refuses
    intercept[IllegalArgumentException](Docx.parseDocumentXml(
      "<w:body><w:p><w:r><w:t><![CDATA[x]]></w:t></w:r></w:p></w:body>"))
    // unknown entity refuses
    intercept[IllegalArgumentException](Docx.parseDocumentXml(
      "<w:p><w:r><w:t>&nope;</w:t></w:r></w:p>"))
    // truncated inside a paragraph refuses
    intercept[IllegalArgumentException](Docx.parseDocumentXml(
      "<w:p><w:r><w:t>half"))
  }

  test("asDocxMedia → extractTexts: distributed layout rule end to end") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val docs = Seq(
      (1L, (1 to 20).map(i => s"t$i").mkString(" ")),
      (2L, "just four words here"))
      .toDF("doc_id", "text")
    val rows = graft.operators.Docx.extractTexts(
      graft.operators.Docx.asDocxMedia(docs))
      .collect().map(r => r.doc_id -> r).toMap
    // doc 1: 20 words → paragraphs of 9/9/2
    assert(rows(1L).n_paragraphs == 3)
    val words = (1 to 20).map(i => s"t$i")
    assert(rows(1L).text ==
      words.grouped(9).map(_.mkString(" ")).mkString("\n"))
    assert(rows(2L).n_paragraphs == 1 &&
      rows(2L).text == "just four words here")
  }
}
