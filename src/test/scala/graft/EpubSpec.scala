package graft

import graft.operators.Epub
import org.scalatest.funsuite.AnyFunSuite

/** EPUB (OCF/OPF) writer/reader: container round trips, spine ORDER
  * authority (a hand-built package with spine ≠ zip ≠ manifest order),
  * the stored-mimetype OCF rule, and loud refusals.
  */
class EpubSpec extends AnyFunSuite {

  test("encode → extractText round-trips chapters exactly") {
    val chapters = Seq(
      Seq("the first line of chapter one", "and its second line"),
      Seq("chapter two begins here"),
      Seq("escapes & <brackets> work", "closing line"))
    val got = Epub.extractText(Epub.encode(chapters))
    assert(got == chapters.map(_.mkString("\n")).toVector)
  }

  test("OCF rule: mimetype is the FIRST entry and is STORED") {
    val epub = Epub.encode(Seq(Seq("body")))
    val zip = new java.util.zip.ZipInputStream(
      new java.io.ByteArrayInputStream(epub))
    val first = zip.getNextEntry
    assert(first.getName == "mimetype")
    assert(first.getMethod == java.util.zip.ZipEntry.STORED)
    val body = new Array[Byte](64)
    val n = zip.read(body)
    assert(new String(body, 0, n, "US-ASCII") == "application/epub+zip")
    zip.close()
    // and the raw bytes show the magic at the spec'd offset 38
    assert(new String(epub, 30, 8, "US-ASCII") == "mimetype")
    assert(new String(epub, 38, 20, "US-ASCII") == "application/epub+zip")
  }

  test("spine order is authoritative, not zip or manifest order") {
    // hand-built package: chapters stored b-then-a, manifest lists
    // a-then-b, spine reads b-then-a — extraction must follow the spine
    val bos = new java.io.ByteArrayOutputStream()
    val z = new java.util.zip.ZipOutputStream(bos)
    def entry(name: String, body: String): Unit = {
      z.putNextEntry(new java.util.zip.ZipEntry(name))
      z.write(body.getBytes("UTF-8")); z.closeEntry()
    }
    entry("META-INF/container.xml",
      """<container><rootfiles>
        |<rootfile full-path="book/pkg.opf" media-type="application/oebps-package+xml"/>
        |</rootfiles></container>""".stripMargin)
    entry("book/b.xhtml", "<html><body><p>second text</p></body></html>")
    entry("book/a.xhtml", "<html><body><p>first text</p></body></html>")
    entry("book/pkg.opf",
      """<package><manifest>
        |<item id="a" href="a.xhtml" media-type="application/xhtml+xml"/>
        |<item id="b" href="b.xhtml" media-type="application/xhtml+xml"/>
        |</manifest><spine>
        |<itemref idref="b"/><itemref idref="a"/>
        |</spine></package>""".stripMargin)
    z.close()
    assert(Epub.extractText(bos.toByteArray) ==
      Vector("second text", "first text"))
  }

  test("attribute lookup needs a name boundary (guid= must not match id=)") {
    val bos = new java.io.ByteArrayOutputStream()
    val z = new java.util.zip.ZipOutputStream(bos)
    def entry(name: String, body: String): Unit = {
      z.putNextEntry(new java.util.zip.ZipEntry(name))
      z.write(body.getBytes("UTF-8")); z.closeEntry()
    }
    entry("META-INF/container.xml",
      """<container><rootfiles><rootfile full-path="p.opf"/></rootfiles></container>""")
    entry("p.opf",
      """<package><manifest>
        |<item guid="WRONG" id="c" href="c.xhtml" media-type="application/xhtml+xml"/>
        |</manifest><spine><itemref data-idref="DECOY" idref="c"/></spine></package>""".stripMargin)
    entry("c.xhtml", "<html><body><p>boundary ok</p></body></html>")
    z.close()
    assert(Epub.extractText(bos.toByteArray) == Vector("boundary ok"))
  }

  test("malformed packages fail loudly") {
    intercept[IllegalArgumentException](
      Epub.extractText("not a zip".getBytes("US-ASCII")))
    // zip without container.xml
    val bos = new java.io.ByteArrayOutputStream()
    val z = new java.util.zip.ZipOutputStream(bos)
    z.putNextEntry(new java.util.zip.ZipEntry("x.txt"))
    z.write("hi".getBytes); z.closeEntry(); z.close()
    val e = intercept[IllegalArgumentException](
      Epub.extractText(bos.toByteArray))
    assert(e.getMessage.contains("container.xml"))
    // spine referencing a missing manifest id
    val bos2 = new java.io.ByteArrayOutputStream()
    val z2 = new java.util.zip.ZipOutputStream(bos2)
    def e2(name: String, body: String): Unit = {
      z2.putNextEntry(new java.util.zip.ZipEntry(name))
      z2.write(body.getBytes("UTF-8")); z2.closeEntry()
    }
    e2("META-INF/container.xml",
      """<container><rootfiles><rootfile full-path="p.opf"/></rootfiles></container>""")
    e2("p.opf",
      """<package><manifest></manifest><spine><itemref idref="ghost"/></spine></package>""")
    z2.close()
    val e3 = intercept[IllegalArgumentException](
      Epub.extractText(bos2.toByteArray))
    assert(e3.getMessage.contains("ghost"))
  }

  test("asEpubMedia → extractTexts: distributed layout rule end to end") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val docs = Seq(
      (1L, (1 to 23).map(i => s"t$i").mkString(" ")),
      (2L, "tiny book"))
      .toDF("doc_id", "text")
    val rows = Epub.extractTexts(Epub.asEpubMedia(docs))
      .collect().map(r => r.doc_id -> r).toMap
    // doc 1: 23 words → 5 lines of 5/5/5/5/3 → 3 chapters
    assert(rows(1L).n_chapters == 3)
    val words = (1 to 23).map(i => s"t$i")
    assert(rows(1L).text ==
      words.grouped(5).map(_.mkString(" ")).mkString("\n"))
    assert(rows(2L).n_chapters == 1 && rows(2L).text == "tiny book")
  }
}
