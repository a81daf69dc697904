package graft

import graft.operators.Wikitext
import org.scalatest.funsuite.AnyFunSuite

/** Wikitext writer + reader: nowiki escaping, the global structure
  * removers (comments/refs/templates/tables), apostrophe-run toggles,
  * link forms, hand-written real-world wikitext as the second
  * implementation, loud refusals on unterminated constructs.
  */
class WikitextSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("escapeWt wraps metacharacter words in nowiki, refuses the closing tag") {
    assert(Wikitext.escapeWt("plain") == "plain")
    assert(Wikitext.escapeWt("a'b") == "<nowiki>a'b</nowiki>")
    assert(Wikitext.escapeWt("x[y]z") == "<nowiki>x[y]z</nowiki>")
    assert(Wikitext.escapeWt("{{tpl}}") == "<nowiki>{{tpl}}</nowiki>")
    intercept[IllegalArgumentException] {
      Wikitext.escapeWt("bad</nowiki>word")
    }
  }

  test("render → extract round-trips text, counts tables and refs") {
    // 17 words → 3 lines (heading, bullet, indent); strides fire:
    // j=1 bold, j=3 italic, j=6 ref+template, j=7 internal link,
    // j=9 comment, j=11 external... j%9==2 at j=2,11; j=16 ref
    val words = (0 until 17).map(i => s"w$i")
    val wt = Wikitext.render(words, Some("cell X"))
    val doc = Wikitext.extract(wt)
    assert(doc.nTables == 1)
    assert(doc.nRefs == 2) // j=6 and j=16
    assert(doc.textLines.size == 3)
    assert(doc.textLines(0) == (0 until 8).map(i => s"w$i").mkString(" "))
    assert(doc.textLines(1) == (8 until 16).map(i => s"w$i").mkString(" "))
    assert(doc.textLines(2) == "w16")
  }

  test("metacharacter words survive through every decoration") {
    val words = Vector("it's", "bo'''ld", "[brack]", "{{t}}", "a=b",
      "p|q", "c*d", "e<f>")
    val wt = Wikitext.render(words, None)
    val doc = Wikitext.extract(wt)
    assert(doc.textLines == Vector(words.mkString(" ")))
  }

  test("empty and all-empty-word lines keep their place") {
    // 9 empty words: line 1 = heading of 8 empties, line 2 = bullet
    val words = Vector.fill(9)("")
    val doc = Wikitext.extract(Wikitext.render(words, None))
    assert(doc.textLines.size == 2)
    assert(doc.textLines(0) == " " * 7)
    assert(doc.textLines(1) == "")
  }

  test("hand-written wikitext (second implementation) extracts exactly") {
    val wt =
      """== History ==
        |The '''city''' was ''founded'' in 1850.<ref>Smith 2001</ref>
        |{{Infobox settlement
        || name = Springfield
        || population = {{formatnum:12345}}
        |}}
        |* See [[Capital city|the capital]] and [[Shelbyville]].
        |: Visit [https://example.org/springfield the site] or [https://example.org/bare].
        |<!-- editors: keep this section short -->
        |{| class="wikitable"
        ||-
        || Year || Population
        ||}
        |'''''Both bold and italic''''' text, a <nowiki>literal ''marker''</nowiki> span.<ref name="x"/>
        |""".stripMargin
    val doc = Wikitext.extract(wt)
    assert(doc.nTables == 1)
    assert(doc.nRefs == 2) // one <ref>…</ref> + one self-closing
    assert(doc.textLines == Vector(
      "History",
      "The city was founded in 1850.",
      "See the capital and Shelbyville.",
      "Visit the site or .",
      "Both bold and italic text, a literal ''marker'' span."))
  }

  test("apostrophe-run rule: 5 toggles both, 3 bold, 2 italic, 1 literal") {
    assert(Wikitext.inlineText("'''''x'''''") == "x")
    assert(Wikitext.inlineText("'''b''' ''i'' it's") == "b i it's")
    assert(Wikitext.inlineText("''''q''''") == "'q'")
  }

  test("nested templates are removed as one unit") {
    val (cleaned, t, r) = Wikitext.stripStructures(
      "a{{outer|{{inner|x}}|y}}b")
    assert(cleaned == "ab" && t == 0 && r == 0)
  }

  test("nowiki shields structures from removal") {
    val (cleaned, t, r) = Wikitext.stripStructures(
      "keep <nowiki>{{this}} <ref>and this</ref></nowiki> drop{{that}}")
    assert(cleaned == "keep <nowiki>{{this}} <ref>and this</ref></nowiki> drop")
    assert(t == 0 && r == 0)
  }

  test("unterminated constructs fail loudly") {
    intercept[IllegalArgumentException] { Wikitext.extract("a{{open") }
    intercept[IllegalArgumentException] { Wikitext.extract("a<!-- open") }
    intercept[IllegalArgumentException] { Wikitext.extract("a<ref>open") }
    intercept[IllegalArgumentException] { Wikitext.extract("{| open\nrow") }
    intercept[IllegalArgumentException] { Wikitext.extract("a<nowiki>open") }
    intercept[IllegalArgumentException] {
      Wikitext.extract("x [[unclosed link\n")
    }
  }

  test("asWikitextDocs → extractTexts: distributed layout rule end to end") {
    val docs = Seq((4L, "alpha beta gamma delta epsilon zeta eta theta iota"),
      (5L, "one two")).toDF("doc_id", "text")
    val out = Wikitext.extractTexts(Wikitext.asWikitextDocs(docs))
      .collect().sortBy(_.doc_id)
    assert(out(0).n_tables == 1 && out(1).n_tables == 0)
    assert(out(0).n_lines == 2 && out(1).n_lines == 1)
    assert(out(0).n_refs == 1) // word index 6 ("eta")
    assert(out(0).text ==
      "alpha beta gamma delta epsilon zeta eta theta\niota")
    assert(out(1).text == "one two")
  }
}
