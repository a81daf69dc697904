package graft

import graft.operators.Markdown
import org.scalatest.funsuite.AnyFunSuite

/** Markdown writer/reader: round trips through the block + inline
  * machinery, hand-written markdown as the second implementation,
  * CommonMark escape/code-span rules, and loud refusals.
  */
class MarkdownSpec extends AnyFunSuite {

  test("render → extract round-trips words exactly") {
    val words = ("the quick brown fox jumps over the lazy dog and " +
      "then some more words to cross several line strides so that " +
      "headings lists quotes and ordered items all fire").split(" ").toSeq
    val doc = Markdown.extract(Markdown.render(words, None))
    assert(doc.textLines.mkString("\n") ==
      words.grouped(Markdown.WordsPerLine).map(_.mkString(" "))
        .mkString("\n"))
    assert(doc.codeBlocks.isEmpty)
  }

  test("specials in words survive the escape rule") {
    val words = Seq("a*b", "`tick`", "[br]", "(par)", "#hash", "-dash",
      "1.", "__u__", "!bang", "\\slash", "plain", "**")
    val doc = Markdown.extract(Markdown.render(words, None))
    assert(doc.textLines.mkString("\n") ==
      words.grouped(Markdown.WordsPerLine).map(_.mkString(" "))
        .mkString("\n"))
  }

  test("code blocks route to the code channel, never the text") {
    val words = Seq("prose", "words", "here")
    val doc = Markdown.extract(
      Markdown.render(words, Some("x = 1  # code\ny = [2]")))
    assert(doc.textLines == Vector("prose words here"))
    assert(doc.codeBlocks == Vector("x = 1  # code\ny = [2]"))
  }

  test("hand-written markdown: blocks, inline, fences, breaks") {
    val md =
      """# Title here
        |
        |plain **bold** and *em* line
        |- item one
        |- item `code span` two
        |> quoted _text_
        |> > nested quote
        |1. first
        |22. twenty-two
        |```python
        |x = 1 # not text
        |```
        |[link](http://a) and ![img](http://b)
        |===
        |---
        |***
        |tail \*literal\* stars""".stripMargin
    val doc = Markdown.extract(md)
    assert(doc.textLines == Vector(
      "Title here",
      "plain bold and em line",
      "item one",
      "item code span two",
      "quoted text",
      "nested quote",
      "first",
      "twenty-two",
      "link and img",
      "tail *literal* stars"))
    assert(doc.codeBlocks == Vector("x = 1 # not text"))
  }

  test("escapes do NOT apply inside code spans (CommonMark)") {
    assert(Markdown.inlineText("a `\\*raw\\*` b") == "a \\*raw\\* b")
  }

  test("__bold__ and _em_ underscore toggles") {
    assert(Markdown.inlineText("__b__ and _e_") == "b and e")
  }

  test("bare brackets are literal; nested link text allowed") {
    assert(Markdown.inlineText("see [section 2] here") ==
      "see [section 2] here")
    assert(Markdown.inlineText("[a [b] c](http://x)") == "a [b] c")
  }

  test("multiple code fences and ~~~ fences") {
    val md = "one\n```\nA\n```\nmid\n~~~\nB1\nB2\n~~~\nend"
    val doc = Markdown.extract(md)
    assert(doc.textLines == Vector("one", "mid", "end"))
    assert(doc.codeBlocks == Vector("A", "B1\nB2"))
  }

  test("six-or-more hashes without a space is not a heading") {
    val doc = Markdown.extract("####### seven\n#nospace")
    assert(doc.textLines == Vector("####### seven", "#nospace"))
  }

  test("malformed markdown fails loudly") {
    intercept[IllegalArgumentException](
      Markdown.extract("```python\nnever closed"))
    intercept[IllegalArgumentException](
      Markdown.inlineText("unterminated `code span"))
    intercept[IllegalArgumentException](
      Markdown.inlineText("unterminated [link text"))
    intercept[IllegalArgumentException](
      Markdown.inlineText("unterminated [link](target"))
  }

  test("random words round-trip under every layout stride") {
    val rnd = new scala.util.Random(396)
    val alphabet =
      "abcdefghijklmnopqrstuvwxyz0123456789*_`[]()#>-+.!\\~".toVector
    (0 until 40).foreach { trial =>
      val words = (0 until 1 + rnd.nextInt(40)).map(_ =>
        (0 until 1 + rnd.nextInt(8)).map(_ =>
          alphabet(rnd.nextInt(alphabet.length))).mkString)
      val cb = if (trial % 3 == 0) Some(s"code $trial") else None
      val doc = Markdown.extract(Markdown.render(words, cb))
      assert(doc.textLines.mkString("\n") ==
        words.grouped(Markdown.WordsPerLine).map(_.mkString(" "))
          .mkString("\n"), s"trial $trial words=$words")
      assert(doc.codeBlocks.size == cb.size.toInt, s"trial $trial")
    }
  }
}
