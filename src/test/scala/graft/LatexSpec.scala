package graft

import graft.operators.Latex
import org.scalatest.funsuite.AnyFunSuite

/** LaTeX writer + reader: character escapes, command dispatch, math
  * channel routing, comment stripping, paragraph structure,
  * hand-written real-world LaTeX as the second implementation, loud
  * refusals on unknown commands/environments and unterminated forms.
  */
class LatexSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("escapeTex round-trips every special through the reader") {
    val words = Vector("pct%amp&", "un_der#hash", "dol$lar", "br{ace}s",
      "back\\slash", "til~de", "car^et")
    val tex = Latex.render(words, None)
    val doc = Latex.extract(tex)
    assert(doc.textLines == Vector(words.mkString(" ")))
  }

  test("render → extract: text, math channel, and footnotes line up") {
    // 21 words → 3 paragraphs (section, itemize, Large group);
    // math at j%9==4 → j=4,13; footnotes at j%10==6 → j=6,16
    val words = (0 until 21).map(i => s"w$i")
    val tex = Latex.render(words, Some("E = m c^2"))
    val doc = Latex.extract(tex)
    assert(doc.textLines.size == 3)
    assert(doc.textLines(0) == (0 until 10).map(i => s"w$i").mkString(" "))
    assert(doc.textLines(1) == (10 until 20).map(i => s"w$i").mkString(" "))
    assert(doc.textLines(2) == "w20")
    assert(doc.mathBlocks == Vector("x_{4}+1", "x_{13}+1", "E = m c^2"))
    assert(doc.nFootnotes == 2)
  }

  test("hand-written LaTeX (second implementation) extracts exactly") {
    // "\u" is a scanner-level unicode escape even in triple quotes —
    // splice the usepackage backslash in after the fact
    val tex =
      """\documentclass[11pt]{article}
        |@BS@usepackage{amsmath}
        |% referees: ignore the macros
        |\begin{document}
        |
        |\section{Introduction}
        |
        |We study \textbf{large} corpora\footnote{crawled in 2024} and
        |their \emph{quality}~signals.\cite{smith2001}
        |
        |% a comment-only paragraph contributes nothing
        |
        |\begin{equation}
        |  y = a x + b
        |\end{equation}
        |
        |\begin{itemize}\item First point about $O(n)$ cost.\end{itemize}
        |
        |{\Large Closing remarks} with a literal 100\% and A\_B.
        |
        |\end{document}
        |""".stripMargin.replace("@BS@", "\\")
    val doc = Latex.extract(tex)
    assert(doc.textLines == Vector(
      "Introduction",
      "We study large corpora and their quality signals.",
      "First point about  cost.",
      "Closing remarks with a literal 100% and A_B."))
    assert(doc.mathBlocks == Vector("y = a x + b", "O(n)"))
    assert(doc.nFootnotes == 1)
  }

  test("preamble is dropped even when it carries prose-looking text") {
    val tex = "\\documentclass{article}\n\n" +
      "\\begin{document}\n\nbody text\n\n\\end{document}\n"
    assert(Latex.extract(tex).textLines == Vector("body text"))
    // no \begin{document}: the whole input is body
    assert(Latex.extract("plain fragment").textLines ==
      Vector("plain fragment"))
  }

  test("multi-line paragraphs join with spaces (the TeX newline rule)") {
    val doc = Latex.extract("first line\nsecond line\n\nnext par")
    assert(doc.textLines == Vector("first line second line", "next par"))
  }

  test("structure-only paragraphs contribute no text line") {
    val doc = Latex.extract(
      "\\begin{equation}e\\end{equation}\n\n$m$\n\nreal text")
    assert(doc.textLines == Vector("real text"))
    assert(doc.mathBlocks == Vector("e", "m"))
  }

  test("unknown commands and environments refuse loudly") {
    intercept[IllegalArgumentException] {
      Latex.extract("a \\unknowncmd{x} b")
    }
    intercept[IllegalArgumentException] {
      Latex.extract("\\begin{tabular}x\\end{tabular}")
    }
    intercept[IllegalArgumentException] { Latex.extract("open $math") }
    intercept[IllegalArgumentException] { Latex.extract("\\footnote{open") }
    intercept[IllegalArgumentException] {
      Latex.extract("\\begin{equation}open")
    }
  }

  test("asLatexDocs → extractTexts: distributed layout rule end to end") {
    val docs = Seq(
      (3L, (0 until 12).map(i => s"t$i").mkString(" ")),
      (4L, "solo")).toDF("doc_id", "text")
    val out = Latex.extractTexts(Latex.asLatexDocs(docs))
      .collect().sortBy(_.doc_id)
    assert(out(0).n_lines == 2 && out(1).n_lines == 1)
    assert(out(0).n_math == 2 && out(1).n_math == 0) // j=4 inline + equation
    assert(out(0).n_footnotes == 1) // j=6
    assert(out(0).text ==
      (0 until 10).map(i => s"t$i").mkString(" ") + "\nt10 t11")
    assert(out(0).math == "x_{4}+1\nE = m c^2")
    assert(out(1).math == "")
  }
}
