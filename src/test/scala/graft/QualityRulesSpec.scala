package graft

import graft.operators.Corpus
import org.scalatest.funsuite.AnyFunSuite

class QualityRulesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def gopherOf(text: String): Corpus.GopherSignals = {
    import spark.implicits._
    Corpus.gopherRules(Seq((1L, text)).toDF("doc_id", "text"))
      .collect().head
  }

  private def c4Of(text: String): Corpus.C4Result = {
    import spark.implicits._
    Corpus.c4Clean(Seq((1L, text)).toDF("doc_id", "text"))
      .collect().head
  }

  // a 60-word all-pass document: mean word length 4, stopwords present
  private val healthy: String =
    (Seq.fill(29)("word green") ++ Seq("the with")).flatMap(_.split(" "))
      .mkString(" ")

  test("gopher: the healthy fixture passes every rule") {
    val g = gopherOf(healthy)
    assert(g.n_words == 60 && g.stop_hits == 2 && g.pass,
      s"expected all-pass, got $g")
  }

  test("gopher: word-count bounds gate at 50 and 100000") {
    val short = gopherOf(Seq.fill(49)("word").mkString(" "))
    assert(!short.r_word_count)
    assert(gopherOf(healthy).r_word_count)
  }

  test("gopher: symbol hits count '#' chars and NON-overlapping '...'") {
    // "...." = one non-overlapping '...' (greedy left-to-right), '#' x2
    val g = gopherOf("a #b# ....")
    assert(g.n_symbol_hits == 3, s"got ${g.n_symbol_hits}")
    // 60 words, 7 hits -> 10*7 > 60 fails; 6 hits -> exactly 0.1 passes
    assert(!gopherOf(healthy + " # # # # # # #").r_symbol_ratio)
    assert(gopherOf(healthy + " #exact #ratio #six #hash #marks #here")
      .r_symbol_ratio)
  }

  test("gopher: bullet and ellipsis line fractions use exact tenths") {
    // 10 lines, 9 bullets: 10*9 <= 9*10 passes; 10 bullets fails
    val nine = (Seq.fill(9)("• b") :+ "plain").mkString("\n")
    assert(gopherOf(nine).r_bullet_lines)
    assert(!gopherOf(Seq.fill(10)("- b").mkString("\n")).r_bullet_lines)
    // ellipsis: 3 of 10 passes, 4 of 10 fails; '…' counts too
    val three = (Seq.fill(3)("x…") ++ Seq.fill(7)("x")).mkString("\n")
    assert(gopherOf(three).r_ellipsis_lines)
    val four = (Seq.fill(4)("x...") ++ Seq.fill(6)("x")).mkString("\n")
    assert(!gopherOf(four).r_ellipsis_lines)
  }

  test("gopher: alpha-word ratio at the 80% boundary") {
    assert(gopherOf("a b c d 5").r_alpha_words) // 4 of 5 = exactly 0.8
    assert(!gopherOf("a b c 4 5").r_alpha_words) // 3 of 5
    assert(gopherOf("x1 2y").n_alpha_words == 2) // digit-mixed still alpha
  }

  test("gopher: stopword rule needs 2 DISTINCT members, case-folded") {
    assert(gopherOf("THE the the word").stop_hits == 1)
    assert(!gopherOf("the the the word").r_stopwords)
    assert(gopherOf("The with word").r_stopwords)
  }

  test("gopher: empty document is zero-safe and fails word count only by bounds") {
    val g = gopherOf("")
    assert(g.n_words == 0 && g.n_lines == 1 && !g.r_word_count && !g.pass)
  }

  test("c4: line gate needs terminal punctuation, 3 words, no javascript") {
    val r = c4Of(Seq(
      "no punctuation here",           // dropped: no terminal punct
      "Too short.",                    // dropped: 2 words
      "This line stays here.",         // kept
      "Uses javascript so dropped.",   // dropped: javascript
      "Quoted line also stays here!\"" // kept: ends with quote
    ).mkString("\n"))
    assert(r.n_lines_kept == 2, s"got $r")
    assert(r.text == "This line stays here.\nQuoted line also stays here!\"")
  }

  test("c4: page verdict needs 5 sentence marks in the RETAINED text") {
    val four = c4Of("One two three. Four five six! Seven eight nine? Ten eleven twelve.")
    assert(four.n_sentences == 4 && !four.kept)
    val five = c4Of(
      "One two three. Four five six! Seven eight nine? Ten eleven. Twelve more words.")
    assert(five.n_sentences == 5 && five.kept)
  }

  test("c4: curly brace and lorem ipsum kill the page even when lines survive") {
    val base = "A. B. C. D. E. padded with words here."
    assert(c4Of(base + " extra words okay.").kept)
    assert(!c4Of(base + " has { brace } inside.").kept)
    assert(!c4Of(base + " and Lorem Ipsum filler.").kept)
  }

  test("charSignals: script counts by code point, entropy, empty-doc null") {
    import spark.implicits._
    val docs = Seq(
      (1L, "ab привет 你好 مر"),
      (2L, "aab"),
      (3L, ""),
      (4L, "𝐀b") // astral MATHEMATICAL BOLD A: 1 code point
    ).toDF("doc_id", "text")
    val got = Corpus.charSignals(docs).collect().map(s => s.doc_id -> s).toMap
    val m = got(1L)
    assert((m.n_latin, m.n_cyrillic, m.n_han, m.n_arabic) ===
      ((2L, 6L, 2L, 2L)), s"got $m")
    assert(m.n_chars === 15) // 12 letters + 3 spaces
    // entropy of "aab" = 0.918295... (two symbols, 2/3 + 1/3)
    val e = got(2L).entropy_bits.get
    assert(math.abs(e - 0.9182958340544896) < 1e-12, s"got $e")
    assert(got(3L).entropy_bits.isEmpty && got(3L).n_chars === 0)
    // astral char is ONE code point (UTF-16 pair), script non-Latin?
    // MATHEMATICAL BOLD CAPITAL A is script=Common: counts in n_chars
    // and the histogram, not in the Latin bucket
    assert(got(4L).n_chars === 2 && got(4L).n_distinct === 2)
  }

  test("c4: sentence marks in DROPPED lines do not count") {
    // the only punct-rich line is a javascript line -> dropped
    val r = c4Of("A. B. C. D. E. but javascript kills this line.\nplain line")
    assert(r.n_lines_kept == 0 && r.n_sentences == 0 && !r.kept)
  }
}
