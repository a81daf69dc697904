package graft

import graft.operators.Corpus
import org.scalatest.funsuite.AnyFunSuite

class RepetitionSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def signalsOf(text: String): Corpus.RepetitionSignals = {
    import spark.implicits._
    Corpus.repetitionSignals(Seq((1L, text)).toDF("doc_id", "text"))
      .collect().head
  }

  test("duplicate-line stats count repeats beyond the first occurrence") {
    val s = signalsOf("aa bb\ncc\naa bb\naa bb\ndd")
    assert(s.total_lines == 5 && s.dup_lines == 2)
    assert(s.total_line_chars == 5 * 2 + 2 + 5 + 2) // 5+2+5+5+2 = 19
    assert(s.dup_line_chars == 10) // two extra "aa bb" copies
  }

  test("top bigram count and bigram total") {
    // bigrams: "a b" x3, "b a" x2, "b c" — top 3 of 6
    val s = signalsOf("a b a b a b c")
    assert(s.top_bigram_count == 3 && s.n_bigrams == 6)
  }

  test("max token run catches back-to-back repetition") {
    assert(signalsOf("x x x y x").max_token_run == 3)
    assert(signalsOf("a b c").max_token_run == 1)
    assert(signalsOf("").max_token_run == 0)
  }

  test("empty and single-token documents produce zero-safe signals") {
    val e = signalsOf("")
    assert(e.total_lines == 1 && e.dup_lines == 0 && e.n_bigrams == 0)
    val one = signalsOf("solo")
    assert(one.n_bigrams == 0 && one.top_bigram_count == 0 &&
      one.max_token_run == 1)
  }

  test("whitespace tokenization matches TextFunctions.tokens (newlines split)") {
    val s = signalsOf("a\nb  c\n\na")
    // tokens a b c a → 3 bigrams, all distinct; 4 lines, one dup ("" is
    // NOT a dup of anything here — lines are "a", "b  c", "", "a")
    assert(s.n_bigrams == 3 && s.top_bigram_count == 1)
    assert(s.total_lines == 4 && s.dup_lines == 1)
  }

  test("the tagger is one narrow pass — no Exchange in the plan") {
    import spark.implicits._
    val docs = Seq((1L, "a b"), (2L, "c d")).toDF("doc_id", "text")
    val plan = Corpus.repetitionSignals(docs).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
  }
}
