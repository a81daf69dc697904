package graft

import graft.operators.Blocklist
import org.scalatest.funsuite.AnyFunSuite

/** Aho-Corasick blocklist scanner: automaton behavior against a brute
  * sliding-window counter on adversarial inputs (overlaps, nesting,
  * shared prefixes, borders), and the DataFrame wrapper.
  */
class BlocklistSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def brute(text: String, pats: Seq[String]): (Long, Int) = {
    var hits = 0L
    val matched = scala.collection.mutable.Set.empty[Int]
    pats.zipWithIndex.foreach { case (p, pi) =>
      var i = text.indexOf(p)
      while (i >= 0) {
        hits += 1; matched += pi
        i = text.indexOf(p, i + 1) // every occurrence, overlaps included
      }
    }
    (hits, matched.size)
  }

  test("scan equals brute counting on adversarial pattern sets") {
    val cases = Seq(
      (Seq("aa"), "aaaa"),                        // self-overlap: 3 hits
      (Seq("a", "aa", "aaa"), "aaaa"),            // nesting ladder
      (Seq("he", "she", "his", "hers"), "ushers"),// the textbook case
      (Seq("ab", "ba"), "ababab"),                // interleaved overlap
      (Seq("abab", "ab"), "ababab"),              // pattern inside pattern
      (Seq("xyz"), "no match here"),              // zero hits
      (Seq("spark", "join"), "sparkjoin sparks")) // adjacency + suffix
    cases.foreach { case (pats, text) =>
      val ac = Blocklist.compile(pats)
      assert(ac.scan(text) == brute(text, pats), s"$pats on '$text'")
    }
  }

  test("property: random texts over a tiny alphabet match brute force") {
    val rng = new scala.util.Random(11)
    val pats = Seq("ab", "abc", "ca", "aa", "b")
    val ac = Blocklist.compile(pats)
    for (_ <- 0 until 300) {
      val text = Array.fill(5 + rng.nextInt(60))("abc"(rng.nextInt(3))).mkString
      assert(ac.scan(text) == brute(text, pats), text)
    }
  }

  test("hits() DataFrame wrapper: counts per document, null-safe") {
    import spark.implicits._
    val docs = Seq(
      (1L, "spark join spark"), (2L, "nothing"), (3L, null: String))
      .toDF("doc_id", "text")
    val out = Blocklist.hits(docs, "doc_id", "text", Seq("spark", "join"))
      .as[(Long, Long, Int)].collect().sortBy(_._1)
    assert(out.toSeq == Seq((1L, 3L, 2), (2L, 0L, 0), (3L, 0L, 0)))
  }

  private def bruteRedact(text: String, pats: Seq[String], marker: Char): (String, Int, Int) = {
    val covered = Array.fill(text.length)(false)
    pats.foreach { p =>
      var i = text.indexOf(p)
      while (i >= 0) {
        (i until i + p.length).foreach(covered(_) = true)
        i = text.indexOf(p, i + 1)
      }
    }
    val sb = new StringBuilder
    var runs = 0
    var prev = false
    covered.zipWithIndex.foreach { case (cv, i) =>
      if (cv) { if (!prev) { sb += marker; runs += 1 } }
      else sb += text.charAt(i)
      prev = cv
    }
    (sb.toString, runs, covered.count(identity))
  }

  test("redact equals brute union-of-spans on adversarial inputs") {
    val cases = Seq(
      (Seq("aa"), "aaaa"),                         // one merged run
      (Seq("a", "aa", "aaa"), "xaaaax"),           // nesting ladder
      (Seq("he", "she", "his", "hers"), "ushers"), // overlapping chain
      (Seq("ab", "ba"), "ababab"),                 // full coverage
      (Seq("spark", "ark"), "sparks and arks"),    // nested + standalone
      (Seq("xyz"), "untouched text"))              // zero redaction
    cases.foreach { case (pats, text) =>
      val ac = Blocklist.compile(pats)
      assert(ac.redact(text, '#') == bruteRedact(text, pats, '#'),
        s"$pats on '$text'")
    }
  }

  test("property: random redactions match brute force") {
    val rng = new scala.util.Random(7)
    val pats = Seq("ab", "abc", "ca", "aa", "b")
    val ac = Blocklist.compile(pats)
    for (_ <- 0 until 300) {
      val text = Array.fill(5 + rng.nextInt(60))("abc"(rng.nextInt(3))).mkString
      assert(ac.redact(text, '#') == bruteRedact(text, pats, '#'), text)
    }
  }

  test("scrub() DataFrame wrapper redacts per document, null-safe") {
    import spark.implicits._
    val docs = Seq(
      (1L, "keep spark secret join ok"), (2L, "clean"), (3L, null: String))
      .toDF("doc_id", "text")
    val out = Blocklist.scrub(docs, "doc_id", "text", Seq("spark", "join"), '#')
      .as[(Long, String, Int, Int)].collect().sortBy(_._1)
    assert(out.toSeq == Seq(
      (1L, "keep # secret # ok", 2, 9), (2L, "clean", 0, 0), (3L, "", 0, 0)))
  }

  test("compile rejects empty patterns") {
    intercept[IllegalArgumentException](Blocklist.compile(Seq("ok", "")))
    intercept[IllegalArgumentException](Blocklist.compile(Nil))
  }
}
