package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multi-pattern blocklist scanning — the content-filter stage of a
  * training-data pipeline (banned-term lists, PII keyword sweeps,
  * license-string detection) at the scale where it matters: ONE
  * Aho-Corasick automaton pass per document instead of K per-pattern
  * scans. At K = 10⁵ blocklist entries a per-pattern `rlike` chain is
  * 10⁵ regex traversals per document — the automaton is exactly one,
  * independent of K (the property that makes the stage feasible at
  * 100 TB; BASELINE.md web probe measures the gap at K = 6 already).
  *
  * The automaton is built ONCE on the driver (the blocklist is a
  * bounded artifact — the engine-wide bounded-collect contract, like
  * the PQ codebooks and k-means centroids) and broadcast; the scan is a
  * narrow mapPartitions pass (the minhash-signature precedent: JIT-
  * compiled Scala beats interpreted HOFs for stateful per-char loops).
  */
object Blocklist {

  /** Classic Aho-Corasick: trie + BFS failure links, with each node's
    * output list pre-merged with its failure chain's at build time so
    * the scan never walks fail links for output collection.
    * Deterministic: structure depends only on the pattern sequence.
    */
  final class Automaton private[Blocklist] (
      val patterns: Array[String],
      gotoMap: Array[scala.collection.immutable.Map[Char, Int]],
      fail: Array[Int],
      outputs: Array[Array[Int]]) extends Serializable {

    /** (total occurrences, distinct patterns matched) over `text` —
      * every occurrence of every pattern counts, including patterns
      * nested inside other patterns' matches.
      */
    def scan(text: String): (Long, Int) = {
      var node = 0
      var hits = 0L
      val seen = new java.util.BitSet(patterns.length)
      var i = 0
      while (i < text.length) {
        val c = text.charAt(i)
        var n = node
        while (n != 0 && !gotoMap(n).contains(c)) n = fail(n)
        node = gotoMap(n).getOrElse(c, 0)
        val out = outputs(node)
        var j = 0
        while (j < out.length) { hits += 1; seen.set(out(j)); j += 1 }
        i += 1
      }
      (hits, seen.cardinality())
    }

    /** Redact every character covered by ANY pattern match: each maximal
      * covered run collapses to a single `marker` char. Union-of-spans
      * semantics — order-independent (no "replace pattern 1 first"
      * ambiguity), nesting-safe (a pattern inside a longer match adds no
      * second marker), and one automaton pass regardless of K. Returns
      * (redacted text, n_runs, n_covered_chars).
      */
    def redact(text: String, marker: Char): (String, Int, Int) = {
      val n = text.length
      val covered = new java.util.BitSet(n)
      var node = 0
      var i = 0
      while (i < n) {
        val c = text.charAt(i)
        var f = node
        while (f != 0 && !gotoMap(f).contains(c)) f = fail(f)
        node = gotoMap(f).getOrElse(c, 0)
        val out = outputs(node)
        var j = 0
        while (j < out.length) {
          covered.set(i - patterns(out(j)).length + 1, i + 1)
          j += 1
        }
        i += 1
      }
      val sb = new java.lang.StringBuilder(n)
      var runs = 0
      var nCov = 0
      var inRun = false
      var k = 0
      while (k < n) {
        if (covered.get(k)) {
          nCov += 1
          if (!inRun) { sb.append(marker); runs += 1; inRun = true }
        } else { sb.append(text.charAt(k)); inRun = false }
        k += 1
      }
      (sb.toString, runs, nCov)
    }
  }

  /** Build the automaton from a bounded pattern list. Empty patterns
    * are rejected (they would match at every position).
    */
  def compile(patterns: Seq[String]): Automaton = {
    require(patterns.nonEmpty && patterns.forall(_.nonEmpty),
      "blocklist patterns must be non-empty strings")
    val pats = patterns.toArray
    val gotoB = scala.collection.mutable.ArrayBuffer(
      scala.collection.mutable.Map.empty[Char, Int])
    val outB = scala.collection.mutable.ArrayBuffer(
      scala.collection.mutable.ArrayBuffer.empty[Int])
    // phase 1: trie
    pats.zipWithIndex.foreach { case (p, pi) =>
      var node = 0
      p.foreach { c =>
        node = gotoB(node).getOrElseUpdate(c, {
          gotoB += scala.collection.mutable.Map.empty[Char, Int]
          outB += scala.collection.mutable.ArrayBuffer.empty[Int]
          gotoB.length - 1
        })
      }
      outB(node) += pi
    }
    // phase 2: BFS failure links + output merging
    val n = gotoB.length
    val fail = new Array[Int](n)
    val queue = scala.collection.mutable.Queue.empty[Int]
    gotoB(0).values.foreach { v => fail(v) = 0; queue += v }
    while (queue.nonEmpty) {
      val u = queue.dequeue()
      gotoB(u).foreach { case (c, v) =>
        var f = fail(u)
        while (f != 0 && !gotoB(f).contains(c)) f = fail(f)
        fail(v) = if (gotoB(f).contains(c) && gotoB(f)(c) != v) gotoB(f)(c) else 0
        outB(v) ++= outB(fail(v))
        queue += v
      }
    }
    new Automaton(pats, gotoB.map(_.toMap).toArray, fail,
      outB.map(_.toArray).toArray)
  }

  /** Per-document blocklist stats: (id, n_hits, n_matched) — total
    * occurrences and distinct patterns present. Narrow zero-shuffle
    * pass over a broadcast automaton; compose with `filter(n_hits ===
    * 0)` to drop flagged documents or keep the counts as features.
    */
  def hits(docs: DataFrame, idCol: String, textCol: String,
           patterns: Seq[String]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val acBc = spark.sparkContext.broadcast(compile(patterns))
    docs.select(col(idCol).cast("long"), col(textCol).cast("string"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val ac = acBc.value
        it.map { case (id, text) =>
          val (h, m) = ac.scan(if (text == null) "" else text)
          (id, h, m)
        }
      }
      .toDF(idCol, "n_hits", "n_matched")
  }

  /** Redaction pass — the PII/banned-term scrub stage: every character
    * covered by any blocklist match is removed, each maximal covered run
    * replaced by one `marker` char. Same narrow broadcast-automaton
    * shape as [[hits]]; output (id, clean_text, n_spans, n_redacted).
    */
  def scrub(docs: DataFrame, idCol: String, textCol: String,
            patterns: Seq[String], marker: Char = '█'): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val acBc = spark.sparkContext.broadcast(compile(patterns))
    docs.select(col(idCol).cast("long"), col(textCol).cast("string"))
      .as[(Long, String)]
      .mapPartitions { it =>
        val ac = acBc.value
        it.map { case (id, text) =>
          val (clean, runs, nCov) = ac.redact(if (text == null) "" else text, marker)
          (id, clean, runs, nCov)
        }
      }
      .toDF(idCol, "clean_text", "n_spans", "n_redacted")
  }
}
