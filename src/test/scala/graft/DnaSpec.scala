package graft

import graft.functions.Dna
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

class DnaSpec extends AnyFunSuite {

  private def randomDna(rng: Random, maxLen: Int = 60): String =
    Seq.fill(rng.nextInt(maxLen))("ACGT" (rng.nextInt(4))).mkString

  test("revcomp is an involution on DNA strings") {
    val rng = new Random(42)
    for (_ <- 1 to 300) {
      val s = randomDna(rng)
      assert(Dna.reverseComplement(Dna.reverseComplement(s)) == s)
    }
  }

  test("revcomp keeps length and known values") {
    assert(Dna.reverseComplement("") == "")
    assert(Dna.reverseComplement("A") == "T")
    // Regression for the reference's dropped-first-base bug (ORF.scala:36-38):
    // the complement of the FIRST base must appear as the LAST output char.
    assert(Dna.reverseComplement("ACGT") == "ACGT")
    assert(Dna.reverseComplement("AACC") == "GGTT")
    assert(Dna.reverseComplement("ANGT") == "ACNT")
  }

  test("translate known codons and stops") {
    assert(Dna.translateDna("ATG") == "M")
    assert(Dna.translateDna("ATGAAATAG") == "MK*")
    assert(Dna.translateDna("atgaaa") == "MK") // case-insensitive
    assert(Dna.translateDna("AT") == "") // partial codon dropped
    assert(Dna.translateDna("NNN") == "X") // unknown codon
    assert(Dna.codonTable.size == 64)
    assert(Dna.codonTable.values.count(_ == "*") == 3) // TAA TAG TGA
  }

  test("kmers emits exactly len-k+1 substrings (reference off-by-two fixed)") {
    val rng = new Random(7)
    for (_ <- 1 to 300) {
      val s = randomDna(rng)
      val k = 1 + rng.nextInt(8)
      val ks = Dna.kmers(s, k)
      if (s.length < k) assert(ks.isEmpty)
      else {
        assert(ks.size == s.length - k + 1)
        assert(ks.forall(_.length == k))
      }
    }
    assert(Dna.kmers("ACGTA", 3) == Seq("ACG", "CGT", "GTA"))
  }

  test("avgQuality and lowQualityCount over phred strings") {
    assert(Dna.avgQuality("") == 0.0)
    assert(Dna.avgQuality("II") == 'I'.toInt.toDouble)
    assert(Dna.avgQuality("AC") == ('A'.toInt + 'C'.toInt) / 2.0)
    assert(Dna.lowQualityCount("!!II", 'I') == 2) // '!' = 33 < 'I' = 73
    assert(Dna.lowQualityCount("", 100) == 0)
  }

  test("findOrfs: hand-computed single-frame case") {
    // codons: ATG AAA TAG -> ORF M K * (3 aa), then no second start
    val orfs = Dna.findOrfs("c1", "ATGAAATAG", "+", 1, 2)
    assert(orfs.size == 1)
    val o = orfs.head
    assert(o.start == 1 && o.end == 9)
    assert(o.protein == "MK*")
    assert(o.dna == "ATGAAATAG")
  }

  test("findOrfs: minLen filters short ORFs") {
    assert(Dna.findOrfs("c", "ATGTAG", "+", 1, 3).isEmpty) // only 2 aa
    assert(Dna.findOrfs("c", "ATGTAG", "+", 1, 2).size == 1)
  }

  test("findOrfs: no stop codon means no ORF") {
    assert(Dna.findOrfs("c", "ATGAAAAAA", "+", 1, 1).isEmpty)
  }

  test("findOrfs: non-overlap rule — next ORF starts after previous stop") {
    // ATG AAA TAA ATG CCC TAA: two back-to-back ORFs
    val orfs = Dna.findOrfs("c", "ATGAAATAAATGCCCTAA", "+", 1, 2)
    assert(orfs.size == 2)
    assert(orfs.map(_.protein) == Seq("MK*", "MP*"))
    assert(orfs(1).start == 10)
  }

  test("findOrfs: alternative start codons TTG/GTG/CTG open ORFs") {
    for (start <- Seq("TTG", "GTG", "CTG")) {
      val orfs = Dna.findOrfs("c", start + "AAATAG", "+", 1, 2)
      assert(orfs.size == 1, s"start codon $start")
    }
  }

  test("sixFrameOrfs finds reverse-strand ORFs") {
    val fwd = "ATGAAATAG"
    val seq = Dna.reverseComplement(fwd) // ORF lives on the reverse strand
    val orfs = Dna.sixFrameOrfs("c", seq, 2)
    assert(orfs.exists(o => o.strand == "-" && o.protein == "MK*"))
  }

  test("codonCounts histogram") {
    val m = Dna.codonCounts("ATGATGAAA")
    assert(m == Map("ATG" -> 2, "AAA" -> 1))
    assert(Dna.codonCounts("AT") == Map.empty)
  }
}
