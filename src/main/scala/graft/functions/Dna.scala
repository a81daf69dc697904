package graft.functions

import graft.model.Orf

/** Pure-Scala genomic scalar functions (SURVEY.md §2.9, X1-X8).
  *
  * Core logic is Spark-free so it unit-tests without a session; Column
  * builders and UDF registration live in [[DnaFunctions]]. Reference
  * quirks (SURVEY.md §7.4 item 3) are FIXED here, not replicated:
  *  - revcomp keeps the first base (reference `ORF.scala:36-38` drops it);
  *  - kmers emits all `len-k+1` k-mers (reference `NormalizeRDD.java:78`
  *    drops the last two).
  */
object Dna {

  /** X1: complement map; non-ACGT (incl. N) map to themselves. */
  @inline private def comp(c: Char): Char = c match {
    case 'A' => 'T'; case 'T' => 'A'; case 'C' => 'G'; case 'G' => 'C'
    case 'a' => 't'; case 't' => 'a'; case 'c' => 'g'; case 'g' => 'c'
    case other => other
  }

  /** X1: reverse complement (reference `ORF.scala:11-40`, off-by-one fixed). */
  def reverseComplement(s: String): String = {
    val n = s.length
    val out = new Array[Char](n)
    var i = 0
    while (i < n) { out(n - 1 - i) = comp(s.charAt(i)); i += 1 }
    new String(out)
  }

  /** X2: the standard 64-codon → amino-acid table (reference
    * `ORF.scala:58-75`); '*' marks stops.
    */
  val codonTable: Map[String, String] = Map(
    "TTT" -> "F", "TTC" -> "F", "TTA" -> "L", "TTG" -> "L",
    "CTT" -> "L", "CTC" -> "L", "CTA" -> "L", "CTG" -> "L",
    "ATT" -> "I", "ATC" -> "I", "ATA" -> "I", "ATG" -> "M",
    "GTT" -> "V", "GTC" -> "V", "GTA" -> "V", "GTG" -> "V",
    "TCT" -> "S", "TCC" -> "S", "TCA" -> "S", "TCG" -> "S",
    "CCT" -> "P", "CCC" -> "P", "CCA" -> "P", "CCG" -> "P",
    "ACT" -> "T", "ACC" -> "T", "ACA" -> "T", "ACG" -> "T",
    "GCT" -> "A", "GCC" -> "A", "GCA" -> "A", "GCG" -> "A",
    "TAT" -> "Y", "TAC" -> "Y", "TAA" -> "*", "TAG" -> "*",
    "CAT" -> "H", "CAC" -> "H", "CAA" -> "Q", "CAG" -> "Q",
    "AAT" -> "N", "AAC" -> "N", "AAA" -> "K", "AAG" -> "K",
    "GAT" -> "D", "GAC" -> "D", "GAA" -> "E", "GAG" -> "E",
    "TGT" -> "C", "TGC" -> "C", "TGA" -> "*", "TGG" -> "W",
    "CGT" -> "R", "CGC" -> "R", "CGA" -> "R", "CGG" -> "R",
    "AGT" -> "S", "AGC" -> "S", "AGA" -> "R", "AGG" -> "R",
    "GGT" -> "G", "GGC" -> "G", "GGA" -> "G", "GGG" -> "G")

  /** X2: translate DNA codon-by-codon; unknown codons → 'X'; trailing
    * partial codon dropped.
    */
  def translateDna(dna: String): String = {
    val s = dna.toUpperCase
    val sb = new StringBuilder(s.length / 3)
    var i = 0
    while (i + 3 <= s.length) {
      sb.append(codonTable.getOrElse(s.substring(i, i + 3), "X"))
      i += 3
    }
    sb.toString
  }

  /** X5: all k-length substrings (len-k+1 of them). */
  def kmers(s: String, k: Int): Seq[String] =
    if (s.length < k) Seq.empty
    else (0 to s.length - k).map(i => s.substring(i, i + k))

  /** X6: mean of raw quality bytes (reference does integer division of
    * ASCII sums, FastqFilter.java:174-184; we return the exact double and
    * leave truncation to the caller's predicate).
    */
  def avgQuality(q: String): Double =
    if (q.isEmpty) 0.0
    else {
      var s = 0L; var i = 0
      while (i < q.length) { s += q.charAt(i).toLong; i += 1 }
      s.toDouble / q.length
    }

  /** X7: count of quality bytes strictly below the threshold. */
  def lowQualityCount(q: String, threshold: Int): Int = {
    var n = 0; var i = 0
    while (i < q.length) { if (q.charAt(i) < threshold) n += 1; i += 1 }
    n
  }

  private val StartCodons = Set("ATG", "TTG", "GTG", "CTG")

  /** X3: ORFs in one frame of one strand (reference `ORF.scala:43-123`).
    *
    * Scans codon-by-codon: an ORF opens at the first start codon
    * (ATG/TTG/GTG/CTG) at or after the previous ORF's end (the
    * reference's non-overlap rule `start > tmp_end`), closes at the next
    * stop codon, and is emitted when the protein (incl. stop) is at least
    * `minLen` amino acids. Runs without a stop codon are discarded.
    * Positions are 1-based codon-aligned offsets on `seq`.
    */
  def findOrfs(contigId: String, seq: String, strand: String, frame: Int,
               minLen: Int): Seq[Orf] = {
    val s = seq.toUpperCase
    val out = Vector.newBuilder[Orf]
    var orfStart = -1 // codon index where current ORF opened
    var lastEnd = -1 // codon index of previous ORF's stop (non-overlap rule)
    var ci = 0
    val nCodons = s.length / 3
    while (ci < nCodons) {
      val codon = s.substring(ci * 3, ci * 3 + 3)
      val aa = codonTable.getOrElse(codon, "X")
      if (orfStart < 0) {
        if (StartCodons.contains(codon) && ci > lastEnd) orfStart = ci
      } else if (aa == "*") {
        val nAa = ci - orfStart + 1
        if (nAa >= minLen) {
          val dna = s.substring(orfStart * 3, (ci + 1) * 3)
          out += Orf(contigId, strand, frame,
            start = orfStart * 3 + 1, end = (ci + 1) * 3,
            dna = dna, protein = translateDna(dna))
        }
        lastEnd = ci
        orfStart = -1
      }
      ci += 1
    }
    out.result()
  }

  /** X4: six-frame ORF scan — frames +1/+2/+3 on the forward strand and
    * 1/2/3 on the reverse complement (reference `ORF.scala:125-165`).
    */
  def sixFrameOrfs(contigId: String, seq: String, minLen: Int): Seq[Orf] = {
    val rc = reverseComplement(seq)
    (1 to 3).flatMap { f =>
      findOrfs(contigId, seq.substring(f - 1), "+", f, minLen) ++
        findOrfs(contigId, rc.substring(f - 1), "-", f, minLen)
    }
  }

  /** A6/X8: 64-slot codon histogram over non-overlapping codons. */
  def codonCounts(dna: String): Map[String, Int] = {
    val s = dna.toUpperCase
    var i = 0
    val m = scala.collection.mutable.Map.empty[String, Int]
    while (i + 3 <= s.length) {
      val c = s.substring(i, i + 3)
      if (codonTable.contains(c)) m.update(c, m.getOrElse(c, 0) + 1)
      i += 3
    }
    m.toMap
  }
}
