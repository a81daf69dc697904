package graft.queries

import graft.Tables
import graft.functions.{Dna, DnaFunctions => F}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Genomic scalar/generator functions (SURVEY.md §2.9) exercised over the
  * harness `documents` table, treating `text` as a pseudo-sequence (and
  * its ACGT-subset as DNA). Every SQL-expressible function gets a DuckDB
  * oracle; the ORF generator is rows-only (checked by fixture unit tests).
  *
  * Scale: all of these are narrow per-row transforms (no shuffle) except
  * the k-mer/codon counts, which are explode → partial-agg → tiny final
  * agg — the explode multiplies rows ~text-length×, but map-side combine
  * collapses them to distinct-kmer cardinality before the exchange.
  */
object Genomic {

  /** Shared "DNA view" of documents: the ACGT-subset of the text. */
  private def dnaDocs(s: SparkSession, d: String) =
    Tables.documents(s, d)
      .select(col("doc_id"),
        upper(regexp_replace(col("text"), "[^acgt]", "")).as("dna"))

  private val dnaSql =
    "SELECT doc_id, upper(regexp_replace(text, '[^acgt]', '', 'g')) AS dna FROM documents"

  /** 64-branch CASE translating one codon — generated from the same
    * codon table the Scala implementation uses, so the oracle and the
    * engine share a single source of truth.
    */
  private def codonCase(expr: String): String =
    s"CASE $expr " +
      Dna.codonTable.toSeq.sorted.map { case (c, a) => s"WHEN '$c' THEN '$a'" }.mkString(" ") +
      " ELSE 'X' END"

  private val codonCaseSql: String = codonCase("substr(dna, CAST(i AS INTEGER), 3)")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // X1: reverse complement via codegen'd built-ins (translate+reverse).
    "q20_revcomp" -> { (s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"), F.revComp(col("text")).as("rc"))
    },

    // X5+A1+F8: k-mer counting with a coverage-band filter (the
    // NormalizeRDD histogram, NormalizeRDD.java:64-94).
    "q21_kmer_band" -> { (s, d) =>
      Tables.documents(s, d)
        .repartition(s.sparkContext.defaultParallelism) // 1-file table → explode in parallel
        .filter(length(col("text")) >= 5)
        .select(F.kmersExploded(s, col("text"), 5).as("kmer"))
        .groupBy("kmer").agg(count(lit(1)).as("cnt"))
        .filter(col("cnt") > 5 && col("cnt") < 500)
    },

    // X6: mean code point (quality-score analog) via aggregate HOF. The
    // fixture corpus is pure ASCII, so both engines PLANT a non-ASCII
    // tail (2- and 3-byte UTF-8 chars) — code-point parity under
    // multi-byte input is verified, not assumed.
    "q22_avg_ascii" -> { (s, d) =>
      Tables.documents(s, d)
        .filter(length(col("text")) > 0)
        .select(col("doc_id"),
          concat(col("text"), lit(" é☃€"),
            (col("doc_id") % 10).cast("string")).as("text"))
        .select(col("doc_id"), round(F.avgQualityCol(col("text")), 4).as("avg_q"))
    },

    // X7: low-quality-count analog — chars below 'f' (code 102). Same
    // planted non-ASCII tail as q22: multi-byte chars sit above any
    // sane ASCII threshold and must count 0 in both engines.
    "q23_low_char_count" -> { (s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"),
          concat(col("text"), lit(" é☃€"),
            (col("doc_id") % 10).cast("string")).as("text"))
        .select(col("doc_id"),
          F.lowQualityCountCol(col("text"), 102).as("n_low"))
    },

    // X2: codon translation via the native codegen expression (the Scala
    // UDF form costs closure dispatch + row boxing per row and breaks
    // whole-stage codegen; TranslateDnaExpression stays inside it).
    "q24_translate_dna" -> { (s, d) =>
      graft.plans.NativeFunctions.register(s)
      dnaDocs(s, d)
        .filter(length(col("dna")) >= 3)
        .select(col("doc_id"),
          call_function("translate_dna_native", col("dna")).as("protein"))
    },

    // X3/X4: six-frame ORF scan (generator → explode). Oracle: the codon
    // state machine is expressible with window functions — each stop
    // codon closes the ORF opened at the FIRST start codon after the
    // previous stop (the reference's non-overlap rule) — so DuckDB
    // re-derives the same ORFs without a sequential scan. DnaSpec's 12
    // fixtures validate the Scala machine independently.
    "q25_orf_sixframe" -> { (s, d) =>
      val orfs = udf((id: String, seq: String, minLen: Int) =>
        Dna.sixFrameOrfs(id, seq, minLen))
      dnaDocs(s, d)
        .filter(length(col("dna")) >= 6)
        .select(explode(orfs(col("doc_id").cast("string"), col("dna"), lit(2))).as("orf"))
        .select(col("orf.contigId").as("contig_id"), col("orf.strand").as("strand"),
          col("orf.frame").as("frame"), col("orf.start").as("start"),
          col("orf.end").as("end"), col("orf.protein").as("protein"))
    },

    // A6/X8: codon usage histogram over non-overlapping triplets.
    "q26_codon_count" -> { (s, d) =>
      dnaDocs(s, d)
        .filter(length(col("dna")) >= 3)
        .select(explode(F.codonsCol(col("dna"))).as("codon"))
        .groupBy("codon").agg(count(lit(1)).as("cnt"))
    },

    // A6 via the custom typed Aggregator (UDAF surface, §2.12): one
    // corpus-wide 64-slot codon histogram, partial-aggregated map-side,
    // exploded back to rows — must equal the groupBy version (q26's
    // oracle verifies exactly that).
    "q29_codon_udaf" -> { (s, d) =>
      import s.implicits._
      val hist = dnaDocs(s, d)
        .filter(length(col("dna")) >= 3)
        .select(col("dna")).as[String]
        .select(graft.functions.CodonAggregator.toColumn.name("hist"))
      hist.select(explode(col("hist")).as(Seq("codon", "cnt")))
    },

    // Native Catalyst expressions (plans.RevCompExpression codegen +
    // plans.KmerGenerator streaming generator) reached from user SQL via
    // LATERAL VIEW — capability the reference never had (§2.12).
    "q27_native_exprs" -> { (s, d) =>
      graft.plans.NativeFunctions.register(s)
      Tables.documents(s, d).createOrReplaceTempView("documents")
      s.sql(
        """SELECT revcomp_native(kmer) AS rc_kmer, count(*) AS cnt
           FROM documents LATERAL VIEW kmers_native(text, 6) t AS kmer
           GROUP BY 1 HAVING count(*) > 10""")
    },

    // §3.3 digital normalization, made deterministic: keep the MIN doc per
    // band-surviving k-mer (reference keeps an arbitrary first-seen read,
    // NormalizeRDD.java:87-92 — SURVEY.md §7.4 says fix, not replicate).
    "q28_normalize" -> { (s, d) =>
      val docs = Tables.documents(s, d)
      val keepers = docs
        .repartition(s.sparkContext.defaultParallelism)
        .filter(length(col("text")) >= 8)
        .select(col("doc_id"), F.kmersExploded(s, col("text"), 8).as("kmer"))
        .groupBy("kmer")
        .agg(count(lit(1)).as("cnt"), min(col("doc_id")).as("keeper"))
        .filter(col("cnt") > 2 && col("cnt") < 100)
        .select(col("keeper")).distinct()
      keepers.join(docs, keepers("keeper") === docs("doc_id"))
        .select(col("doc_id"), col("n_chars"))
    }
  )

  val oracles: Map[String, String] = Map(
    // X3/X4 as SQL: codons per (doc, strand, frame); stops pair with the
    // first start after the previous stop (lag window); protein re-agged
    // codon-by-codon through the shared 64-branch CASE. minLen = 2,
    // positions 1-based on the frame-shifted sequence — both exactly as
    // Dna.findOrfs computes them.
    "q25_orf_sixframe" ->
      s"""WITH d AS ($dnaSql),
          d2 AS (SELECT doc_id, dna FROM d WHERE length(dna) >= 6),
          strands AS (
            SELECT doc_id, '+' AS strand, dna AS seq FROM d2
            UNION ALL
            SELECT doc_id, '-' AS strand,
                   reverse(translate(dna, 'ACGT', 'TGCA')) AS seq FROM d2),
          frames AS (
            SELECT doc_id, strand, CAST(f AS INTEGER) AS frame,
                   substr(seq, CAST(f AS INTEGER)) AS fseq
            FROM strands, (SELECT unnest([1, 2, 3]) AS f)),
          cod AS (
            SELECT doc_id, strand, frame, fseq,
                   CAST(unnest(generate_series(0, length(fseq) // 3 - 1)) AS INTEGER) AS ci
            FROM frames WHERE length(fseq) >= 3),
          cod2 AS (SELECT doc_id, strand, frame, ci,
                          substr(fseq, ci * 3 + 1, 3) AS codon FROM cod),
          stops AS (
            SELECT doc_id, strand, frame, ci,
                   lag(ci, 1, -1) OVER (PARTITION BY doc_id, strand, frame
                                        ORDER BY ci) AS prev_stop
            FROM cod2 WHERE codon IN ('TAA', 'TAG', 'TGA')),
          starts AS (
            SELECT doc_id, strand, frame, ci AS si FROM cod2
            WHERE codon IN ('ATG', 'TTG', 'GTG', 'CTG')),
          orfs AS (
            SELECT s.doc_id, s.strand, s.frame, min(st.si) AS a, s.ci AS z
            FROM stops s JOIN starts st
              ON st.doc_id = s.doc_id AND st.strand = s.strand
             AND st.frame = s.frame
             AND st.si > s.prev_stop AND st.si < s.ci
            GROUP BY s.doc_id, s.strand, s.frame, s.ci
            HAVING s.ci - min(st.si) + 1 >= 2)
          SELECT CAST(o.doc_id AS VARCHAR) AS contig_id, o.strand, o.frame,
                 CAST(o.a * 3 + 1 AS INTEGER) AS start,
                 CAST((o.z + 1) * 3 AS INTEGER) AS "end",
                 string_agg(${codonCase("c.codon")}, '' ORDER BY c.ci) AS protein
          FROM orfs o JOIN cod2 c
            ON c.doc_id = o.doc_id AND c.strand = o.strand AND c.frame = o.frame
           AND c.ci BETWEEN o.a AND o.z
          GROUP BY o.doc_id, o.strand, o.frame, o.a, o.z""",
    "q20_revcomp" ->
      """SELECT doc_id, reverse(translate(text, 'ACGTacgt', 'TGCAtgca')) AS rc
         FROM documents""",
    "q21_kmer_band" ->
      """WITH ex AS (SELECT text, unnest(generate_series(1, length(text)-4)) AS i
                     FROM documents WHERE length(text) >= 5)
         SELECT substr(text, CAST(i AS INTEGER), 5) AS kmer, count(*) AS cnt
         FROM ex GROUP BY 1 HAVING count(*) > 5 AND count(*) < 500""",
    "q22_avg_ascii" ->
      """WITH t AS (SELECT doc_id, text || ' é☃€' || (doc_id % 10) AS text
                    FROM documents WHERE length(text) > 0)
         SELECT doc_id,
         round(CAST(list_sum(list_transform(split(text, ''), c -> unicode(c))) AS DOUBLE)
               / length(text), 4) AS avg_q
         FROM t""",
    "q23_low_char_count" ->
      """WITH t AS (SELECT doc_id, text || ' é☃€' || (doc_id % 10) AS text FROM documents)
         SELECT doc_id,
         CAST(list_sum(list_transform(split(text, ''), c -> CASE WHEN unicode(c) < 102 THEN 1 ELSE 0 END)) AS INTEGER) AS n_low
         FROM t""",
    "q24_translate_dna" ->
      s"""WITH d AS ($dnaSql),
          ex AS (SELECT doc_id, dna, unnest(generate_series(1, length(dna)-2, 3)) AS i
                 FROM d WHERE length(dna) >= 3)
          SELECT doc_id, string_agg($codonCaseSql, '' ORDER BY i) AS protein
          FROM ex GROUP BY doc_id""",
    "q26_codon_count" ->
      s"""WITH d AS ($dnaSql),
          ex AS (SELECT dna, unnest(generate_series(1, length(dna)-2, 3)) AS i
                 FROM d WHERE length(dna) >= 3)
          SELECT substr(dna, CAST(i AS INTEGER), 3) AS codon, count(*) AS cnt
          FROM ex GROUP BY 1""",
    "q29_codon_udaf" ->
      s"""WITH d AS ($dnaSql),
          ex AS (SELECT dna, unnest(generate_series(1, length(dna)-2, 3)) AS i
                 FROM d WHERE length(dna) >= 3)
          SELECT substr(dna, CAST(i AS INTEGER), 3) AS codon, count(*) AS cnt
          FROM ex GROUP BY 1""",
    "q27_native_exprs" ->
      """WITH ex AS (SELECT text, unnest(generate_series(1, length(text)-5)) AS i
                     FROM documents WHERE length(text) >= 6)
         SELECT reverse(translate(substr(text, CAST(i AS INTEGER), 6),
                  'ACGTacgt', 'TGCAtgca')) AS rc_kmer, count(*) AS cnt
         FROM ex GROUP BY 1 HAVING count(*) > 10""",
    "q28_normalize" ->
      """WITH ex AS (SELECT doc_id, text, unnest(generate_series(1, length(text)-7)) AS i
                     FROM documents WHERE length(text) >= 8),
          km AS (SELECT substr(text, CAST(i AS INTEGER), 8) AS kmer,
                        count(*) AS cnt, min(doc_id) AS keeper
                 FROM ex GROUP BY 1),
          keep AS (SELECT DISTINCT keeper FROM km WHERE cnt > 2 AND cnt < 100)
          SELECT d.doc_id, d.n_chars FROM keep k JOIN documents d ON k.keeper = d.doc_id"""
  )
}
