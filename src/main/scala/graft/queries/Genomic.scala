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
  private val codonCaseSql: String =
    "CASE substr(dna, CAST(i AS INTEGER), 3) " +
      Dna.codonTable.toSeq.sorted.map { case (c, a) => s"WHEN '$c' THEN '$a'" }.mkString(" ") +
      " ELSE 'X' END"

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

    // X6: mean of raw ASCII bytes (quality-score analog) via aggregate HOF.
    "q22_avg_ascii" -> { (s, d) =>
      Tables.documents(s, d)
        .filter(length(col("text")) > 0)
        .select(col("doc_id"), round(F.avgQualityCol(col("text")), 4).as("avg_q"))
    },

    // X7: low-quality-count analog — chars below 'f' (code 102).
    "q23_low_char_count" -> { (s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"),
          F.lowQualityCountCol(col("text"), 102).as("n_low"))
    },

    // X2: codon translation of the DNA-subset of each document.
    "q24_translate_dna" -> { (s, d) =>
      dnaDocs(s, d)
        .filter(length(col("dna")) >= 3)
        .select(col("doc_id"),
          udf((x: String) => Dna.translateDna(x)).apply(col("dna")).as("protein"))
    },

    // X3/X4: six-frame ORF scan (generator → explode). Rows-only oracle:
    // the codon-state machine is validated by DnaSpec fixtures instead.
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
    "q20_revcomp" ->
      """SELECT doc_id, reverse(translate(text, 'ACGTacgt', 'TGCAtgca')) AS rc
         FROM documents""",
    "q21_kmer_band" ->
      """WITH ex AS (SELECT text, unnest(generate_series(1, length(text)-4)) AS i
                     FROM documents WHERE length(text) >= 5)
         SELECT substr(text, CAST(i AS INTEGER), 5) AS kmer, count(*) AS cnt
         FROM ex GROUP BY 1 HAVING count(*) > 5 AND count(*) < 500""",
    "q22_avg_ascii" ->
      """SELECT doc_id,
         round(CAST(list_sum(list_transform(split(text, ''), c -> ascii(c))) AS DOUBLE)
               / length(text), 4) AS avg_q
         FROM documents WHERE length(text) > 0""",
    "q23_low_char_count" ->
      """SELECT doc_id,
         CAST(list_sum(list_transform(split(text, ''), c -> CASE WHEN ascii(c) < 102 THEN 1 ELSE 0 END)) AS INTEGER) AS n_low
         FROM documents""",
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
