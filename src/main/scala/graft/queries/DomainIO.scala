package graft.queries

import graft.Tables
import graft.io.{BlastTsv, Fasta, Fastq, SamText}
import graft.operators.Pipeline
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Domain-format IO, verified by ROUND-TRIP: deterministic FASTQ/FASTA/
  * SAM/BLAST-TSV content is generated from the harness tables, written
  * with our sinks, read back with our sources, and the parsed result is
  * hash-compared against a DuckDB oracle that reconstructs the same
  * records straight from the parquet — so the writer, the reader, and
  * the header/field parsers are all under oracle test (SURVEY.md S1-S4,
  * K1-K4, T3, F5, J1+F10).
  */
object DomainIO {

  private def tmp(d: String, name: String): String =
    s"/tmp/graft_io/${new java.io.File(d).getName}/$name"

  // digits → bases/quality (cross-engine: translate() in both).
  private def dnaOf(c: org.apache.spark.sql.Column) =
    translate(c.cast("string"), "0123456789", "ACGTACGTAC")
  private def qualOf(c: org.apache.spark.sql.Column) =
    translate(c.cast("string"), "0123456789", "IJKLMNOPQH")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // S1+K1+T1: FASTQ write → read → Illumina-header projection.
    "q50_fastq_roundtrip" -> { (s, d) =>
      val li = Tables.lineitem(s, d)
      val mate = when(col("l_linenumber") % 2 === 1, 1).otherwise(2)
      val fq = li.select(
        concat_ws("",
          lit("M01:"), col("l_orderkey"), lit(":FC1:2:1101:"),
          col("l_partkey"), lit(":"), col("l_linenumber"),
          lit(" "), mate, lit(":N:0:ACGT")).as("key"),
        dnaOf(col("l_partkey")).as("sequence"),
        qualOf(col("l_partkey")).as("quality"))
      val dir = tmp(d, "fastq")
      Fastq.write(fq, dir)
      Fastq.read(s, dir)
    },

    // S3+K4+F11: FASTA write (wrapped at 10 chars — multi-line bodies)
    // → delimiter-safe read → (id, sequence).
    "q51_fasta_roundtrip" -> { (s, d) =>
      val p = Tables.part(s, d)
      val contigs = p.select(
        concat_ws("", lit("P"), col("p_partkey")).as("id"),
        translate(regexp_replace(upper(col("p_name")), "[^A-Z]", ""),
          "ABCDEFGHIJKLMNOPQRSTUVWXYZ",
          "ACGTACGTACGTACGTACGTACGTAC").as("sequence"))
      val dir = tmp(d, "fasta")
      Fasta.write(contigs, dir, wrap = 10)
      Fasta.read(s, dir).select("id", "sequence")
    },

    // S2+K5+F5: SAM write → read → flag-77/141 both-unmapped filter
    // (AlignInterleaved.java:104-139).
    "q52_sam_flag_filter" -> { (s, d) =>
      val o = Tables.orders(s, d)
      val sam = o.select(
        concat_ws("", lit("r"), col("o_orderkey")).as("readName"),
        when(col("o_orderstatus") === "F", 77)
          .when(col("o_orderstatus") === "O", 141)
          .otherwise(4).as("flag"),
        lit("*").as("referenceName"),
        lit(0).as("start"),
        lit(0).as("mapq"),
        lit("*").as("cigar"),
        dnaOf(col("o_orderkey")).as("bases"),
        qualOf(col("o_orderkey")).as("quality"))
      val dir = tmp(d, "sam")
      SamText.write(sam, dir)
      SamText.read(s, dir)
        .filter(col("flag").isin(77, 141))
        .select(col("readName"), col("flag"), col("readUnmapped"),
          col("firstOfPair"), col("secondOfPair"))
    },

    // S4+K3+J1+F10: BLAST TSV write → schema read → BlastNFilter
    // (left-outer join + pident/overlap threshold, no-hit contigs kept).
    "q53_blast_filter" -> { (s, d) =>
      val p = Tables.part(s, d)
      val contigs = p.select(
        concat_ws("", lit("P"), col("p_partkey")).as("id"),
        translate(regexp_replace(upper(col("p_name")), "[^A-Z]", ""),
          "ABCDEFGHIJKLMNOPQRSTUVWXYZ",
          "ACGTACGTACGTACGTACGTACGTAC").as("sequence"))
      val li = Tables.lineitem(s, d)
      val hits = li.select(
        concat_ws("", lit("P"), col("l_partkey")).as("qseqid"),
        concat_ws("", lit("S"), col("l_suppkey")).as("sseqid"),
        (lit(50.0) + (col("l_partkey") % 50).cast("double")).as("pident"),
        lit(10).as("length"), lit(0).as("mismatch"), lit(0).as("gapopen"),
        lit(1L).as("qstart"),
        (col("l_quantity") * 2).cast("long").as("qend"),
        lit(1L).as("sstart"), lit(10L).as("send"),
        lit(0.001).as("evalue"), lit(100.0).as("bitscore"))
      val dir = tmp(d, "blast")
      BlastTsv.write(hits, dir)
      Pipeline.blastThresholdFilter(contigs, BlastTsv.read(s, dir), 70.0)
        .select("id")
    },

    // P1-P4 machinery: stream records through a forked process (identity
    // command) and parse them back — the pipe operator under oracle test.
    "q54_pipe_roundtrip" -> { (s, d) =>
      import s.implicits._
      val lines = Tables.documents(s, d)
        .select(concat_ws("\t", col("doc_id"), md5(col("text"))).as("line"))
        .as[String]
      val piped = graft.pipe.PipeStage(Seq("cat")).run(lines)
      val f = split(col("value"), "\t")
      piped.toDF("value").select(
        f.getItem(0).cast("long").as("doc_id"),
        f.getItem(1).as("text_md5"))
    }
  )

  val oracles: Map[String, String] = Map(
    "q50_fastq_roundtrip" ->
      """SELECT 'M01:' || l_orderkey || ':FC1:2:1101:' || l_partkey || ':' ||
                l_linenumber || ' ' || (CASE WHEN l_linenumber % 2 = 1 THEN 1 ELSE 2 END) ||
                ':N:0:ACGT' AS key,
              translate(CAST(l_partkey AS VARCHAR), '0123456789', 'ACGTACGTAC') AS sequence,
              translate(CAST(l_partkey AS VARCHAR), '0123456789', 'IJKLMNOPQH') AS quality,
              CAST(CASE WHEN l_linenumber % 2 = 1 THEN 1 ELSE 2 END AS INTEGER) AS "read",
              'M01' AS instrument,
              CAST(l_orderkey AS INTEGER) AS "runNumber",
              'FC1' AS "flowcellId",
              CAST(2 AS INTEGER) AS lane,
              CAST(1101 AS INTEGER) AS tile,
              CAST(l_partkey AS INTEGER) AS xpos,
              CAST(l_linenumber AS INTEGER) AS ypos,
              'ACGT' AS "indexSequence",
              TRUE AS "filterPassed"
         FROM lineitem""",
    "q51_fasta_roundtrip" ->
      """SELECT 'P' || p_partkey AS id,
              translate(regexp_replace(upper(p_name), '[^A-Z]', '', 'g'),
                'ABCDEFGHIJKLMNOPQRSTUVWXYZ',
                'ACGTACGTACGTACGTACGTACGTAC') AS sequence
         FROM part""",
    "q52_sam_flag_filter" ->
      """SELECT 'r' || o_orderkey AS "readName",
              CAST(CASE WHEN o_orderstatus = 'F' THEN 77 ELSE 141 END AS INTEGER) AS flag,
              TRUE AS "readUnmapped",
              (o_orderstatus = 'F') AS "firstOfPair",
              (o_orderstatus = 'O') AS "secondOfPair"
         FROM orders WHERE o_orderstatus IN ('F', 'O')""",
    "q53_blast_filter" ->
      """WITH contigs AS (
           SELECT 'P' || p_partkey AS id,
                  translate(regexp_replace(upper(p_name), '[^A-Z]', '', 'g'),
                    'ABCDEFGHIJKLMNOPQRSTUVWXYZ',
                    'ACGTACGTACGTACGTACGTACGTAC') AS sequence
           FROM part),
         hits AS (
           SELECT 'P' || l_partkey AS qseqid,
                  50.0 + CAST(l_partkey % 50 AS DOUBLE) AS pident,
                  CAST(1 AS BIGINT) AS qstart,
                  CAST(l_quantity * 2 AS BIGINT) AS qend
           FROM lineitem)
         SELECT DISTINCT c.id AS id
         FROM contigs c LEFT JOIN hits h ON c.id = h.qseqid
         WHERE h.qseqid IS NULL
            OR (h.pident > 70.0 AND
                CAST(h.qend - h.qstart + 1 AS DOUBLE) / length(c.sequence) * 100.0 > 70.0)""",
    "q54_pipe_roundtrip" ->
      "SELECT doc_id, md5(text) AS text_md5 FROM documents"
  )
}
