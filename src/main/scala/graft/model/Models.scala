package graft.model

/** Typed data model for the genomic domain (SURVEY.md §1).
  *
  * Case classes + `Encoders.product` replace the reference's JavaBean
  * reflection schemas (MyRead.java:12-28, MyAlignment.java:12-19,
  * BlastRecord.java:14-25). Boxed `Option[_]` fields mirror the
  * reference's nullable boxed Integer/Boolean columns.
  */

/** FASTQ read (reference `MyRead.java:10-28`; fields populated at
  * SQLQueryFastq.java:71-89 from the Illumina header).
  */
final case class Read(
    key: String,
    sequence: String,
    quality: String,
    read: Option[Int],
    instrument: Option[String],
    runNumber: Option[Int],
    flowcellId: Option[String],
    lane: Option[Int],
    tile: Option[Int],
    xpos: Option[Int],
    ypos: Option[Int],
    indexSequence: Option[String],
    filterPassed: Option[Boolean])

/** SAM alignment record (reference `MyAlignment.java:10-19`). */
final case class Alignment(
    readName: String,
    start: Option[Int],
    referenceName: String,
    length: Option[Int],
    bases: String,
    cigar: String,
    flag: Int,
    readUnmapped: Boolean,
    duplicateRead: Boolean)

/** FASTA sequence / contig (SURVEY.md §1.1 row 3). */
final case class Contig(id: String, sequence: String)

/** BLAST tabular hit, outfmt 6 (reference `BlastRecord.java:12-25`). */
final case class BlastHit(
    qseqid: String,
    sseqid: String,
    pident: Option[Double],
    length: Option[Int],
    mismatch: Option[Int],
    gapopen: Option[Int],
    qstart: Option[Long],
    qend: Option[Long],
    sstart: Option[Long],
    send: Option[Long],
    evalue: Option[Double],
    bitscore: Option[Double])

/** Open reading frame emitted by the ORF finder (reference
  * `ORF.scala:43-123` returns FASTA-formatted strings; we keep it typed).
  * `frame` is 1..3, `strand` is '+' or '-'; positions are 1-based on the
  * frame-shifted strand sequence.
  */
final case class Orf(
    contigId: String,
    strand: String,
    frame: Int,
    start: Int,
    end: Int,
    dna: String,
    protein: String)
