package graft.io

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** VCF 4.x text source/sink — the variant-call format immediately
  * downstream of the reference's alignment stages (SAM → caller → VCF;
  * the reference pipeline stops at alignments, SURVEY.md §2.1, so this
  * is beyond-parity format surface). Follows the public VCFv4.3 spec
  * (samtools/hts-specs): `##` meta lines and one `#CHROM` column
  * header, then TAB-separated records
  * `CHROM POS ID REF ALT QUAL FILTER INFO [FORMAT samples…]`.
  *
  * Scan shape: plain `spark.read.text` keeps the scan SPLITTABLE —
  * header lines filter out per line, no driver-side preamble parse, so
  * a 100 GB population VCF splits like any text file. `.` encodes null
  * (id/qual/filter), ALT is comma-separated (multi-allelic sites keep
  * every allele), INFO parses to a map (`key=value` pairs; valueless
  * FLAG keys carry null). FORMAT/per-sample genotype columns are out
  * of scope for the typed core (they vary per file; the raw line stays
  * reachable via `spark.read.text`).
  */
object Vcf {

  private def nullIfDot(c: Column): Column =
    when(c === "." || c === "", lit(null)).otherwise(c)

  /** Splittable VCF scan → (chrom, pos, id, ref, alt, qual, filter,
    * info) with spec null handling and multi-allelic ALT arrays.
    */
  def read(spark: SparkSession, path: String): DataFrame = {
    val f = split(col("value"), "\t")
    spark.read.text(path)
      .filter(!col("value").startsWith("#") &&
        length(trim(col("value"))) > 0)
      .select(
        f.getItem(0).as("chrom"),
        f.getItem(1).cast("long").as("pos"),
        nullIfDot(f.getItem(2)).as("id"),
        f.getItem(3).as("ref"),
        when(nullIfDot(f.getItem(4)).isNull, lit(null))
          .otherwise(split(f.getItem(4), ",")).as("alt"),
        nullIfDot(f.getItem(5)).cast("double").as("qual"),
        nullIfDot(f.getItem(6)).as("filter"),
        when(nullIfDot(f.getItem(7)).isNull,
          map_from_arrays(array(), array()))
          .otherwise(expr("str_to_map(split(value, '\t')[7], ';', '=')"))
          .as("info"))
  }

  /** Multi-sample GENOTYPE scan — the population-genetics half the
    * typed core skips: every (site, sample) pair as one long-format
    * row `(chrom, pos, ref, alt, sample, geno)` where `geno` maps the
    * site's FORMAT keys (GT, DP, …) to that sample's values. Sample
    * NAMES live only on each file's `#CHROM` header line, so the scan
    * does ONE bounded driver read per file (first header line — the
    * same footer-probe discipline the genomic loaders use), builds a
    * (file, column-index → sample) table, and resolves names with a
    * broadcast equi-join; the data pass itself stays the splittable
    * line scan, exploded positionally. Files with different sample
    * sets union naturally in long format.
    */
  def readSamples(spark: SparkSession, path: String): DataFrame = {
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val st = fs.getFileStatus(new org.apache.hadoop.fs.Path(path))
    val files =
      (if (st.isDirectory)
        fs.listStatus(new org.apache.hadoop.fs.Path(path)).toSeq
          .filter(s => s.isFile && !s.getPath.getName.startsWith("_") &&
            !s.getPath.getName.startsWith("."))
      else Seq(st)).map(_.getPath)
    val sampleRows = files.flatMap { p =>
      val in = fs.open(p)
      val header =
        try {
          val src = scala.io.Source.fromInputStream(in, "UTF-8")
          src.getLines().find(l =>
            l.startsWith("#") && !l.startsWith("##"))
        } finally in.close()
      header.toSeq.flatMap(_.split('\t').drop(9).zipWithIndex.map {
        case (name, i) => (p.toString, i, name)
      })
    }
    import spark.implicits._
    require(sampleRows.nonEmpty,
      s"no #CHROM header with sample columns under $path")
    val samples = sampleRows.toDF("_sfile", "_idx", "sample")
    val f = split(col("value"), "\t")
    spark.read.text(path)
      .filter(!col("value").startsWith("#") &&
        length(trim(col("value"))) > 0)
      .select(col("_metadata.file_path").as("_file"),
        f.getItem(0).as("chrom"),
        f.getItem(1).cast("long").as("pos"),
        f.getItem(3).as("ref"),
        split(f.getItem(4), ",").as("alt"),
        split(f.getItem(8), ":").as("_fmt"),
        posexplode(slice(f, 10, 100000)).as(Seq("_idx0", "_sval")))
      .join(broadcast(samples),
        col("_file") === col("_sfile") && col("_idx0") === col("_idx"))
      .select(col("chrom"), col("pos"), col("ref"),
        col("alt"), col("sample"),
        map_from_arrays(col("_fmt"), split(col("_sval"), ":")).as("geno"))
  }

  /** VCF sink: the typed shape back to spec text — `.` for nulls, ALT
    * re-joined on commas, INFO entries re-serialized in map order
    * (FLAG keys bare, `key=value` otherwise). Emits the minimal
    * `##fileformat` + `#CHROM` header per written file so the output
    * is a valid standalone VCF.
    */
  def write(df: DataFrame, path: String): Unit = {
    val infoStr = {
      val parts = expr(
        "transform(map_entries(info), e -> " +
          "IF(e.value IS NULL, e.key, concat(e.key, '=', e.value)))")
      when(size(map_entries(col("info"))) === 0, lit("."))
        .otherwise(array_join(parts, ";"))
    }
    val header = "##fileformat=VCFv4.3\n" +
      "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO"
    val lines = df.select(concat_ws("\t",
      col("chrom"), col("pos"),
      coalesce(col("id"), lit(".")),
      col("ref"),
      coalesce(array_join(col("alt"), ","), lit(".")),
      coalesce(col("qual").cast("string"), lit(".")),
      coalesce(col("filter"), lit(".")),
      infoStr).as("value"))
    val spark = df.sparkSession
    import spark.implicits._
    lines.mapPartitions(it => Iterator(header) ++ it.map(_.getString(0)))
      .write.mode("overwrite").text(path)
  }
}
