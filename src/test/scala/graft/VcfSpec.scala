package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** VCF source/sink: spec null handling ('.'), multi-allelic ALT,
  * INFO map with FLAG keys, header skipping, and write→read
  * round-trip fidelity.
  */
class VcfSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("read: headers skip, dots null, multi-alt splits, INFO maps with flags") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_vcf").toString
    val body =
      """##fileformat=VCFv4.3
        |##INFO=<ID=DP,Number=1,Type=Integer,Description="Depth">
        |#CHROM	POS	ID	REF	ALT	QUAL	FILTER	INFO
        |chr1	101	rs1	A	T	50.0	PASS	DP=30;AF=0.5
        |chr1	205	.	G	C,T	.	q10	DP=7;DB
        |chr2	9	rs9	TTA	T	12.5	.	.
        |""".stripMargin
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/a.vcf"), body)
    val df = graft.io.Vcf.read(spark, dir).orderBy("chrom", "pos")
    val rows = df.collect()
    assert(rows.length === 3)
    val r1 = rows(0)
    assert(r1.getString(0) === "chr1" && r1.getLong(1) === 101L)
    assert(r1.getString(2) === "rs1")
    assert(r1.getSeq[String](4) === Seq("T"))
    assert(r1.getDouble(5) === 50.0)
    assert(r1.getMap[String, String](7).toMap ===
      Map("DP" -> "30", "AF" -> "0.5"))
    val r2 = rows(1)
    assert(r2.isNullAt(2), "'.' id is null")
    assert(r2.getSeq[String](4) === Seq("C", "T"), "multi-allelic")
    assert(r2.isNullAt(5), "'.' qual is null")
    val m2 = r2.getMap[String, String](7)
    assert(m2.get("DP") === Some("7"))
    assert(m2.contains("DB") && m2("DB") == null, "FLAG key, null value")
    val r3 = rows(2)
    assert(r3.isNullAt(6), "'.' filter is null")
    assert(r3.getMap[String, String](7).isEmpty, "'.' INFO is empty map")
  }

  test("write -> read round-trips the typed shape, including nulls and flags") {
    val dir = java.nio.file.Files.createTempDirectory("graft_vcfrt").toString
    val src =
      """##fileformat=VCFv4.3
        |#CHROM	POS	ID	REF	ALT	QUAL	FILTER	INFO
        |chrX	7	.	A	G,TT	99.5	PASS	AC=2;DB;AF=0.25
        |chrX	8	rs8	C	.	.	.	.
        |""".stripMargin
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/in.vcf"), src)
    val a = graft.io.Vcf.read(spark, s"$dir/in.vcf")
    graft.io.Vcf.write(a.coalesce(1), s"$dir/out")
    val b = graft.io.Vcf.read(spark, s"$dir/out")
    val norm = (df: org.apache.spark.sql.DataFrame) => df.select(
      col("chrom"), col("pos"), col("id"), col("ref"),
      array_join(col("alt"), ",").as("alt"), col("qual"), col("filter"),
      map_entries(col("info")).cast("string").as("info"))
      .collect().toSet
    assert(norm(a) === norm(b))
    // the emitted file is a standalone VCF: header present
    val written = new java.io.File(s"$dir/out").listFiles()
      .filter(_.getName.startsWith("part")).head
    val first = scala.io.Source.fromFile(written).getLines().take(2).toSeq
    assert(first.head.startsWith("##fileformat"))
  }

  test("readSamples: per-file sample resolution, FORMAT keying, mixed sample sets union") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_vcfgt").toString
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/a.vcf"),
      """##fileformat=VCFv4.3
        |#CHROM	POS	ID	REF	ALT	QUAL	FILTER	INFO	FORMAT	alice	bob
        |chr1	5	.	A	G	50	PASS	.	GT:DP	0/1:12	1/1:7
        |""".stripMargin)
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/b.vcf"),
      """##fileformat=VCFv4.3
        |#CHROM	POS	ID	REF	ALT	QUAL	FILTER	INFO	FORMAT	bob	carol
        |chr2	9	.	C	T	10	q10	.	GT	0/0	0/1
        |""".stripMargin)
    val got = graft.io.Vcf.readSamples(spark, dir)
      .select(col("chrom"), col("pos"), col("sample"),
        element_at(col("geno"), "GT").as("gt"),
        element_at(col("geno"), "DP").as("dp"))
      .as[(String, Long, String, String, Option[String])].collect().toSet
    assert(got === Set(
      ("chr1", 5L, "alice", "0/1", Some("12")),
      ("chr1", 5L, "bob", "1/1", Some("7")),
      ("chr2", 9L, "bob", "0/0", None),
      ("chr2", 9L, "carol", "0/1", None)),
      s"got $got")
  }

  test("alleleFrequencies: phased, uncalled, multi-allelic, zero-called sites") {
    import spark.implicits._
    val g = Seq(
      ("chr1", 1L, "alice", Map("GT" -> "0/1")),
      ("chr1", 1L, "bob", Map("GT" -> "1|1")),   // phased
      ("chr1", 1L, "carol", Map("GT" -> "./.")), // uncalled
      ("chr2", 2L, "alice", Map("GT" -> "0/2")), // multi-allelic alt
      ("chr2", 2L, "bob", Map("GT" -> "0/0")),
      ("chr3", 3L, "alice", Map("GT" -> "./."))
    ).toDF("chrom", "pos", "sample", "geno")
    val r = graft.operators.ViraPipeline.alleleFrequencies(g)
      .as[(String, Long, Long, Long, Option[Long])].collect().toSet
    assert(r === Set(
      ("chr1", 1L, 4L, 3L, Some(750000L)),
      ("chr2", 2L, 4L, 1L, Some(250000L)),
      ("chr3", 3L, 0L, 0L, None)))
  }

  test("hweStats: class counts, uncalled/haploid drop, monomorphic null") {
    import spark.implicits._
    val g = Seq(
      ("chr1", 1L, "a", Map("GT" -> "0/0")),
      ("chr1", 1L, "b", Map("GT" -> "0/0")),
      ("chr1", 1L, "c", Map("GT" -> "0|1")),  // phased het
      ("chr1", 1L, "d", Map("GT" -> "1/2")),  // multi-allelic hom-alt
      ("chr1", 1L, "e", Map("GT" -> "./.")),  // uncalled
      ("chr1", 1L, "f", Map("GT" -> "1")),    // haploid: not diploid
      ("chr2", 2L, "a", Map("GT" -> "0/0")),  // monomorphic site
      ("chr2", 2L, "b", Map("GT" -> "0/0"))
    ).toDF("chrom", "pos", "sample", "geno")
    val r = graft.operators.ViraPipeline.hweStats(g)
      .as[(String, Long, Long, Long, Long, Option[Double])]
      .collect().map(t => (t._1, t._2) -> t).toMap
    val (_, _, naa, nab, nbb, chi2) = r(("chr1", 1L))
    assert((naa, nab, nbb) === (2L, 1L, 1L))
    // replay the formula: n=4, p=(2*2+1)/8=0.625
    val n = 4.0; val p = (2.0 * 2 + 1) / (2.0 * n); val q = 1.0 - p
    val exp = Seq((2.0, n * p * p), (1.0, 2.0 * n * p * q),
      (1.0, n * q * q)).map { case (o, e) => (o - e) * (o - e) / e }.sum
    assert(chi2.contains(math.rint(exp * 1e6) / 1e6) ||
      chi2.exists(c => math.abs(c - exp) < 1e-6), s"chi2 $chi2 vs $exp")
    assert(r(("chr2", 2L))._6.isEmpty, "monomorphic site must carry null chi2")
  }

  test("tiTvRatio: transitions vs transversions, indels and MNPs excluded") {
    import spark.implicits._
    val sites = Seq(
      ("chr1", 1L, "A", Seq("G")),        // ti
      ("chr1", 2L, "c", Seq("t")),        // ti (case-folded)
      ("chr1", 3L, "C", Seq("A")),        // tv
      ("chr1", 4L, "A", Seq("G", "T")),   // ti + tv (multi-allelic)
      ("chr1", 5L, "AT", Seq("A")),       // indel: excluded
      ("chr1", 6L, "G", Seq("GA"))        // insertion allele: excluded
    ).toDF("chrom", "pos", "ref", "alt")
    val r = graft.operators.ViraPipeline.tiTvRatio(sites)
      .as[(Long, Long, Option[Long])].collect().head
    assert(r === ((3L, 2L, Some(1500000L))), s"got $r")
  }
}
