package graft

import graft.functions.{Dna, DnaFunctions}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** The codegen'd Column builders must agree with the pure-Scala reference
  * implementations, and the registered UDFs must be reachable from SQL.
  */
class DnaFunctionsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def sampleDf = {
    import spark.implicits._
    val rng = new Random(1234)
    val rows = Seq.fill(80) {
      Seq.fill(rng.nextInt(40))("ACGTNacgtn" (rng.nextInt(10))).mkString
    }
    rows.toDF("s")
  }

  test("revComp column agrees with Dna.reverseComplement") {
    val got = sampleDf
      .select(col("s"), DnaFunctions.revComp(col("s")).as("rc"))
      .collect()
    got.foreach { r =>
      assert(r.getString(1) == Dna.reverseComplement(r.getString(0)))
    }
  }

  test("kmersCol agrees with Dna.kmers incl. short-string guard") {
    val got = sampleDf
      .select(col("s"), DnaFunctions.kmersCol(col("s"), 4).as("ks"))
      .collect()
    got.foreach { r =>
      assert(r.getSeq[String](1) == Dna.kmers(r.getString(0), 4))
    }
  }

  test("avgQualityCol / lowQualityCountCol agree with pure versions") {
    val got = sampleDf
      .filter(length(col("s")) > 0)
      .select(col("s"),
        DnaFunctions.avgQualityCol(col("s")).as("aq"),
        DnaFunctions.lowQualityCountCol(col("s"), 'c').as("lq"))
      .collect()
    got.foreach { r =>
      assert(math.abs(r.getDouble(1) - Dna.avgQuality(r.getString(0))) < 1e-9)
      assert(r.getInt(2) == Dna.lowQualityCount(r.getString(0), 'c'))
    }
  }

  test("registered UDFs are reachable from the SQL surface") {
    DnaFunctions.register(spark)
    val row = spark.sql(
      """SELECT revcomp('ACGT') AS rc,
                translate_dna('ATGAAATAG') AS p,
                avg_quality('II') AS aq,
                low_quality_count('!!II', 73) AS lq,
                size(dna_kmers('ACGTA', 3)) AS nk,
                size(six_frame_orfs('c', 'ATGAAATAG', 2)) AS no""").first()
    assert(row.getString(0) == "ACGT")
    assert(row.getString(1) == "MK*")
    assert(row.getDouble(2) == 'I'.toInt.toDouble)
    assert(row.getInt(3) == 2)
    assert(row.getInt(4) == 3)
    assert(row.getInt(5) >= 1)
  }
}
