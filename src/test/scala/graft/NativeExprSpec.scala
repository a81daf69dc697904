package graft

import graft.functions.Dna
import graft.plans.NativeFunctions
import org.scalatest.funsuite.AnyFunSuite

class NativeExprSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("revcomp_native agrees with the pure implementation (codegen path)") {
    NativeFunctions.register(spark)
    import spark.implicits._
    val rows = Seq("ACGT", "AACCGGTTN", "", "acgtn").toDF("s")
    rows.createOrReplaceTempView("native_in")
    val got = spark.sql("SELECT s, revcomp_native(s) AS rc FROM native_in").collect()
    got.foreach { r =>
      assert(r.getString(1) == Dna.reverseComplement(r.getString(0)))
    }
  }

  test("kmers_native generator streams len-k+1 rows per input") {
    NativeFunctions.register(spark)
    import spark.implicits._
    Seq("ACGTACGT", "AC", "").toDF("s").createOrReplaceTempView("native_in2")
    val got = spark.sql(
      """SELECT s, kmer FROM native_in2
         LATERAL VIEW kmers_native(s, 3) t AS kmer""").collect()
    // only the 8-char string yields kmers: 8-3+1 = 6
    assert(got.length == 6)
    assert(got.forall(_.getString(1).length == 3))
    val expected = Dna.kmers("ACGTACGT", 3).toSet
    assert(got.map(_.getString(1)).toSet == expected)
  }

  test("dot_native is bit-identical to the HOF dot product") {
    NativeFunctions.register(spark)
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val vecs = Seq(
      (Array(0.1f, -2.5f, 3.25f), Array(1.5f, 0.25f, -0.75f)),
      (Array.empty[Float], Array.empty[Float]),
      (Array(1.0f), Array(2.0f))
    ).toDF("x", "y")
    val hof = graft.operators.Similarity.dot(col("x"), col("y"))
    val rows = vecs.select(hof.as("h"),
      call_function("dot_native", col("x"), col("y")).as("n")).collect()
    rows.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)), r.toString)
    }
    // mixed float/double sides (the k-means assignment shape)
    val mixed = vecs.select(col("x"), col("y").cast("array<double>").as("y"))
    val r2 = mixed.select(graft.operators.Similarity.dot(col("x"), col("y")).as("h"),
      call_function("dot_native", col("x"), col("y")).as("n")).collect()
    r2.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
  }

  test("nfc_native composes decomposed sequences; ASCII passes through") {
    NativeFunctions.register(spark)
    import spark.implicits._
    val decomposed = "café" // e + combining acute
    val composed = "café"
    val rows = Seq(decomposed, composed, "plain ascii").toDF("s")
      .createOrReplaceTempView("nfc_in")
    val got = spark.sql("SELECT s, nfc_native(s) AS n FROM nfc_in").collect()
      .map(r => (r.getString(0), r.getString(1))).toMap
    assert(got(decomposed) == composed)
    assert(got(composed) == composed)
    assert(got("plain ascii") == "plain ascii")
  }

  test("extensions class registers the same functions at session build") {
    // smoke: the injector runs without error on a fresh builder config
    // (full withExtensions sessions share the JVM; runtime registry is
    // equivalent and already covered above)
    val ext = new graft.plans.GraftExtensions
    val e = new org.apache.spark.sql.SparkSessionExtensions
    ext.apply(e) // must not throw
  }
}
