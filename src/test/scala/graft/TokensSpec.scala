package graft

import graft.functions.TextFunctions
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native tokens expression must be BIT-IDENTICAL to the HOF form
  * it replaced — same trim rule (0x20 spaces only), same Java-regex
  * `\s+` split classes, same empty-drop, same null propagation.
  */
class TokensSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("native tokens == HOF tokens on hostile inputs") {
    import spark.implicits._
    val hostile = Seq(
      "plain words here",
      "  leading and trailing  ",
      "tab\tseparated\twords",
      "newline\nseparated",
      "\r\n mixed \t\f whitespace  here ",
      "", " ", "\t", "\n\n\n",
      "one",
      "unicode café 中文 words",
      "nbsp is-not-ascii-whitespace",   // \s does NOT match U+00A0
      "many     spaces      between",
      "trailing-tab\t",
      "\ta\tb\t")
      .toDF("text")
    val both = hostile.select(
      TextFunctions.tokens(col("text")).as("native"),
      TextFunctions.tokensHof(col("text")).as("hof"))
    val rows = both.collect()
    rows.foreach { r =>
      assert(r.getSeq[String](0) == r.getSeq[String](1),
        s"native=${r.getSeq[String](0)} hof=${r.getSeq[String](1)}")
    }
    // null propagates as null through both
    val n = Seq[Option[String]](None).toDF("text").select(
      TextFunctions.tokens(col("text")).as("native"),
      TextFunctions.tokensHof(col("text")).as("hof")).collect()(0)
    assert(n.isNullAt(0) && n.isNullAt(1))
  }

  test("native avg_quality / low_quality_count == HOF twins on non-empty strings") {
    import spark.implicits._
    val cases = Seq("IIIIIIII", "!#%&", "I", "@@@@IIII@@@@",
      "mixed unicode é≤").toDF("q")
    val both = cases.select(
      graft.functions.DnaFunctions.avgQualityCol(col("q")).as("a_nat"),
      graft.functions.DnaFunctions.avgQualityHof(col("q")).as("a_hof"),
      graft.functions.DnaFunctions.lowQualityCountCol(col("q"), 40).as("c_nat"),
      graft.functions.DnaFunctions.lowQualityCountHof(col("q"), 40).as("c_hof"))
    both.collect().foreach { r =>
      assert(r.getDouble(0) == r.getDouble(1), r.toString)
      assert(r.getInt(2) == r.getInt(3), r.toString)
    }
  }

  test("native avg_quality: empty string is NULL (the HOF form THREW under ANSI)") {
    import spark.implicits._
    val r = Seq("").toDF("q").select(
      graft.functions.DnaFunctions.avgQualityCol(col("q")).as("a"),
      graft.functions.DnaFunctions.lowQualityCountCol(col("q"), 40).as("c"))
      .collect()(0)
    assert(r.isNullAt(0))
    assert(r.getInt(1) == 0)
  }

  test("gpt2Pretokens: contractions, leading-space convention, categories") {
    import spark.implicits._
    def toks(t: String): Seq[String] =
      Seq(t).toDF("text")
        .select(TextFunctions.gpt2Pretokens(col("text")).as("t"))
        .head().getSeq[String](0)
    // contraction suffixes split as their own tokens
    assert(toks("it's we're don't") ==
      Seq("it", "'s", " we", "'re", " don", "'t"))
    // leading space attaches to the following letter/number/punct run;
    // "42nd" splits at the number/letter category edge
    assert(toks("the 42nd #tag!!") ==
      Seq("the", " 42", "nd", " #", "tag", "!!"))
    // accented letters are \p{L}
    assert(toks("naïve café") == Seq("naïve", " café"))
    // apostrophe that is NOT a contraction is a punct run
    assert(toks("l'été") == Seq("l", "'", "été"))
    // a multi-space run is ONE whitespace token (the documented RE2
    // lookahead divergence); single spaces still attach forward
    assert(toks("a  b") == Seq("a", "  ", "b"))
    // CJK letter runs, 4-byte emoji as punct-category run
    assert(toks("東京 データ 🚀") == Seq("東京", " データ", " 🚀"))
  }

  test("tokens stays inside whole-stage codegen (the point of the rewrite)") {
    import spark.implicits._
    // parquet-backed input: a literal Seq constant-folds to a
    // LocalTableScan with no codegen stage to inspect
    val dir = java.nio.file.Files.createTempDirectory("graft_tok").toString + "/t"
    Seq(("a b c", 1), ("d e", 2)).toDF("text", "n").write.parquet(dir)
    val df = spark.read.parquet(dir)
      .filter(col("n") > 0)
      .select(size(TextFunctions.tokens(col("text"))).as("k"), col("n"))
    df.count()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1)"), plan.take(800))
    // SQL surface too
    graft.plans.NativeFunctions.register(spark)
    val viaSql = spark.sql("SELECT tokens_native('  x  y ') AS t")
      .collect()(0).getSeq[String](0)
    assert(viaSql == Seq("x", "y"))
  }
}
