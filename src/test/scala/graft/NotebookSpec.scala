package graft

import graft.operators.Notebook
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** ipynb writer (nbformat-4 JSON) + the declarative from_json
  * extraction: channel split, hand-written notebooks as the second
  * implementation, escape vectors, FAILFAST on malformed JSON.
  */
class NotebookSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("jsonEscape covers the RFC 8259 mandatory escapes") {
    assert(Notebook.jsonEscape("a\"b\\c\nd\re\tf\u0001g") ==
      "a\\\"b\\\\c\\nd\\re\\tf\\u0001g")
    assert(Notebook.jsonEscape("plain text") == "plain text")
  }

  test("renderIpynb → extractCells round-trips both channels") {
    val lines = Vector("md one", "md two", "code one", "code two",
      "md three", "md four", "code three")
    val df = Seq((7L, Notebook.renderIpynb(lines))).toDF("doc_id", "ipynb")
    val row = Notebook.extractCells(df).collect()(0)
    assert(row.getAs[Int]("nbformat") == 4)
    assert(row.getAs[Int]("n_cells") == 4)
    assert(row.getAs[Int]("n_code_cells") == 2)
    assert(row.getAs[String]("md_text") ==
      "md one\nmd two\nmd three\nmd four")
    assert(row.getAs[String]("code_text") == "code one\ncode two\ncode three")
  }

  test("specials in source lines survive the JSON escapes") {
    val lines = Vector("quote \" back \\ slash", "tab\there",
      "unicode café 中")
    val df = Seq((1L, Notebook.renderIpynb(lines))).toDF("doc_id", "ipynb")
    val row = Notebook.extractCells(df).collect()(0)
    assert(row.getAs[String]("md_text") ==
      "quote \" back \\ slash\ntab\there")
    assert(row.getAs[String]("code_text") == "unicode café 中")
  }

  test("hand-written notebook (second implementation) extracts exactly") {
    // a real-world-shaped notebook: extra keys, outputs with content,
    // multi-line sources with embedded newlines in the JSON strings
    val nb =
      """{
        | "cells": [
        |  {"cell_type": "markdown", "metadata": {"tags": []},
        |   "source": ["# Title\n", "intro line"]},
        |  {"cell_type": "code", "execution_count": 3,
        |   "metadata": {"scrolled": true},
        |   "outputs": [{"output_type": "stream", "name": "stdout",
        |                "text": ["ignored output\n"]}],
        |   "source": ["import os\n", "print(os.sep)"]},
        |  {"cell_type": "markdown", "metadata": {},
        |   "source": ["tail prose"]}
        | ],
        | "metadata": {"kernelspec": {"name": "python3"}},
        | "nbformat": 4, "nbformat_minor": 5
        |}""".stripMargin
    val df = Seq((9L, nb)).toDF("doc_id", "ipynb")
    val row = Notebook.extractCells(df).collect()(0)
    assert(row.getAs[Int]("n_cells") == 3)
    assert(row.getAs[Int]("n_code_cells") == 1)
    assert(row.getAs[String]("md_text") == "# Title\nintro line\ntail prose")
    assert(row.getAs[String]("code_text") == "import os\nprint(os.sep)")
  }

  test("malformed notebook JSON fails loudly (FAILFAST)") {
    val df = Seq((1L, "{\"cells\": [broken")).toDF("doc_id", "ipynb")
    val e = intercept[Exception] {
      Notebook.extractCells(df).collect()
    }
    assert(e.getMessage != null)
  }

  test("the plan is declarative — a JsonToStructs projection, no RDD scan") {
    // A local Seq folds to LocalRelation and a lit() notebook folds
    // through from_json (ConvertToLocalRelation / ConstantFolding), so
    // pin the shape on a real file scan: the whole extraction must
    // stay a single from_json projection over the parquet source.
    val dir = java.nio.file.Files
      .createTempDirectory("graft_nbplan").toString
    Seq((1L, Notebook.renderIpynb(Vector("a"))))
      .toDF("doc_id", "ipynb").write.mode("overwrite").parquet(dir)
    val plan = Notebook.extractCells(spark.read.parquet(dir))
      .queryExecution.optimizedPlan
    assert(plan.toString.contains("from_json"),
      s"expected from_json in the optimized plan:\n$plan")
    assert(!plan.toString.toLowerCase.contains("scanexistingrdd"),
      s"expected no RDD scan in the optimized plan:\n$plan")
  }
}
