package graft

import graft.operators.Code
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** License scan + source-shape signals: SPDX precedence, fingerprint
  * order, permissive verdicts, line metrics on hand-computed files,
  * codegen plan shape.
  */
class CodeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def lic(texts: String*): Seq[(String, Boolean)] = {
    val df = texts.toDF("text")
    Code.licenseScan(df, "text").select("license", "permissive")
      .collect().map(r => (r.getAs[String]("license"),
        r.getAs[Boolean]("permissive"))).toSeq
  }

  test("SPDX tag wins over any phrase; ids pass through") {
    val out = lic(
      "// SPDX-License-Identifier: MIT\ncode",
      "# SPDX-License-Identifier: GPL-3.0-or-later\n" +
        "Permission is hereby granted, free of charge",
      "/* SPDX-License-Identifier: BSD-2-Clause */")
    assert(out(0) == ("MIT", true))
    assert(out(1) == ("GPL-3.0-or-later", false)) // tag beats phrase
    assert(out(2) == ("BSD-2-Clause", true))
  }

  test("fingerprints in precedence order; none → null, not trainable") {
    val out = lic(
      "/* Permission is hereby granted, free of charge ... */",
      "Licensed under the Apache License, Version 2.0 (the License)",
      "This program is covered by the GNU General Public License.",
      "Redistribution and use in source and binary forms, with or without",
      "no license text at all")
    assert(out(0) == ("MIT", true))
    assert(out(1) == ("Apache-2.0", true))
    assert(out(2) == ("GPL-3.0-only", false))
    assert(out(3) == ("BSD-3-Clause", true))
    assert(out(4) == ((null, false)))
  }

  test("license text beyond the head window is not scanned") {
    val out = lic("x" * 3000 + " SPDX-License-Identifier: MIT")
    assert(out(0) == ((null, false)))
  }

  test("sourceSignals computes hand-checked metrics and verdicts") {
    val normal = "def f(x):\n    return x + 1\n\nprint(f(2))"
    val minified = "var a=" + "b" * 1500 + ";"
    val data = "0,1,2,3\n4,5,6,7\n" * 5
    val df = Seq((1L, normal), (2L, minified), (3L, data))
      .toDF("id", "text")
    val out = Code.sourceSignals(df, "text")
      .collect().sortBy(_.getAs[Long]("id"))
    assert(out(0).getAs[Int]("n_lines") == 4)
    assert(out(0).getAs[Int]("max_line_len") == "    return x + 1".length)
    assert(out(0).getAs[Boolean]("kept"))
    assert(out(1).getAs[Int]("max_line_len") > Code.MaxLineLimit)
    assert(!out(1).getAs[Boolean]("kept"))
    // the CSV-ish file: short lines but almost no alphabetic chars
    assert(out(2).getAs[Long]("alpha_ppm") < Code.AlphaPpmFloor)
    assert(!out(2).getAs[Boolean]("kept"))
  }

  test("narrow plans: no shuffle anywhere; the license scan codegens") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_codeplan").toString
    Seq((1L, "x")).toDF("id", "text").write.mode("overwrite").parquet(dir)
    val df = spark.read.parquet(dir)
    val both = Code.sourceSignals(Code.licenseScan(df, "text"), "text")
    assert(!both.queryExecution.executedPlan.toString.contains("Exchange"),
      "unexpected shuffle in the combined scan")
    // the license scan alone (regexp/contains arithmetic) fuses into
    // whole-stage codegen; the HOF shape signals are CodegenFallback
    // by nature, which is why the two are separate operators
    val licOnly = Code.licenseScan(df, "text")
    licOnly.collect()
    // the "*(n)" stage prefix is the simple-string form of a
    // WholeStageCodegen span
    assert(licOnly.queryExecution.executedPlan.toString.contains("*(1)"),
      "license scan fell out of whole-stage codegen")
  }
}
