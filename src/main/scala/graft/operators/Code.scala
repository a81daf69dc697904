package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Source-code corpus curation — the two gates every code-corpus
  * pipeline (the published StarCoder/SantaCoder recipes) runs before
  * anything else: LICENSE filtering (only permissively-licensed files
  * may train) and FILE-SHAPE quality filtering (minified bundles,
  * generated code, and data-as-code files are detected by line
  * metrics, not content models).
  *
  * Both operators are fully declarative Column expressions — no UDFs,
  * no shuffles, one narrow projection per file: the shape that scans a
  * code corpus at ingest bandwidth. The license scan is regexp/contains
  * arithmetic inside whole-stage codegen; the shape signals use
  * higher-order functions (CodegenFallback by nature, still a narrow
  * vectorized pass).
  */
object Code {

  // ------------------------------------------------------------------
  // License scan
  // ------------------------------------------------------------------

  /** SPDX short-form tag (the machine-readable standard). */
  private val SpdxRx = "SPDX-License-Identifier:\\s*([A-Za-z0-9.+-]+)"

  /** Canonical fingerprint phrases → license id (the detection the
    * published code-corpus recipes use when no SPDX tag exists; first
    * match in this order wins).
    */
  val Fingerprints: Seq[(String, String)] = Seq(
    "Permission is hereby granted, free of charge" -> "MIT",
    "Licensed under the Apache License, Version 2.0" -> "Apache-2.0",
    "Redistribution and use in source and binary forms" -> "BSD-3-Clause",
    "GNU General Public License" -> "GPL-3.0-only",
    "free and unencumbered software released into the public domain"
      -> "Unlicense")

  /** Permissive allow-list (trainable). */
  val Permissive: Set[String] =
    Set("MIT", "Apache-2.0", "BSD-3-Clause", "BSD-2-Clause", "ISC",
      "Unlicense", "CC0-1.0")

  /** License of a source text: the SPDX tag if present, else the first
    * fingerprint match, else null. Scans only the head of the file
    * (licenses live in headers; bounding the scan keeps the work
    * per-file constant).
    */
  def license(text: Column, headChars: Int = 2000): Column = {
    val head = substring(text, 1, headChars)
    val spdx = regexp_extract(head, SpdxRx, 1)
    val byPhrase = Fingerprints.foldRight(lit(null).cast("string")) {
      case ((phrase, id), acc) =>
        when(head.contains(phrase), lit(id)).otherwise(acc)
    }
    when(spdx =!= "", spdx).otherwise(byPhrase)
  }

  /** Append license + trainability columns. */
  def licenseScan(df: DataFrame, textCol: String): DataFrame = {
    val lic = license(col(textCol))
    df.withColumn("license", lic)
      .withColumn("permissive",
        coalesce(lic.isin(Permissive.toSeq: _*), lit(false)))
  }

  // ------------------------------------------------------------------
  // Source-shape quality signals
  // ------------------------------------------------------------------

  /** StarCoder-recipe thresholds: files with a max line over 1000
    * chars, a mean line over 100 chars, or under 25% alphabetic
    * characters are dropped (minified/generated/data files).
    */
  val MaxLineLimit = 1000
  val AvgLineMilliLimit = 100000L // mean*1000
  val AlphaPpmFloor = 250000L

  /** Per-file line metrics + the keep verdict, all codegen'd column
    * arithmetic over `split(text, "\n")`.
    */
  def sourceSignals(df: DataFrame, textCol: String): DataFrame = {
    val lines = split(col(textCol), "\n", -1)
    val lens = transform(lines, l => length(l))
    val nLines = size(lines)
    val maxLine = array_max(lens)
    val totalChars = aggregate(lens, lit(0L), (a, x) => a + x)
    // Column `/` is double division; floor keeps the metrics integer
    // (exact here — counts are far below 2^53)
    val avgMilli = floor((totalChars * 1000L) / nLines).cast("long")
    val alphaChars =
      length(regexp_replace(col(textCol), "[^A-Za-z]", ""))
    val textLen = length(col(textCol))
    val alphaPpm = when(textLen > 0,
      floor((alphaChars.cast("long") * 1000000L) / textLen).cast("long"))
      .otherwise(0L)
    df.withColumn("n_lines", nLines)
      .withColumn("max_line_len", maxLine)
      .withColumn("avg_line_milli", avgMilli)
      .withColumn("alpha_ppm", alphaPpm)
      .withColumn("kept",
        maxLine <= MaxLineLimit && avgMilli <= AvgLineMilliLimit &&
          alphaPpm >= AlphaPpmFloor)
  }
}
