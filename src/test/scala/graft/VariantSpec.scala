package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Spark 4 VARIANT semantics under heterogeneous per-row JSON shapes —
  * the contract q140 relies on: parse once, typed extraction per path,
  * NULL (not error) on missing paths or failed casts via
  * try_variant_get, and JSON-null distinguishable from path-absent.
  */
class VariantSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def parsed = {
    import spark.implicits._
    Seq(
      """{"a": 1, "b": [10, 20, 30]}""",
      """{"a": "text", "b": {"c": true}}""",
      """{"a": null}""",
      """{"nested": {"deep": {"x": 2.5}}}""")
      .toDF("j")
      .select(col("j"), parse_json(col("j")).as("v"))
  }

  test("typed extraction across heterogeneous row shapes") {
    val rows = parsed.select(
      try_variant_get(col("v"), "$.a", "int").as("a_int"),
      try_variant_get(col("v"), "$.a", "string").as("a_str"),
      try_variant_get(col("v"), "$.b[1]", "int").as("b1"),
      try_variant_get(col("v"), "$.b.c", "boolean").as("bc"),
      try_variant_get(col("v"), "$.nested.deep.x", "double").as("x"))
      .collect()
    // row 0: a is an int, b an array
    assert(rows(0).getInt(0) == 1 && rows(0).getString(1) == "1")
    assert(rows(0).getInt(2) == 20 && rows(0).isNullAt(3))
    // row 1: a is a string (int cast fails -> null under try_), b an object
    assert(rows(1).isNullAt(0) && rows(1).getString(1) == "text")
    assert(rows(1).isNullAt(2) && rows(1).getBoolean(3))
    // row 2: a is JSON null
    assert(rows(2).isNullAt(0) && rows(2).isNullAt(1))
    // row 3: nested path reaches through two objects
    assert(rows(3).getDouble(4) == 2.5)
  }

  test("JSON null vs absent path: is_variant_null distinguishes them") {
    val r = parsed.select(
      is_variant_null(variant_get(col("v"), "$.a", "variant")).as("a_is_jnull"),
      variant_get(col("v"), "$.zzz", "variant").isNull.as("zzz_absent"))
      .collect()
    assert(!r(0).getBoolean(0) && r(0).getBoolean(1))
    assert(r(2).getBoolean(0), "JSON null must read as a variant null value")
  }

  test("schema_of_variant_agg merges heterogeneous shapes") {
    val merged = parsed.select(schema_of_variant_agg(col("v"))).head().getString(0)
    // 'a' seen as BIGINT and STRING across rows -> merged to VARIANT
    assert(merged.contains("a: VARIANT"), merged)
    assert(merged.contains("nested"), merged)
  }

  test("q140's contract: variant_get(int/string) matches get_json_object") {
    import spark.implicits._
    val df = Seq("""{"k": 87}""", """{"k": 0}""", """{"other": 1}""")
      .toDF("props")
      .select(col("props"), parse_json(col("props")).as("v"))
    val both = df.select(
      variant_get(col("v"), "$.k", "int").as("vk"),
      get_json_object(col("props"), "$.k").cast("int").as("jk"),
      variant_get(col("v"), "$.k", "string").as("vs"),
      get_json_object(col("props"), "$.k").as("js"))
    assert(both.filter(
      !(col("vk") <=> col("jk")) || !(col("vs") <=> col("js"))).count() == 0)
  }
}
