package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Column profiling — the `SUMMARIZE` / data-quality surface of an
  * analytics engine: per-column row/null/distinct counts, range, and
  * exact median, computed for N columns in ONE aggregation pass.
  *
  * Shape: a single wide `agg` (Spark plans the multi-column DISTINCT
  * aggregates via one Expand — k columns cost one shuffle of k·rows
  * skinny tuples, not k jobs), then one explode pivots the 1-row
  * result into a row per column. No per-column jobs, no driver-side
  * stats assembly — the profile is itself a DataFrame.
  *
  * Medians are EXACT (`percentile`, linear interpolation at
  * p·(n−1)) rather than approximate: the sketch-based
  * `percentile_approx` is cheaper at open cardinality but its result
  * depends on merge order — the profile is a correctness surface, so
  * determinism wins here and the HLL/t-digest variants stay in the
  * sketch family (q47/q101). All stats are emitted as DOUBLE (ids in
  * the corpus are < 2^53, so the widening is lossless).
  */
object Profile {

  /** Profile `cols` (numeric) of `df`: one output row per column with
    * n_rows, n_nulls, n_distinct, min_v, max_v, p50 (exact median,
    * rounded to 4 — one interpolation over the same sorted data on any
    * engine).
    */
  def summarize(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "no columns to profile")
    def n(c: String, suffix: String) = s"__$c$suffix"
    val aggs: Seq[Column] = cols.flatMap { c =>
      Seq(
        count(lit(1)).as(n(c, "_rows")),
        (count(lit(1)) - count(col(c))).as(n(c, "_nulls")),
        count_distinct(col(c)).as(n(c, "_distinct")),
        min(col(c)).cast("double").as(n(c, "_min")),
        max(col(c)).cast("double").as(n(c, "_max")),
        round(expr(s"percentile($c, 0.5)"), 4).as(n(c, "_p50")))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val structs = cols.map { c =>
      struct(
        lit(c).as("column_name"),
        col(n(c, "_rows")).as("n_rows"),
        col(n(c, "_nulls")).as("n_nulls"),
        col(n(c, "_distinct")).as("n_distinct"),
        col(n(c, "_min")).as("min_v"),
        col(n(c, "_max")).as("max_v"),
        col(n(c, "_p50")).as("p50"))
    }
    one.select(explode(array(structs: _*)).as("s")).select("s.*")
  }
}
