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

  /** Filter-calibration sweep: for each candidate threshold, how many
    * rows survive `score >= t` and what fraction (exact integer ppm) —
    * the table a curation team reads before committing a quality-
    * filter cut-off (the survivor curve). ONE narrow pass: k codegen'd
    * bit-of-work predicates inside a single global aggregation (k is a
    * calibration grid, tens not thousands), then the 1-row result
    * explodes to (threshold, n_kept, kept_ppm) rows. Zero shuffles
    * beyond the one-row agg at any corpus size.
    */
  def thresholdSweep(df: DataFrame, scoreCol: String,
                     thresholds: Seq[Double]): DataFrame = {
    require(thresholds.nonEmpty, "no thresholds to sweep")
    val aggs = thresholds.zipWithIndex.map { case (t, i) =>
      sum(when(col(scoreCol) >= t, 1L).otherwise(0L)).as(s"__k$i")
    }
    val row = df.agg(count(lit(1)).as("__n"), aggs: _*)
    val tArr = array(thresholds.map(lit(_)): _*)
    // sum() over ZERO rows is null, not 0 — an empty corpus must sweep
    // to zero survivors, not null ones
    val kArr = array(thresholds.indices.map(i =>
      coalesce(col(s"__k$i"), lit(0L))): _*)
    row.select(col("__n"), posexplode(kArr).as(Seq("__i", "n_kept")))
      .select(
        element_at(tArr, col("__i") + 1).as("threshold"),
        col("n_kept"),
        when(col("__n") === 0, lit(null))
          .otherwise(expr("n_kept * 1000000 DIV __n")).as("kept_ppm"))
  }

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

  /** Pairwise correlation matrix over `cols` in ONE aggregation pass —
    * all C(k,2) Pearson coefficients as algebraic aggregates sharing a
    * single shuffle (k columns cost one job, not k² scans); the 1-row
    * result explodes to a row per pair. Rounded at 4dp (+0.0 collapses
    * IEEE −0.0) so the cross-engine compare is stable.
    */
  def corrMatrix(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.size >= 2, "need at least two columns")
    val pairs = for {
      i <- cols.indices; j <- (i + 1) until cols.size
    } yield (cols(i), cols(j))
    val aggs = pairs.map { case (a, b) =>
      (round(corr(col(a), col(b)), 4) + lit(0.0)).as(s"__${a}__$b")
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    val structs = pairs.map { case (a, b) =>
      struct(lit(a).as("col_a"), lit(b).as("col_b"),
        col(s"__${a}__$b").as("r"))
    }
    one.select(explode(array(structs: _*)).as("s")).select("s.*")
  }

  /** Winsorized group statistics — the robust-mean preprocessing move:
    * per group, values clamped into the exact interpolated [pLo, pHi]
    * percentile band before averaging, so a handful of extremes stops
    * dominating the mean (MAD flags outliers, q154; winsorizing
    * NEUTRALIZES them without dropping rows). Two passes over the
    * group: one percentile aggregation (|groups| rows, broadcast
    * back), one clamp + mean.
    */
  def winsorizedStats(df: DataFrame, groupCol: String, valCol: String,
                      pLo: Double, pHi: Double): DataFrame = {
    require(pLo >= 0 && pHi <= 1 && pLo < pHi, s"bad band $pLo/$pHi")
    val bounds = df.groupBy(col(groupCol))
      .agg(expr(s"percentile($valCol, $pLo)").as("lo"),
        expr(s"percentile($valCol, $pHi)").as("hi"))
    df.join(broadcast(bounds), groupCol)
      .select(col(groupCol),
        greatest(col("lo"), least(col("hi"), col(valCol))).as("w"),
        col("lo"), col("hi"))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"),
        (round(min("lo"), 4) + lit(0.0)).as("lo"),
        (round(min("hi"), 4) + lit(0.0)).as("hi"),
        (round(avg("w"), 4) + lit(0.0)).as("wins_mean"))
  }

  /** One named data-quality constraint: a DataFrame whose row count IS
    * the violation count. Builders below produce the classic four;
    * arbitrary predicates compose the same way.
    */
  final case class Check(name: String, violations: DataFrame)

  /** NULLs in a declared-NOT-NULL column. */
  def notNull(df: DataFrame, c: String): Check =
    Check(s"not_null($c)", df.filter(col(c).isNull))

  /** Rows belonging to a duplicated key group (0 = the column is a
    * key). Counted as ROWS, not keys: the number a cleanup job must
    * touch.
    */
  def unique(df: DataFrame, c: String): Check = {
    val dupKeys = df.groupBy(col(c)).agg(count(lit(1)).as("_n"))
      .filter(col("_n") > 1).select(col(c))
    Check(s"unique($c)", df.join(dupKeys, Seq(c), "left_semi"))
  }

  /** Child rows whose non-null foreign key misses the parent key set —
    * one anti join on the key.
    */
  def foreignKey(child: DataFrame, fk: String, parent: DataFrame,
                 pk: String): Check =
    Check(s"fk($fk->$pk)",
      child.filter(col(fk).isNotNull)
        .join(parent.select(col(pk).as(fk)).distinct(), Seq(fk), "left_anti"))

  /** Values outside [lo, hi] (NULLs don't violate a range check). */
  def inRange(df: DataFrame, c: String, lo: Double, hi: Double): Check =
    Check(s"range($c)",
      df.filter(col(c).isNotNull && (col(c) < lo || col(c) > hi)))

  /** Foreign-key DISCOVERY by distinct-value containment — the
    * metadata-inference pass over an undocumented lake: a candidate
    * (child.col → parent.col) relationship is scored by what fraction
    * of the child's distinct non-null values appear among the parent's
    * (the inclusion-dependency measure every schema-discovery system
    * ranks by; [[foreignKey]] is its enforcement sibling once a
    * relationship is declared). Emits one row per candidate with the
    * distinct counts, the containment, and an is_fk verdict at
    * `threshold` (< 1.0 tolerates the dirty keys real lakes have).
    *
    * Scale shape per candidate: two skinny distinct aggregations + one
    * left-semi equi-join on the distinct CHILD keys — never on rows;
    * candidates audit independently (the report unions |pairs| rows).
    */
  def fkDiscovery(pairs: Seq[(String, DataFrame, String, DataFrame, String)],
                  threshold: Double = 0.99): DataFrame = {
    require(pairs.nonEmpty, "no candidate pairs")
    pairs.map { case (name, child, childCol, parent, parentCol) =>
      val c = child.filter(col(childCol).isNotNull)
        .select(col(childCol).cast("string").as("k")).distinct()
        .localCheckpoint() // counted AND joined
      val p = parent.filter(col(parentCol).isNotNull)
        .select(col(parentCol).cast("string").as("k")).distinct()
      val nChild = c.agg(count(lit(1)).as("n_child"))
      val nHit = c.join(p, Seq("k"), "left_semi")
        .agg(count(lit(1)).as("n_contained"))
      nChild.crossJoin(nHit)
        .select(lit(name).as("candidate"), col("n_child"),
          col("n_contained"),
          (round(col("n_contained").cast("double") /
            greatest(col("n_child").cast("double"), lit(1.0)), 4) + lit(0.0))
            .as("containment"))
        .withColumn("is_fk", col("containment") >= threshold)
    }.reduce(_ unionByName _)
  }

  /** Audit report: one row per constraint with its violation count —
    * the data-quality gate a pipeline asserts before publishing a
    * snapshot. Each check is one independent aggregation / anti-join
    * over its own table (no cross-check coupling); the report is
    * |checks| rows.
    */
  def constraintAudit(checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "no constraints to audit")
    checks.map { ch =>
      ch.violations.agg(count(lit(1)).as("violations"))
        .select(lit(ch.name).as("check_name"), col("violations"))
    }.reduce(_ unionByName _)
  }
}
