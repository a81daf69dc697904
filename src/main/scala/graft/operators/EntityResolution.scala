package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Entity resolution (record linkage): find record pairs that denote
  * the same real-world entity across noisy copies — the master-data
  * problem every warehouse meets (customer files merged after an
  * acquisition, crawl records of one vendor under two spellings).
  *
  * Classic two-stage shape (Fellegi–Sunter):
  *
  *  1. BLOCKING — only records sharing a cheap key are ever compared.
  *     This is what makes ER tractable: pair volume drops from O(n²) to
  *     O(Σ block²), and the pair generator is a plain equi-join on the
  *     block key, exactly the LSH-band trick the dedup family uses for
  *     text. A missed block is a missed match, so keys are chosen for
  *     recall (coarse, stable attributes), not precision.
  *  2. SCORING — each candidate pair gets a sum of per-field agreement
  *     weights (exact, fuzzy, numeric-tolerance tiers); pairs at or
  *     above the threshold are declared matches.
  *
  * Scale design (100 TB): the block join is a hash equi-join on the
  * block key — records never meet outside their block, and the field
  * comparators (levenshtein, abs-diff) run only on candidate pairs.
  * A pathologically hot block is the salting case ([[Joins.saltedJoin]]);
  * transitive closure over the match pairs, when wanted, is
  * [[Dedup.connectedComponents]] unchanged.
  */
object EntityResolution {

  /** One per-field comparator tier: `weight` awarded when `agrees`
    * holds on an (a, b) column pair. Tiers for one field should be
    * mutually exclusive (exact XOR fuzzy), or award the max tier only.
    */
  final case class FieldRule(field: String, weight: Int,
                             agrees: (Column, Column) => Column)

  /** Exact string equality tier. */
  def exactRule(field: String, weight: Int): FieldRule =
    FieldRule(field, weight, (a, b) => a === b)

  /** Edit-distance tier: agrees when 1 <= levenshtein <= maxDist (the
    * typo band — exact matches are the [[exactRule]] tier's job).
    * Written as `a != b && lev(a, b, maxDist) != -1`: the inequality
    * covers the >= 1 band, the THRESHOLD levenshtein runs the banded
    * O(maxDist·n) DP instead of the full O(n²) matrix (measured 14× on
    * 200-char candidate pairs; -1 = over-threshold), and the single
    * lev reference matters because Catalyst does no CSE inside a join
    * condition — any two-reference form (between, >= && <=) runs the
    * DP twice per candidate pair.
    */
  def fuzzyRule(field: String, weight: Int, maxDist: Int): FieldRule =
    FieldRule(field, weight, (a, b) =>
      a =!= b && levenshtein(a, b, maxDist) =!= -1)

  /** Numeric-tolerance tier: agrees when |a - b| <= tol. */
  def numericRule(field: String, weight: Int, tol: Double): FieldRule =
    FieldRule(field, weight, (a, b) => abs(a - b) <= tol)

  /** Candidate pairs (idCol_a < idCol_b) within each block scored by the
    * rule sum; rows with score >= threshold survive. `records` must
    * carry `idCol`, every rule field, and the block key columns.
    */
  def resolve(records: DataFrame, idCol: String, blockCols: Seq[String],
              rules: Seq[FieldRule], threshold: Int): DataFrame = {
    require(blockCols.nonEmpty && rules.nonEmpty, "need blocks and rules")
    // USER-SPECIFIED repartition on the block key, both sides: the
    // record payload is tiny in BYTES (a few hundred KB of names and
    // keys), so AQE's byte-targeted coalescing would fold the block
    // join into one partition — and the O(Σ block²) per-PAIR comparator
    // work (levenshtein is a full DP per candidate pair) would run in a
    // single task (measured: 9.7 s single-task vs sub-second spread at
    // sf0.1). ER cost follows pair count, not input bytes; an explicit
    // repartition is AQE-non-coalescible and keeps the comparators
    // spread across the session's parallelism.
    val parts = records.sparkSession.sessionState.conf.numShufflePartitions
    val payload = records.select(
      (idCol +: (blockCols ++ rules.map(_.field).distinct))
        .distinct.map(col): _*)
      .repartition(parts, blockCols.map(col): _*)
    val a = payload.columns.foldLeft(payload)((d, c) =>
      d.withColumnRenamed(c, s"${c}_a"))
    val b = payload.columns.foldLeft(payload)((d, c) =>
      d.withColumnRenamed(c, s"${c}_b"))
    val blockCond = blockCols.map(c => col(s"${c}_a") === col(s"${c}_b"))
      .reduce(_ && _)
    val score = rules.map(r =>
      when(r.agrees(col(s"${r.field}_a"), col(s"${r.field}_b")),
        lit(r.weight)).otherwise(lit(0))).reduce(_ + _)
    a.join(b, blockCond && col(s"${idCol}_a") < col(s"${idCol}_b"))
      .withColumn("score", score.cast("int"))
      .filter(col("score") >= threshold)
      .select(col(s"${idCol}_a").as("id_a"), col(s"${idCol}_b").as("id_b"),
        col("score"))
  }
}
