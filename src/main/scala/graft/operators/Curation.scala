package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end training-data curation: the LLM-pipeline operators
  * composed the way a production corpus pass runs them, cheapest first:
  *
  *   1. quality gate (narrow, drops junk before anything shuffles)
  *   2. language filter (narrow)
  *   3. exact dedup — one groupBy on the md5 fingerprint
  *   4. near-dup removal — MinHash LSH pairs among the survivors,
  *      resolved to clusters by [[Dedup.connectedComponents]]; each
  *      cluster keeps ONLY its minimum id. Cluster-keeper semantics
  *      beat naive pair-drop: in a component {1,2,3} with edges
  *      (1,3),(2,3), pair-drop would keep both 1 and 2 even though
  *      they are transitive near-dups of each other through 3
  *
  * Order matters at 100 TB: the narrow filters typically remove a large
  * fraction of the corpus before the two shuffling stages, and the LSH
  * stage only ever joins band-collision candidates.
  *
  * Composition points pin through [[Staging.pin]]: `staging = None`
  * keeps the fast executor-lifetime `localCheckpoint` tier;
  * `staging = Some(dir)` routes them through durable manifest-snapshot
  * tables so the pipeline survives executor preemption (the returned
  * frame's lineage then references only committed staged tables, never
  * in-memory blocks — see StreamingSpec's kill-the-blocks proof).
  */
object Curation {

  def curate(docs: DataFrame, idCol: String, textCol: String,
             minQuality: Double = 0.3,
             langs: Seq[String] = Seq("en"),
             nearDupThreshold: Double = 0.5,
             staging: Option[String] = None): DataFrame = {
    // Pin the gate output: the quality/langid expressions are
    // token-loop-heavy, and `gated` feeds both the keeper aggregation
    // and the dedup join — without the pin the scan+gate subtree
    // executes once per consumer (measured: curate at sf0.1 spent most
    // of its 4.7 s recomputing narrow stages, see BASELINE r7 notes).
    // Parallelism.ensurePinned: the gate is narrow over the raw corpus
    // scan, so a small-file input would run the whole token-heavy pass
    // as ONE task (q217's probe showed a 1.35 s single-task pin stage
    // — the same fold the r15 media builders fixed). ensure alone is
    // NOT enough here: deterministic filters push below a bare
    // Repartition, putting the gate right back into the single map
    // task — the pinned variant is the pushdown barrier. Per-row gates
    // are partitioning-insensitive and every downstream stage keys on
    // exact ids/fingerprints, so the spread changes no result.
    val gated = Staging.pin(Parallelism.ensurePinned(docs)
      .filter(TextFunctions.qualityScore(col(textCol)) >= minQuality)
      .filter(TextFunctions.langId(col(textCol)).isin(langs: _*)),
      staging, "gated")

    // exact dedup: keep the minimum id per normalized-text fingerprint
    val keeper = gated
      .groupBy(TextFunctions.fingerprint(col(textCol)).as("_fp"))
      .agg(min(col(idCol)).as(idCol))
      .select(idCol)
    // Pinned: consumed by the LSH stage AND the final anti-join.
    val exactDeduped = Staging.pin(gated.join(keeper, idCol),
      staging, "exact_deduped")

    // near-dup removal: cluster the verified LSH pairs, keep each
    // cluster's minimum id (docs absent from any pair keep themselves)
    val cc = Dedup.connectedComponents(
      Dedup.minhashLshPairs(exactDeduped, idCol, textCol,
        threshold = nearDupThreshold))
    val dropIds0 = cc.filter(col("doc_id") =!= col("cluster_id"))
      .select(col("doc_id").as(idCol))
    // Durable mode also stages the drop list: connectedComponents pins
    // its iterations with localCheckpoint internally, and without this
    // pin the final anti-join's lineage would still hang off those
    // executor-lifetime blocks.
    val dropIds =
      if (staging.isEmpty) dropIds0
      else Staging.pin(dropIds0, staging, "drop_ids")
    exactDeduped.join(dropIds, Seq(idCol), "left_anti")
  }

  /** The FULL production corpus pass — every curation stage composed
    * in pipeline order, cheapest-narrow first, each stage an operator
    * that also stands alone:
    *
    *   1. quality + language gate (narrow)       [[curate]]
    *   2. exact dedup (fingerprint groupBy)      [[curate]]
    *   3. fuzzy dedup (MinHash LSH + CC keepers) [[curate]]
    *   4. benchmark decontamination (broadcast shingle set, narrow)
    *   5. per-domain quality cap (WindowGroupLimit)
    *   6. target mixture sampling (md5 gate, narrow)
    *   7. PII redaction (narrow) — last, so audit counts describe the
    *      rows that actually ship
    *
    * The stage order is the scale argument: narrow gates drop the bulk
    * before anything shuffles; the two shuffling stages (exact + fuzzy
    * dedup) run on survivors; everything after them is narrow or
    * per-group. Output: one row per shipped document with its source,
    * lang, length, PII audit counts, and cleaned-text digest.
    */
  def fullPipeline(docs: DataFrame, idCol: String, textCol: String,
                   sourceCol: String, langCol: String,
                   minQuality: Double, langs: Seq[String],
                   nearDupThreshold: Double, bench: DataFrame,
                   domainCap: Int,
                   mixture: Seq[(String, Double)],
                   staging: Option[String] = None): DataFrame = {
    // Pins at every reused composition point: each stage's DAG would
    // otherwise re-execute once per downstream consumer (the
    // decontamination pass, its anti-join, the cap window, the
    // mixture's count collect, and the final join each re-read their
    // input) — measured 10.8 s -> ~2 s warm at sf0.1. With a staging
    // root, the pins are durable snapshot tables instead of
    // executor-lifetime blocks (see [[Staging]]).
    val curated = Staging.pin(curate(docs, idCol, textCol, minQuality,
      langs, nearDupThreshold, staging.map(s => s"$s/curate")),
      staging, "curated")
    val contaminated = Corpus
      .decontaminate(curated, idCol, textCol, bench, textCol)
      .filter(col("contaminated")).select(col("doc_id").as(idCol))
    val clean = curated.join(contaminated, Seq(idCol), "left_anti")
    val capped = Staging.pin(Corpus.domainCap(clean, sourceCol, "n_chars",
      idCol, domainCap).drop("rank"), staging, "capped")
    val mixed = Staging.pin(Corpus.mixtureSample(capped, idCol, langCol,
      mixture), staging, "mixed")
    mixed.select(col(idCol).as("doc_id"), col(sourceCol).as("source"),
      col(langCol).as("lang"), col("n_chars"))
      .join(redactPii(mixed, idCol, textCol), "doc_id")
  }

  /** Email pattern shared by redaction and counting — kept to syntax
    * both Java regex (Spark) and RE2 (DuckDB oracle) read identically.
    */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** NNN-NNN-NNNN phone shape, word-bounded so longer digit runs don't
    * shed false matches.
    */
  val PhonePattern = "\\b[0-9]{3}-[0-9]{3}-[0-9]{4}\\b"

  /** PII redaction — the release gate every public training corpus runs
    * before anything ships: emails then phone numbers replaced by typed
    * placeholder tokens, with per-document match counts for the audit
    * trail. Deliberately regex-scoped (the deterministic, replayable
    * tier); entity-level PII (names, addresses) is a model pass that
    * sits OUTSIDE the reproducible pipeline and consumes this one's
    * output. Phones are counted after email redaction, matching the
    * sequential replace pipeline (digits inside an email never
    * double-count).
    *
    * Scale shape: one narrow per-row pass, no shuffle — pushes through
    * any plan like the quality/langid gates.
    */
  def redactPii(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val deEmailed = regexp_replace(col(textCol), EmailPattern, "<EMAIL>")
    docs.select(col(idCol).as("doc_id"),
      regexp_count(col(textCol), lit(EmailPattern)).cast("int")
        .as("n_emails"),
      regexp_count(deEmailed, lit(PhonePattern)).cast("int").as("n_phones"),
      md5(regexp_replace(deEmailed, PhonePattern, "<PHONE>")).as("clean_md5"))
  }
  /** k-anonymity audit of a quasi-identifier projection — the privacy
    * gate a training-data release runs before shipping rows that carry
    * demographic-ish columns: every equivalence class (one row per
    * distinct quasi-identifier combination) with its size, its
    * l-diversity on the sensitive column (distinct sensitive values —
    * a k-anonymous class with l = 1 still leaks the attribute), and
    * the suppression verdict (size < k ⇒ the class's rows must be
    * generalized or dropped before release).
    *
    * Scale shape: one hash-partitioned aggregation over the
    * quasi-identifier key — the same shuffle a groupBy-count pays;
    * l-diversity rides the same aggregation as a count(distinct).
    */
  def kAnonymity(df: DataFrame, quasiCols: Seq[String],
                 sensitiveCol: String, k: Long): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier column")
    require(k >= 1, s"bad k $k")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("class_size"),
        countDistinct(col(sensitiveCol)).as("l_diversity"))
      .withColumn("suppressed", col("class_size") < k)
  }
}
