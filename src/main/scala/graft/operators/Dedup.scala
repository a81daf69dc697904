package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deduplication operators for large text corpora (north-star surface:
  * exact, MinHash+LSH, SimHash, n-gram Jaccard).
  *
  * Scale design notes (100 TB target):
  *  - exact dedup is one hash-partitioned groupBy on a 32-char md5 —
  *    partial aggregation collapses each partition to distinct
  *    fingerprints before the exchange;
  *  - MinHash LSH never materializes the O(n²) pair space: candidates
  *    come from an equi-join on (band_index, band_hash), i.e. only docs
  *    that collide in a band meet, and the expensive exact-Jaccard
  *    verify runs on that tiny candidate set;
  *  - all signatures are per-row narrow expressions (no shuffle until
  *    the band join);
  *  - skewed bands (a popular shingle set) would hot-spot one reducer —
  *    AQE skew-join handles it; at extreme scale add the band hash's
  *    first hex char to the join key as a salt.
  */
object Dedup {

  /** Shared prologue: (id, distinct shingle array) with tokens
    * MATERIALIZED in their own projection (an inline tokenizer would be
    * re-evaluated per shingle by the slice lambda), and the input
    * repartitioned to the session's parallelism — signature computation
    * is CPU-heavy per row, and a corpus arriving as one small file would
    * otherwise run on a single task.
    */
  private def shingled(docs: DataFrame, idCol: String, textCol: String,
                       shingleN: Int): DataFrame =
    docs
      .repartition(docs.sparkSession.sparkContext.defaultParallelism)
      .select(col(idCol).as("id"), TextFunctions.tokens(col(textCol)).as("toks"))
      .select(col("id"),
        TextFunctions.shinglesFromTokens(col("toks"), shingleN).as("shs"))
      .filter(size(col("shs")) > 0)

  /** A2/A3 exact dedup, deterministic: group rows by normalized-text
    * fingerprint, keep the minimum id per group (the reference keeps an
    * arbitrary first — `reduceByKey((a,b)=>a)`, FastqFilter.java:88-94).
    * Returns (keeper id, n_copies).
    */
  def exactDedup(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.groupBy(TextFunctions.fingerprint(col(textCol)).as("fp"))
      .agg(min(col(idCol)).as("keeper"), count(lit(1)).as("n_copies"))

  /** MinHash+LSH near-duplicate pairs.
    *
    * shingle (word n-grams, distinct) → 12-hash MinHash signature →
    * 4 bands × 3 rows → band-collision candidate join → exact Jaccard
    * verify ≥ `threshold`. Output: (doc_a < doc_b, jaccard).
    */
  def minhashLshPairs(docs: DataFrame, idCol: String, textCol: String,
                      shingleN: Int = 3, numHashes: Int = 12, bands: Int = 4,
                      threshold: Double = 0.5): DataFrame = {
    // Persisted: both sides of the band self-join and both verify joins
    // read these — without caching, the whole signature pipeline would
    // recompute once per branch.
    val sh = shingled(docs, idCol, textCol, shingleN).persist()
    val mh = TextFunctions.minhashFromHashes(col("hs"), numHashes)
    val banded = sh
      .select(col("id"), transform(col("shs"), s => md5(s)).as("hs"))
      .select(col("id"),
        posexplode(TextFunctions.bandKeys(mh, bands)).as(Seq("band", "bkey")))
      .persist()

    // Candidate pairs: same (band, band-hash), id_a < id_b, deduped.
    // Only (id, band, bkey) rows cross this shuffle — the shingle arrays
    // rejoin AFTER dedup, on the tiny candidate set.
    val cands = banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("doc_a"), col("b.id").as("doc_b"))
      .dropDuplicates("doc_a", "doc_b")

    // Exact Jaccard verify on the candidate set.
    val withShs = cands
      .join(sh.select(col("id"), col("shs").as("shs_a")), col("doc_a") === col("id")).drop("id")
      .join(sh.select(col("id"), col("shs").as("shs_b")), col("doc_b") === col("id")).drop("id")
    val inter = size(array_intersect(col("shs_a"), col("shs_b"))).cast("double")
    val uni = (size(col("shs_a")) + size(col("shs_b"))).cast("double") - inter
    withShs
      .withColumn("jaccard", round(inter / uni, 4))
      .filter(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "jaccard")
  }

  /** SimHash near-dup buckets: 16-bit signature over tokens; groups with
    * >1 member are near-dup clusters (plus rare 16-bit collisions).
    */
  def simhashBuckets(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .repartition(docs.sparkSession.sparkContext.defaultParallelism)
      // materialize tokens, then ONE md5 per token — the 16 bit-
      // aggregates reference the hash column, so an inline tokenizer or
      // inline md5 would re-run 16× per row.
      .select(col(idCol).as("id"), TextFunctions.tokens(col(textCol)).as("toks"))
      .select(col("id"), transform(col("toks"), t => md5(t)).as("hs"))
      .select(col("id"), TextFunctions.simhash16FromHashes(col("hs")).as("simhash"))
      .groupBy("simhash")
      .agg(count(lit(1)).as("n"), min(col("id")).as("min_id"))
      .filter(col("n") > 1)

  /** Exact n-gram Jaccard pairs above a threshold, via shingle-explode
    * co-grouping (no LSH, but still no cartesian product: only pairs that
    * SHARE at least one shingle are generated by the equi-join).
    */
  def ngramJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
                        shingleN: Int = 3, threshold: Double = 0.3): DataFrame = {
    val sh = shingled(docs, idCol, textCol, shingleN).persist()
    val sizes = sh.select(col("id"), size(col("shs")).as("n"))
    val ex = sh.select(col("id"), explode(col("shs")).as("sh")).persist()

    val overlap = ex.as("a")
      .join(ex.as("b"), col("a.sh") === col("b.sh") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("doc_a"), col("b.id").as("doc_b"))
      .agg(count(lit(1)).as("m"))

    overlap
      .join(sizes.as("sa"), col("doc_a") === col("sa.id"))
      .join(sizes.as("sb"), col("doc_b") === col("sb.id"))
      .withColumn("jaccard",
        round(col("m").cast("double") /
          (col("sa.n") + col("sb.n") - col("m")).cast("double"), 4))
      .filter(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "jaccard")
  }
}
