package graft.streaming

import graft.functions.TextFunctions
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming twin of the batch curation gates (operators/Curation):
  * documents arrive continuously (a crawl, an ingest bus) and are
  * quality-gated, language-filtered, and exact-deduped online.
  *
  *  - the quality/language gates are stateless narrow filters — they
  *    apply per micro-batch unchanged from the batch forms (same
  *    TextFunctions expressions, same thresholds);
  *  - exact dedup becomes `dropDuplicatesWithinWatermark` on the text
  *    fingerprint: state is bounded by the watermark horizon, not by
  *    corpus size — the property that keeps a year-long ingest from
  *    accumulating unbounded dedup state;
  *  - NEAR-dup dedup bridges to the batch operator via
  *    [[incrementalDedupStream]]: each micro-batch runs the bipartite
  *    band join against the accumulated signature table (foreachBatch —
  *    the standard stream→batch-operator bridge), so fuzzy dedup keeps
  *    up with the stream without ever re-signing the corpus.
  */
object DocStreams {

  /** Streaming fuzzy dedup: each arriving micro-batch of (doc_id, text)
    * is deduped against the ACCUMULATED history —
    * [[graft.operators.Dedup.incrementalDedupAgainstSignatures]] per
    * batch — survivors append to `outDir`, and the survivors' OWN
    * signatures join the history so later batches dedup against
    * everything accepted so far. State is the skinny signature table
    * (id, shingle hashes, band keys), never the corpus text; in a
    * deployed pipeline it lives as a parquet table the job appends to
    * ([[graft.operators.Dedup.minhashSignatures]]), exactly as here but
    * across restarts.
    *
    * Batch-internal near-dups survive (the bipartite property, as in
    * the batch operator) — within-batch dedup composes separately.
    * Processes `inDir` files one per micro-batch in arrival (mtime)
    * order; blocks until the available input drains
    * (Trigger.AvailableNow).
    */
  def incrementalDedupStream(spark: SparkSession, inDir: String,
                             outDir: String, checkpoint: String,
                             initialSignatures: DataFrame,
                             shingleN: Int = 3, numHashes: Int = 12,
                             bands: Int = 4,
                             threshold: Double = 0.5): Unit = {
    import org.apache.spark.sql.streaming.Trigger
    var hist = initialSignatures.localCheckpoint()
    val stream = spark.readStream
      .schema("doc_id LONG, text STRING")
      .option("maxFilesPerTrigger", 1)
      .parquet(inDir)
    val q = stream.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val survivors = graft.operators.Dedup
          .incrementalDedupAgainstSignatures(batch, hist, "doc_id", "text",
            shingleN, numHashes, bands, threshold)
          .localCheckpoint()
        survivors.write.mode("append").parquet(outDir)
        hist = hist.unionByName(graft.operators.Dedup
          .minhashSignatures(survivors, "doc_id", "text",
            shingleN, numHashes, bands))
          .localCheckpoint()
        ()
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** Online content scrubbing — the moderation path of the curation
    * story (the batch pair q125 blocklist scrub + q192 PII redaction as
    * ONE mapped stream): each arriving document goes through the
    * broadcast Aho-Corasick blocklist scrub, then the sequential
    * email→phone PII redaction over the scrubbed text, emitting the
    * audit row (span/redaction/PII counts + cleaned digest) per doc.
    *
    * Entirely STATELESS — a narrow per-row map with no watermark and no
    * state store, so it composes in front of any stateful stage and
    * scales like the batch taggers (zero shuffle). Hash-equal to the
    * batch composition by construction: same automaton, same
    * [[graft.operators.Curation.EmailPattern]]/PhonePattern replace
    * order (q225 pins the parity under the oracle).
    */
  def scrubStream(docs: DataFrame, patterns: Seq[String]): DataFrame = {
    val scrubbed = graft.operators.Blocklist
      .scrub(docs, "doc_id", "text", patterns)
    val deEmailed = regexp_replace(col("clean_text"),
      graft.operators.Curation.EmailPattern, "<EMAIL>")
    scrubbed.select(col("doc_id"), col("n_spans"), col("n_redacted"),
      regexp_count(col("clean_text"),
        lit(graft.operators.Curation.EmailPattern)).cast("int")
        .as("n_emails"),
      regexp_count(deEmailed,
        lit(graft.operators.Curation.PhonePattern)).cast("int")
        .as("n_phones"),
      md5(regexp_replace(deEmailed,
        graft.operators.Curation.PhonePattern, "<PHONE>")).as("clean_md5"))
  }

  /** Online curation gates over a streaming documents source with an
    * event-time column `tsCol`. Emits the curated append stream.
    */
  def curateStream(docs: DataFrame, tsCol: String,
                   minQuality: Double = 0.3,
                   langs: Seq[String] = Seq("en"),
                   watermark: String = "1 hour"): DataFrame =
    docs
      .filter(TextFunctions.qualityScore(col("text")) >= minQuality)
      .filter(TextFunctions.langId(col("text")).isin(langs: _*))
      .withColumn("_fp", TextFunctions.fingerprint(col("text")))
      .withColumn("_ts", col(tsCol).cast("timestamp"))
      .withWatermark("_ts", watermark)
      .dropDuplicatesWithinWatermark("_fp")
      .drop("_fp", "_ts")
}
