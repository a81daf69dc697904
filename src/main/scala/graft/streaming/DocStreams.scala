package graft.streaming

import graft.functions.TextFunctions
import org.apache.spark.sql.DataFrame
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
  *  - the LSH near-dup stage stays batch: pairwise similarity needs a
  *    corpus-wide view, so production runs it as a periodic compaction
  *    over the streamed-in bronze table ([[graft.operators.Curation]]).
  */
object DocStreams {

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
