package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-level term statistics for training-data curation.
  *
  * Scale design (100 TB corpus):
  *  - TF is one hash-partitioned aggregation on (doc, term) — partial
  *    aggregation collapses repeats inside each partition before the
  *    exchange;
  *  - DF re-aggregates the (already small) TF table on term only;
  *  - the TF×DF join is an equi-join on `term`, the key both sides
  *    already hash by — at bounded vocab Spark broadcasts the DF side,
  *    at open vocab it stays a co-partitioned shuffle join;
  *  - the corpus size N joins in as a broadcast 1-row aggregate (a
  *    Catalyst plan, NOT a driver-side `.count()` action — one job).
  */
object Corpus {

  /** Deterministic hash sampling: keep a row iff
    * `md5(id) mod 100 < pct`. No RNG — the sample is reproducible
    * across runs, engines, and partitionings (the property training-mix
    * pipelines need for resumable jobs and audits), and it is a narrow
    * per-row filter that pushes through any plan. `pct` may vary per
    * row (a Column), enabling stratified rates — e.g. by language or
    * quality band.
    */
  def hashSampleFilter(id: Column, pct: Column): Column =
    (conv(substring(md5(id.cast("string")), 1, 8), 16, 10)
      .cast("long") % 100) < pct

  /** Top-k terms per document by tf·idf (idf = ln(N/df)), deterministic:
    * ties on the rounded score break by term. Output:
    * (doc_id, term, tf, tfidf, rank).
    */
  def tfidfTopK(docs: DataFrame, idCol: String, textCol: String,
                k: Int): DataFrame = {
    val terms = docs.select(col(idCol).as("doc_id"),
      explode(TextFunctions.tokens(col(textCol))).as("term"))
    val tf = terms.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    val scored = tf.join(df, "term")
      .crossJoin(broadcast(nDocs))
      .withColumn("tfidf",
        round(col("tf") * log(col("n_docs").cast("double") / col("df")), 4))
    val w = Window.partitionBy("doc_id")
      .orderBy(col("tfidf").desc, col("term").asc)
    scored.withColumn("rank", row_number().over(w).cast("int"))
      .filter(col("rank") <= k)
      .select("doc_id", "term", "tf", "tfidf", "rank")
  }
}
