package graft.operators

import graft.plans.{CanonicalizeUrlExpression, HtmlToTextExpression, ResolveUrlExpression}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Web-crawl curation operators: the ingestion-side stages a
  * Common-Crawl-scale training-data pipeline runs between the WARC scan
  * ([[graft.io.Warc]]) and the dedup/quality families (Dedup.scala,
  * Corpus.scala). The reference engine has no web surface; these are
  * north-star extensions in the published-pipeline shapes (URL-level
  * dedup first, then boilerplate line removal, then content dedup).
  */
object Web {

  /** HTML→text as a Column (native codegen expression —
    * [[graft.functions.Web.htmlToText]] rules; one scan per document,
    * fused into the enclosing projection).
    */
  def htmlToText(html: Column): Column =
    org.apache.spark.sql.graft.Bridge.column(
      HtmlToTextExpression(org.apache.spark.sql.graft.Bridge.expression(html)))

  /** URL canonicalization as a Column (native codegen expression —
    * [[graft.functions.Web.canonicalizeUrl]] rules).
    */
  def canonicalizeUrl(url: Column): Column =
    org.apache.spark.sql.graft.Bridge.column(
      CanonicalizeUrlExpression(org.apache.spark.sql.graft.Bridge.expression(url)))

  /** RFC 3986 reference resolution as a Column (native codegen
    * expression — [[graft.functions.Web.resolveUrl]] rules; null =
    * drop the link).
    */
  def resolveUrl(baseUrl: Column, href: Column): Column =
    org.apache.spark.sql.graft.Bridge.column(
      ResolveUrlExpression(
        org.apache.spark.sql.graft.Bridge.expression(baseUrl),
        org.apache.spark.sql.graft.Bridge.expression(href)))

  /** [[extractLinks]] with relative-URL resolution against each page's
    * own URL — the form a real crawl link graph needs (most organic
    * hrefs are relative; the absolute-only form below misses those
    * edges entirely). Every captured href resolves per
    * [[graft.functions.Web.resolveUrl]] (absolute pass-through,
    * `//`-protocol-relative, rooted, relative with `../` collapse;
    * fragment-only and non-http(s) schemes drop). Same narrow
    * projection + explode shape — resolution is one codegen'd scalar,
    * no extra pass.
    */
  def extractLinks(pages: DataFrame, idCol: String, htmlCol: String,
                   baseUrlCol: String): DataFrame =
    pages.select(col(idCol), col(baseUrlCol).as("_base"),
        explode(regexp_extract_all(col(htmlCol),
          lit("(?i)(?<![\\w-])href\\s*=\\s*(\"[^\"]*\"|'[^']*')"),
          lit(1))).as("q"))
      .select(col(idCol),
        resolveUrl(col("_base"),
          expr("substring(q, 2, length(q) - 2)")).as("href"))
      .filter(col("href").isNotNull)

  /** Out-link extraction — the crawl-graph construction step between
    * WARC ingestion and [[Graph.pageRank]]: every absolute http(s)
    * `href` attribute value, one (id, href) row per occurrence
    * (multiplicity preserved — parallel links are real edges to a
    * rank computation). Deliberately regex-scoped like the PII tier
    * (deterministic, replayable); the sibling overload above resolves
    * relative hrefs against a base-URL column. One narrow projection +
    * explode, no shuffle; compose with [[canonicalizeUrl]] before
    * grouping into an edge table.
    */
  def extractLinks(pages: DataFrame, idCol: String,
                   htmlCol: String): DataFrame =
    // (?<![\w-]) keeps data-href/xhref out (\b alone passes data-href:
    // '-h' is a word boundary); the alternation pairs quotes properly,
    // so href="a' can never capture across mismatched quotes — the
    // captured value keeps its quotes and is stripped below
    pages.select(col(idCol),
        explode(regexp_extract_all(col(htmlCol),
          lit("(?i)(?<![\\w-])href\\s*=\\s*(\"[^\"]*\"|'[^']*')"),
          lit(1))).as("q"))
      .select(col(idCol),
        expr("substring(q, 2, length(q) - 2)").as("href"))
      .filter(col("href").startsWith("http://") ||
        col("href").startsWith("https://"))

  /** URL-level dedup — the FIRST dedup stage of every published crawl
    * pipeline (it runs before fetching content is even considered):
    * canonicalize, group, keep the minimum id (the engine-wide
    * deterministic keeper rule, Dedup.exactDedup's contract). Returns
    * (canonical_url, keeper id, n_dups).
    *
    * Scale: canonicalization is a narrow per-row scalar; the group-by
    * is ONE hash-partitioned aggregation with map-side partial
    * aggregation — the same shape as exact dedup, which q30 already
    * proves out.
    */
  def urlDedup(df: DataFrame, idCol: String, urlCol: String): DataFrame =
    df.groupBy(canonicalizeUrl(col(urlCol)).as("canonical_url"))
      .agg(min(col(idCol)).as("keeper_id"), count(lit(1)).as("n_dups"))

  /** Boilerplate removal by GLOBAL line frequency (the RefinedWeb /
    * FineWeb recipe): split each document into lines, count how many
    * DISTINCT documents each exact line occurs in, drop lines occurring
    * in more than `maxDocs` documents (navigation menus, cookie
    * banners, footers — content lines are rare, boilerplate lines are
    * corpus-wide), and reassemble survivors in original order. A
    * document whose every line is boilerplate disappears entirely.
    * Returns (id, clean_text, n_kept).
    *
    * Scale (100 TB): the frequency table is one hash aggregation over
    * XXH64 line keys — the exploded payload that shuffles is (key, id),
    * never the line text, and partial aggregation collapses per-partition
    * repeats first. The line table re-joins as a key equi-join (both
    * sides hash by `lkey`); reassembly is one groupBy(id) with an
    * in-group sort (collect_list + array_sort — bounded by document
    * size, not corpus size). Two shuffles + one equi-join total; nothing
    * driver-side. 64-bit key collisions are the q35 contract: ~n²/2⁶⁵
    * for n distinct lines — at 10¹² lines, odds ~3%; collision promotes
    * a rare line's count, dropping at most that line (never corrupts
    * text).
    */
  def lineDedup(docs: DataFrame, idCol: String, textCol: String,
                maxDocs: Long): DataFrame = {
    val lines = docs
      .select(col(idCol).as("id"),
        posexplode(split(col(textCol), "\n")).as(Seq("pos", "line")))
      .withColumn("lkey", xxhash64(col("line")))
    val lineDf = lines.select(col("lkey"), col("id"))
      .groupBy("lkey")
      .agg(countDistinct(col("id")).as("line_docs"))
      .filter(col("line_docs") > maxDocs)
    // anti-join against the (small) over-threshold key set: only
    // boilerplate keys ship to the join, content lines pass untouched
    val kept = lines.join(lineDf.select("lkey"), Seq("lkey"), "left_anti")
    kept.groupBy(col("id"))
      .agg(
        array_join(
          transform(array_sort(collect_list(struct(col("pos"), col("line")))),
            s => s.getField("line")),
          "\n").as("clean_text"),
        count(lit(1)).cast("long").as("n_kept"))
      .withColumnRenamed("id", idCol)
  }
}
