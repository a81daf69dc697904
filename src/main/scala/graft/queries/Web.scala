package graft.queries

import graft.Tables
import graft.io.Warc
import graft.operators.{Web => W}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Web-ingestion queries (north-star surface — the crawl side of an LLM
  * data pipeline): WARC round-trip with HTML→text extraction, URL-level
  * dedup over canonicalized URLs, and FineWeb-style boilerplate removal
  * by global line frequency.
  *
  * Fixture rule (shared with the oracles): deterministic HTML/URLs/
  * boilerplate are generated from the `documents` parquet, so DuckDB
  * can reconstruct every expected output arithmetically — the WARC
  * writer, gzip-member reader, HTTP envelope parser, HTML extractor,
  * and URL canonicalizer are all under hash test.
  */
object Web {

  /** The q388/q392 fixture: every document rendered into a full page
    * with planted boilerplate (title, link-only nav, a stopword-free
    * cookie banner, a link-heavy footer, script/style noise) around
    * the article text as 8-word paragraphs; doc_id%3==0 pages carry an
    * inline link in the first paragraph.
    */
  private def boilerplatePages(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    // length > 0 gate on BOTH sides (mainContentOracle carries it too):
    // an empty-text doc would render a no-block page while the oracle's
    // string_split('') still counts one empty pseudo-block
    Tables.documents(s, d)
      .select(col("doc_id"), coalesce(col("text"), lit("")).as("text"))
      .filter(length(col("text")) > 0)
      .as[(Long, String)]
      .map { case (id, text) =>
        val words = text.split(" ", -1)
        val paras = words.grouped(8).map(_.mkString(" ")).toVector
        val body = paras.zipWithIndex.map { case (p, i) =>
          if (i == 0 && id % 3 == 0) {
            val sp = p.indexOf(' ')
            if (sp < 0) s"""<p><a href="/w">$p</a></p>"""
            else
              s"""<p><a href="/w">${p.substring(0, sp)}</a>${p.substring(sp)}</p>"""
          } else s"<p>$p</p>"
        }.mkString("\n")
        val html =
          s"""<html><head><title>Doc $id</title><style>p { color: red }</style>
             |<script>var tracker = 1;</script></head><body>
             |<nav><a href="/">Home</a> <a href="/about">About</a> <a href="/contact">Contact</a></nav>
             |<div>Cookie consent banner accept decline ok</div>
             |$body
             |<footer><a href="/privacy">Privacy</a> <a href="/terms">Terms</a> site map</footer>
             |</body></html>""".stripMargin
        (id, html)
      }.toDF("doc_id", "html")
  }

  private def tmp(d: String, name: String): String =
    s"/tmp/graft_io/${new java.io.File(d).getName}/$name"

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // WARC round-trip: documents render to HTML (title + h1 with an
    // entity + body paragraph + script/style/comment junk), write as
    // one-gzip-member-per-record .warc.gz files, read back, parse the
    // HTTP envelope, extract text natively. The oracle reconstructs
    // uri/status/text straight from the parquet — junk leaking into the
    // text, a broken member boundary, or a bad Content-Length all break
    // the hash.
    "q119_warc_roundtrip" -> { (s, d) =>
      val docs = Tables.documents(s, d)
      val html = concat(
        lit("<html><head><title>Doc "), col("doc_id"),
        lit("</title><style>p{color:red}</style></head><body>"),
        lit("<script>var x = 1 < 2;</script><h1>Doc &amp; "), col("doc_id"),
        lit("</h1><p>"), col("text"),
        lit("</p><!-- hidden --></body></html>"))
      val recs = docs.select(
        concat(lit("http://corpus.example/doc/"), col("doc_id")).as("uri"),
        lit("2020-01-01T00:00:00Z").as("date"),
        lit("text/html").as("contentType"),
        encode(html, "UTF-8").as("body"))
      val dir = tmp(d, "warc_roundtrip")
      Warc.write(recs, dir)
      Warc.read(s, dir)
        .filter(col("warcType") === "response")
        .select(col("targetUri").as("uri"),
          col("httpStatus").cast("int").as("status"),
          W.htmlToText(decode(col("body"), "UTF-8")).as("text_out"))
    },

    // URL-level dedup: half the rows carry the messy variant (uppercase
    // scheme/host, default port, tracking params, fragment, unsorted
    // params), half the clean one; canonicalization must fold both onto
    // one key so each path groups ALL its doc_ids. The oracle builds
    // the canonical form directly.
    "q120_url_dedup" -> { (s, d) =>
      val docs = Tables.documents(s, d)
      val messy = when(col("doc_id") % 2 === 0,
        concat(lit("HTTP://Corpus.EXAMPLE:80/page/"), col("doc_id") % 250,
          lit("?utm_source=feed&b=2&a=1#frag")))
        .otherwise(
          concat(lit("http://corpus.example/page/"), col("doc_id") % 250,
            lit("?b=2&utm_campaign=x&a=1")))
      W.urlDedup(docs.select(col("doc_id"), messy.as("url")),
          "doc_id", "url")
        .select(col("canonical_url"), col("keeper_id"),
          col("n_dups").cast("long").as("n_dups"))
    },

    // STREAMING twin of q119 (the crawl analog of q116's FASTQ
    // parity): the same WARC fixture ingested by Structured Streaming
    // — binaryFile file-stream → the batch reader's exact record parse
    // → native extraction → parquet sink (append, Trigger.AvailableNow)
    // → read back. Stateless narrow transform ⇒ no watermark; oracle is
    // q119's verbatim, so batch reader, stream reader, and both engines
    // pin to one hash.
    "q122_warc_stream" -> { (s, d) =>
      import org.apache.spark.sql.streaming.Trigger
      val docs = Tables.documents(s, d)
      val html = concat(
        lit("<html><head><title>Doc "), col("doc_id"),
        lit("</title><style>p{color:red}</style></head><body>"),
        lit("<script>var x = 1 < 2;</script><h1>Doc &amp; "), col("doc_id"),
        lit("</h1><p>"), col("text"),
        lit("</p><!-- hidden --></body></html>"))
      val recs = docs.select(
        concat(lit("http://corpus.example/doc/"), col("doc_id")).as("uri"),
        lit("2020-01-01T00:00:00Z").as("date"),
        lit("text/html").as("contentType"),
        encode(html, "UTF-8").as("body"))
      val base = Fixtures.fresh(tmp(d, "warc_stream"))
      Warc.write(recs, s"$base/in")
      val stream = graft.streaming.WebStreams.readWarcStream(s, s"$base/in")
        .filter(col("warcType") === "response")
        .select(col("targetUri").as("uri"),
          col("httpStatus").cast("int").as("status"),
          W.htmlToText(decode(col("body"), "UTF-8")).as("text_out"))
      val q = stream.writeStream.format("parquet")
        .option("path", s"$base/out")
        .option("checkpointLocation", s"$base/ckpt")
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      s.read.schema(stream.schema).parquet(s"$base/out")
    },

    // FineWeb-style boilerplate removal: every document gains a
    // corpus-wide navigation line, a per-source header (~1/5 of the
    // corpus each), and a corpus-wide footer around its unique content;
    // lines in more than 5 distinct documents drop, survivors rebuild
    // in order. The oracle replays the frequency count + filter +
    // ordered reassembly in SQL.
    "q121_line_dedup" -> { (s, d) =>
      val docs = Tables.documents(s, d)
      val boiler = docs.select(col("doc_id"),
        concat(
          lit("NAVIGATION MENU\n"),
          lit("site "), col("source"), lit(" header\n"),
          col("text"),
          lit("\ncopyright footer")).as("text2"))
      W.lineDedup(boiler, "doc_id", "text2", maxDocs = 5)
        .select(col("doc_id"), col("clean_text"), col("n_kept"))
    },

    // MAIN-CONTENT EXTRACTION (q388, r15): the jusText-style per-block
    // classifier — every document rendered into a full page with
    // planted boilerplate (title, nav of links, a stopword-free cookie
    // banner, a link-heavy footer, script/style noise) around the
    // article text as 8-word <p> blocks (doc_id%3==0 pages carry an
    // inline link in the first paragraph). The integer rule (>=5
    // words, link density < 1/3, stopword density >= 1/8) provably
    // removes every planted boilerplate block while article prose
    // survives; the oracle replays segmentation and rule arithmetic.
    "q388_main_content" -> { (s, d) =>
      graft.operators.Web.mainContent(boilerplatePages(s, d), "doc_id", "html")
        .select(col("doc_id"), col("n_blocks"), col("n_good"),
          md5(col("main_text")).as("main_md5"))
    },

    // STREAMING MAIN-CONTENT (q392, r15): the block classifier is ONE
    // stateless mapPartitions pass, so it runs inside Structured
    // Streaming unchanged — the q290/q375 ingest-parity doctrine on
    // the web family. Pages land as files, the stream tails them, the
    // SAME mainContent pass classifies per micro-batch, and the
    // parquet sink must equal the batch rows bit for bit (the oracle
    // IS q388's).
    "q392_main_content_stream" -> { (s, d) =>
      import org.apache.spark.sql.streaming.Trigger
      val base = Fixtures.fresh(
        s"/tmp/graft_stream/${new java.io.File(d).getName}_maincontent")
      boilerplatePages(s, d).write.mode("overwrite").parquet(s"$base/in")
      val in = s.readStream.schema("doc_id LONG, html STRING")
        .parquet(s"$base/in")
      val q = graft.operators.Web.mainContent(in, "doc_id", "html")
        .select(col("doc_id"), col("n_blocks"), col("n_good"),
          md5(col("main_text")).as("main_md5"))
        .writeStream.format("parquet")
        .option("path", s"$base/out")
        .option("checkpointLocation", s"$base/ckpt")
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      s.read.parquet(s"$base/out")
    },

    // Aho-Corasick blocklist sweep: K patterns in ONE automaton pass
    // per document (vs K regex scans). The oracle recomputes each
    // pattern's substring-occurrence count by replace-arithmetic —
    // exact here because the patterns are borderless words in a
    // space-separated corpus (no overlapping matches to diverge on).
    "q123_blocklist" -> { (s, d) =>
      val docs = Tables.documents(s, d)
      graft.operators.Blocklist.hits(docs, "doc_id", "text", BlockPatterns)
        .select(col("doc_id"), col("n_hits"),
          col("n_matched").cast("int").as("n_matched"))
    },

    // Redaction twin of q123: union-of-covered-spans scrub. The oracle
    // replays it as nested replace() — exact under the same corpus
    // property (word patterns never overlap or adjoin, so every covered
    // run is one match span, and marker substitution per occurrence
    // equals run-collapse).
    "q125_blocklist_scrub" -> { (s, d) =>
      val docs = Tables.documents(s, d)
      graft.operators.Blocklist.scrub(docs, "doc_id", "text", BlockPatterns)
        .select(col("doc_id"), col("clean_text"), col("n_spans"),
          col("n_redacted"))
    },

    // Streaming scrub twin (q225): the q125 blocklist scrub + q192 PII
    // redaction composed as ONE stateless mapped stream over planted
    // documents (emails on doc_id%3, phones on doc_id%4) — the online
    // moderation path. The oracle replays the batch composition
    // (replace-arithmetic scrub, then the sequential email→phone regex
    // pass over the scrubbed text), so stream/batch parity is under the
    // hash, q88-style.
    "q225_scrub_stream" -> { (s, d) =>
      import org.apache.spark.sql.streaming.Trigger
      val base = Fixtures.fresh(s"/tmp/graft_stream/${new java.io.File(d).getName}_scrub")
      val in = s"$base/in"
      val out = s"$base/out"
      val planted = Tables.documents(s, d).select(col("doc_id"),
        concat(col("text"),
          when(col("doc_id") % 3 === 0,
            concat(lit(" contact user"), col("doc_id").cast("string"),
              lit("@mail.example.com now"))).otherwise(lit("")),
          when(col("doc_id") % 4 === 0,
            concat(lit(" call 555-"),
              lpad(pmod(col("doc_id"), lit(1000)).cast("string"), 3, "0"),
              lit("-4321 today"))).otherwise(lit(""))).as("text"))
      planted.write.mode("overwrite").parquet(in)
      val q = graft.streaming.DocStreams
        .scrubStream(s.readStream.schema(planted.schema).parquet(in),
          BlockPatterns)
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", s"$base/ckpt")
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      s.read.parquet(out)
    },

    // Out-link extraction (q240): render each document as an HTML page
    // whose anchors encode q175's EXACT edge arithmetic PLUS one link
    // of every RFC 3986 reference shape — rooted, ../-relative, plain
    // relative, protocol-relative — resolved against the page's own URL
    // (`http://corpus.example/s<id%5>/p<id>.html`), then extract hrefs
    // back through the regex + resolution tier. The oracle replays the
    // resolution arithmetic shape by shape, so merge + dot-collapse are
    // under the hash; fragment-only, mailto: and javascript: anchors
    // must not survive.
    "q240_link_extraction" -> { (s, d) =>
      val docs = Tables.documents(s, d).select(col("doc_id"))
      val n = docs.agg(count(lit(1)).cast("long").as("n"))
      val pages = docs.crossJoin(broadcast(n)).select(col("doc_id"),
        concat(lit("http://corpus.example/s"), pmod(col("doc_id"), lit(5)),
          lit("/p"), col("doc_id"), lit(".html")).as("url"),
        concat(lit("<html><body><p>page "), col("doc_id"),
          lit(" & more</p>"),
          concat_ws("", transform(
            sequence(lit(1), (lit(1) + pmod(col("doc_id"), lit(3))).cast("int")),
            j => concat(lit("<a class='x' href=\"http://corpus.example/doc/"),
              ((col("doc_id") * 31 + j * 7) % col("n")).cast("string"),
              lit("\">link</a>")))),
          lit("<a href=\"/r/"), pmod(col("doc_id"), lit(97)),
          lit("\">rooted</a><a href='../d/"), pmod(col("doc_id"), lit(89)),
          lit("'>parent</a><a href=\"x/"), pmod(col("doc_id"), lit(83)),
          lit("\">rel</a><a href='//cdn.example/c/"),
          pmod(col("doc_id"), lit(79)),
          lit("'>proto</a><a href='#frag'>skip</a>"),
          lit("<a href='mailto:a@b.c'>m</a>"),
          lit("<a href=\"javascript:void(0)\">j</a></body></html>")).as("html"))
      graft.operators.Web.extractLinks(pages, "doc_id", "html", "url")
    },

    // PageRank over a deterministic link graph (the crawl-quality
    // prior): node = document, out-links from a fixed arithmetic rule
    // with VARIABLE out-degree 1..3 (regular graphs have uniform rank —
    // no signal). 5 power iterations, damping 0.85; the oracle replays
    // every iteration as a chained CTE, so the join+agg update rule is
    // under the hash, not just the final ordering.
    "q175_pagerank" -> { (s, d) =>
      val docs = Tables.documents(s, d).select(col("doc_id"))
      val n = docs.agg(count(lit(1)).cast("long").as("n"))
      val edges = docs.crossJoin(broadcast(n))
        .select(col("doc_id"), col("n"),
          explode(array(lit(1), lit(2), lit(3))).as("j"))
        .filter(col("j") <= lit(1) + col("doc_id") % 3)
        .select(col("doc_id").as("src"),
          ((col("doc_id") * 31 + col("j") * 7) % col("n")).as("dst"))
      graft.operators.Graph.pageRank(docs, edges, idCol = "doc_id")
        .select(col("id").as("doc_id"), round(col("r"), 8).as("rank"))
    },

    // Label propagation (q246): deterministic synchronous LPA over a
    // planted block-community graph (intra-block ring chords only, so
    // ground-truth communities exist) — 3 rounds, ties toward the
    // smallest label. The oracle unrolls every round as a chained
    // count+argmax CTE, so the simultaneous-update semantics and the
    // tie order are both under the hash.
    "q246_label_propagation" -> { (s, d) =>
      val docs = Tables.documents(s, d).select(col("doc_id"))
      val n = docs.agg(count(lit(1)).cast("long").as("n"))
      val edges = docs.crossJoin(broadcast(n))
        .select(col("doc_id"), col("n"),
          explode(array(lit(1), lit(2))).as("j"))
        .select(col("doc_id").as("src"),
          (floor(col("doc_id") / 50) * 50 +
            pmod(col("doc_id") % 50 + col("j"), lit(50))).cast("long").as("dst"),
          col("n"))
        .filter(col("dst") < col("n") && col("dst") =!= col("src"))
        .select("src", "dst")
      graft.operators.Graph.labelPropagation(edges, iterations = 3)
        .select(col("id").as("doc_id"), col("label"))
    },

    // Personalized PageRank (q250): teleport restricted to the
    // doc_id % 50 == 0 seed set over q175's graph — rank concentrates
    // around seeds and decays with link distance (TrustRank's seeded
    // quality prior). The oracle unrolls the seeded update rule per
    // round, so the personalization vector, init, and decay are all
    // under the hash.
    "q250_personalized_pagerank" -> { (s, d) =>
      val docs = Tables.documents(s, d).select(col("doc_id"))
      val n = docs.agg(count(lit(1)).cast("long").as("n"))
      val edges = docs.crossJoin(broadcast(n))
        .select(col("doc_id"), col("n"),
          explode(array(lit(1), lit(2), lit(3))).as("j"))
        .filter(col("j") <= lit(1) + col("doc_id") % 3)
        .select(col("doc_id").as("src"),
          ((col("doc_id") * 31 + col("j") * 7) % col("n")).as("dst"))
      graft.operators.Graph.personalizedPageRank(docs, edges,
        seeds = docs.filter(col("doc_id") % 50 === 0), idCol = "doc_id")
        .select(col("id").as("doc_id"), round(col("r"), 8).as("rank"))
    },

    // Multi-source BFS (q247): hop distances from a sparse seed set
    // (doc_id % 97 == 0) over the ring+chord graph, depth-capped at 4 —
    // nodes first reached deeper (or never) are ABSENT, pinning the
    // frontier/anti-join semantics. The oracle is a depth-bounded
    // recursive CTE taking min hop count per node.
    "q247_bfs_distances" -> { (s, d) =>
      val docs = Tables.documents(s, d).select(col("doc_id"))
      val n = docs.agg(count(lit(1)).cast("long").as("n"))
      val edges = docs.crossJoin(broadcast(n))
        .select(col("doc_id"), col("n"),
          explode(array(
            (col("doc_id") + 1) % col("n"),
            (col("doc_id") + 2) % col("n"),
            (col("doc_id") * 31 + 7) % col("n"))).as("dst"))
        .select(col("doc_id").as("src"), col("dst"))
      val sources = docs.filter(col("doc_id") % 97 === 0)
      graft.operators.Graph.bfsDistances(edges, sources,
        idCol = "doc_id", maxDepth = 4)
        .select(col("id").as("doc_id"), col("dist"))
    },

    // k-core peeling (q253): four synchronous peel rounds at k=3 over
    // the variable-degree q175 graph — low-degree fringe drops first,
    // cascades settle toward the dense core (the link-farm/community-
    // core signal). The oracle unrolls every round: degree HAVING gate
    // then the double semi-join edge restriction.
    // SITEMAP FRONTIER EXTRACTION (q407, r15): the crawl-seeding side
    // of q278's robots gate — every document rendered as a protocol
    // urlset (one <url> per 4-word group; loc/lastmod/changefreq/
    // priority from id+index arithmetic) and parsed back by the strict
    // tag walk (entity decode, namespace-extension elements skipped,
    // missing <loc> refuses). The oracle replays the entry arithmetic
    // including the wrap-around date rule.
    "q407_sitemap_extract" -> { (s, d) =>
      graft.operators.Sitemap.extractEntries(
        graft.operators.Sitemap.asSitemapDocs(Tables.documents(s, d)))
        .toDF()
        .select(col("doc_id"), col("n_urls"), col("locs_md5"),
          col("lastmod_min"), col("lastmod_max"), col("priority_milli"))
    },

    // REGISTRABLE DOMAIN / eTLD+1 (q406, r15): the public-suffix
    // algorithm — domain caps and per-site dedup are only correct on
    // the registrable domain, and only the suffix rules can find it.
    // Hosts derive from doc_id across six strata (normal/longest-
    // match/private-registry/wildcard/exception/default-rule); the
    // planted rule table carries every rule kind. The declarative
    // candidate-explode → broadcast-rule-join → max(struct) winner
    // runs per DISTINCT host; the oracle replays each stratum's
    // expected eTLD+1 arithmetically.
    "q406_registrable_domain" -> { (s, d) =>
      val rules = graft.operators.PublicSuffix.ruleTable(s,
        Seq("com", "uk", "co.uk", "github.io", "*.ck", "!www.ck"))
      val m6 = pmod(col("doc_id"), lit(6))
      val sub = concat(lit("sub"), pmod(col("doc_id"), lit(3)))
      val hosts = Tables.documents(s, d).select(col("doc_id"),
        concat(lit("w"), col("doc_id"), lit("."),
          when(m6 === 0, concat(sub, lit(".com")))
            .when(m6 === 1, concat(sub, lit(".co.uk")))
            .when(m6 === 2, concat(sub, lit(".github.io")))
            .when(m6 === 3, concat(sub, lit(".ck")))
            .when(m6 === 4, lit("www.ck"))
            .otherwise(concat(sub, lit(".zz")))).as("host"))
      graft.operators.PublicSuffix
        .registrableDomains(hosts, "host", rules)
        .select(col("doc_id"), col("host"), col("reg_domain"))
    },

    // robots.txt politeness filter (q278): RFC 9309 longest-match
    // verdicts over a URL frontier — hosts carry prefix, wildcard
    // (`*`), and end-anchored (`$`) rules with mixed allow/disallow;
    // the longest matching pattern wins, ties go to allow, uncovered
    // URLs default to allowed. Rules and URLs derive arithmetically
    // (rule table from nation, frontier from orders) so the oracle
    // replays host/path extraction, regex matching, and the
    // precedence sort exactly. The parser itself (group selection by
    // most-specific agent token) is pinned in WebSpec on the RFC's
    // worked examples.
    "q278_robots_filter" -> { (s, d) =>
      val m3 = pmod(col("o_orderkey"), lit(3))
      val urls = Tables.orders(s, d).select(
        concat(lit("https://h"),
          pmod(col("o_custkey"), lit(4)).cast("string"),
          lit(".ex.com/p/"),
          pmod(col("o_orderkey"), lit(50)).cast("string"),
          when(m3 === 0, "/x").when(m3 === 1, "?q=1").otherwise(""))
          .as("url"))
      val m5 = pmod(col("n_nationkey"), lit(5))
      val m10 = pmod(col("n_nationkey"), lit(10)).cast("string")
      val rules = Tables.nation(s, d).select(
        concat(lit("h"), pmod(col("n_nationkey"), lit(4)).cast("string"),
          lit(".ex.com")).as("host"),
        when(m5 === 0, concat(lit("/p/"), m10))
          .when(m5 === 1, concat(lit("/p/"), m10, lit("*")))
          .when(m5 === 2, concat(lit("/p/"), m10, lit("$")))
          .when(m5 === 3, lit("/p/1*7$"))
          .otherwise(lit("/p/")).as("pattern"),
        (pmod(col("n_nationkey"), lit(2)) === 0).as("allow"),
        when(m5 === 0, concat(lit("^/p/"), m10))
          .when(m5 === 1, concat(lit("^/p/"), m10, lit(".*")))
          .when(m5 === 2, concat(lit("^/p/"), m10, lit("$")))
          .when(m5 === 3, lit("^/p/1.*7$"))
          .otherwise(lit("^/p/")).as("rx"))
        .withColumn("plen", length(col("pattern")))
      graft.operators.Web.robotsFilter(urls, "url", rules)
    },

    "q253_kcore" -> { (s, d) =>
      val docs = Tables.documents(s, d).select(col("doc_id"))
      val n = docs.agg(count(lit(1)).cast("long").as("n"))
      val edges = docs.crossJoin(broadcast(n))
        .select(col("doc_id"), col("n"),
          explode(array(lit(1), lit(2), lit(3))).as("j"))
        .filter(col("j") <= lit(1) + col("doc_id") % 3)
        .select(col("doc_id").as("src"),
          ((col("doc_id") * 31 + col("j") * 7) % col("n")).as("dst"))
      graft.operators.Graph.kCore(edges, k = 3, rounds = 4)
        .select(col("id").as("doc_id"), col("degree"))
    },

    // Triangle counting (q181): per-node triangle membership on an
    // undirected graph (ring + chord edges guarantee triangles; a hash
    // edge family adds irregular degree). The engine runs the
    // degree-ordered orientation; the oracle takes the canonical
    // a<b<c triple-join shortcut — same triangle set, so agreement
    // hash-proves the oriented wedge join loses/duplicates nothing.
    "q181_triangles" -> { (s, d) =>
      val docs = Tables.documents(s, d).select(col("doc_id"))
      val n = docs.agg(count(lit(1)).cast("long").as("n"))
      val raw = docs.crossJoin(broadcast(n))
        .select(col("doc_id"), col("n"),
          explode(array(
            (col("doc_id") + 1) % col("n"),
            (col("doc_id") + 2) % col("n"),
            (col("doc_id") * 31 + 7) % col("n"))).as("dst"))
        .select(col("doc_id").as("src"), col("dst"))
      graft.operators.Graph.triangleCounts(raw)
        .select(col("node").as("doc_id"), col("n_triangles"))
    }
  )

  /** q175's oracle: the identical 5 power iterations as chained CTEs —
    * generated by the same loop shape the engine runs, so iteration
    * count, damping, teleport, and the leak-free in-degree handling all
    * replay in SQL.
    */
  private def pageRankOracle(iterations: Int): String = {
    val ctes = Seq(
      "nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents)",
      """e AS (SELECT d.doc_id AS src, (d.doc_id * 31 + j.j * 7) % nn.n AS dst
              FROM documents d, nn, (VALUES (1), (2), (3)) AS j(j)
              WHERE j.j <= 1 + d.doc_id % 3)""",
      "deg AS (SELECT src, CAST(count(*) AS BIGINT) AS outdeg FROM e GROUP BY 1)",
      "r0 AS (SELECT d.doc_id AS id, 1.0 / nn.n AS r FROM documents d, nn)") ++
      (1 to iterations).map { i =>
        s"""r$i AS (SELECT d.doc_id AS id,
               0.15 / (SELECT n FROM nn) + 0.85 * COALESCE(s.c, 0.0) AS r
             FROM documents d LEFT JOIN (
               SELECT e.dst AS dst, SUM(p.r / deg.outdeg) AS c
               FROM e JOIN r${i - 1} p ON e.src = p.id
                      JOIN deg ON deg.src = e.src
               GROUP BY e.dst) s ON d.doc_id = s.dst)"""
      }
    s"WITH ${ctes.mkString(",\n")}\n" +
      s"SELECT id AS doc_id, round(r, 8) AS rank FROM r$iterations"
  }

  /** q250's oracle: the seeded update rule unrolled — p(v) = 1/|S| on
    * seeds else 0, r₀ = p, rᵢ = 0.15·p + 0.85·Σ in-contributions.
    */
  private def pprOracle(iterations: Int): String = {
    val ctes = Seq(
      "nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents)",
      """e AS (SELECT d.doc_id AS src, (d.doc_id * 31 + j.j * 7) % nn.n AS dst
              FROM documents d, nn, (VALUES (1), (2), (3)) AS j(j)
              WHERE j.j <= 1 + d.doc_id % 3)""",
      "deg AS (SELECT src, CAST(count(*) AS BIGINT) AS outdeg FROM e GROUP BY 1)",
      """sc AS (SELECT CAST(count(*) AS BIGINT) AS c FROM documents
              WHERE doc_id % 50 = 0)""",
      """p AS (SELECT d.doc_id AS id,
            CASE WHEN d.doc_id % 50 = 0 THEN 1.0 / sc.c ELSE 0.0 END AS p
          FROM documents d, sc)""",
      "r0 AS (SELECT id, p AS r FROM p)") ++
      (1 to iterations).map { i =>
        s"""r$i AS (SELECT p.id AS id,
               0.15 * p.p + 0.85 * COALESCE(s.c, 0.0) AS r
             FROM p LEFT JOIN (
               SELECT e.dst AS dst, SUM(q.r / deg.outdeg) AS c
               FROM e JOIN r${i - 1} q ON e.src = q.id
                      JOIN deg ON deg.src = e.src
               GROUP BY e.dst) s ON p.id = s.dst)"""
      }
    s"WITH ${ctes.mkString(",\n")}\n" +
      s"SELECT id AS doc_id, round(r, 8) AS rank FROM r$iterations"
  }

  /** q246's oracle: the 3 LPA rounds unrolled as chained CTEs — each
    * round joins the previous labeling to the symmetric edge table,
    * counts (node, label), and takes the argmax with ties toward the
    * smallest label (row_number ORDER BY count DESC, label ASC ≡ the
    * engine's min(struct(-count, label))).
    */
  private def lpaOracle(iterations: Int): String = {
    val vExpr = "(doc_id // 50) * 50 + ((doc_id % 50) + j) % 50"
    val rounds = (1 to iterations).map { k =>
      val prev = if (k == 1) "l0" else s"r${k - 1}"
      s"""r$k AS MATERIALIZED (
           SELECT node, label FROM (
             SELECT s.v AS node, l.label AS label,
                    row_number() OVER (PARTITION BY s.v
                      ORDER BY count(*) DESC, l.label ASC) AS rn
             FROM sym s JOIN $prev l ON s.u = l.node
             GROUP BY s.v, l.label) t WHERE rn = 1)"""
    }.mkString(",\n")
    s"""WITH nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
       raw AS MATERIALIZED (
         SELECT doc_id AS u, $vExpr AS v
         FROM documents, nn, (VALUES (1), (2)) AS js(j)
         WHERE $vExpr < nn.n AND $vExpr <> doc_id),
       sym AS MATERIALIZED (
         SELECT u, v FROM raw UNION SELECT v AS u, u AS v FROM raw),
       l0 AS MATERIALIZED (SELECT DISTINCT u AS node, u AS label FROM sym),
       $rounds
       SELECT node AS doc_id, label FROM r$iterations"""
  }

  /** q253's oracle: the synchronous peel rounds unrolled — each round
    * a HAVING degree gate plus the double semi-join edge restriction.
    */
  private def kCoreOracle(k: Int, rounds: Int): String = {
    val peels = (1 to rounds).map { r =>
      s"""n$r AS MATERIALIZED (
           SELECT u FROM sym${r - 1} GROUP BY u HAVING count(*) >= $k),
         sym$r AS MATERIALIZED (
           SELECT s.u, s.v FROM sym${r - 1} s
           JOIN n$r a ON s.u = a.u JOIN n$r b ON s.v = b.u)"""
    }.mkString(",\n")
    s"""WITH nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
       e AS (SELECT d.doc_id AS src, (d.doc_id * 31 + j.j * 7) % nn.n AS dst
             FROM documents d, nn, (VALUES (1), (2), (3)) AS j(j)
             WHERE j.j <= 1 + d.doc_id % 3),
       sym0 AS MATERIALIZED (
         SELECT src AS u, dst AS v FROM e WHERE src <> dst
         UNION SELECT dst, src FROM e WHERE src <> dst),
       $peels
       SELECT u AS doc_id, CAST(count(*) AS BIGINT) AS degree
       FROM sym$rounds GROUP BY u"""
  }

  private val BlockPatterns =
    Seq("spark", "join", "window", "filter", "merge", "stream")

  /** q388/q392 shared oracle: the 8-word block segmentation and the
    * integer content rule replayed over the planted fixture.
    * DECLARED BEFORE `oracles` — object vals initialize in order, and
    * a forward reference from the map literal would read null.
    */
  private val mainContentOracle: String =
    """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws
                 FROM documents WHERE length(text) > 0),
          b AS (SELECT doc_id, ws,
                   CAST(ceil(len(ws) / 8.0) AS BIGINT) AS nblk FROM w),
          e AS (SELECT doc_id, ws, nblk,
                   unnest(range(1, nblk + 1)) AS i FROM b),
          blk AS (SELECT doc_id, nblk, i,
                   ws[(i-1)*8+1 : least(i*8, len(ws))] AS bws,
                   CASE WHEN i = 1 AND doc_id % 3 = 0
                        THEN length(ws[1]) ELSE 0 END AS lchars
                FROM e),
          g AS (SELECT doc_id, nblk, i,
                   array_to_string(bws, ' ') AS btext,
                   (len(bws) >= 5
                    AND 3 * lchars < length(array_to_string(bws, ' '))
                    AND 8 * len(list_filter(bws, x -> list_contains(
                          ['the','a','and','of','to','in','is'], x)))
                        >= len(bws)) AS good
                FROM blk)
         SELECT doc_id,
              CAST(max(nblk) + 4 AS INTEGER) AS n_blocks,
              CAST(coalesce(count(*) FILTER (WHERE good), 0) AS INTEGER)
                AS n_good,
              md5(coalesce(array_to_string(array_agg(btext ORDER BY i)
                FILTER (WHERE good), chr(10)), '')) AS main_md5
         FROM g GROUP BY doc_id"""

  val oracles: Map[String, String] = Map(
    // q407: one url per 4-word group; locs, dates ((id+i)%365 days
    // from 2024-01-01, wrap included), and priorities replayed.
    "q407_sitemap_extract" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws
                 FROM documents),
            l AS (SELECT doc_id,
                     greatest(1, CAST(ceil(len(ws) / 4.0) AS BIGINT))
                       AS n FROM w),
            t AS (SELECT doc_id, n,
                     list_transform(range(0, n), i ->
                       strftime(DATE '2024-01-01'
                         + CAST((doc_id + i) % 365 AS INTEGER),
                         '%Y-%m-%d')) AS days
                  FROM l)
         SELECT doc_id,
              CAST(n AS INTEGER) AS n_urls,
              md5(array_to_string(list_transform(range(0, n),
                i -> 'https://w' || doc_id || '.example.com/p' || i),
                chr(10))) AS locs_md5,
              list_min(days) AS lastmod_min,
              list_max(days) AS lastmod_max,
              CAST(list_sum(list_transform(range(0, n),
                i -> (i % 10) * 100)) AS BIGINT) AS priority_milli
         FROM t""",

    // q406: each stratum's eTLD+1 is the planted ground truth — the
    // suffix-rule winner (normal longest-match, private registry,
    // wildcard, exception, default *) replayed as id arithmetic.
    "q406_registrable_domain" ->
      """SELECT doc_id,
              'w' || doc_id || '.' ||
                CASE CAST(doc_id % 6 AS INTEGER)
                  WHEN 0 THEN 'sub' || (doc_id % 3) || '.com'
                  WHEN 1 THEN 'sub' || (doc_id % 3) || '.co.uk'
                  WHEN 2 THEN 'sub' || (doc_id % 3) || '.github.io'
                  WHEN 3 THEN 'sub' || (doc_id % 3) || '.ck'
                  WHEN 4 THEN 'www.ck'
                  ELSE 'sub' || (doc_id % 3) || '.zz' END AS host,
              CASE CAST(doc_id % 6 AS INTEGER)
                  WHEN 0 THEN 'sub' || (doc_id % 3) || '.com'
                  WHEN 1 THEN 'sub' || (doc_id % 3) || '.co.uk'
                  WHEN 2 THEN 'sub' || (doc_id % 3) || '.github.io'
                  WHEN 3 THEN 'w' || doc_id || '.sub' || (doc_id % 3)
                    || '.ck'
                  WHEN 4 THEN 'www.ck'
                  ELSE 'sub' || (doc_id % 3) || '.zz' END AS reg_domain
         FROM documents""",

    // q240: the oracle is the PLANTED ground truth (q175's edge
    // arithmetic + the per-shape resolution results) — equality proves
    // the regex + resolution tier loses/duplicates nothing; '#frag',
    // mailto: and javascript: anchors must not survive.
    "q240_link_extraction" ->
      """WITH nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents)
         SELECT d.doc_id,
              'http://corpus.example/doc/' ||
                CAST((d.doc_id * 31 + j.j * 7) % nn.n AS VARCHAR) AS href
         FROM documents d, nn, (VALUES (1), (2), (3)) AS j(j)
         WHERE j.j <= 1 + d.doc_id % 3
         UNION ALL
         SELECT doc_id, 'http://corpus.example/r/' ||
              CAST(doc_id % 97 AS VARCHAR) FROM documents
         UNION ALL
         SELECT doc_id, 'http://corpus.example/d/' ||
              CAST(doc_id % 89 AS VARCHAR) FROM documents
         UNION ALL
         SELECT doc_id, 'http://corpus.example/s' ||
              CAST(doc_id % 5 AS VARCHAR) || '/x/' ||
              CAST(doc_id % 83 AS VARCHAR) FROM documents
         UNION ALL
         SELECT doc_id, 'http://cdn.example/c/' ||
              CAST(doc_id % 79 AS VARCHAR) FROM documents""",
    "q123_blocklist" -> {
      val hitTerms = BlockPatterns.map(p =>
        s"(length(text) - length(replace(text, '$p', ''))) / ${p.length}")
        .mkString(" + ")
      val matchTerms = BlockPatterns.map(p =>
        s"(CASE WHEN text LIKE '%$p%' THEN 1 ELSE 0 END)").mkString(" + ")
      s"""SELECT doc_id,
              CAST($hitTerms AS BIGINT) AS n_hits,
              CAST($matchTerms AS INTEGER) AS n_matched
         FROM documents"""
    },
    "q125_blocklist_scrub" -> {
      val cleanExpr = BlockPatterns.foldLeft("text") { (acc, p) =>
        s"replace($acc, '$p', '█')"
      }
      val spanTerms = BlockPatterns.map(p =>
        s"(length(text) - length(replace(text, '$p', ''))) / ${p.length}")
        .mkString(" + ")
      val redTerms = BlockPatterns.map(p =>
        s"(length(text) - length(replace(text, '$p', '')))").mkString(" + ")
      s"""SELECT doc_id,
              $cleanExpr AS clean_text,
              CAST($spanTerms AS INTEGER) AS n_spans,
              CAST($redTerms AS INTEGER) AS n_redacted
         FROM documents"""
    },
    // q225: replant (q192's rule), re-scrub (q125's replace
    // arithmetic), then the sequential email→phone PII pass on the
    // scrubbed text — the whole online moderation row re-derived.
    "q225_scrub_stream" -> {
      val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
      val phone = "\\b[0-9]{3}-[0-9]{3}-[0-9]{4}\\b"
      val cleanExpr = BlockPatterns.foldLeft("text") { (acc, p) =>
        s"replace($acc, '$p', '█')"
      }
      val spanTerms = BlockPatterns.map(p =>
        s"(length(text) - length(replace(text, '$p', ''))) / ${p.length}")
        .mkString(" + ")
      val redTerms = BlockPatterns.map(p =>
        s"(length(text) - length(replace(text, '$p', '')))").mkString(" + ")
      s"""WITH planted AS (SELECT doc_id,
               text ||
               (CASE WHEN doc_id % 3 = 0
                     THEN ' contact user' || CAST(doc_id AS VARCHAR)
                          || '@mail.example.com now' ELSE '' END) ||
               (CASE WHEN doc_id % 4 = 0
                     THEN ' call 555-'
                          || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0')
                          || '-4321 today' ELSE '' END) AS text
             FROM documents),
          s AS (SELECT doc_id, $cleanExpr AS ct,
                  CAST($spanTerms AS INTEGER) AS n_spans,
                  CAST($redTerms AS INTEGER) AS n_redacted
                FROM planted),
          r AS (SELECT doc_id, ct, n_spans, n_redacted,
                  regexp_replace(ct, '$email', '<EMAIL>', 'g') AS de
                FROM s)
          SELECT doc_id, n_spans, n_redacted,
               CAST(len(regexp_extract_all(ct, '$email')) AS INTEGER)
                 AS n_emails,
               CAST(len(regexp_extract_all(de, '$phone')) AS INTEGER)
                 AS n_phones,
               md5(regexp_replace(de, '$phone', '<PHONE>', 'g'))
                 AS clean_md5
          FROM r"""
    },
    "q119_warc_roundtrip" ->
      """SELECT 'http://corpus.example/doc/' || doc_id AS uri,
              CAST(200 AS INTEGER) AS status,
              'Doc ' || doc_id || chr(10) ||
              'Doc & ' || doc_id || chr(10) || text AS text_out
         FROM documents""",
    "q122_warc_stream" ->
      """SELECT 'http://corpus.example/doc/' || doc_id AS uri,
              CAST(200 AS INTEGER) AS status,
              'Doc ' || doc_id || chr(10) ||
              'Doc & ' || doc_id || chr(10) || text AS text_out
         FROM documents""",
    "q120_url_dedup" ->
      """SELECT 'http://corpus.example/page/' || (doc_id % 250) || '?a=1&b=2'
                AS canonical_url,
              MIN(doc_id) AS keeper_id,
              CAST(COUNT(*) AS BIGINT) AS n_dups
         FROM documents
         GROUP BY 1""",
    "q121_line_dedup" ->
      """WITH docs2 AS (
           SELECT doc_id,
                  string_split('NAVIGATION MENU' || chr(10) ||
                               'site ' || source || ' header' || chr(10) ||
                               text || chr(10) ||
                               'copyright footer', chr(10)) AS ls
           FROM documents),
         lines AS (
           SELECT doc_id, unnest(ls) AS ln,
                  generate_subscripts(ls, 1) AS pos
           FROM docs2),
         freq AS (
           SELECT ln, COUNT(DISTINCT doc_id) AS nd FROM lines GROUP BY ln)
         SELECT l.doc_id,
                string_agg(l.ln, chr(10) ORDER BY l.pos) AS clean_text,
                CAST(COUNT(*) AS BIGINT) AS n_kept
         FROM lines l JOIN freq f ON l.ln = f.ln
         WHERE f.nd <= 5
         GROUP BY l.doc_id""",
    // q388: the 8-word block segmentation and the integer content rule
    // replayed; the planted boilerplate blocks (title/nav/cookie/
    // footer) contribute the fixed +4 to n_blocks and never to
    // main_text (title/nav/footer die on words<5, the cookie banner on
    // stopword density, nav/footer also on link density).
    "q388_main_content" -> mainContentOracle,
    // q392 is q388 through Structured Streaming — identical oracle:
    // hash equality proves batch/stream parity.
    "q392_main_content_stream" -> mainContentOracle,

    "q175_pagerank" -> pageRankOracle(5),
    "q278_robots_filter" ->
      """WITH urls AS (
           SELECT 'https://h' || (o_custkey % 4) || '.ex.com/p/' ||
                  (o_orderkey % 50) ||
                  CASE WHEN o_orderkey % 3 = 0 THEN '/x'
                       WHEN o_orderkey % 3 = 1 THEN '?q=1'
                       ELSE '' END AS url
           FROM orders),
         rl AS (
           SELECT 'h' || (n_nationkey % 4) || '.ex.com' AS host,
                  CASE n_nationkey % 5
                    WHEN 0 THEN '/p/' || (n_nationkey % 10)
                    WHEN 1 THEN '/p/' || (n_nationkey % 10) || '*'
                    WHEN 2 THEN '/p/' || (n_nationkey % 10) || '$'
                    WHEN 3 THEN '/p/1*7$'
                    ELSE '/p/' END AS pattern,
                  (n_nationkey % 2 = 0) AS allow,
                  CASE n_nationkey % 5
                    WHEN 0 THEN '^/p/' || (n_nationkey % 10)
                    WHEN 1 THEN '^/p/' || (n_nationkey % 10) || '.*'
                    WHEN 2 THEN '^/p/' || (n_nationkey % 10) || '$'
                    WHEN 3 THEN '^/p/1.*7$'
                    ELSE '^/p/' END AS rx
           FROM nation),
         rll AS (SELECT *, length(pattern) AS plen FROM rl),
         t AS (
           SELECT url,
             lower(regexp_extract(url,
               '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]+)', 1)) AS host,
             CASE WHEN regexp_extract(url,
                 '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]+([^#]*)', 1) = ''
               THEN '/'
               ELSE regexp_extract(url,
                 '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]+([^#]*)', 1)
             END AS pathq
           FROM urls),
         cand AS (
           SELECT DISTINCT tp.host, tp.pathq, rll.allow, rll.plen
           FROM (SELECT DISTINCT host, pathq FROM t) tp
           JOIN rll ON tp.host = rll.host
           WHERE regexp_matches(tp.pathq, rll.rx)),
         v AS (
           SELECT host, pathq, allow,
             row_number() OVER (PARTITION BY host, pathq
               ORDER BY plen DESC, allow DESC) AS rn
           FROM cand)
         SELECT t.url, coalesce(v.allow, TRUE) AS allowed
         FROM t
         LEFT JOIN v ON t.host = v.host AND t.pathq = v.pathq
                    AND v.rn = 1""",
    "q246_label_propagation" -> lpaOracle(3),
    "q250_personalized_pagerank" -> pprOracle(5),
    "q253_kcore" -> kCoreOracle(3, 4),
    // q247: depth-bounded recursive BFS — min hop count per reached
    // node; UNION (not UNION ALL) dedups (node, d) pairs so the
    // recursion is frontier-sized, not path-counting.
    "q247_bfs_distances" ->
      """WITH RECURSIVE
         nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
         raw AS MATERIALIZED (
           SELECT doc_id AS u, (doc_id + 1) % nn.n AS v FROM documents, nn
           UNION ALL SELECT doc_id, (doc_id + 2) % nn.n FROM documents, nn
           UNION ALL SELECT doc_id, (doc_id * 31 + 7) % nn.n FROM documents, nn),
         sym AS MATERIALIZED (
           SELECT u, v FROM raw WHERE u <> v
           UNION SELECT v AS u, u AS v FROM raw WHERE u <> v),
         walk(node, d) AS (
           SELECT doc_id AS node, 0 AS d FROM documents WHERE doc_id % 97 = 0
           UNION
           SELECT s.v AS node, w.d + 1 AS d
           FROM walk w JOIN sym s ON s.u = w.node WHERE w.d < 4)
         SELECT node AS doc_id, min(d) AS dist FROM walk GROUP BY node""",
    "q181_triangles" ->
      """WITH nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
         raw AS (
           SELECT doc_id AS u, (doc_id + 1) % nn.n AS v FROM documents, nn
           UNION ALL SELECT doc_id, (doc_id + 2) % nn.n FROM documents, nn
           UNION ALL SELECT doc_id, (doc_id * 31 + 7) % nn.n FROM documents, nn),
         sym AS (SELECT u, v FROM raw WHERE u <> v
                 UNION SELECT v, u FROM raw WHERE u <> v),
         ce AS (SELECT u AS a, v AS b FROM sym WHERE u < v),
         tri AS (SELECT e1.a, e1.b, e2.b AS c
                 FROM ce e1 JOIN ce e2 ON e1.b = e2.a
                            JOIN ce e3 ON e3.a = e1.a AND e3.b = e2.b)
         SELECT node AS doc_id, CAST(count(*) AS BIGINT) AS n_triangles
         FROM (SELECT a AS node FROM tri UNION ALL SELECT b FROM tri
               UNION ALL SELECT c FROM tri)
         GROUP BY 1"""
  )
}
