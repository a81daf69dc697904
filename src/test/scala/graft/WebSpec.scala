package graft

import graft.functions.{Web => WebFn}
import graft.operators.{Web => WebOp}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** HTML→text and URL canonicalization scalar rules, plus the
  * line-frequency boilerplate-removal and URL-dedup operators checked
  * against brute-force Scala recomputation.
  */
class WebSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("htmlToText: tags, entities, script/style/comments, whitespace") {
    assert(WebFn.htmlToText("<p>hello</p>") == "hello")
    assert(WebFn.htmlToText("<b>a</b><i>b</i>") == "a b")
    assert(WebFn.htmlToText("<p>a</p><p>b</p>") == "a\nb")
    assert(WebFn.htmlToText("x<br>y") == "x\ny")
    assert(WebFn.htmlToText("<script>var a = 1 < 2;</script>rest") == "rest")
    assert(WebFn.htmlToText("<SCRIPT src='x'>junk</SCRIPT>kept") == "kept")
    assert(WebFn.htmlToText("<style>p{}</style>kept") == "kept")
    // comments are invisible — no separator (matches browser rendering)
    assert(WebFn.htmlToText("a<!-- no --->b<!-- unterminated") == "ab")
    assert(WebFn.htmlToText("&amp;&lt;&gt;&quot;&apos;") == "&<>\"'")
    assert(WebFn.htmlToText("a&nbsp;b") == "a b")
    assert(WebFn.htmlToText("&#65;&#x42;") == "AB")
    assert(WebFn.htmlToText("fish &chips; &#zz;") == "fish &chips; &#zz;")
    // '>' inside a quoted attribute does not close the tag
    assert(WebFn.htmlToText("""<a href="x>y">link</a>""") == "link")
    // whitespace collapses, blank lines drop
    assert(WebFn.htmlToText("<p>  a   b  </p>\n\n<p>\t</p><p>c</p>") == "a b\nc")
    assert(WebFn.htmlToText("<script>only junk</script>") == "")
    // unterminated script swallows to EOF — nothing leaks
    assert(WebFn.htmlToText("ok<script>trailing") == "ok")
  }

  test("canonicalizeUrl: scheme/host case, ports, params, fragment") {
    assert(WebFn.canonicalizeUrl("HTTP://Example.COM:80/a") ==
      "http://example.com/a")
    assert(WebFn.canonicalizeUrl("https://example.com:443/") ==
      "https://example.com/")
    assert(WebFn.canonicalizeUrl("http://example.com:8080/a") ==
      "http://example.com:8080/a")
    assert(WebFn.canonicalizeUrl("http://example.com") ==
      "http://example.com/")
    assert(WebFn.canonicalizeUrl("http://example.com/a#frag") ==
      "http://example.com/a")
    assert(WebFn.canonicalizeUrl("http://example.com/a?b=2&a=1") ==
      "http://example.com/a?a=1&b=2")
    assert(WebFn.canonicalizeUrl(
      "http://example.com/a?utm_source=x&gclid=1&q=z") ==
      "http://example.com/a?q=z")
    assert(WebFn.canonicalizeUrl("http://example.com/a?utm_source=x") ==
      "http://example.com/a")
    assert(WebFn.canonicalizeUrl("http://u:p@Example.com/a") ==
      "http://u:p@example.com/a")
    // non-URL rows pass through trimmed
    assert(WebFn.canonicalizeUrl("  not a url  ") == "not a url")
    assert(WebFn.canonicalizeUrl("mailto:x@y.z") == "mailto:x@y.z")
  }

  test("native expressions equal the Scala cores through a projection") {
    import spark.implicits._
    val rows = Seq(
      "<p>Hello &amp; <b>world</b></p><script>x</script>",
      "<h1>T</h1><p>body text</p>",
      "plain")
    val urls = Seq(
      "HTTP://A.B:80/x?utm_source=s&b=2&a=1#f",
      "https://c.d/e",
      "nonsense")
    val got = rows.toDF("h")
      .select(WebOp.htmlToText(col("h")).as("t")).as[String].collect()
    assert(got.toSeq == rows.map(WebFn.htmlToText))
    val gotU = urls.toDF("u")
      .select(WebOp.canonicalizeUrl(col("u")).as("c")).as[String].collect()
    assert(gotU.toSeq == urls.map(WebFn.canonicalizeUrl))
  }

  test("lineDedup drops over-threshold lines and rebuilds in order") {
    import spark.implicits._
    // 8 docs: 'COMMON' in all 8, 'semi' in 3, content unique
    val docs = (0 until 8).map { i =>
      (i.toLong, s"COMMON\n${if (i < 3) "semi\n" else ""}content $i\nend $i")
    }.toDF("id", "text")
    val out = WebOp.lineDedup(docs, "id", "text", maxDocs = 2)
      .as[(Long, String, Long)].collect().sortBy(_._1)
    assert(out.length == 8)
    out.foreach { case (id, text, n) =>
      assert(text == s"content $id\nend $id", s"doc $id")
      assert(n == 2L)
    }
    // threshold 4 lets the 3-doc 'semi' line through
    val loose = WebOp.lineDedup(docs, "id", "text", maxDocs = 4)
      .as[(Long, String, Long)].collect().sortBy(_._1)
    assert(loose(0)._2 == "semi\ncontent 0\nend 0")
    assert(loose(5)._2 == "content 5\nend 5")
  }

  test("lineDedup: a fully-boilerplate document disappears") {
    import spark.implicits._
    val docs = Seq(
      (1L, "SAME\nSAME2"), (2L, "SAME\nSAME2"), (3L, "SAME\nSAME2"),
      (4L, "SAME\nunique")).toDF("id", "text")
    val out = WebOp.lineDedup(docs, "id", "text", maxDocs = 2)
      .as[(Long, String, Long)].collect().sortBy(_._1)
    assert(out.map(_._1).toSeq == Seq(4L))
    assert(out(0)._2 == "unique")
  }

  test("urlDedup groups all variants of a canonical url") {
    import spark.implicits._
    val df = Seq(
      (1L, "HTTP://X.com:80/a?b=2&a=1"),
      (2L, "http://x.com/a?a=1&b=2#frag"),
      (3L, "http://x.com/a?a=1&b=2&utm_source=s"),
      (4L, "http://x.com/other")).toDF("id", "url")
    val out = WebOp.urlDedup(df, "id", "url")
      .as[(String, Long, Long)].collect().sortBy(_._1)
    assert(out.toSeq == Seq(
      ("http://x.com/a?a=1&b=2", 1L, 3L),
      ("http://x.com/other", 4L, 1L)))
  }

  test("resolveUrl: RFC 3986 reference shapes") {
    val base = "http://a.com/dir/sub/page.html?q=1#top"
    // absolute pass-through (fragment in ref stripped)
    assert(WebFn.resolveUrl(base, "https://b.com/x#s") == "https://b.com/x")
    // protocol-relative takes the base scheme
    assert(WebFn.resolveUrl(base, "//cdn.com/y") == "http://cdn.com/y")
    assert(WebFn.resolveUrl("https://a.com/p", "//cdn.com/y") ==
      "https://cdn.com/y")
    // rooted
    assert(WebFn.resolveUrl(base, "/r/1") == "http://a.com/r/1")
    // plain relative merges with the base directory
    assert(WebFn.resolveUrl(base, "x/2") == "http://a.com/dir/sub/x/2")
    // ../ collapse, including multiple levels and past-root clamping
    assert(WebFn.resolveUrl(base, "../d/3") == "http://a.com/dir/d/3")
    assert(WebFn.resolveUrl(base, "../../d/4") == "http://a.com/d/4")
    assert(WebFn.resolveUrl(base, "../../../../d") == "http://a.com/d")
    // ./ and trailing-dot segments
    assert(WebFn.resolveUrl(base, "./e") == "http://a.com/dir/sub/e")
    assert(WebFn.resolveUrl(base, "f/./g/../h") == "http://a.com/dir/sub/f/h")
    // query-only keeps the base path
    assert(WebFn.resolveUrl(base, "?z=2") ==
      "http://a.com/dir/sub/page.html?z=2")
    // ref query survives resolution
    assert(WebFn.resolveUrl(base, "p?k=v") == "http://a.com/dir/sub/p?k=v")
    // authority-less base path merges from root
    assert(WebFn.resolveUrl("http://a.com", "x") == "http://a.com/x")
    // drops: fragment-only, empty, non-http schemes, non-http base
    assert(WebFn.resolveUrl(base, "#s") == null)
    assert(WebFn.resolveUrl(base, "") == null)
    assert(WebFn.resolveUrl(base, "mailto:a@b.c") == null)
    assert(WebFn.resolveUrl(base, "javascript:void(0)") == null)
    assert(WebFn.resolveUrl(base, "ftp://f.com/x") == null)
    assert(WebFn.resolveUrl("mailto:x@y.z", "a") == null)
    assert(WebFn.resolveUrl("not a url", "a") == null)
  }

  test("extractLinks with base column resolves relative hrefs; non-links drop") {
    import spark.implicits._
    val pages = Seq(
      (1L, "http://h.com/d/p.html",
        """<a href="/r/1">a</a><a href='../u/2'>b</a><a href="v/3">c</a>
          |<a href='//c.com/4'>d</a><a href="#f">e</a>
          |<a href='mailto:x@y.z'>f</a><a href="https://abs.com/5">g</a>"""
          .stripMargin)
    ).toDF("id", "url", "html")
    val out = WebOp.extractLinks(pages, "id", "html", "url")
      .as[(Long, String)].collect().toSet
    assert(out == Set(
      (1L, "http://h.com/r/1"),
      (1L, "http://h.com/u/2"),
      (1L, "http://h.com/d/v/3"),
      (1L, "http://c.com/4"),
      (1L, "https://abs.com/5")))
  }

  test("extractLinks: attribute boundary and paired quotes") {
    import spark.implicits._
    val pages = Seq(
      (1L, """<a href="http://a.com/1">x</a> <a data-href="http://evil.com/d">y</a>"""),
      (2L, """<a xhref="http://evil.com/x">n</a> <a HREF='http://b.com/2'>u</a>"""),
      (3L, """<a href="http://broken.com/m'>bad</a>"""),
      (4L, """<a href = "https://c.com/3">s</a> <a href='#frag'>f</a>""")
    ).toDF("id", "html")
    val out = WebOp.extractLinks(pages, "id", "html")
      .as[(Long, String)].collect().toSet
    // data-href/xhref are different attributes; the mismatched-quote
    // page must capture NOTHING (the old single-class regex captured
    // across the quote mismatch); case-insensitive HREF counts
    assert(out == Set((1L, "http://a.com/1"), (2L, "http://b.com/2"),
      (4L, "https://c.com/3")))
  }

  test("extractImageRefs: src/alt pairs, alt-less, decoys, resolution") {
    import spark.implicits._
    val pages = Seq(
      (1L, "http://h.com/d/p.html",
        """<img src="http://img.com/a.jpg" alt="cap one">
          |<IMG ALT='cap two' SRC='//cdn.com/b.png'>
          |<img src="../up/c.gif">
          |<img data-src='http://evil.com/d.jpg' alt='decoy'>
          |<img alt="srcless">
          |<img src="#frag" alt="frag">""".stripMargin)
    ).toDF("id", "url", "html")
    val out = WebOp.extractImageRefs(pages, "id", "html", "url")
      .as[(Long, String, String)].collect().toSet
    // attribute order is free (alt before src captures too); data-src
    // is a different attribute; src-less and fragment-only tags drop;
    // alt-less images survive with '' (still a joinable pair)
    assert(out == Set(
      (1L, "http://img.com/a.jpg", "cap one"),
      (1L, "http://cdn.com/b.png", "cap two"),
      (1L, "http://h.com/up/c.gif", "")))
  }

  test("parseRobots: RFC 9309 group selection, merge, comments, empty disallow") {
    import graft.functions.Web.{parseRobots, RobotRule}
    val body =
      """# politeness config
        |User-agent: googlebot-news
        |Disallow: /news-archive
        |
        |User-agent: *
        |Disallow: /private
        |Allow: /private/ok  # inline comment
        |Crawl-delay: 10
        |Disallow:
        |
        |User-agent: googlebot
        |User-agent: fancybot
        |Disallow: /tmp
        |
        |User-agent: googlebot
        |Disallow: /beta
        |""".stripMargin
    // most specific token wins: googlebot-news is longer than googlebot
    assert(parseRobots(body, "Googlebot-News") ===
      Seq(RobotRule("/news-archive", false)))
    // googlebot matches two groups carrying the same token — merged;
    // the * group does NOT apply once a specific token matches
    assert(parseRobots(body, "GoogleBot").toSet ===
      Set(RobotRule("/tmp", false), RobotRule("/beta", false)))
    // unmatched agents fall to *; empty Disallow and crawl-delay drop
    assert(parseRobots(body, "otherbot") ===
      Seq(RobotRule("/private", false), RobotRule("/private/ok", true)))
    assert(parseRobots(null, "x") === Nil)
    // rules before any user-agent line are ignored
    assert(parseRobots("Disallow: /x\nUser-agent: *\nAllow: /y", "b") ===
      Seq(RobotRule("/y", true)))
  }

  test("robotsRegex + robotsFilter: RFC longest-match precedence end to end") {
    import graft.functions.Web.robotsRegex
    import spark.implicits._
    // regex conversion: escape metachars, * wildcard, $ anchor
    assert(robotsRegex("/p/a.b") === "^/p/a\\.b")
    assert(robotsRegex("/*.htm$") === "^/.*\\.htm$")
    assert("/page.htm".matches(robotsRegex("/*.htm$")))
    assert(!"/page.html".matches(robotsRegex("/*.htm$")))
    // Google's documented precedence examples, through the full
    // parse -> rules -> filter pipeline
    val robots = Seq(("ex.com",
      """User-agent: *
        |Allow: /p
        |Disallow: /
        |Allow: /folder
        |Disallow: /folder
        |Allow: /page
        |Disallow: /*.htm
        |Allow: /$
        |""".stripMargin)).toDF("host", "body")
    val rules = graft.operators.Web.robotsRules(robots, "host", "body", "mybot")
    val urls = Seq(
      "https://ex.com/page",       // /page (5) beats / (1) -> allow
      "https://ex.com/folder/x",   // tie /folder vs /folder -> allow
      "https://ex.com/page.htm",   // /*.htm (6) beats /page (5) -> disallow
      "https://ex.com/",           // /$ (2) beats / (1) -> allow
      "https://ex.com/other"       // only / matches -> disallow
    ).toDF("url")
    val got = graft.operators.Web.robotsFilter(urls, "url", rules)
      .as[(String, Boolean)].collect().toMap
    assert(got === Map(
      "https://ex.com/page" -> true,
      "https://ex.com/folder/x" -> true,
      "https://ex.com/page.htm" -> false,
      "https://ex.com/" -> true,
      "https://ex.com/other" -> false))
    // a host with no rules defaults (both ways)
    val stray = Seq("https://none.com/x").toDF("url")
    assert(graft.operators.Web.robotsFilter(stray, "url", rules)
      .as[(String, Boolean)].head()._2)
    assert(!graft.operators.Web.robotsFilter(stray, "url", rules,
      defaultAllow = false).as[(String, Boolean)].head()._2)
  }

  test("mainContentBlocks: segmentation, link accounting, densities") {
    import graft.functions.Web
    val html =
      """<html><head><title>My Page</title><style>p{}</style>
        |<script>var x = '<p>not a block</p>';</script></head><body>
        |<nav><a href="/">Home</a> <a href="/x">About us</a></nav>
        |<p>the quick brown fox jumps over the lazy dog</p>
        |<p>short one</p>
        |<div><a href="/a">a link heavy block of mostly anchors</a> x</div>
        |<p>alpha beta gamma delta epsilon zeta</p>
        |<!-- <p>comment</p> --><footer><a href="/p">Privacy</a></footer>
        |</body></html>""".stripMargin
    val blocks = Web.mainContentBlocks(html)
    val byText = blocks.map(b => b.text -> b).toMap
    assert(blocks.map(_.text) == Vector(
      "My Page",
      "Home About us",
      "the quick brown fox jumps over the lazy dog",
      "short one",
      "a link heavy block of mostly anchors x",
      "alpha beta gamma delta epsilon zeta",
      "Privacy"))
    // link accounting: per-segment normalized lengths
    assert(byText("Home About us").linkChars == 4 + 8)
    assert(byText("a link heavy block of mostly anchors x").linkChars ==
      "a link heavy block of mostly anchors".length)
    assert(byText("the quick brown fox jumps over the lazy dog").linkChars == 0)
    // densities
    val prose = byText("the quick brown fox jumps over the lazy dog")
    assert(prose.words == 9 && prose.stopwords == 2) // the x2
    // classification: only the prose block passes all three thresholds
    assert(blocks.filter(Web.isContentBlock).map(_.text) == Vector(
      "the quick brown fox jumps over the lazy dog"))
  }

  test("mainContent: planted boilerplate removed, article text survives") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val html =
      """<html><body><nav><a href="/">Home</a> <a href="/a">About</a> <a href="/c">Contact</a></nav>
        |<div>Cookie consent banner accept decline ok</div>
        |<p>the data of a pipeline is moved to the warehouse</p>
        |<footer><a href="/p">Privacy</a> <a href="/t">Terms</a> site map</footer>
        |</body></html>""".stripMargin
    val got = graft.operators.Web.mainContent(
      Seq((1L, html)).toDF("doc_id", "html"), "doc_id", "html")
      .collect().head
    assert(got.getInt(1) == 4) // nav, cookie, article, footer
    assert(got.getInt(2) == 1)
    assert(got.getString(3) ==
      "the data of a pipeline is moved to the warehouse")
    // a link spanning a block boundary counts into both parts
    val spanning = "<p>one <a href='/'>two</p><p>three</a> four five</p>"
    val b2 = graft.functions.Web.mainContentBlocks(spanning)
    assert(b2.map(_.text) == Vector("one two", "three four five"))
    assert(b2(0).linkChars == 3 && b2(1).linkChars == 5)
    // markup-split anchor text: the inline-tag separator counts into
    // linkChars too, or link density is understated
    val markup = "<p><a href='/'>one<b>two</b></a> x</p>"
    val b3 = graft.functions.Web.mainContentBlocks(markup)
    assert(b3.map(_.text) == Vector("one two x"))
    assert(b3(0).linkChars == "one two".length, b3(0).toString)
  }
}
