package graft.functions

/** Web-corpus scalar cores: HTML→text extraction and URL
  * canonicalization — the two per-document scalars a Common-Crawl-style
  * ingestion pipeline runs on every record before any dedup/quality
  * stage. Pure JVM string passes (no regex backtracking, no external
  * libs) so the Catalyst wrappers in
  * [[graft.plans.NativeExpressions]] stay inside whole-stage codegen.
  *
  * The reference engine has no web ingestion at all (its sources are
  * genomic: SURVEY.md §2.1); these follow the published extraction
  * rules (strip script/style/comments, block tags break lines, decode
  * entities, collapse whitespace) rather than any particular library.
  */
object Web {

  /** Tags whose open OR close breaks a line in the extracted text —
    * the HTML block-level elements (plus `br` and `title`). Everything
    * else (span, a, b, em, …) separates words with a single space.
    */
  private val BlockTags: Set[String] = Set(
    "p", "div", "br", "h1", "h2", "h3", "h4", "h5", "h6", "li", "ul",
    "ol", "tr", "table", "title", "article", "section", "blockquote",
    "pre", "header", "footer", "nav", "hr", "form", "dl", "dt", "dd")

  /** Extract readable text from HTML. Deterministic rules, in order:
    *  1. `<!-- … -->` comments, `<script>…</script>` and
    *     `<style>…</style>` elements (case-insensitive, attributes
    *     allowed) are dropped entirely; unterminated ones drop to EOF —
    *     truncated pages never leak raw javascript into the corpus.
    *  2. Every other tag is replaced by a separator: newline for block
    *     tags ([[BlockTags]]), space otherwise. `>` inside quoted
    *     attribute values does not end a tag.
    *  3. Character entities decode: the named five (&amp; &lt; &gt;
    *     &quot; &apos;) plus &nbsp; (→ space) and numeric `&#NNN;` /
    *     `&#xHH;`. Unknown entities pass through literally.
    *  4. Whitespace normalizes: runs of spaces/tabs/CR collapse to one
    *     space, lines trim, empty lines drop, lines join with `\n`.
    */
  def htmlToText(html: String): String = {
    if (html == null) return null
    val n = html.length
    val out = new java.lang.StringBuilder(n)
    var i = 0
    while (i < n) {
      val c = html.charAt(i)
      if (c == '<') {
        if (html.startsWith("<!--", i)) {
          val end = html.indexOf("-->", i + 4)
          i = if (end < 0) n else end + 3
        } else if (tagNameAt(html, i) == "script") {
          i = skipElement(html, i, "script")
        } else if (tagNameAt(html, i) == "style") {
          i = skipElement(html, i, "style")
        } else {
          val name = tagNameAt(html, i)
          out.append(if (BlockTags.contains(name)) '\n' else ' ')
          i = skipTag(html, i)
        }
      } else if (c == '&') {
        val (decoded, next) = decodeEntity(html, i)
        out.append(decoded)
        i = next
      } else {
        out.append(c)
        i += 1
      }
    }
    normalizeWhitespace(out.toString)
  }

  /** The stopword list shared by the main-content classifier and its
    * DuckDB oracle (mirrors TextFunctions' quality-score list).
    */
  val MainStopWords: Seq[String] =
    Seq("the", "a", "and", "of", "to", "in", "is")

  /** One segmented HTML block for main-content extraction: normalized
    * single-line text, the summed length of its normalized `<a>`
    * segments, its word count, and its stopword count.
    */
  final case class HtmlBlock(text: String, linkChars: Int, words: Int,
                             stopwords: Int)

  /** jusText/trafilatura-style block segmentation: split the page at
    * [[BlockTags]] boundaries (script/style/comments dropped, entities
    * decoded, other tags read as word separators), normalize each
    * block to one line, and measure the three densities the
    * main-content rule needs. A link spanning a block boundary counts
    * into each block's tally for the part it covers; nested `<a>` is
    * treated as a new segment.
    */
  def mainContentBlocks(html: String): Vector[HtmlBlock] = {
    val n = html.length
    val blocks = Vector.newBuilder[HtmlBlock]
    val buf = new java.lang.StringBuilder()
    val linkBuf = new java.lang.StringBuilder()
    var linkChars = 0
    var inLink = false

    def oneLine(s: String): String = {
      val out = new java.lang.StringBuilder(s.length)
      var pending = false
      var i = 0
      while (i < s.length) {
        val c = s.charAt(i)
        if (c == ' ' || c == '\t' || c == '\r' || c == '\n') pending = true
        else {
          if (pending && out.length > 0) out.append(' ')
          pending = false
          out.append(c)
        }
        i += 1
      }
      out.toString
    }

    def endLinkSegment(): Unit = {
      if (inLink || linkBuf.length > 0) {
        linkChars += oneLine(linkBuf.toString).length
        linkBuf.setLength(0)
      }
    }

    def flush(): Unit = {
      endLinkSegment()
      val t = oneLine(buf.toString)
      if (t.nonEmpty) {
        val ws = t.split(' ')
        val stop = ws.count(MainStopWords.contains)
        blocks += HtmlBlock(t, linkChars, ws.length, stop)
      }
      buf.setLength(0)
      linkChars = 0
    }

    var i = 0
    while (i < n) {
      val c = html.charAt(i)
      if (c == '<') {
        if (html.startsWith("<!--", i)) {
          val end = html.indexOf("-->", i + 4)
          i = if (end < 0) n else end + 3
        } else if (tagNameAt(html, i) == "script") {
          i = skipElement(html, i, "script")
        } else if (tagNameAt(html, i) == "style") {
          i = skipElement(html, i, "style")
        } else {
          val name = tagNameAt(html, i)
          if (name == "a") {
            endLinkSegment()
            inLink = i + 1 < n && html.charAt(i + 1) != '/'
          }
          if (BlockTags.contains(name)) flush()
          else {
            buf.append(' ')
            // an inline tag inside an anchor separates link words too,
            // or linkChars undercounts markup-split anchors and link
            // density is understated
            if (inLink) linkBuf.append(' ')
          }
          i = skipTag(html, i)
        }
      } else if (c == '&') {
        val (decoded, next) = decodeEntity(html, i)
        buf.append(decoded)
        if (inLink) linkBuf.append(decoded)
        i = next
      } else {
        buf.append(c)
        if (inLink) linkBuf.append(c)
        i += 1
      }
    }
    flush()
    blocks.result()
  }

  /** The main-content classification rule — integer thresholds only,
    * so the DuckDB oracle replays it verbatim: a block is CONTENT iff
    * it has at least 5 words, its link density is under 1/3
    * (3·linkChars < chars), and its stopword density is at least 1/8
    * (8·stopwords ≥ words). Navigation/footer blocks die on length or
    * link density; cookie banners and keyword soup die on stopword
    * density; running prose survives.
    */
  def isContentBlock(b: HtmlBlock): Boolean =
    b.words >= 5 && 3 * b.linkChars < b.text.length &&
      8 * b.stopwords >= b.words

  /** Lower-cased element name of the tag opening at `i` (which must
    * point at '<'); "" when it is not a well-formed tag start.
    */
  private def tagNameAt(html: String, i: Int): String = {
    var j = i + 1
    val n = html.length
    if (j < n && html.charAt(j) == '/') j += 1
    val start = j
    while (j < n && (html.charAt(j).isLetterOrDigit)) j += 1
    if (j == start) "" else html.substring(start, j).toLowerCase
  }

  /** Index just past the '>' closing the tag at `i`; quote-aware so a
    * literal '>' inside an attribute value does not terminate it.
    * Unterminated tag → EOF.
    */
  private def skipTag(html: String, i: Int): Int = {
    var j = i + 1
    val n = html.length
    var quote: Char = 0
    while (j < n) {
      val c = html.charAt(j)
      if (quote != 0) { if (c == quote) quote = 0 }
      else if (c == '"' || c == '\'') quote = c
      else if (c == '>') return j + 1
      j += 1
    }
    n
  }

  /** Index just past `</name…>` for a content-swallowing element
    * (script/style) whose open tag starts at `i`. Unterminated → EOF.
    */
  private def skipElement(html: String, i: Int, name: String): Int = {
    val bodyStart = skipTag(html, i)
    val n = html.length
    var j = bodyStart
    while (j < n) {
      if (html.charAt(j) == '<' && j + 1 < n && html.charAt(j + 1) == '/' &&
        tagNameAt(html, j) == name) return skipTag(html, j)
      j += 1
    }
    n
  }

  /** Decode the entity starting at `i` ('&'); returns (replacement,
    * next index). Unknown/unterminated entities return the literal '&'
    * and advance one char.
    */
  private def decodeEntity(html: String, i: Int): (String, Int) = {
    val n = html.length
    val semi = html.indexOf(';', i + 1)
    if (semi < 0 || semi - i > 10) return ("&", i + 1)
    val body = html.substring(i + 1, semi)
    val rep = body match {
      case "amp" => "&"
      case "lt" => "<"
      case "gt" => ">"
      case "quot" => "\""
      case "apos" => "'"
      case "nbsp" => " "
      case num if num.startsWith("#x") || num.startsWith("#X") =>
        try String.valueOf(Integer.parseInt(num.substring(2), 16).toChar)
        catch { case _: Exception => null }
      case num if num.startsWith("#") =>
        try String.valueOf(Integer.parseInt(num.substring(1)).toChar)
        catch { case _: Exception => null }
      case _ => null
    }
    if (rep == null) ("&", i + 1) else (rep, semi + 1)
  }

  private def normalizeWhitespace(s: String): String = {
    val out = new java.lang.StringBuilder(s.length)
    var pendingSpace = false
    var pendingNewline = false
    var emittedAny = false
    var lineHasContent = false
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\n') { pendingNewline = true; pendingSpace = false }
      else if (c == ' ' || c == '\t' || c == '\r') pendingSpace = true
      else {
        if (pendingNewline && lineHasContent) { out.append('\n'); lineHasContent = false }
        else if (pendingSpace && lineHasContent) out.append(' ')
        pendingNewline = false; pendingSpace = false
        out.append(c)
        lineHasContent = true
        emittedAny = true
      }
      i += 1
    }
    if (emittedAny) out.toString else ""
  }

  /** Query parameters dropped by [[canonicalizeUrl]]: per-click
    * tracking identifiers that make byte-identical pages look like
    * distinct URLs — the first-stage dedup killer in any crawl.
    */
  private val TrackingParams: Set[String] =
    Set("fbclid", "gclid", "msclkid", "ref", "ref_src")
  private def isTracking(key: String): Boolean =
    TrackingParams.contains(key) || key.startsWith("utm_")

  /** Canonicalize an http(s) URL for URL-level dedup. Deterministic
    * rules: lowercase scheme and host; drop the default port (`:80`
    * http, `:443` https); drop the `#fragment`; drop tracking query
    * params ([[TrackingParams]] + `utm_*`); sort surviving params by
    * (key, value) byte order; empty path → `/`; empty surviving query →
    * no `?`. Non-http(s) inputs (no `://`) pass through trimmed — the
    * caller decides what to do with mailto:/ftp:/garbage rows.
    */
  def canonicalizeUrl(url: String): String = {
    if (url == null) return null
    val s = url.trim
    val schemeEnd = s.indexOf("://")
    if (schemeEnd <= 0) return s
    val scheme = s.substring(0, schemeEnd).toLowerCase
    var rest = s.substring(schemeEnd + 3)
    val frag = rest.indexOf('#')
    if (frag >= 0) rest = rest.substring(0, frag)
    val pathStart = rest.indexOf('/')
    val qStart = rest.indexOf('?')
    val authEnd =
      if (pathStart < 0 && qStart < 0) rest.length
      else if (pathStart < 0) qStart
      else if (qStart < 0) pathStart
      else math.min(pathStart, qStart)
    var auth = rest.substring(0, authEnd)
    val afterAuth = rest.substring(authEnd)
    // userinfo@ survives untouched; only the host:port half normalizes
    val at = auth.lastIndexOf('@')
    val (userinfo, hostPort) =
      if (at >= 0) (auth.substring(0, at + 1), auth.substring(at + 1))
      else ("", auth)
    val colon = hostPort.lastIndexOf(':')
    val (host, port) =
      if (colon >= 0 && hostPort.substring(colon + 1).forall(_.isDigit))
        (hostPort.substring(0, colon), hostPort.substring(colon + 1))
      else (hostPort, "")
    val defaultPort = (scheme == "http" && port == "80") ||
      (scheme == "https" && port == "443")
    auth = userinfo + host.toLowerCase +
      (if (port.nonEmpty && !defaultPort) ":" + port else "")
    val (path0, query) = {
      val q = afterAuth.indexOf('?')
      if (q < 0) (afterAuth, "")
      else (afterAuth.substring(0, q), afterAuth.substring(q + 1))
    }
    val path = if (path0.isEmpty) "/" else path0
    val kept = query.split("&").filter(_.nonEmpty).filter { p =>
      val k = p.indexOf('=') match {
        case -1 => p
        case e => p.substring(0, e)
      }
      !isTracking(k.toLowerCase)
    }
    val sorted = kept.sortWith { (a, b) =>
      val c = compareBytes(a, b); c < 0
    }
    scheme + "://" + auth + path +
      (if (sorted.nonEmpty) "?" + sorted.mkString("&") else "")
  }

  /** Resolve an href against its page URL — RFC 3986 §5 reference
    * resolution restricted to hierarchical http(s) bases, the rule set
    * a crawl link-graph needs (most real hrefs are relative; without
    * resolution the graph feeding pageRank is missing most of its
    * edges). Deterministic, replayable rules in order:
    *  - the ref's `#fragment` is stripped first; an empty remainder
    *    (fragment-only / empty href) is a same-page link → null;
    *  - a ref with its own scheme passes through iff http(s); other
    *    schemes (mailto:, javascript:, data:, ftp:) → null;
    *  - `//host/...` (protocol-relative) takes the base's scheme;
    *  - `/rooted`, `relative`, and `../relative` paths merge with the
    *    base path (§5.2.3) and collapse dot segments (§5.2.4, the
    *    standard in/out algorithm — excess `..` stops at the root);
    *  - `?query`-only refs keep the base path with the new query;
    *  - a base that is not an absolute http(s) URL → null.
    * Returns null to mean "drop this link".
    */
  def resolveUrl(baseUrl: String, href: String): String = {
    if (baseUrl == null || href == null) return null
    var ref = href.trim
    val hash = ref.indexOf('#')
    if (hash >= 0) ref = ref.substring(0, hash)
    if (ref.isEmpty) return null
    schemePrefix(ref) match {
      case null => ()
      case s => return if (s == "http" || s == "https") ref else null
    }
    val base = baseUrl.trim
    val schemeEnd = base.indexOf("://")
    if (schemeEnd <= 0) return null
    val scheme = base.substring(0, schemeEnd).toLowerCase
    if (scheme != "http" && scheme != "https") return null
    if (ref.startsWith("//")) return scheme + ":" + ref
    var rest = base.substring(schemeEnd + 3)
    val bf = rest.indexOf('#')
    if (bf >= 0) rest = rest.substring(0, bf)
    val slash = rest.indexOf('/')
    val q = rest.indexOf('?')
    val authEnd =
      if (slash < 0 && q < 0) rest.length
      else if (slash < 0) q
      else if (q < 0) slash
      else math.min(slash, q)
    val authority = rest.substring(0, authEnd)
    if (authority.isEmpty) return null
    val after = rest.substring(authEnd)
    val basePath = {
      val qq = after.indexOf('?')
      if (qq >= 0) after.substring(0, qq) else after
    }
    val (refPath, refQuery) = {
      val qq = ref.indexOf('?')
      if (qq >= 0) (ref.substring(0, qq), ref.substring(qq)) else (ref, "")
    }
    if (refPath.isEmpty) // "?query"-only: base path, new query (§5.3)
      return scheme + "://" + authority +
        (if (basePath.isEmpty) "/" else basePath) + refQuery
    val merged =
      if (refPath.startsWith("/")) refPath
      else {
        val cut = basePath.lastIndexOf('/')
        (if (cut >= 0) basePath.substring(0, cut + 1) else "/") + refPath
      }
    scheme + "://" + authority + removeDotSegments(merged) + refQuery
  }

  /** Lower-cased scheme when `s` begins `scheme:` per RFC 3986
    * (ALPHA *(ALPHA/DIGIT/+/-/.) ":"), else null.
    */
  private def schemePrefix(s: String): String = {
    if (s.isEmpty || !s.charAt(0).isLetter) return null
    var i = 1
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == ':') return s.substring(0, i).toLowerCase
      if (!(c.isLetterOrDigit || c == '+' || c == '-' || c == '.')) return null
      i += 1
    }
    null
  }

  /** RFC 3986 §5.2.4 remove_dot_segments — the standard input/output
    * buffer walk; excess `..` at the root is dropped, not kept.
    */
  private def removeDotSegments(input: String): String = {
    var in = input
    val out = new StringBuilder
    def popSegment(): Unit = {
      val idx = out.lastIndexOf("/")
      out.setLength(if (idx < 0) 0 else idx)
    }
    while (in.nonEmpty) {
      if (in.startsWith("../")) in = in.substring(3)
      else if (in.startsWith("./")) in = in.substring(2)
      else if (in.startsWith("/./")) in = "/" + in.substring(3)
      else if (in == "/.") in = "/"
      else if (in.startsWith("/../")) { in = "/" + in.substring(4); popSegment() }
      else if (in == "/..") { in = "/"; popSegment() }
      else if (in == "." || in == "..") in = ""
      else {
        val start = if (in.startsWith("/")) 1 else 0
        val idx = in.indexOf('/', start)
        if (idx < 0) { out.append(in); in = "" }
        else { out.append(in.substring(0, idx)); in = in.substring(idx) }
      }
    }
    out.toString
  }

  private def compareBytes(a: String, b: String): Int = {
    val ab = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val bb = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    val n = math.min(ab.length, bb.length)
    while (i < n) {
      val d = (ab(i) & 0xff) - (bb(i) & 0xff)
      if (d != 0) return d
      i += 1
    }
    ab.length - bb.length
  }

  /** One robots.txt rule for a chosen agent: the raw path `pattern`
    * (as written, `*`/`$` wildcards intact) and whether it allows.
    */
  final case class RobotRule(pattern: String, allow: Boolean)

  /** Parse a robots.txt body into the rules that apply to `agent` —
    * RFC 9309 group semantics: consecutive `User-agent:` lines open a
    * group sharing the rules that follow; the crawler obeys the group
    * with the MOST SPECIFIC matching agent token (longest token that
    * is a case-insensitive prefix of `agent`; `*` matches anything at
    * specificity zero), merging every group carrying that token.
    * `Allow:`/`Disallow:` values keep their `*`/`$` wildcards; an
    * empty `Disallow:` means "no restriction" and drops; comments
    * (`#…`) strip; unknown directives (crawl-delay, sitemap) are
    * ignored. Percent-decoding equivalence is out of scope
    * (documented RFC MAY).
    */
  def parseRobots(body: String, agent: String): Seq[RobotRule] = {
    if (body == null) return Nil
    final case class Group(agents: List[String],
                           rules: scala.collection.mutable.ListBuffer[RobotRule])
    val groups = scala.collection.mutable.ListBuffer.empty[Group]
    var openAgents: List[String] = Nil // consecutive UA lines pending
    var current: Group = null
    body.linesIterator.foreach { raw =>
      val noComment = {
        val h = raw.indexOf('#')
        if (h >= 0) raw.substring(0, h) else raw
      }
      val line = noComment.trim
      val colon = line.indexOf(':')
      if (colon > 0) {
        val key = line.substring(0, colon).trim.toLowerCase
        val value = line.substring(colon + 1).trim
        key match {
          case "user-agent" =>
            if (current != null) { openAgents = Nil; current = null }
            openAgents = value.toLowerCase :: openAgents
          case "allow" | "disallow" =>
            if (current == null) {
              current = Group(openAgents,
                scala.collection.mutable.ListBuffer.empty)
              openAgents = Nil
              if (current.agents.nonEmpty) groups += current
            }
            if (value.nonEmpty && current.agents.nonEmpty)
              current.rules += RobotRule(value, key == "allow")
          case _ => // crawl-delay, sitemap, unknown: ignored
        }
      }
    }
    val a = agent.toLowerCase
    val best = groups.iterator.flatMap(_.agents).filter(ua =>
      ua == "*" || a.startsWith(ua)).maxByOption(ua =>
      if (ua == "*") 0 else ua.length)
    best match {
      case None => Nil
      case Some(ua) =>
        groups.filter(_.agents.contains(ua)).flatMap(_.rules).toSeq
    }
  }

  /** A robots path pattern → anchored Java regex: `*` matches any
    * char run, a TRAILING `$` anchors the end, everything else is
    * literal (regex metachars escaped). The match target is the URL's
    * path+query; without `$` the pattern is a prefix match.
    */
  def robotsRegex(pattern: String): String = {
    val (bodyP, anchored) =
      if (pattern.endsWith("$")) (pattern.dropRight(1), true)
      else (pattern, false)
    val sb = new StringBuilder("^")
    bodyP.foreach {
      case '*' => sb.append(".*")
      case c if "\\.[]{}()+-?^$|".indexOf(c) >= 0 =>
        sb.append('\\').append(c)
      case c => sb.append(c)
    }
    if (anchored) sb.append('$')
    sb.toString
  }
}
