package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** PDF text extraction — the single biggest untapped document source in
  * real training corpora. Implements the CLASSIC subset of the
  * published PDF 1.4/1.7 file format from scratch:
  *
  *   - file structure: header, indirect objects (`N G obj … endobj`),
  *     cross-reference TABLE sections chained via `/Prev`, trailer,
  *     `startxref`;
  *   - the object grammar: numbers, names (with `#xx` escapes), literal
  *     strings (nested parens, all spec escapes incl. octal and
  *     line continuations), hex strings, arrays, dictionaries,
  *     indirect references (`N G R` with two-token lookahead), streams
  *     with direct or INDIRECT `/Length`;
  *   - stream filters: none or `/FlateDecode` (zlib via
  *     `java.util.zip.Inflater` — the PNG path's codec);
  *   - the document tree: catalog → `/Pages` (nested page-tree nodes) →
  *     `/Page` → `/Contents` (single stream or array, concatenated);
  *   - the content-stream text machine: `BT`/`ET`, shows `Tj`, `'`,
  *     `"`, `TJ` (negative kerns ≤ [[WordKernThreshold]] read as word
  *     breaks), line moves `Td`/`TD`/`T*`/`Tm` (each starts a new output
  *     line), with all other operators consuming their operands;
  *   - text bytes decoded as WinAnsi/CP-1252 ([[graft.functions.Cp1252]]).
  *
  * OUT OF SCOPE — loud refusal, never silent garbage: encrypted files
  * (`/Encrypt`), cross-reference STREAMS (PDF 1.5 `/Type /XRef` — the
  * `xref` keyword must sit at the startxref offset), object streams,
  * any filter other than FlateDecode, `/DecodeParms` predictors, and
  * inline images (`BI`).
  *
  * Fixture doctrine (like JPEG/WAV/GIF): [[asPdfMedia]] renders each
  * document's text through OUR OWN writer [[encode]] — plain and
  * Flate-compressed streams, three show-operator families by doc_id —
  * and the q386 oracle replays the 6-words-per-line / 4-lines-per-page
  * layout arithmetically in DuckDB. PdfSpec additionally byte-pins a
  * hand-written fixture so writer and reader cannot share a bug.
  */
object Pdf {

  /** A TJ kern at or below this (thousandths of an em, negative) is a
    * word break; shallower kerns are letter-spacing and add nothing.
    * −250 ≈ a space's width in a 1000-unit em — larger gaps read as
    * deliberate separation (public pdftotext uses the same idea).
    */
  val WordKernThreshold: Double = -180.0

  // ------------------------------------------------------------------
  // Object model
  // ------------------------------------------------------------------

  sealed trait PObj
  final case class PNum(v: Double, isInt: Boolean) extends PObj
  final case class PStr(bytes: Array[Byte]) extends PObj
  final case class PName(s: String) extends PObj
  final case class PArr(items: Vector[PObj]) extends PObj
  final case class PDict(m: Map[String, PObj]) extends PObj
  final case class PRef(num: Int, gen: Int) extends PObj
  final case class PBool(b: Boolean) extends PObj
  case object PNull extends PObj
  /** An operator keyword — only produced in content-stream mode. */
  final case class POp(op: String) extends PObj
  final case class PStream(dict: PDict, raw: Array[Byte]) extends PObj

  private def isWhite(b: Int): Boolean =
    b == 0x00 || b == 0x09 || b == 0x0a || b == 0x0c || b == 0x0d || b == 0x20
  private def isDelim(b: Int): Boolean =
    b == '(' || b == ')' || b == '<' || b == '>' || b == '[' || b == ']' ||
      b == '{' || b == '}' || b == '/' || b == '%'

  /** Recursive-descent lexer/parser over a byte window. In `content`
    * mode unknown keywords become [[POp]] tokens instead of errors and
    * `R`-reference lookahead is disabled (content streams carry no
    * indirect references).
    */
  private final class Parser(bytes: Array[Byte], var p: Int,
                             content: Boolean) {
    def eof: Boolean = { skipWs(); p >= bytes.length }

    def skipWs(): Unit = {
      var go = true
      while (go) {
        while (p < bytes.length && isWhite(bytes(p) & 0xff)) p += 1
        if (p < bytes.length && bytes(p) == '%') {
          while (p < bytes.length && bytes(p) != '\n' && bytes(p) != '\r')
            p += 1
        } else go = false
      }
    }

    def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"PDF parse error at byte $p: $msg")

    def expectKeyword(kw: String): Unit = {
      skipWs()
      val got = keyword()
      if (got != kw) fail(s"expected '$kw', got '$got'")
    }

    /** Read a bare keyword (regular characters). */
    def keyword(): String = {
      skipWs()
      val start = p
      while (p < bytes.length && !isWhite(bytes(p) & 0xff) &&
        !isDelim(bytes(p) & 0xff)) p += 1
      if (p == start) fail("expected a keyword")
      new String(bytes, start, p - start, "US-ASCII")
    }

    def parseName(): PName = {
      require(bytes(p) == '/', "name must start with /")
      p += 1
      val sb = new java.lang.StringBuilder()
      while (p < bytes.length && !isWhite(bytes(p) & 0xff) &&
        !isDelim(bytes(p) & 0xff)) {
        if (bytes(p) == '#') {
          if (p + 2 >= bytes.length) fail("truncated #xx name escape")
          val h = new String(bytes, p + 1, 2, "US-ASCII")
          sb.append(Integer.parseInt(h, 16).toChar)
          p += 3
        } else { sb.append((bytes(p) & 0xff).toChar); p += 1 }
      }
      PName(sb.toString)
    }

    def parseNumber(): PNum = {
      skipWs()
      val start = p
      if (p < bytes.length && (bytes(p) == '+' || bytes(p) == '-')) p += 1
      var isInt = true
      while (p < bytes.length &&
        (bytes(p) >= '0' && bytes(p) <= '9' || bytes(p) == '.')) {
        if (bytes(p) == '.') isInt = false
        p += 1
      }
      if (p == start) fail("expected a number")
      val s = new String(bytes, start, p - start, "US-ASCII")
      PNum(s.toDouble, isInt)
    }

    def parseLiteralString(): PStr = {
      require(bytes(p) == '(', "literal string must start with (")
      p += 1
      val out = new java.io.ByteArrayOutputStream()
      var depth = 1
      while (depth > 0) {
        if (p >= bytes.length) fail("unterminated literal string")
        val c = bytes(p) & 0xff
        c match {
          case '(' => depth += 1; out.write(c); p += 1
          case ')' =>
            depth -= 1
            if (depth > 0) out.write(c)
            p += 1
          case '\\' =>
            if (p + 1 >= bytes.length) fail("dangling backslash")
            val e = bytes(p + 1) & 0xff
            e match {
              case 'n' => out.write('\n'); p += 2
              case 'r' => out.write('\r'); p += 2
              case 't' => out.write('\t'); p += 2
              case 'b' => out.write('\b'); p += 2
              case 'f' => out.write('\f'); p += 2
              case '(' | ')' | '\\' => out.write(e); p += 2
              case '\r' => // line continuation: swallow \r or \r\n
                p += 2
                if (p < bytes.length && bytes(p) == '\n') p += 1
              case '\n' => p += 2
              case d if d >= '0' && d <= '7' =>
                var v = 0
                var k = 0
                p += 1
                while (k < 3 && p < bytes.length &&
                  bytes(p) >= '0' && bytes(p) <= '7') {
                  v = v * 8 + (bytes(p) - '0'); p += 1; k += 1
                }
                out.write(v & 0xff)
              case other => fail(f"bad string escape \\${other.toChar}")
            }
          case '\r' => // raw EOL inside a string normalizes to \n
            out.write('\n')
            p += 1
            if (p < bytes.length && bytes(p) == '\n') p += 1
          case _ => out.write(c); p += 1
        }
      }
      PStr(out.toByteArray)
    }

    def parseHexString(): PStr = {
      require(bytes(p) == '<', "hex string must start with <")
      p += 1
      val out = new java.io.ByteArrayOutputStream()
      var hi = -1
      var open = true
      while (open) {
        if (p >= bytes.length) fail("unterminated hex string")
        val c = bytes(p) & 0xff
        if (c == '>') {
          if (hi >= 0) out.write(hi << 4) // odd digit count: pad with 0
          open = false
          p += 1
        } else if (isWhite(c)) p += 1
        else {
          val d = Character.digit(c, 16)
          if (d < 0) fail(f"bad hex digit '${c.toChar}'")
          if (hi < 0) hi = d else { out.write((hi << 4) | d); hi = -1 }
          p += 1
        }
      }
      PStr(out.toByteArray)
    }

    def parseObject(): PObj = pushBackNum match {
      case Some(n) => pushBackNum = None; n
      case None => parseObjectRaw()
    }

    private def parseObjectRaw(): PObj = {
      skipWs()
      if (p >= bytes.length) fail("unexpected end of input")
      val c = bytes(p) & 0xff
      c match {
        case '/' => parseName()
        case '(' => parseLiteralString()
        case '[' =>
          p += 1
          val items = Vector.newBuilder[PObj]
          skipWs()
          // pushBackNum: a parked number is still an element — the
          // closing ']' test must not end the array over it
          while (pushBackNum.isDefined || {
            if (p >= bytes.length) fail("unterminated array")
            bytes(p) != ']' }) { items += parseObject(); skipWs() }
          p += 1
          PArr(items.result())
        case '<' =>
          if (p + 1 < bytes.length && bytes(p + 1) == '<') {
            p += 2
            val m = Map.newBuilder[String, PObj]
            skipWs()
            while ({ if (p + 1 >= bytes.length) fail("unterminated dict")
              !(bytes(p) == '>' && bytes(p + 1) == '>') }) {
              val PName(k) = parseName(): @unchecked
              m += k -> parseObject()
              skipWs()
            }
            p += 2
            PDict(m.result())
          } else parseHexString()
        case d if d >= '0' && d <= '9' || d == '+' || d == '-' || d == '.' =>
          val n = parseNumber()
          // two-token lookahead for `N G R` indirect references
          if (!content && n.isInt && n.v >= 0) {
            val save = p
            skipWs()
            val c2 = if (p < bytes.length) bytes(p) & 0xff else -1
            if (c2 >= '0' && c2 <= '9') {
              val g = parseNumber()
              val save2 = p
              skipWs()
              if (g.isInt && p < bytes.length && bytes(p) == 'R' &&
                (p + 1 >= bytes.length || isWhite(bytes(p + 1) & 0xff) ||
                  isDelim(bytes(p + 1) & 0xff))) {
                p += 1
                return PRef(n.v.toInt, g.v.toInt)
              }
              p = save2
              pushBackNum = Some(g) // already-parsed following number
              return n
            }
            p = save
          }
          n
        case _ =>
          keyword() match {
            case "true" => PBool(true)
            case "false" => PBool(false)
            case "null" => PNull
            case kw if content => POp(kw)
            case kw => fail(s"unexpected keyword '$kw'")
          }
      }
    }

    /** The `N G`-without-`R` lookahead parses one number too many; it
      * parks it here and the next [[parseObject]] replays it.
      */
    var pushBackNum: Option[PNum] = None

    def next(): PObj = parseObject()
  }

  // ------------------------------------------------------------------
  // File structure: xref + objects
  // ------------------------------------------------------------------

  private final class Doc(bytes: Array[Byte]) {
    require(bytes.length >= 8 &&
      new String(bytes, 0, 5, "US-ASCII") == "%PDF-", "not a PDF (no header)")

    // NOTE: declared before `xref`, whose initializer assigns it —
    // a later `= _` declaration would re-null it after the fact.
    var trailerDict: PDict = _

    /** object number → byte offset (newest xref section wins) */
    val xref: Map[Int, Long] = {
      val tailStart = math.max(0, bytes.length - 64)
      val tail = new String(bytes, tailStart, bytes.length - tailStart,
        "US-ASCII")
      val sx = tail.lastIndexOf("startxref")
      require(sx >= 0, "no startxref — truncated or not a classic PDF")
      val px = new Parser(bytes, tailStart + sx + "startxref".length,
        content = false)
      val off = px.parseNumber()
      require(off.isInt && off.v >= 0 && off.v < bytes.length,
        s"startxref offset ${off.v} out of range")
      val acc = scala.collection.mutable.Map.empty[Int, Long]
      var sectionOff = off.v.toLong
      var guard = 0
      while (sectionOff >= 0) {
        require(guard < 64, "xref /Prev chain too deep (cycle?)")
        guard += 1
        val pr = new Parser(bytes, sectionOff.toInt, content = false)
        pr.skipWs()
        val kw = pr.keyword()
        require(kw == "xref",
          s"'$kw' at the xref offset — cross-reference STREAMS (PDF 1.5+) " +
            "are out of scope for this classic-PDF reader")
        pr.skipWs()
        // subsections until 'trailer'
        var inSections = true
        while (inSections) {
          pr.skipWs()
          if (bytes(pr.p) == 't') {
            pr.expectKeyword("trailer")
            inSections = false
          } else {
            val start = pr.parseNumber()
            val count = pr.parseNumber()
            require(start.isInt && count.isInt, "bad xref subsection header")
            (0 until count.v.toInt).foreach { i =>
              pr.skipWs()
              require(pr.p + 18 <= bytes.length, "truncated xref entry")
              val entry = new String(bytes, pr.p, 18, "US-ASCII")
              val eOff = entry.substring(0, 10).toLong
              val kind = entry.charAt(17)
              require(kind == 'n' || kind == 'f', s"bad xref entry '$entry'")
              val num = start.v.toInt + i
              // older sections must not override newer ones
              if (kind == 'n' && !acc.contains(num)) acc(num) = eOff
              pr.p += 18
            }
          }
        }
        val trailer = pr.parseObject() match {
          case d: PDict => d
          case other => pr.fail(s"trailer is not a dictionary: $other")
        }
        require(!trailer.m.contains("Encrypt"),
          "encrypted PDF — out of scope, refusing rather than extracting garbage")
        if (trailerDict == null) trailerDict = trailer
        sectionOff = trailer.m.get("Prev") match {
          case Some(PNum(v, true)) => v.toLong
          case None => -1L
          case other => pr.fail(s"bad /Prev: $other")
        }
      }
      acc.toMap
    }

    private val cache = scala.collection.mutable.Map.empty[Int, PObj]

    def resolve(o: PObj): PObj = o match {
      case PRef(num, _) => fetch(num)
      case other => other
    }

    def fetch(num: Int): PObj = cache.getOrElseUpdate(num, {
      val off = xref.getOrElse(num,
        throw new IllegalArgumentException(s"object $num not in xref"))
      val pr = new Parser(bytes, off.toInt, content = false)
      val n = pr.parseNumber()
      require(n.isInt && n.v.toInt == num,
        s"xref points object $num at an 'obj' numbered ${n.v}")
      pr.parseNumber() // generation
      pr.expectKeyword("obj")
      val body = pr.next()
      pr.skipWs()
      if (pr.p + 6 <= bytes.length && bytes(pr.p) == 's' &&
        new String(bytes, pr.p, 6, "US-ASCII") == "stream") {
        val dict = body match {
          case d: PDict => d
          case other => pr.fail(s"stream preceded by non-dict $other")
        }
        pr.p += 6
        // spec: 'stream' is followed by \r\n or \n (never bare \r)
        if (bytes(pr.p) == '\r') pr.p += 1
        require(bytes(pr.p) == '\n', "stream keyword not followed by EOL")
        pr.p += 1
        val len = resolve(dict.m.getOrElse("Length",
          pr.fail("stream without /Length"))) match {
          case PNum(v, true) => v.toInt
          case other => pr.fail(s"bad /Length: $other")
        }
        require(pr.p + len <= bytes.length, "stream data past end of file")
        val raw = java.util.Arrays.copyOfRange(bytes, pr.p, pr.p + len)
        pr.p += len
        pr.skipWs()
        pr.expectKeyword("endstream")
        PStream(dict, raw)
      } else {
        pr.expectKeyword("endobj")
        body
      }
    })

    def decodedStream(obj: PObj): Array[Byte] = obj match {
      case PStream(dict, raw) =>
        require(!dict.m.contains("DecodeParms"),
          "/DecodeParms predictors are out of scope")
        dict.m.get("Filter").map(resolve) match {
          case None => raw
          case Some(PName("FlateDecode")) => inflate(raw)
          case Some(PArr(Vector(PName("FlateDecode")))) => inflate(raw)
          case Some(other) =>
            throw new IllegalArgumentException(
              s"unsupported stream filter $other (only FlateDecode)")
        }
      case other =>
        throw new IllegalArgumentException(s"expected a stream, got $other")
    }
  }

  private def inflate(data: Array[Byte]): Array[Byte] = {
    val inf = new java.util.zip.Inflater()
    inf.setInput(data)
    val out = new java.io.ByteArrayOutputStream(data.length * 4)
    val buf = new Array[Byte](8192)
    try {
      while (!inf.finished()) {
        val n = inf.inflate(buf)
        if (n == 0) {
          require(!inf.needsInput && !inf.needsDictionary,
            "truncated FlateDecode stream")
        } else out.write(buf, 0, n)
      }
    } catch {
      case e: java.util.zip.DataFormatException =>
        throw new IllegalArgumentException(s"corrupt FlateDecode stream: $e")
    } finally inf.end()
    out.toByteArray
  }

  // ------------------------------------------------------------------
  // Text extraction
  // ------------------------------------------------------------------

  /** Extract per-page text. Page text is the content stream's shows in
    * order; every line-move (`Td`/`TD`/`T*`/`Tm`/`'`/`"`) starts a new
    * output line; TJ kerns at or below [[WordKernThreshold]] become
    * single spaces. Bytes decode as CP-1252/WinAnsi, loudly on the
    * undefined slots.
    */
  def extractText(pdf: Array[Byte]): Seq[String] = {
    val doc = new Doc(pdf)
    val root = doc.resolve(doc.trailerDict.m.getOrElse("Root",
      throw new IllegalArgumentException("trailer has no /Root"))) match {
      case d: PDict => d
      case other =>
        throw new IllegalArgumentException(s"/Root is not a dict: $other")
    }
    val pagesRoot = doc.resolve(root.m.getOrElse("Pages",
      throw new IllegalArgumentException("catalog has no /Pages")))

    // walk the page tree (nested /Pages nodes allowed)
    val pages = Vector.newBuilder[PDict]
    def walk(node: PObj): Unit = doc.resolve(node) match {
      case d: PDict =>
        doc.resolve(d.m.getOrElse("Type", PNull)) match {
          case PName("Pages") =>
            doc.resolve(d.m.getOrElse("Kids",
              throw new IllegalArgumentException("/Pages without /Kids"))) match {
              case PArr(kids) => kids.foreach(walk)
              case other =>
                throw new IllegalArgumentException(s"bad /Kids: $other")
            }
          case PName("Page") => pages += d
          case other =>
            throw new IllegalArgumentException(s"bad page-tree node: $other")
        }
      case other =>
        throw new IllegalArgumentException(s"page-tree node not a dict: $other")
    }
    walk(pagesRoot)

    pages.result().map { page =>
      val content = doc.resolve(page.m.getOrElse("Contents", PNull)) match {
        case PNull => Array.emptyByteArray
        case s: PStream => doc.decodedStream(s)
        case PArr(parts) =>
          // multiple content streams concatenate with interleaved EOLs
          parts.map(r => doc.decodedStream(doc.resolve(r)))
            .reduceOption((a, b) => a ++ Array[Byte]('\n') ++ b)
            .getOrElse(Array.emptyByteArray)
        case other =>
          throw new IllegalArgumentException(s"bad /Contents: $other")
      }
      extractFromContent(content)
    }
  }

  /** The text machine over ONE page's decoded content bytes. */
  private[graft] def extractFromContent(content: Array[Byte]): String = {
    val pr = new Parser(content, 0, content = true)
    val sb = new java.lang.StringBuilder()
    var lineHasText = false
    val operands = scala.collection.mutable.ArrayBuffer.empty[PObj]

    def newline(): Unit =
      if (lineHasText) { sb.append('\n'); lineHasText = false }

    def show(s: PStr): Unit = {
      sb.append(graft.functions.Cp1252.decode(s.bytes))
      if (s.bytes.nonEmpty) lineHasText = true
    }

    while (!pr.eof) {
      pr.next() match {
        case POp(op) =>
          op match {
            case "BT" | "ET" => newline()
            case "Tj" =>
              operands.lastOption match {
                case Some(s: PStr) => show(s)
                case other => pr.fail(s"Tj without a string operand: $other")
              }
            case "'" =>
              newline()
              operands.lastOption match {
                case Some(s: PStr) => show(s)
                case other => pr.fail(s"' without a string operand: $other")
              }
            case "\"" =>
              newline()
              operands.lastOption match {
                case Some(s: PStr) => show(s)
                case other => pr.fail(s"\" without a string operand: $other")
              }
            case "TJ" =>
              operands.lastOption match {
                case Some(PArr(items)) =>
                  items.foreach {
                    case s: PStr => show(s)
                    case PNum(v, _) =>
                      if (v <= WordKernThreshold && lineHasText &&
                        sb.charAt(sb.length - 1) != ' ') sb.append(' ')
                    case other => pr.fail(s"bad TJ element: $other")
                  }
                case other => pr.fail(s"TJ without an array operand: $other")
              }
            case "Td" | "TD" | "T*" | "Tm" => newline()
            case "BI" =>
              pr.fail("inline images (BI) are out of scope")
            case _ => // Tf, TL, Tc, Tw, Tz, Ts, graphics ops: consume operands
          }
          operands.clear()
        case operand => operands += operand
      }
    }
    newline()
    // drop the trailing newline: page text is '\n'-separated lines
    if (sb.length > 0 && sb.charAt(sb.length - 1) == '\n')
      sb.setLength(sb.length - 1)
    sb.toString
  }

  // ------------------------------------------------------------------
  // Writer (fixture path)
  // ------------------------------------------------------------------

  /** Escape a text line into a PDF literal string (CP-1252 bytes;
    * non-ASCII as octal escapes so the reader's octal path is
    * exercised on every high byte).
    */
  private def literal(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length + 8)
    sb.append('(')
    s.foreach { ch =>
      val b = graft.functions.Cp1252.fromChar(ch.toInt)
      require(b >= 0, f"char U+${ch.toInt}%04x has no CP-1252 byte")
      if (ch == '(' || ch == ')' || ch == '\\') sb.append('\\').append(ch)
      else if (b >= 0x20 && b < 0x7f) sb.append(ch)
      // always 3 octal digits: an unpadded \12 followed by a literal
      // digit would mis-parse as \120
      else sb.append(f"\\$b%03o")
    }
    sb.append(')')
    sb.toString
  }

  private def hexStr(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length * 2 + 2)
    sb.append('<')
    s.foreach { ch =>
      val b = graft.functions.Cp1252.fromChar(ch.toInt)
      require(b >= 0, f"char U+${ch.toInt}%04x has no CP-1252 byte")
      sb.append(f"$b%02X")
    }
    sb.append('>')
    sb.toString
  }

  /** Render one page's lines as a content stream, in one of three
    * show-operator styles:
    * 0 — `Td` moves + `Tj` literal strings;
    * 1 — one `TJ` per line, words as separate strings with −250 word
    *     kerns and −20 letter kerns (the reader's kern rule is load-
    *     bearing);
    * 2 — `TL` + `'` move-show with HEX strings.
    */
  private[graft] def contentFor(lines: Seq[String], style: Int): String = {
    val sb = new java.lang.StringBuilder()
    sb.append("BT\n/F1 12 Tf\n")
    style match {
      case 0 =>
        sb.append("72 720 Td\n")
        lines.zipWithIndex.foreach { case (ln, i) =>
          if (i > 0) sb.append("0 -14 Td\n")
          sb.append(literal(ln)).append(" Tj\n")
        }
      case 1 =>
        sb.append("72 720 Td\n")
        lines.zipWithIndex.foreach { case (ln, i) =>
          if (i > 0) sb.append("0 -14 Td\n")
          val words = ln.split(" ", -1)
          sb.append('[')
          words.zipWithIndex.foreach { case (w, j) =>
            if (j > 0) sb.append(" -250 ")
            // split the word once more to plant a harmless letter kern
            if (w.length > 2) {
              sb.append(literal(w.substring(0, 1))).append(" -20 ")
                .append(literal(w.substring(1)))
            } else sb.append(literal(w))
          }
          sb.append("] TJ\n")
        }
      case _ =>
        sb.append("14 TL\n72 734 Td\n")
        lines.foreach { ln =>
          sb.append(hexStr(ln)).append(" '\n")
        }
    }
    sb.append("ET")
    sb.toString
  }

  /** Serialize a classic PDF: catalog, page tree, one Helvetica/WinAnsi
    * font, one content stream per page (zlib-deflated when `compress`),
    * a single-section xref table, trailer, startxref.
    */
  def encode(pageLines: Seq[Seq[String]], style: Int,
             compress: Boolean): Array[Byte] = {
    require(pageLines.nonEmpty, "a PDF needs at least one page")
    val out = new java.io.ByteArrayOutputStream()
    def ascii(s: String): Unit = out.write(s.getBytes("US-ASCII"))
    // header with the conventional binary comment line
    ascii("%PDF-1.4\n%")
    out.write(Array[Byte](0xe2.toByte, 0xe3.toByte, 0xcf.toByte, 0xd3.toByte))
    ascii("\n")

    val nPages = pageLines.size
    // object numbering: 1 catalog, 2 pages, 3 font,
    // 4..3+n page dicts, 4+n..3+2n content streams
    val firstPageObj = 4
    val firstContentObj = 4 + nPages
    val offsets = new Array[Long](4 + 2 * nPages) // index = obj number - 1

    def obj(num: Int)(body: => Unit): Unit = {
      offsets(num - 1) = out.size().toLong
      ascii(s"$num 0 obj\n")
      body
      ascii("\nendobj\n")
    }

    obj(1)(ascii("<< /Type /Catalog /Pages 2 0 R >>"))
    obj(2) {
      val kids = (0 until nPages)
        .map(i => s"${firstPageObj + i} 0 R").mkString(" ")
      ascii(s"<< /Type /Pages /Kids [$kids] /Count $nPages >>")
    }
    obj(3)(ascii("<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica " +
      "/Encoding /WinAnsiEncoding >>"))
    (0 until nPages).foreach { i =>
      obj(firstPageObj + i)(ascii(
        s"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] " +
          s"/Resources << /Font << /F1 3 0 R >> >> " +
          s"/Contents ${firstContentObj + i} 0 R >>"))
    }
    pageLines.zipWithIndex.foreach { case (lines, i) =>
      val plain = contentFor(lines, style).getBytes("US-ASCII")
      val data =
        if (!compress) plain
        else {
          val d = new java.util.zip.Deflater()
          d.setInput(plain); d.finish()
          val buf = new Array[Byte](plain.length + 64)
          val bos = new java.io.ByteArrayOutputStream()
          while (!d.finished()) bos.write(buf, 0, d.deflate(buf))
          d.end()
          bos.toByteArray
        }
      obj(firstContentObj + i) {
        val filter = if (compress) " /Filter /FlateDecode" else ""
        ascii(s"<< /Length ${data.length}$filter >>\nstream\n")
        out.write(data)
        ascii("\nendstream")
      }
    }

    val xrefOff = out.size().toLong
    val total = 4 + 2 * nPages
    ascii(s"xref\n0 ${total + 1}\n")
    ascii("0000000000 65535 f \n")
    offsets.foreach(o => ascii(f"$o%010d 00000 n \n"))
    ascii(s"trailer\n<< /Size ${total + 1} /Root 1 0 R >>\n" +
      s"startxref\n$xrefOff\n%%EOF\n")
    out.toByteArray
  }

  // ------------------------------------------------------------------
  // Dataset operators
  // ------------------------------------------------------------------

  /** Lines-per-page layout rule shared by the fixture and the q386
    * oracle: 6 words per line, 4 lines per page.
    */
  val WordsPerLine = 6
  val LinesPerPage = 4

  /** Render each document's text through the writer: words wrap at
    * [[WordsPerLine]], pages at [[LinesPerPage]]; show style =
    * doc_id % 3, Flate compression on even doc_ids.
    */
  def asPdfMedia(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    Parallelism.ensure(docs)
      .select(col("doc_id"), coalesce(col("text"), lit("")).as("text"))
      .as[(Long, String)]
      .mapPartitions { rows =>
        rows.map { case (id, text) =>
          val words = text.split(" ", -1).toSeq
          val lines = words.grouped(WordsPerLine).map(_.mkString(" ")).toSeq
          val pages = lines.grouped(LinesPerPage).map(_.toSeq).toSeq
          val payload = encode(if (pages.isEmpty) Seq(Seq("")) else pages,
            style = (id % 3).toInt, compress = id % 2 == 0)
          Multimodal.MediaRecord(id, payload)
        }
      }
      .toDF("doc_id", "payload")
  }

  final case class PdfText(doc_id: Long, n_pages: Int, text: String)

  /** Distributed extraction: one narrow pass, payloads never at the
    * driver. `text` is all pages' text joined with newlines.
    */
  def extractTexts(media: DataFrame): Dataset[PdfText] = {
    import media.sparkSession.implicits._
    media.select(col("doc_id"), col("payload"))
      .as[Multimodal.MediaRecord]
      .mapPartitions { records =>
        records.map { r =>
          val pages = extractText(r.payload)
          PdfText(r.doc_id, pages.size, pages.mkString("\n"))
        }
      }
  }
}
