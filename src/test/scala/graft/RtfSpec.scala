package graft

import graft.operators.Rtf
import org.scalatest.funsuite.AnyFunSuite

/** RTF writer/reader: round trips through the real escape and group
  * machinery, hand-written RTF streams as the second implementation
  * (so writer and reader cannot share a tokenizer bug), the spec's
  * group-scoped \uc / fallback-skip rules, destination skipping, and
  * loud refusals.
  */
class RtfSpec extends AnyFunSuite {

  test("encode → extractText round-trips paragraphs exactly") {
    val paras = Seq(
      "the quick brown fox jumps over the lazy dog",
      "a second paragraph with several words in it",
      "short one",
      "specials \\ { } and braces survive escaping",
      "unicode café straße 中文 here")
    val got = Rtf.extractText(Rtf.encode(paras))
    assert(got == paras.toVector)
  }

  test("empty and single-word paragraphs round-trip") {
    for (paras <- Seq(Seq(""), Seq("word"), Seq("", "a", ""), Seq("a b")))
      assert(Rtf.extractText(Rtf.encode(paras)) == paras.toVector,
        paras.toString)
  }

  test("hand-written RTF: control words, hex, unicode, groups, tab") {
    val rtf = ("{\\rtf1\\ansi\\deff0\\uc1" +
      "{\\fonttbl{\\f0 Calibri;}}" +
      "\\pard Hel{\\b lo} \\'77orld\\par" +
      "\\pard a\\tab b\\line c\\par" +
      "\\pard caf\\u233?s and \\u-3584? high\\par" + // -3584+65536 = 0xF200
      "}").getBytes("windows-1252")
    val got = Rtf.extractText(rtf)
    assert(got(0) == "Hello world")
    assert(got(1) == "a\tb\nc")
    assert(got(2) == "cafés and  high")
  }

  test("\\uc group scoping: fallback count restores on group pop") {
    // inside the group \uc2 makes \u skip TWO fallback chars; outside
    // the group the \uc1 default is restored
    val rtf = ("{\\rtf1\\ansi\\uc1 " +
      "A{\\uc2 \\u233??}B\\u234?C\\par}").getBytes("windows-1252")
    assert(Rtf.extractText(rtf) == Vector("AéBêC"))
  }

  test("fallback chars may themselves be hex escapes") {
    val rtf = ("{\\rtf1\\ansi\\uc1 " +
      "x\\u233\\'3fy\\par}").getBytes("windows-1252")
    assert(Rtf.extractText(rtf) == Vector("xéy"))
  }

  test("ignorable destinations and known destinations are skipped") {
    val rtf = ("{\\rtf1\\ansi\\uc1" +
      "{\\*\\generator Widget 9.9;}" +
      "{\\fonttbl{\\f0 Arial;}}" +
      "{\\colortbl;\\red0\\green0\\blue0;}" +
      "{\\info{\\title secret title}}" +
      "\\pard visible text only\\par}").getBytes("windows-1252")
    assert(Rtf.extractText(rtf) == Vector("visible text only"))
  }

  test("unknown control words are ignored per the forward-compat rule") {
    // \newfangled42: param 42 + the space delimiter are consumed with
    // the word; \qq-7 likewise with a negative parameter
    val rtf = ("{\\rtf1\\ansi\\uc1" +
      "\\pard\\newfangled42 keep\\qq-7 me\\par}").getBytes("windows-1252")
    assert(Rtf.extractText(rtf) == Vector("keepme"))
  }

  test("windows-1252 hex escapes decode through the real codepage") {
    // 0x93/0x94 are curly quotes, 0xe9 is é in cp1252
    val rtf = ("{\\rtf1\\ansi\\uc1" +
      "\\pard \\'93q\\'94 \\'e9\\par}").getBytes("windows-1252")
    assert(Rtf.extractText(rtf) ==
      Vector("“q” é"))
  }

  test("\\bin raw bytes are skipped even when they contain braces") {
    val body = ("{\\rtf1\\ansi\\uc1\\pard a" +
      "{\\pict\\bin5 ").getBytes("windows-1252") ++
      Array[Byte]('}', '{', 0x00, '\\', 'z') ++
      ("}b\\par}").getBytes("windows-1252")
    assert(Rtf.extractText(body) == Vector("ab"))
  }

  test("raw CR/LF bytes in the stream are ignored") {
    val rtf = ("{\\rtf1\\ansi\\uc1\r\n\\pard one\r\ntwo\\par\r\n}")
      .getBytes("windows-1252")
    assert(Rtf.extractText(rtf) == Vector("onetwo"))
  }

  test("trailing text without \\par becomes a final paragraph") {
    val rtf = "{\\rtf1\\ansi\\uc1\\pard first\\par second}"
      .getBytes("windows-1252")
    assert(Rtf.extractText(rtf) == Vector("first", "second"))
  }

  test("malformed streams fail loudly") {
    // not RTF at all
    intercept[IllegalArgumentException](
      Rtf.extractText("plain text".getBytes("US-ASCII")))
    // unbalanced open brace
    intercept[IllegalArgumentException](
      Rtf.extractText("{\\rtf1{\\b oops".getBytes("US-ASCII")))
    // unbalanced close brace
    intercept[IllegalArgumentException](
      Rtf.extractText("{\\rtf1 }}".getBytes("US-ASCII")))
    // EOF inside hex escape
    intercept[IllegalArgumentException](
      Rtf.extractText("{\\rtf1 \\'4".getBytes("US-ASCII")))
    // EOF after backslash
    intercept[IllegalArgumentException](
      Rtf.extractText("{\\rtf1 x\\".getBytes("US-ASCII")))
    // \bin past EOF
    intercept[IllegalArgumentException](
      Rtf.extractText("{\\rtf1 {\\pict\\bin99 x}}".getBytes("US-ASCII")))
  }

  test("escapeWord stride rule: k%5==2 goes out as hex") {
    val e = Rtf.escapeWord("abcdefgh")
    assert(e == "ab\\'63defg\\'68")
  }
}
