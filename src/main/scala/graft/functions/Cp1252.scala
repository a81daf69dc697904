package graft.functions

/** The Windows-1252 code page (the published mapping — identical to
  * what PDF's WinAnsiEncoding is built on, and the code page real-world
  * mojibake usually round-trips through). Bytes 0x00..0x7F are ASCII;
  * 0xA0..0xFF are the Latin-1 block; 0x80..0x9F hold the Windows
  * additions below, with five code points (0x81 0x8D 0x8F 0x90 0x9D)
  * UNDEFINED. Shared by [[graft.operators.Pdf]] (WinAnsi text decode)
  * and [[TextFunctions]]'s fix_encoding (mojibake repair): both need
  * the same byte→char table, and the repair additionally needs the
  * char→byte inverse.
  */
object Cp1252 {

  /** 0x80..0x9F → Unicode code point; -1 marks the undefined slots. */
  private val HighTable: Array[Int] = Array(
    0x20ac, -1, 0x201a, 0x0192, 0x201e, 0x2026, 0x2020, 0x2021, // 80-87
    0x02c6, 0x2030, 0x0160, 0x2039, 0x0152, -1, 0x017d, -1,     // 88-8F
    -1, 0x2018, 0x2019, 0x201c, 0x201d, 0x2022, 0x2013, 0x2014, // 90-97
    0x02dc, 0x2122, 0x0161, 0x203a, 0x0153, -1, 0x017e, 0x0178) // 98-9F

  /** Byte (0..255) → Unicode code point, or -1 for the five undefined
    * CP-1252 slots.
    */
  def toChar(b: Int): Int = {
    val v = b & 0xff
    if (v < 0x80 || v >= 0xa0) v else HighTable(v - 0x80)
  }

  /** Unicode code point → CP-1252 byte (0..255), or -1 when the
    * character has no CP-1252 encoding.
    */
  def fromChar(cp: Int): Int = {
    if (cp < 0x80) cp
    else if (cp >= 0xa0 && cp <= 0xff) cp
    else {
      // the 27 Windows additions — linear scan over a 32-entry table
      var i = 0
      while (i < 32) {
        if (HighTable(i) == cp) return 0x80 + i
        i += 1
      }
      -1
    }
  }

  /** Decode a CP-1252 byte array to a String; throws on the undefined
    * slots (a curation pipeline must fail loudly on non-text bytes, not
    * guess).
    */
  def decode(bytes: Array[Byte]): String = {
    val sb = new java.lang.StringBuilder(bytes.length)
    var i = 0
    while (i < bytes.length) {
      val cp = toChar(bytes(i) & 0xff)
      require(cp >= 0,
        f"byte 0x${bytes(i) & 0xff}%02x is undefined in CP-1252")
      sb.append(cp.toChar)
      i += 1
    }
    sb.toString
  }
}
