package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Baseline TIFF 6.0 codec + dataset operators — the fourth real image
  * container after JPEG, PNG, and GIF ([[Jpeg]], [[Multimodal.Png]],
  * [[Gif]]): scanned-document corpora and print pipelines still ship
  * TIFF, and its three baseline compressions exercise codec machinery
  * the other formats don't (PackBits RLE and the MSB-first LZW variant
  * with EARLY CHANGE — one code earlier than GIF's width switch).
  *
  * Pure-JVM, spec-from-scratch per the public TIFF 6.0 specification:
  * II little-endian writer, IFD walk (both byte orders on read),
  * multi-strip images (RowsPerStrip), Compression 1 (none),
  * 32773 (PackBits), and 5 (LZW, MSB-first, early change), 8-bit
  * grayscale and RGB. TiffSpec cross-validates both directions against
  * the JDK's javax.imageio TIFF plugin (reader AND writer, all three
  * compressions).
  *
  * Scale shape: the same as the sibling codecs — one narrow
  * mapPartitions pass per operator, payloads never at the driver.
  */
object Tiff {

  // TIFF 6.0 tag ids
  private val TImageWidth = 256
  private val TImageLength = 257
  private val TBitsPerSample = 258
  private val TCompression = 259
  private val TPhotometric = 262
  private val TStripOffsets = 273
  private val TSamplesPerPixel = 277
  private val TRowsPerStrip = 278
  private val TStripByteCounts = 279

  val CompNone = 1
  val CompLzw = 5
  val CompPackBits = 32773

  // ------------------------------------------------------------------
  // PackBits (TIFF 6.0 §9)
  // ------------------------------------------------------------------

  /** PackBits compress: replicate runs of ≥3 as (257-n, byte), literal
    * runs as (n-1, bytes). Never crosses the input end; the simple
    * greedy form every writer uses.
    */
  private[graft] def packBits(in: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    var i = 0
    while (i < in.length) {
      var run = 1
      while (i + run < in.length && run < 128 && in(i + run) == in(i)) run += 1
      if (run >= 3) {
        out.write(257 - run); out.write(in(i)); i += run
      } else {
        // literal run: until the next ≥3 replicate or 128 bytes
        val start = i
        i += run
        var lit = run
        while (i < in.length && lit < 128) {
          var r2 = 1
          while (i + r2 < in.length && r2 < 3 && in(i + r2) == in(i)) r2 += 1
          if (r2 >= 3 && i + 2 < in.length && in(i + 2) == in(i)) {
            // a replicate run starts here
            lit = 129 // break
          } else { i += 1; lit += 1 }
        }
        val n = math.min(i, in.length) - start
        out.write(n - 1)
        out.write(in, start, n)
      }
    }
    out.toByteArray
  }

  /** PackBits decompress into exactly `expected` bytes; -128 is a
    * no-op per the spec. Fails loudly on overrun/truncation.
    */
  private[graft] def unpackBits(in: Array[Byte], expected: Int): Array[Byte] = {
    val out = new Array[Byte](expected)
    var i = 0
    var o = 0
    while (o < expected) {
      require(i < in.length, "truncated PackBits stream")
      val n = in(i); i += 1
      if (n >= 0) {
        require(i + n + 1 <= in.length && o + n + 1 <= expected,
          "PackBits literal overruns")
        System.arraycopy(in, i, out, o, n + 1); i += n + 1; o += n + 1
      } else if (n != -128) {
        require(i < in.length && o + (1 - n) <= expected,
          "PackBits replicate overruns")
        java.util.Arrays.fill(out, o, o + 1 - n, in(i)); i += 1; o += 1 - n
      }
    }
    out
  }

  // ------------------------------------------------------------------
  // TIFF LZW (TIFF 6.0 §13): MSB-first packing, EARLY CHANGE
  // ------------------------------------------------------------------

  /** TIFF-variant LZW compress: 8-bit symbols, codes MSB-first,
    * ClearCode 256 / EOI 257, width switches ONE CODE EARLIER than the
    * GIF variant (at next == 2^width − 1, the spec's "early change"),
    * dictionary reset via ClearCode at 4094 per the reference writers.
    */
  private[graft] def lzwEncode(in: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    var bitBuf = 0L
    var bitCnt = 0
    // The emission width mirrors the DECODER's registers exactly: the
    // decoder adds an entry for every received data code except the
    // first since a clear, then widens (early change) at
    // next == 2^w − 1. The add for code k lands between reading k and
    // k+1, so it is applied as PENDING bookkeeping before the next
    // emission — including before EOI/ClearCode, where the final data
    // code's add can cross a width boundary the in-loop schedule never
    // sees (the classic last-code/EOI width bug; MSB-first packing
    // makes it fatal rather than pad-masked).
    var codeSize = 9
    var decNext = 258
    var pending = false
    var emitted = 0 // data codes since the last clear
    def put(code: Int): Unit = {
      bitBuf = (bitBuf << codeSize) | code
      bitCnt += codeSize
      while (bitCnt >= 8) {
        out.write(((bitBuf >>> (bitCnt - 8)) & 0xff).toInt)
        bitCnt -= 8
      }
    }
    def applyPending(): Unit = if (pending) {
      if (decNext < 4096) {
        decNext += 1
        if (decNext == (1 << codeSize) - 1 && codeSize < 12) codeSize += 1
      }
      pending = false
    }
    def emitData(code: Int): Unit = {
      applyPending()
      put(code)
      pending = emitted >= 1
      emitted += 1
    }
    val dict = new java.util.HashMap[Integer, Integer](8192)
    def key(prefix: Int, b: Int): Integer = Integer.valueOf((prefix << 8) | b)
    var assign = 258 // entry numbering (== the decoder's)
    def emitClear(): Unit = {
      applyPending()
      put(256)
      pending = false; emitted = 0
      decNext = 258; codeSize = 9; assign = 258
      dict.clear()
    }
    put(256)
    if (in.nonEmpty) {
      var cur = in(0) & 0xff
      var i = 1
      while (i < in.length) {
        val b = in(i) & 0xff
        val hit = dict.get(key(cur, b))
        if (hit != null) cur = hit.intValue()
        else {
          emitData(cur)
          dict.put(key(cur, b), Integer.valueOf(assign))
          assign += 1
          // spec-mandated reset margin: emit ClearCode before the
          // 12-bit table fills (libtiff and the JDK expect it here)
          if (assign == 4094) emitClear()
          cur = b
        }
        i += 1
      }
      emitData(cur)
    }
    applyPending()
    put(257)
    if (bitCnt > 0) out.write(((bitBuf << (8 - bitCnt)) & 0xff).toInt)
    out.toByteArray
  }

  /** TIFF-variant LZW decompress into exactly `expected` bytes. */
  private[graft] def lzwDecode(in: Array[Byte], expected: Int): Array[Byte] = {
    val prefix = new Array[Int](4096)
    val suffix = new Array[Byte](4096)
    val stack = new Array[Byte](4096)
    val out = new Array[Byte](expected)
    var outPos = 0
    var codeSize = 9
    var next = 258
    var prev = -1
    var bitBuf = 0L
    var bitCnt = 0
    var pos = 0
    var done = false
    while (!done) {
      while (bitCnt < codeSize && pos < in.length) {
        bitBuf = (bitBuf << 8) | (in(pos) & 0xffL)
        bitCnt += 8
        pos += 1
      }
      require(bitCnt >= codeSize, "truncated TIFF LZW stream")
      val code = ((bitBuf >>> (bitCnt - codeSize)) & ((1 << codeSize) - 1)).toInt
      bitCnt -= codeSize
      if (code == 256) {
        next = 258; codeSize = 9; prev = -1
      } else if (code == 257) {
        done = true
      } else {
        require(code < next || (code == next && prev >= 0),
          s"TIFF LZW code $code out of range (next=$next)")
        var sp = 0
        var c = if (code == next) prev else code
        while (c >= 258) { stack(sp) = suffix(c); sp += 1; c = prefix(c) }
        require(c < 256, s"TIFF LZW chain hit reserved code $c")
        val firstChar = c.toByte
        require(outPos + sp + 1 + (if (code == next) 1 else 0) <= expected,
          "TIFF LZW output overruns the declared strip size")
        out(outPos) = firstChar; outPos += 1
        while (sp > 0) { sp -= 1; out(outPos) = stack(sp); outPos += 1 }
        if (code == next) { out(outPos) = firstChar; outPos += 1 }
        if (prev >= 0 && next < 4096) {
          prefix(next) = prev
          suffix(next) = firstChar
          next += 1
          // early change: widen when the NEXT code could be 2^w − 1
          if (next == (1 << codeSize) - 1 && codeSize < 12) codeSize += 1
        }
        prev = code
      }
    }
    require(outPos == expected,
      s"TIFF strip decoded $outPos of $expected declared bytes")
    out
  }

  // ------------------------------------------------------------------
  // Container
  // ------------------------------------------------------------------

  final case class Image(width: Int, height: Int, channels: Int,
                         photometric: Int, compression: Int,
                         pixels: Array[Byte])

  private val RowsPerStrip = 8

  /** Write a baseline II TIFF: 8-bit gray (photometric 1, 1 sample) or
    * RGB (photometric 2, 3 samples), strips of [[RowsPerStrip]] rows,
    * Compression 1 / 5 / 32773.
    */
  def encode(width: Int, height: Int, channels: Int, compression: Int,
             pixels: Array[Byte]): Array[Byte] = {
    require(channels == 1 || channels == 3, s"channels $channels")
    require(pixels.length == width * height * channels, "pixel buffer size")
    require(compression == CompNone || compression == CompLzw ||
      compression == CompPackBits, s"compression $compression")
    val rowBytes = width * channels
    val nStrips = (height + RowsPerStrip - 1) / RowsPerStrip
    val strips = (0 until nStrips).map { s =>
      val r0 = s * RowsPerStrip
      val rows = math.min(RowsPerStrip, height - r0)
      val raw = java.util.Arrays.copyOfRange(pixels, r0 * rowBytes,
        (r0 + rows) * rowBytes)
      compression match {
        case CompNone => raw
        case CompLzw => lzwEncode(raw)
        case CompPackBits => packBits(raw)
      }
    }
    val out = new java.io.ByteArrayOutputStream()
    def u16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    def u32(v: Long): Unit = {
      out.write((v & 0xff).toInt); out.write(((v >> 8) & 0xff).toInt)
      out.write(((v >> 16) & 0xff).toInt); out.write(((v >> 24) & 0xff).toInt)
    }
    out.write('I'); out.write('I'); u16(42); u32(8)
    // IFD at offset 8; entry list sorted by tag — nine entries for
    // both pixel formats (gray's BitsPerSample is inline, RGB's is an
    // out-of-line triple)
    val nEntries = 9
    val ifdSize = 2 + nEntries * 12 + 4
    var dataOff = 8L + ifdSize
    // out-of-line areas: BitsPerSample (RGB only), StripOffsets,
    // StripByteCounts (when nStrips > 2), then strip data
    val bpsOff = dataOff
    if (channels == 3) dataOff += 6
    val soOff = dataOff
    if (nStrips > 1) dataOff += 4L * nStrips
    // strip byte counts: always LONG; inline only when there is 1 strip
    val sbcInline = nStrips == 1
    val sbcOff =
      if (nStrips > 1) { val o = dataOff; dataOff += 4L * nStrips; o }
      else 0L
    val stripDataOff = dataOff
    val stripOffsets = strips.scanLeft(stripDataOff)((acc, s) => acc + s.length)
    u16(nEntries)
    def entry(tag: Int, typ: Int, count: Long, value: Long): Unit = {
      u16(tag); u16(typ); u32(count)
      if (typ == 3 && count == 1) { u16(value.toInt); u16(0) } else u32(value)
    }
    entry(TImageWidth, 3, 1, width)
    entry(TImageLength, 3, 1, height)
    if (channels == 3) entry(TBitsPerSample, 3, 3, bpsOff)
    else entry(TBitsPerSample, 3, 1, 8)
    entry(TCompression, 3, 1, compression)
    entry(TPhotometric, 3, 1, if (channels == 3) 2 else 1)
    if (nStrips == 1) entry(TStripOffsets, 4, 1, stripOffsets(0))
    else entry(TStripOffsets, 4, nStrips, soOff)
    entry(TSamplesPerPixel, 3, 1, channels)
    entry(TRowsPerStrip, 3, 1, RowsPerStrip)
    if (sbcInline) entry(TStripByteCounts, 4, 1, strips(0).length)
    else entry(TStripByteCounts, 4, nStrips, sbcOff)
    u32(0) // next IFD
    if (channels == 3) { u16(8); u16(8); u16(8) }
    if (nStrips > 1) stripOffsets.init.foreach(u32)
    if (!sbcInline) strips.foreach(s => u32(s.length))
    strips.foreach(s => out.write(s, 0, s.length))
    out.toByteArray
  }

  /** Decode a baseline TIFF (either byte order): IFD walk, strip
    * reassembly, all three baseline compressions, 8-bit gray/RGB.
    * Throws on anything malformed or out of this baseline scope.
    */
  def decode(bytes: Array[Byte]): Image = {
    require(bytes.length >= 8, "truncated TIFF header")
    val le = bytes(0) == 'I'.toByte && bytes(1) == 'I'.toByte
    require(le || (bytes(0) == 'M'.toByte && bytes(1) == 'M'.toByte),
      "bad TIFF byte-order mark")
    def u16(at: Int): Int = {
      require(at >= 0 && at + 2 <= bytes.length, s"TIFF read past end at $at")
      if (le) (bytes(at) & 0xff) | ((bytes(at + 1) & 0xff) << 8)
      else ((bytes(at) & 0xff) << 8) | (bytes(at + 1) & 0xff)
    }
    def u32(at: Int): Long = {
      require(at >= 0 && at + 4 <= bytes.length, s"TIFF read past end at $at")
      if (le) (bytes(at) & 0xffL) | ((bytes(at + 1) & 0xffL) << 8) |
        ((bytes(at + 2) & 0xffL) << 16) | ((bytes(at + 3) & 0xffL) << 24)
      else ((bytes(at) & 0xffL) << 24) | ((bytes(at + 1) & 0xffL) << 16) |
        ((bytes(at + 2) & 0xffL) << 8) | (bytes(at + 3) & 0xffL)
    }
    require(u16(2) == 42, "bad TIFF magic")
    val ifd = u32(4).toInt
    val n = u16(ifd)
    var width = -1; var height = -1; var channels = 1
    var compression = 1; var photometric = -1; var rowsPerStrip = -1
    var soType = 0; var soCount = 0L; var soAt = 0
    var sbcType = 0; var sbcCount = 0L; var sbcAt = 0
    (0 until n).foreach { i =>
      val e = ifd + 2 + i * 12
      val tag = u16(e); val typ = u16(e + 2); val count = u32(e + 4)
      def sizeOf(t: Int) = t match {
        case 1 | 2 | 6 | 7 => 1; case 3 => 2; case 4 | 9 => 4; case 5 | 10 => 8
        case o => throw new IllegalArgumentException(s"TIFF type $o")
      }
      val inline = sizeOf(typ) * count <= 4
      val vAt = if (inline) e + 8 else u32(e + 8).toInt
      def scalar: Long = if (typ == 3) u16(vAt).toLong else u32(vAt)
      tag match {
        case TImageWidth => width = scalar.toInt
        case TImageLength => height = scalar.toInt
        case TBitsPerSample =>
          (0 until count.toInt).foreach { k =>
            require(u16(vAt + 2 * k) == 8, "only 8-bit samples supported")
          }
        case TCompression => compression = scalar.toInt
        case TPhotometric => photometric = scalar.toInt
        case TSamplesPerPixel => channels = scalar.toInt
        case TRowsPerStrip =>
          rowsPerStrip = math.min(scalar, Int.MaxValue).toInt
        case TStripOffsets => soType = typ; soCount = count; soAt = vAt
        case TStripByteCounts => sbcType = typ; sbcCount = count; sbcAt = vAt
        case _ => // ancillary: skip
      }
    }
    require(width > 0 && height > 0, "TIFF missing dimensions")
    require(photometric == 1 || photometric == 2,
      s"photometric $photometric out of baseline scope")
    require(channels == (if (photometric == 2) 3 else 1),
      s"SamplesPerPixel $channels inconsistent with photometric $photometric")
    if (rowsPerStrip <= 0) rowsPerStrip = height
    val nStrips = (height + rowsPerStrip - 1) / rowsPerStrip
    require(soCount == nStrips && sbcCount == nStrips,
      s"strip table sizes $soCount/$sbcCount != $nStrips")
    def tableAt(typ: Int, at: Int, k: Int): Long =
      if (typ == 3) u16(at + 2 * k).toLong else u32(at + 4 * k)
    val rowBytes = width * channels
    val pixels = new Array[Byte](rowBytes * height)
    (0 until nStrips).foreach { s =>
      val off = tableAt(soType, soAt, s).toInt
      val len = tableAt(sbcType, sbcAt, s).toInt
      require(off >= 0 && len >= 0 && off + len <= bytes.length,
        s"strip $s out of bounds")
      val rows = math.min(rowsPerStrip, height - s * rowsPerStrip)
      val expected = rows * rowBytes
      val comp = java.util.Arrays.copyOfRange(bytes, off, off + len)
      val raw = compression match {
        case CompNone =>
          require(len == expected, s"uncompressed strip $s size $len != $expected")
          comp
        case CompLzw => lzwDecode(comp, expected)
        case CompPackBits => unpackBits(comp, expected)
        case other =>
          throw new IllegalArgumentException(s"compression $other unsupported")
      }
      System.arraycopy(raw, 0, pixels, s * rowsPerStrip * rowBytes, expected)
    }
    Image(width, height, channels, photometric, compression, pixels)
  }

  // ------------------------------------------------------------------
  // Dataset operators
  // ------------------------------------------------------------------

  /** Attach a real RGB TIFF payload per document — the pixelsOf text
    * rule through the shared color rule, compression cycling by
    * doc_id mod 3 (none / PackBits / LZW) — so one arithmetic oracle
    * replay covers all three baseline codecs. One narrow mapPartitions
    * pass; payloads never at the driver.
    */
  def asTiffMedia(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    Parallelism.ensure(docs)
      .select(col("doc_id"), coalesce(col("text"), lit("")).as("text"))
      .as[(Long, String)]
      .mapPartitions { rows =>
        val w = Multimodal.ImgWidth
        rows.map { case (id, text) =>
          val pix = Multimodal.pixelsOf(text)
          val h = pix.length / w
          val rgb = new Array[Byte](pix.length * 3)
          var i = 0
          while (i < pix.length) {
            val (r, g, b, _) = Multimodal.colorOf(pix(i) & 0xff)
            rgb(i * 3) = r.toByte; rgb(i * 3 + 1) = g.toByte
            rgb(i * 3 + 2) = b.toByte
            i += 1
          }
          val comp = (id % 3) match {
            case 0 => CompNone
            case 1 => CompPackBits
            case _ => CompLzw
          }
          Multimodal.MediaRecord(id, encode(w, h, 3, comp, rgb))
        }
      }
      .toDF("doc_id", "payload")
  }

  // ------------------------------------------------------------------
  // BMP (Windows DIB) — the fifth image container: uncompressed 24-bit
  // BITMAPINFOHEADER, bottom-up rows, BGR order, 4-byte row padding.
  // Small enough to live beside TIFF; BmpSpec cross-validates both
  // directions against javax.imageio.
  // ------------------------------------------------------------------

  object Bmp {
    /** Encode interleaved RGB as a 24-bit bottom-up BMP. */
    def encode(width: Int, height: Int, rgb: Array[Byte]): Array[Byte] = {
      require(rgb.length == width * height * 3, "RGB buffer size")
      val rowBytes = (width * 3 + 3) & ~3
      val dataSize = rowBytes * height
      val out = java.nio.ByteBuffer.allocate(54 + dataSize)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      out.put('B'.toByte).put('M'.toByte)
      out.putInt(54 + dataSize)
      out.putInt(0)
      out.putInt(54)
      out.putInt(40) // BITMAPINFOHEADER
      out.putInt(width)
      out.putInt(height) // positive: bottom-up
      out.putShort(1)    // planes
      out.putShort(24)   // bpp
      out.putInt(0)      // BI_RGB
      out.putInt(dataSize)
      out.putInt(2835).putInt(2835) // 72 dpi in px/m
      out.putInt(0).putInt(0)
      var y = height - 1
      while (y >= 0) {
        var x = 0
        while (x < width) {
          val i = (y * width + x) * 3
          out.put(rgb(i + 2)).put(rgb(i + 1)).put(rgb(i)) // BGR
          x += 1
        }
        var pad = rowBytes - width * 3
        while (pad > 0) { out.put(0.toByte); pad -= 1 }
        y -= 1
      }
      out.array()
    }

    final case class Image(width: Int, height: Int, pixels: Array[Byte])

    /** Decode a 24-bit BI_RGB BMP (bottom-up or top-down): validates
      * the headers and materializes interleaved RGB. Throws on
      * anything malformed or outside the 24-bit uncompressed scope.
      */
    def decode(bytes: Array[Byte]): Image = {
      require(bytes.length >= 54 && bytes(0) == 'B'.toByte &&
        bytes(1) == 'M'.toByte, "not a BMP")
      val bb = java.nio.ByteBuffer.wrap(bytes)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      val dataOff = bb.getInt(10)
      val dibSize = bb.getInt(14)
      require(dibSize >= 40, s"DIB header $dibSize out of scope")
      val width = bb.getInt(18)
      val rawHeight = bb.getInt(22)
      val topDown = rawHeight < 0
      val height = math.abs(rawHeight)
      require(width > 0 && height > 0, "bad BMP dimensions")
      require((bb.getShort(26) & 0xffff) == 1, "BMP planes != 1")
      val bpp = bb.getShort(28) & 0xffff
      val comp = bb.getInt(30)
      require(bpp == 24 && comp == 0,
        s"unsupported BMP: bpp=$bpp compression=$comp (24-bit BI_RGB only)")
      val rowBytes = (width * 3 + 3) & ~3
      require(dataOff >= 54 && dataOff.toLong + rowBytes.toLong * height
        <= bytes.length, "truncated BMP pixel data")
      val rgb = new Array[Byte](width * height * 3)
      var r = 0
      while (r < height) {
        val srcRow = dataOff + r * rowBytes
        val y = if (topDown) r else height - 1 - r
        var x = 0
        while (x < width) {
          val s = srcRow + x * 3
          val d = (y * width + x) * 3
          rgb(d) = bytes(s + 2); rgb(d + 1) = bytes(s + 1)
          rgb(d + 2) = bytes(s)
          x += 1
        }
        r += 1
      }
      Image(width, height, rgb)
    }
  }

  /** Attach a real 24-bit BMP payload per document (the shared color
    * rule) and the dataset-level meta parse — same contract shape as
    * the sibling containers.
    */
  def asBmpMedia(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    Parallelism.ensure(docs)
      .select(col("doc_id"), coalesce(col("text"), lit("")).as("text"))
      .as[(Long, String)]
      .mapPartitions { rows =>
        val w = Multimodal.ImgWidth
        rows.map { case (id, text) =>
          val pix = Multimodal.pixelsOf(text)
          val h = pix.length / w
          val rgb = new Array[Byte](pix.length * 3)
          var i = 0
          while (i < pix.length) {
            val (r, g, b, _) = Multimodal.colorOf(pix(i) & 0xff)
            rgb(i * 3) = r.toByte; rgb(i * 3 + 1) = g.toByte
            rgb(i * 3 + 2) = b.toByte
            i += 1
          }
          Multimodal.MediaRecord(id, Bmp.encode(w, h, rgb))
        }
      }
      .toDF("doc_id", "payload")
  }

  final case class BmpMeta(doc_id: Long, width: Int, height: Int,
                           n_pixels: Int, rgb_md5: String, rgb_sum: Long)

  def parseBmpMeta(media: DataFrame): Dataset[BmpMeta] = {
    import media.sparkSession.implicits._
    Parallelism.ensure(media).select(col("doc_id"), col("payload")).as[Multimodal.MediaRecord]
      .mapPartitions { records =>
        val hex = "0123456789abcdef".toCharArray
        records.map { r =>
          val img = Bmp.decode(r.payload)
          val sb = new java.lang.StringBuilder(img.pixels.length * 2)
          var sum = 0L
          img.pixels.foreach { b =>
            val v = b & 0xff
            sb.append(hex(v >> 4)).append(hex(v & 0xf))
            sum += v
          }
          BmpMeta(r.doc_id, img.width, img.height, img.width * img.height,
            java.security.MessageDigest.getInstance("MD5")
              .digest(sb.toString.getBytes("US-ASCII"))
              .map(b => f"$b%02x").mkString, sum)
        }
      }
  }

  final case class TiffMeta(doc_id: Long, width: Int, height: Int,
                            channels: Int, compression: Int, n_pixels: Int,
                            rgb_md5: String, rgb_sum: Long)

  /** Decode each payload and emit header geometry + the decoded-RGB
    * digest — every field comes out of the decoder (compression
    * included), not construction metadata.
    */
  def parseTiffMeta(media: DataFrame): Dataset[TiffMeta] = {
    import media.sparkSession.implicits._
    Parallelism.ensure(media).select(col("doc_id"), col("payload")).as[Multimodal.MediaRecord]
      .mapPartitions { records =>
        val hex = "0123456789abcdef".toCharArray
        records.map { r =>
          val img = decode(r.payload)
          val n = img.width * img.height
          val sb = new java.lang.StringBuilder(n * 6)
          var sum = 0L
          var i = 0
          while (i < n * img.channels) {
            val v = img.pixels(i) & 0xff
            sb.append(hex(v >> 4)).append(hex(v & 0xf))
            sum += v
            i += 1
          }
          TiffMeta(r.doc_id, img.width, img.height, img.channels,
            img.compression, n,
            java.security.MessageDigest.getInstance("MD5")
              .digest(sb.toString.getBytes("US-ASCII"))
              .map(b => f"$b%02x").mkString, sum)
        }
      }
  }
}
