package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Baseline sequential JPEG (ITU-T T.81) — the third REAL image codec
  * next to [[Multimodal.Png]] and [[Audio]]'s WAV: a pure-JVM encoder
  * (level shift → FDCT → quantize → zigzag → DC-diff/AC-run Huffman
  * with byte stuffing) and a FULL decoder (marker walk, DQT 8/16-bit,
  * DHT canonical tables, DRI/RSTn restart intervals, Huffman entropy
  * decode, dequantize, separable IDCT, level shift + clamp, edge
  * crop). JpegSpec cross-validates the decoder against javax.imageio
  * on JPEGs the JDK's own encoder wrote, and validates the encoder by
  * decoding its output with javax.imageio — neither direction is
  * merely self-consistent.
  *
  * Oracle strategy (the q60 doctrine, adapted to a LOSSY codec): the
  * fixture plants one UNIFORM 8×8 block per text byte. A uniform block
  * has exactly one nonzero DCT coefficient (DC = 8·(v−128); every AC
  * is analytically zero), so with a flat quantization table the
  * encode→decode round trip is EXACT — the DuckDB oracle recomputes
  * every decoded pixel arithmetically from the text while the engine
  * runs the full lossy pipeline (real FDCT, real Huffman, real IDCT).
  * A mis-signed DC diff, a bad zigzag, a broken restart reset, or an
  * IDCT scale error all break the hash.
  *
  * Scale shape: identical to the PNG family — one narrow mapPartitions
  * pass, codec tables built once per partition, payload bytes never at
  * the driver.
  */
object Jpeg {

  // ---- shared constants -------------------------------------------------

  /** Natural-order index of each zigzag position (T.81 Figure A.6). */
  private val Zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  /** Separable DCT basis: ct(u)(x) = 0.5·C(u)·cos((2x+1)uπ/16), so both
    * FDCT and IDCT are two 8-point passes over the same table.
    */
  private val Ct: Array[Array[Double]] = Array.tabulate(8, 8) { (u, x) =>
    val c = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0
    0.5 * c * math.cos((2 * x + 1) * u * math.Pi / 16.0)
  }

  // Standard Annex K luminance Huffman tables (T.81 Tables K.3/K.5) —
  // used by the encoder; the decoder always reads tables from DHT.
  private val DcBits = Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val DcVals = (0 to 11).map(_.toByte).toArray
  private val AcBits = Array(0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7d)
  private val AcVals: Array[Byte] = Array(
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xa1, 0x08,
    0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0a, 0x16, 0x17, 0x18, 0x19, 0x1a, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3a, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6a, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3,
    0xa4, 0xa5, 0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6,
    0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9,
    0xca, 0xd2, 0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1, 0xe2,
    0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea, 0xf1, 0xf2, 0xf3, 0xf4,
    0xf5, 0xf6, 0xf7, 0xf8, 0xf9, 0xfa).map(_.toByte)

  /** Flat quantization table: DC step 1 keeps uniform blocks exact (the
    * oracle contract); a real deployment swaps in a perceptual table —
    * the pipeline is identical.
    */
  val FlatQuant: Array[Int] = Array.fill(64)(1)

  // ---- canonical Huffman construction ------------------------------------

  /** (code, length) per symbol from a (bits, vals) table — T.81 C.2. */
  private def buildEncodeTable(bits: Array[Int], vals: Array[Byte]): Array[(Int, Int)] = {
    val table = new Array[(Int, Int)](256)
    var code = 0
    var k = 0
    var len = 1
    while (len <= 16) {
      var i = 0
      while (i < bits(len - 1)) {
        table(vals(k) & 0xff) = (code, len)
        code += 1; k += 1; i += 1
      }
      code <<= 1
      len += 1
    }
    table
  }

  /** Decoder tables: minCode/maxCode/valPtr per code length (F.2.2.3). */
  private final class HuffTable(bits: Array[Int], vals: Array[Byte]) {
    val minCode = new Array[Int](17)
    val maxCode = Array.fill(17)(-1)
    val valPtr = new Array[Int](17)
    locally {
      var code = 0
      var k = 0
      var len = 1
      while (len <= 16) {
        if (bits(len - 1) > 0) {
          valPtr(len) = k
          minCode(len) = code
          code += bits(len - 1); k += bits(len - 1)
          maxCode(len) = code - 1
        }
        code <<= 1
        len += 1
      }
    }
    def value(len: Int, code: Int): Int =
      vals(valPtr(len) + code - minCode(len)) & 0xff
  }

  // ---- encoder ------------------------------------------------------------

  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var acc = 0
    private var nBits = 0
    def put(bitsVal: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        acc = (acc << 1) | ((bitsVal >>> i) & 1)
        nBits += 1
        if (nBits == 8) {
          out.write(acc)
          if (acc == 0xff) out.write(0x00) // byte stuffing
          acc = 0; nBits = 0
        }
        i -= 1
      }
    }
    def flush(): Unit = if (nBits > 0) { // pad with 1s (T.81 F.1.2.3)
      acc = (acc << (8 - nBits)) | ((1 << (8 - nBits)) - 1)
      out.write(acc)
      if (acc == 0xff) out.write(0x00)
      acc = 0; nBits = 0
    }
  }

  private def category(v: Int): Int = {
    var t = 0
    var a = math.abs(v)
    while (a != 0) { t += 1; a >>= 1 }
    t
  }

  /** Encode 8-bit grayscale pixels as a baseline sequential JPEG: SOI,
    * DQT (`quant`, natural order in, zigzag on the wire), SOF0, DHT
    * (standard luminance DC+AC), optional DRI, SOS, entropy-coded
    * scan, EOI. Dimensions not multiples of 8 pad by edge replication.
    * `restartInterval` > 0 emits DRI + RSTn markers every that many
    * blocks (exercised by JpegSpec; the fixture path uses 0).
    */
  def encodeGray(width: Int, height: Int, pixels: Array[Byte],
                 quant: Array[Int] = FlatQuant, restartInterval: Int = 0): Array[Byte] = {
    require(width > 0 && height > 0 && pixels.length == width * height,
      s"bad dimensions: $width x $height for ${pixels.length} pixels")
    require(quant.length == 64 && quant.forall(q => q >= 1 && q <= 255),
      "quant table must be 64 entries in 1..255")
    val out = new java.io.ByteArrayOutputStream()
    def marker(m: Int): Unit = { out.write(0xff); out.write(m) }
    def segment(m: Int, body: Array[Int]): Unit = {
      marker(m)
      val len = body.length + 2
      out.write(len >> 8); out.write(len & 0xff)
      body.foreach(out.write)
    }
    marker(0xd8) // SOI
    segment(0xdb, 0 +: Zigzag.map(quant)) // DQT: Pq=0/Tq=0, zigzag order
    segment(0xc0, Array(8, height >> 8, height & 0xff, width >> 8,
      width & 0xff, 1, 1, 0x11, 0)) // SOF0: 1 component, 1x1, table 0
    segment(0xc4, 0x00 +: (DcBits ++ DcVals.map(_ & 0xff)))
    segment(0xc4, 0x10 +: (AcBits ++ AcVals.map(_ & 0xff)))
    if (restartInterval > 0)
      segment(0xdd, Array(restartInterval >> 8, restartInterval & 0xff))
    segment(0xda, Array(1, 1, 0x00, 0, 63, 0)) // SOS
    val dcTab = buildEncodeTable(DcBits, DcVals)
    val acTab = buildEncodeTable(AcBits, AcVals)
    val bw = new BitWriter(out)
    val bw8 = (width + 7) / 8
    val bh8 = (height + 7) / 8
    val block = new Array[Double](64)
    val coef = new Array[Int](64)
    var pred = 0
    var mcu = 0
    var rstIdx = 0
    var by = 0
    while (by < bh8) {
      var bx = 0
      while (bx < bw8) {
        if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
          bw.flush()
          marker(0xd0 + rstIdx)
          rstIdx = (rstIdx + 1) % 8
          pred = 0
        }
        // gather with edge replication + level shift
        var y = 0
        while (y < 8) {
          val sy = math.min(by * 8 + y, height - 1)
          var x = 0
          while (x < 8) {
            val sx = math.min(bx * 8 + x, width - 1)
            block(y * 8 + x) = (pixels(sy * width + sx) & 0xff) - 128.0
            x += 1
          }
          y += 1
        }
        fdct(block)
        var i = 0
        while (i < 64) { coef(i) = Math.round(block(i) / quant(i)).toInt; i += 1 }
        // DC
        val diff = coef(0) - pred
        pred = coef(0)
        val t = category(diff)
        val (dcCode, dcLen) = dcTab(t)
        bw.put(dcCode, dcLen)
        if (t > 0) bw.put(if (diff < 0) diff + (1 << t) - 1 else diff, t)
        // AC
        var run = 0
        var lastNz = 0
        var k = 1
        while (k < 64) { if (coef(Zigzag(k)) != 0) lastNz = k; k += 1 }
        k = 1
        while (k <= lastNz) {
          val v = coef(Zigzag(k))
          if (v == 0) run += 1
          else {
            while (run > 15) { val (c, l) = acTab(0xf0); bw.put(c, l); run -= 16 }
            val s = category(v)
            val (c, l) = acTab((run << 4) | s)
            bw.put(c, l)
            bw.put(if (v < 0) v + (1 << s) - 1 else v, s)
            run = 0
          }
          k += 1
        }
        if (lastNz < 63) { val (c, l) = acTab(0x00); bw.put(c, l) } // EOB
        mcu += 1
        bx += 1
      }
      by += 1
    }
    bw.flush()
    marker(0xd9) // EOI
    out.toByteArray
  }

  /** Separable 2-D DCT in place: rows then columns through [[Ct]]. The
    * same routine is its own inverse with the table transposed, so
    * [[idct]] shares it.
    */
  private def fdct(b: Array[Double]): Unit = transform2d(b, forward = true)
  private def idct(b: Array[Double]): Unit = transform2d(b, forward = false)

  private def transform2d(b: Array[Double], forward: Boolean): Unit = {
    val tmp = new Array[Double](64)
    var r = 0
    while (r < 8) { // transform each row
      var u = 0
      while (u < 8) {
        var s = 0.0
        var x = 0
        while (x < 8) {
          s += b(r * 8 + x) * (if (forward) Ct(u)(x) else Ct(x)(u))
          x += 1
        }
        tmp(r * 8 + u) = s
        u += 1
      }
      r += 1
    }
    var c = 0
    while (c < 8) { // then each column
      var u = 0
      while (u < 8) {
        var s = 0.0
        var y = 0
        while (y < 8) {
          s += tmp(y * 8 + c) * (if (forward) Ct(u)(y) else Ct(y)(u))
          y += 1
        }
        b(u * 8 + c) = s
        u += 1
      }
      c += 1
    }
  }

  // ---- decoder ------------------------------------------------------------

  final case class Image(width: Int, height: Int, pixels: Array[Byte])

  private final class BitReader(bytes: Array[Byte], var pos: Int) {
    private var acc = 0
    private var nBits = 0
    private var sawMarker = false
    def readBit(): Int = {
      if (nBits == 0) {
        // T.81 F.2.2.5: a marker mid-read supplies 1-fill bits to
        // complete the CURRENT decode — one byte of fill covers the ≤7
        // legal pad bits. A refill still hungry after that byte means
        // the scan over-ran into the marker (truncated/corrupt stream),
        // which must fail loudly, not decode the marker identifier
        // byte (e.g. the D9 of EOI) as entropy data.
        if (sawMarker)
          throw new IllegalArgumentException(
            "entropy stream over-ran into a marker — truncated or corrupt scan")
        require(pos < bytes.length, "truncated entropy stream")
        var b = bytes(pos) & 0xff
        pos += 1
        if (b == 0xff) {
          require(pos < bytes.length, "truncated after 0xFF")
          val m = bytes(pos) & 0xff
          if (m == 0x00) pos += 1 // stuffed byte: data 0xFF
          else {
            // marker reached mid-read: rewind so pos still points AT
            // the 0xFF (restart() can consume an RST), latch the flag,
            // and serve this one byte of 1-fill
            pos -= 1
            sawMarker = true
            b = 0xff
          }
        }
        acc = b; nBits = 8
      }
      nBits -= 1
      (acc >> nBits) & 1
    }
    def receive(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) { v = (v << 1) | readBit(); i += 1 }
      v
    }
    /** Byte-align and consume an expected RSTn marker. Clears the
      * marker latch: fill bits before an RST followed by resync is the
      * one legal way a well-formed stream touches a marker mid-read.
      */
    def restart(): Unit = {
      nBits = 0
      require(pos + 1 < bytes.length && (bytes(pos) & 0xff) == 0xff &&
        (bytes(pos + 1) & 0xf8) == 0xd0,
        f"expected RST marker at $pos, got ${bytes(pos) & 0xff}%02x ${bytes(pos + 1) & 0xff}%02x")
      pos += 2
      sawMarker = false
    }
    def decodeHuff(t: HuffTable): Int = {
      var code = readBit()
      var len = 1
      while (len <= 16) {
        if (code <= t.maxCode(len)) return t.value(len, code)
        code = (code << 1) | readBit()
        len += 1
      }
      throw new IllegalArgumentException("invalid Huffman code")
    }
  }

  private def extend(v: Int, t: Int): Int =
    if (t == 0) 0 else if (v < (1 << (t - 1))) v - (1 << t) + 1 else v

  /** Decode a baseline sequential grayscale JPEG: full marker walk
    * (APPn/COM skipped, multi-table DQT with 8- or 16-bit precision,
    * multi-table DHT, DRI), SOF0 (rejects progressive SOF2 and
    * multi-component frames loudly), then the entropy-coded scan with
    * byte unstuffing and restart handling, per-block Huffman decode →
    * dequantize → IDCT → +128 level shift → clamp, finally cropped
    * from the padded block grid to the declared dimensions. Throws on
    * anything malformed — corrupt payloads must fail loudly.
    */
  def decode(bytes: Array[Byte]): Image = {
    require(bytes.length >= 4 && (bytes(0) & 0xff) == 0xff &&
      (bytes(1) & 0xff) == 0xd8, "not a JPEG (no SOI)")
    var p = 2
    val quant = new Array[Array[Int]](4)
    val dcTabs = new Array[HuffTable](4)
    val acTabs = new Array[HuffTable](4)
    var width, height = -1
    var qSel, dcSel, acSel = 0
    var restartInterval = 0
    var scanStart = -1
    def u16(at: Int) = ((bytes(at) & 0xff) << 8) | (bytes(at + 1) & 0xff)
    while (scanStart < 0) {
      require(p + 4 <= bytes.length, "truncated JPEG marker stream")
      require((bytes(p) & 0xff) == 0xff, f"bad marker byte at $p")
      val m = bytes(p + 1) & 0xff
      val segLen = u16(p + 2)
      val body = p + 4
      require(body + segLen - 2 <= bytes.length, "truncated JPEG segment")
      m match {
        case 0xdb => // DQT: one or more tables
          var q = body
          while (q < body + segLen - 2) {
            val pq = (bytes(q) & 0xff) >> 4
            val tq = bytes(q) & 0x0f
            require(pq <= 1 && tq < 4, "bad DQT header")
            val tab = new Array[Int](64)
            var i = 0
            while (i < 64) {
              tab(Zigzag(i)) =
                if (pq == 0) bytes(q + 1 + i) & 0xff else u16(q + 1 + 2 * i)
              i += 1
            }
            quant(tq) = tab
            q += 1 + (if (pq == 0) 64 else 128)
          }
        case 0xc4 => // DHT: one or more tables
          var q = body
          while (q < body + segLen - 2) {
            val tc = (bytes(q) & 0xff) >> 4
            val th = bytes(q) & 0x0f
            require(tc <= 1 && th < 4, "bad DHT header")
            val bits = Array.tabulate(16)(i => bytes(q + 1 + i) & 0xff)
            val n = bits.sum
            val vals = java.util.Arrays.copyOfRange(bytes, q + 17, q + 17 + n)
            if (tc == 0) dcTabs(th) = new HuffTable(bits, vals)
            else acTabs(th) = new HuffTable(bits, vals)
            q += 17 + n
          }
        case 0xc0 | 0xc1 => // SOF0/1: baseline (extended-sequential ok)
          require((bytes(body) & 0xff) == 8, "only 8-bit precision supported")
          height = u16(body + 1); width = u16(body + 3)
          val nComp = bytes(body + 5) & 0xff
          require(nComp == 1,
            s"grayscale decoder: expected 1 component, got $nComp")
          qSel = bytes(body + 8) & 0x0f
        case 0xc2 =>
          throw new IllegalArgumentException(
            "progressive JPEG (SOF2) not supported by this baseline decoder")
        case 0xdd => restartInterval = u16(body)
        case 0xda => // SOS
          require((bytes(body) & 0xff) == 1, "expected single-component scan")
          dcSel = (bytes(body + 2) & 0xff) >> 4
          acSel = bytes(body + 2) & 0x0f
          scanStart = body + segLen - 2
        case 0xd9 => throw new IllegalArgumentException("EOI before SOS")
        case _ => // APPn / COM / others: skip
      }
      if (scanStart < 0) p = body + segLen - 2
    }
    require(width > 0 && height > 0, "missing SOF before SOS")
    val qt = quant(qSel)
    require(qt != null, s"missing quant table $qSel")
    val dcT = dcTabs(dcSel)
    val acT = acTabs(acSel)
    require(dcT != null && acT != null, "missing Huffman tables")
    val bw8 = (width + 7) / 8
    val bh8 = (height + 7) / 8
    val br = new BitReader(bytes, scanStart)
    val pix = new Array[Byte](width * height)
    val block = new Array[Double](64)
    var pred = 0
    var mcu = 0
    var by = 0
    while (by < bh8) {
      var bx = 0
      while (bx < bw8) {
        if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
          br.restart()
          pred = 0
        }
        java.util.Arrays.fill(block, 0.0)
        val t = br.decodeHuff(dcT)
        pred += extend(br.receive(t), t)
        block(0) = pred.toDouble * qt(0)
        var k = 1
        var done = false
        var anyAc = false
        while (k < 64 && !done) {
          val rs = br.decodeHuff(acT)
          val r = rs >> 4
          val s = rs & 0x0f
          if (s == 0) {
            if (r == 15) k += 16 else done = true // ZRL vs EOB
          } else {
            k += r
            require(k < 64, "AC coefficient index overflow")
            block(Zigzag(k)) = extend(br.receive(s), s).toDouble * qt(Zigzag(k))
            anyAc = true
            k += 1
          }
        }
        // DC-only shortcut (libjpeg's dcval path): the IDCT of a lone
        // DC coefficient is the uniform value F00/8 — skip the two
        // 8-point passes entirely. Bit-compatible with the full IDCT
        // within its own ±1-at-.5-boundary tolerance.
        if (!anyAc) java.util.Arrays.fill(block, block(0) / 8.0)
        else idct(block)
        var y = 0
        while (y < 8) {
          val py = by * 8 + y
          if (py < height) {
            var x = 0
            while (x < 8) {
              val px = bx * 8 + x
              if (px < width) {
                val v = Math.round(block(y * 8 + x) + 128.0).toInt
                pix(py * width + px) =
                  (if (v < 0) 0 else if (v > 255) 255 else v).toByte
              }
              x += 1
            }
          }
          y += 1
        }
        mcu += 1
        bx += 1
      }
      by += 1
    }
    Image(width, height, pix)
  }

  // ---- fixture + operators -------------------------------------------------

  /** Block-planted pixel rule (shared with the DuckDB oracle): the
    * text's bytes, '.'-padded to a whole number of 8-byte groups
    * (empty text ⇒ one all-dots group), each byte expanded to a
    * uniform 8×8 block, 8 blocks per row → a 64-wide image of
    * 8·ceil(len/8)-pixel-tall rows. Uniform blocks make the lossy
    * pipeline exact (see object doc), so the oracle replays pixels
    * arithmetically.
    */
  private[graft] val BlocksPerRow = 8
  private[graft] def blockBytesOf(text: String): Array[Byte] = {
    val tb = text.getBytes("UTF-8")
    val n = math.max(1, (tb.length + BlocksPerRow - 1) / BlocksPerRow) * BlocksPerRow
    val bt = new Array[Byte](n)
    java.util.Arrays.fill(bt, '.'.toByte)
    System.arraycopy(tb, 0, bt, 0, tb.length)
    bt
  }
  private[graft] def blockPixelsOf(text: String): Array[Byte] = {
    val bt = blockBytesOf(text)
    val w = BlocksPerRow * 8
    val h = (bt.length / BlocksPerRow) * 8
    val pix = new Array[Byte](w * h)
    var i = 0
    while (i < pix.length) {
      val r = i / w
      val c = i % w
      pix(i) = bt((r / 8) * BlocksPerRow + c / 8)
      i += 1
    }
    pix
  }

  /** Attach a REAL JPEG payload per document via [[blockPixelsOf]]: one
    * narrow mapPartitions pass, full encode pipeline (FDCT + Huffman),
    * payloads built and kept on the executors.
    */
  def asJpegMedia(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id"), coalesce(col("text"), lit("")).as("text"))
      .as[(Long, String)]
      .mapPartitions { rows =>
        rows.map { case (id, text) =>
          val pix = blockPixelsOf(text)
          val h = pix.length / 64
          Multimodal.Media(id, encodeGray(64, h, pix), "image/jpeg", 64, h)
        }
      }
      .select(col("doc_id"), col("payload"),
        struct(col("format"), col("width"), col("height")).as("meta"))
  }

  final case class JpegMeta(doc_id: Long, width: Int, height: Int,
                            n_pixels: Int, pixel_md5: String, pixel_sum: Long)

  /** REAL decode pass: run the full baseline decoder on each payload
    * and emit parsed dimensions plus digest AND exact sum of the
    * DECODED pixels — all recomputed by the oracle from the block
    * rule, so encoder and decoder are both under the hash.
    */
  def parseMeta(media: DataFrame): Dataset[JpegMeta] = {
    import media.sparkSession.implicits._
    media.select(col("doc_id"), col("payload")).as[Multimodal.MediaRecord]
      .mapPartitions { records =>
        val md = java.security.MessageDigest.getInstance("MD5")
        records.map { r =>
          val img = decode(r.payload)
          var s = 0L
          var i = 0
          while (i < img.pixels.length) { s += (img.pixels(i) & 0xff); i += 1 }
          JpegMeta(r.doc_id, img.width, img.height, img.pixels.length,
            md.digest(img.pixels).map(b => f"$b%02x").mkString, s)
        }
      }
  }
}
