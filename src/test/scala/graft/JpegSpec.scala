package graft

import graft.operators.Jpeg
import org.scalatest.funsuite.AnyFunSuite

/** The JPEG codec under independent test, both directions (the
  * MultimodalSpec doctrine): our DECODER must read JPEGs the JDK's own
  * encoder wrote, and our ENCODER's output must decode correctly under
  * the JDK's own reader — a codec that only round-trips itself could
  * be self-consistently wrong. Exactness claims are scoped precisely:
  * block-uniform images are bit-exact through the lossy pipeline
  * (DC-only blocks, flat quant — the oracle contract); arbitrary
  * images carry bounded quantization error; two independent IDCT
  * implementations may differ by ±1 per pixel.
  */
class JpegSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def jdkDecodeGray(bytes: Array[Byte]): (Int, Int, Array[Byte]) = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    val w = img.getWidth
    val h = img.getHeight
    val gray = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    gray.getGraphics.drawImage(img, 0, 0, null)
    val pix = new Array[Byte](w * h)
    gray.getRaster.getDataElements(0, 0, w, h, pix)
    (w, h, pix)
  }

  test("block-uniform fixture is BIT-EXACT through the full lossy pipeline") {
    for (text <- Seq("hello jpeg world", "x" * 100, "", "a")) {
      val pix = Jpeg.blockPixelsOf(text)
      val h = pix.length / 64
      val img = Jpeg.decode(Jpeg.encodeGray(64, h, pix))
      assert(img.width == 64 && img.height == h)
      assert(java.util.Arrays.equals(img.pixels, pix), s"text '$text'")
    }
  }

  test("JDK ImageIO decodes OUR encoder's output to the planted pixels") {
    val pix = Jpeg.blockPixelsOf("independent decoder check: the JDK reads our bytes")
    val h = pix.length / 64
    val (w2, h2, jdkPix) = jdkDecodeGray(Jpeg.encodeGray(64, h, pix))
    assert(w2 == 64 && h2 == h)
    val maxDiff = pix.indices.map(i => math.abs((pix(i) & 0xff) - (jdkPix(i) & 0xff))).max
    assert(maxDiff <= 1, s"JDK decode deviates by $maxDiff from planted pixels")
  }

  test("our decoder reads the JDK encoder's grayscale JPEGs (within IDCT tolerance)") {
    val rng = new scala.util.Random(41)
    for ((w, h) <- Seq((64, 16), (37, 23), (129, 9))) {
      val bi = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      // smooth-ish content: a gradient with mild noise (JPEG-friendly,
      // keeps the comparison about the codec, not about ringing)
      val src = Array.tabulate(w * h) { i =>
        ((i % w) * 2 + (i / w) * 3 + rng.nextInt(4)).min(255).toByte
      }
      bi.getRaster.setDataElements(0, 0, w, h, src)
      val out = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(bi, "jpg", out))
      val bytes = out.toByteArray
      val ours = Jpeg.decode(bytes)
      val (jw, jh, jdkPix) = jdkDecodeGray(bytes)
      assert(ours.width == jw && ours.height == jh && jw == w && jh == h)
      // two independent IDCTs on identical coefficients: ±1 per pixel
      val maxDiff = (0 until w * h)
        .map(i => math.abs((ours.pixels(i) & 0xff) - (jdkPix(i) & 0xff))).max
      assert(maxDiff <= 1, s"$w x $h: max per-pixel diff $maxDiff vs ImageIO")
    }
  }

  test("arbitrary pixels round-trip within quantization error (flat quant)") {
    val rng = new scala.util.Random(43)
    for ((w, h) <- Seq((64, 8), (20, 14), (8, 8), (1, 1), (9, 17))) {
      val pix = Array.fill(w * h)(rng.nextInt(256).toByte)
      val img = Jpeg.decode(Jpeg.encodeGray(w, h, pix))
      assert(img.width == w && img.height == h)
      val diffs = (0 until w * h)
        .map(i => math.abs((img.pixels(i) & 0xff) - (pix(i) & 0xff)))
      assert(diffs.max <= 4, s"$w x $h: max round-trip error ${diffs.max}")
      assert(diffs.sum.toDouble / diffs.size <= 1.0,
        s"$w x $h: mean round-trip error ${diffs.sum.toDouble / diffs.size}")
    }
  }

  test("restart intervals: DRI + RSTn markers decode exactly and reset the DC chain") {
    val pix = Jpeg.blockPixelsOf("restart markers across many blocks " * 4)
    val h = pix.length / 64
    for (ri <- Seq(1, 3, 7)) {
      val bytes = Jpeg.encodeGray(64, h, pix, restartInterval = ri)
      val img = Jpeg.decode(bytes)
      assert(java.util.Arrays.equals(img.pixels, pix), s"interval $ri")
      // the JDK reader agrees on the restart-coded stream too
      val (jw, jh, jdkPix) = jdkDecodeGray(bytes)
      assert(jw == 64 && jh == h)
      assert(pix.indices.forall(i =>
        math.abs((pix(i) & 0xff) - (jdkPix(i) & 0xff)) <= 1), s"JDK interval $ri")
    }
  }

  test("malformed inputs are rejected loudly") {
    assertThrows[IllegalArgumentException](Jpeg.decode("not a jpeg".getBytes))
    // a SOF2 header is ACCEPTED since r13 (progressive is supported) —
    // but a header with no scans behind it still dies loudly
    val sof2 = Array(0xff, 0xd8, 0xff, 0xc2, 0x00, 0x0b,
      8, 0, 8, 0, 8, 1, 1, 0x11, 0).map(_.toByte)
    assertThrows[IllegalArgumentException](Jpeg.decode(sof2))
    // truncated entropy stream
    val pix = Jpeg.blockPixelsOf("truncate me please")
    val ok = Jpeg.encodeGray(64, pix.length / 64, pix)
    assertThrows[IllegalArgumentException](
      Jpeg.decode(java.util.Arrays.copyOfRange(ok, 0, ok.length - 12)))
  }

  // ---- color ---------------------------------------------------------------

  /** The JFIF full-range conversion the decoder claims, re-stated
    * independently for the expectation side.
    */
  private def ycc2rgb(y: Int, cb: Int, cr: Int): (Int, Int, Int) = {
    def cl(v: Double) = math.max(0, math.min(255, math.floor(v + 0.5).toInt))
    (cl(y + 1.402 * (cr - 128.0)),
      cl(y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)),
      cl(y + 1.772 * (cb - 128.0)))
  }

  private def jdkDecodeRgb(bytes: Array[Byte]): (Int, Int, Array[Int]) = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    val w = img.getWidth
    val h = img.getHeight
    val px = new Array[Int](w * h * 3)
    var i = 0
    while (i < w * h) {
      val rgb = img.getRGB(i % w, i / w)
      px(3 * i) = (rgb >> 16) & 0xff
      px(3 * i + 1) = (rgb >> 8) & 0xff
      px(3 * i + 2) = rgb & 0xff
      i += 1
    }
    (w, h, px)
  }

  test("color block fixture is BIT-EXACT through the full 4:2:0 pipeline") {
    for (text <- Seq("color jpeg: ycbcr four-two-zero", "q" * 50, "", "ab")) {
      val (yP, cbP, crP, h) = Jpeg.colorPlanesOf(text)
      val img = Jpeg.decodeColor(Jpeg.encodeColor(64, h, yP, cbP, crP))
      assert(img.width == 64 && img.height == h && img.channels == 3)
      // expected: replicate-upsampled planes through the JFIF equations
      val exp = new Array[Byte](64 * h * 3)
      for (y <- 0 until h; x <- 0 until 64) {
        val (r, g, b) = ycc2rgb(yP(y * 64 + x) & 0xff,
          cbP((y / 2) * 32 + x / 2) & 0xff, crP((y / 2) * 32 + x / 2) & 0xff)
        val o = (y * 64 + x) * 3
        exp(o) = r.toByte; exp(o + 1) = g.toByte; exp(o + 2) = b.toByte
      }
      assert(java.util.Arrays.equals(img.pixels, exp), s"text '$text'")
    }
  }

  test("4:4:4 and 4:2:2 sampling modes decode exactly on block-uniform planes") {
    val (yP, _, _, h) = Jpeg.colorPlanesOf("all three sampling modes")
    for ((hs, vs) <- Seq((1, 1), (2, 1))) {
      val cw = 64 / hs
      val ch = h / vs
      // constant chroma at each mode's own resolution: uniform blocks
      val cbP = Array.fill(cw * ch)(90.toByte)
      val crP = Array.fill(cw * ch)(170.toByte)
      val img = Jpeg.decodeColor(Jpeg.encodeColor(64, h, yP, cbP, crP, hs, vs))
      assert(img.width == 64 && img.height == h && img.channels == 3)
      for (i <- 0 until 64 * h) {
        val (r, g, b) = ycc2rgb(yP(i) & 0xff, 90, 170)
        assert((img.pixels(3 * i) & 0xff) == r &&
          (img.pixels(3 * i + 1) & 0xff) == g &&
          (img.pixels(3 * i + 2) & 0xff) == b, s"mode ${hs}x$vs pixel $i")
      }
    }
  }

  test("JDK ImageIO decodes OUR 4:2:0 color bytes (chroma-uniform, within tolerance)") {
    val (yP, _, _, h) = Jpeg.colorPlanesOf("the JDK reads our color MCUs")
    // constant chroma: libjpeg's fancy (triangle) upsampling equals our
    // replication exactly when the chroma plane is flat, so the only
    // differences left are the two IDCTs and the two color converts
    val cbP = Array.fill(32 * (h / 2))(64.toByte)
    val crP = Array.fill(32 * (h / 2))(200.toByte)
    val bytes = Jpeg.encodeColor(64, h, yP, cbP, crP)
    val ours = Jpeg.decodeColor(bytes)
    val (jw, jh, jdkPix) = jdkDecodeRgb(bytes)
    assert(jw == 64 && jh == h)
    val maxDiff = (0 until 64 * h * 3)
      .map(i => math.abs((ours.pixels(i) & 0xff) - jdkPix(i))).max
    assert(maxDiff <= 2, s"JDK color decode deviates by $maxDiff")
  }

  test("our decoder reads the JDK encoder's COLOR JPEGs (within tolerance)") {
    // (a) gray-valued RGB: Cb=Cr=128 everywhere, so chroma upsampling
    // differences vanish and the comparison isolates IDCT + conversion;
    // (b) one saturated constant color: flat planes end to end, the
    // color-conversion path itself under test.
    val rng = new scala.util.Random(47)
    val images = Seq(
      Array.tabulate(48 * 32) { i =>
        val v = ((i % 48) * 3 + (i / 48) * 2 + rng.nextInt(3)).min(255)
        (v << 16) | (v << 8) | v
      } -> ((48, 32)),
      Array.fill(40 * 24)((200 << 16) | (80 << 8) | 40) -> ((40, 24)))
    for ((px, (w, h)) <- images) {
      val bi = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      bi.setRGB(0, 0, w, h, px, 0, w)
      val out = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(bi, "jpg", out))
      val bytes = out.toByteArray
      val ours = Jpeg.decodeColor(bytes)
      val (jw, jh, jdkPix) = jdkDecodeRgb(bytes)
      assert(ours.width == jw && ours.height == jh && jw == w && jh == h)
      assert(ours.channels == 3)
      val maxDiff = (0 until w * h * 3)
        .map(i => math.abs((ours.pixels(i) & 0xff) - jdkPix(i))).max
      assert(maxDiff <= 2, s"$w x $h: max per-pixel diff $maxDiff vs ImageIO")
    }
  }

  test("color restart intervals decode exactly and reset all three DC chains") {
    val (yP, cbP, crP, h) = Jpeg.colorPlanesOf("color restart markers " * 3)
    val plain = Jpeg.decodeColor(Jpeg.encodeColor(64, h, yP, cbP, crP))
    for (ri <- Seq(1, 3)) {
      val img = Jpeg.decodeColor(
        Jpeg.encodeColor(64, h, yP, cbP, crP, restartInterval = ri))
      assert(java.util.Arrays.equals(img.pixels, plain.pixels), s"interval $ri")
    }
  }

  test("progressive scan script decodes BIT-IDENTICAL to baseline (all samplings)") {
    // encodeColorProgressive splits the same quantized coefficients
    // over 5 scans (DC first Al=1, DC refine, per-component AC first
    // with EOB runs) — so decode must equal the baseline stream's
    // decode exactly, in every chroma mode.
    val (yP, cbP, crP, h) = Jpeg.colorPlanesOf("progressive spectral scans")
    val base420 = Jpeg.decodeColor(Jpeg.encodeColor(64, h, yP, cbP, crP))
    val prog420 = Jpeg.decodeColor(
      Jpeg.encodeColorProgressive(64, h, yP, cbP, crP))
    assert(java.util.Arrays.equals(prog420.pixels, base420.pixels))
    for ((hs, vs) <- Seq((1, 1), (2, 1))) {
      val cw = 64 / hs
      val ch = h / vs
      val cb = Array.fill(cw * ch)(90.toByte)
      val cr = Array.fill(cw * ch)(170.toByte)
      val b = Jpeg.decodeColor(Jpeg.encodeColor(64, h, yP, cb, cr, hs, vs))
      val p = Jpeg.decodeColor(
        Jpeg.encodeColorProgressive(64, h, yP, cb, cr, hs, vs))
      assert(java.util.Arrays.equals(p.pixels, b.pixels), s"mode ${hs}x$vs")
    }
  }

  test("progressive encode of ARBITRARY planes still equals baseline decode") {
    // non-uniform content: nonzero ACs exercise the (run, size) path,
    // zero-tail blocks the EOB-run aggregation, odd dims the padding
    val rng = new scala.util.Random(13)
    val w = 44; val h = 26
    val cw = (w + 1) / 2; val ch = (h + 1) / 2
    val yP = Array.tabulate(w * h)(i =>
      (((i % w) * 5 + (i / w) * 3 + rng.nextInt(7)) % 256).toByte)
    val cbP = Array.tabulate(cw * ch)(i => ((i * 11) % 256).toByte)
    val crP = Array.tabulate(cw * ch)(i => ((255 - i * 7) % 256).toByte)
    val base = Jpeg.decodeColor(Jpeg.encodeColor(w, h, yP, cbP, crP))
    val prog = Jpeg.decodeColor(Jpeg.encodeColorProgressive(w, h, yP, cbP, crP))
    assert(prog.width == w && prog.height == h && prog.channels == 3)
    assert(java.util.Arrays.equals(prog.pixels, base.pixels))
  }

  test("JDK ImageIO decodes OUR progressive bytes (chroma-uniform, tolerance)") {
    val (yP, _, _, h) = Jpeg.colorPlanesOf("the JDK reads our SOF2 scans")
    val cbP = Array.fill(32 * (h / 2))(64.toByte)
    val crP = Array.fill(32 * (h / 2))(200.toByte)
    val bytes = Jpeg.encodeColorProgressive(64, h, yP, cbP, crP)
    val ours = Jpeg.decodeColor(bytes)
    val (jw, jh, jdkPix) = jdkDecodeRgb(bytes)
    assert(jw == 64 && jh == h)
    val maxDiff = (0 until 64 * h * 3)
      .map(i => math.abs((ours.pixels(i) & 0xff) - jdkPix(i))).max
    assert(maxDiff <= 2, s"JDK progressive decode deviates by $maxDiff")
  }

  test("our decoder reads the JDK's PROGRESSIVE JPEGs (within tolerance)") {
    // the JDK writer's progressive script uses successive approximation
    // on AC (Ah > 0), so this exercises the refinement path our own
    // encoder's Al=0 script never hits
    val rng = new scala.util.Random(29)
    val images = Seq(
      Array.tabulate(48 * 32) { i =>
        val v = ((i % 48) * 3 + (i / 48) * 2 + rng.nextInt(3)).min(255)
        (v << 16) | (v << 8) | v
      } -> ((48, 32)),
      Array.fill(40 * 24)((200 << 16) | (80 << 8) | 40) -> ((40, 24)))
    for ((px, (w, h)) <- images) {
      val bi = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      bi.setRGB(0, 0, w, h, px, 0, w)
      val writer = javax.imageio.ImageIO
        .getImageWritersByFormatName("jpg").next()
      val param = writer.getDefaultWriteParam
      param.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
      val out = new java.io.ByteArrayOutputStream()
      val ios = javax.imageio.ImageIO.createImageOutputStream(out)
      writer.setOutput(ios)
      writer.write(null, new javax.imageio.IIOImage(bi, null, null), param)
      ios.close()
      writer.dispose()
      val bytes = out.toByteArray
      // confirm the writer actually emitted SOF2
      val hasSof2 = (0 until bytes.length - 1).exists(i =>
        (bytes(i) & 0xff) == 0xff && (bytes(i + 1) & 0xff) == 0xc2)
      assert(hasSof2, "JDK writer did not produce a progressive stream")
      val ours = Jpeg.decodeColor(bytes)
      val (jw, jh, jdkPix) = jdkDecodeRgb(bytes)
      assert(ours.width == jw && ours.height == jh && jw == w && jh == h)
      val maxDiff = (0 until w * h * 3)
        .map(i => math.abs((ours.pixels(i) & 0xff) - jdkPix(i))).max
      assert(maxDiff <= 2, s"$w x $h: max diff $maxDiff vs ImageIO progressive")
    }
  }

  test("truncated progressive streams are rejected loudly") {
    val (yP, cbP, crP, h) = Jpeg.colorPlanesOf("truncate the SOF2 scan")
    val ok = Jpeg.encodeColorProgressive(64, h, yP, cbP, crP)
    assertThrows[IllegalArgumentException](
      Jpeg.decodeColor(java.util.Arrays.copyOfRange(ok, 0, ok.length - 16)))
  }

  test("progressive scan referencing a never-defined DHT fails descriptively") {
    // Excise every DHT (0xFFC4) segment: the first scan must then hit
    // the loud missing-table require, not a NullPointerException —
    // same error shape as the baseline path.
    val (yP, cbP, crP, h) = Jpeg.colorPlanesOf("strip the huffman tables")
    val ok = Jpeg.encodeColorProgressive(64, h, yP, cbP, crP)
    val out = new java.io.ByteArrayOutputStream()
    var p = 0
    out.write(ok, 0, 2) // SOI
    p = 2
    var inScan = false
    while (p + 4 <= ok.length && !inScan) {
      val marker = ok(p + 1) & 0xff
      val segLen = ((ok(p + 2) & 0xff) << 8) | (ok(p + 3) & 0xff)
      if (marker == 0xda) { out.write(ok, p, ok.length - p); inScan = true }
      else {
        if (marker != 0xc4) out.write(ok, p, 2 + segLen)
        p += 2 + segLen
      }
    }
    val e = intercept[IllegalArgumentException](
      Jpeg.decodeColor(out.toByteArray))
    assert(e.getMessage.contains("missing DC table") ||
      e.getMessage.contains("missing AC table"), e.getMessage)
  }

  test("color malformed inputs are rejected loudly") {
    val (yP, cbP, crP, h) = Jpeg.colorPlanesOf("truncate the color scan")
    val ok = Jpeg.encodeColor(64, h, yP, cbP, crP)
    assertThrows[IllegalArgumentException](
      Jpeg.decodeColor(java.util.Arrays.copyOfRange(ok, 0, ok.length - 16)))
    // the grayscale API refuses color frames by name
    val e = intercept[IllegalArgumentException](Jpeg.decode(ok))
    assert(e.getMessage.contains("decodeColor"))
    // decodeColor passes grayscale through as channels=1
    val gray = Jpeg.blockPixelsOf("gray through the color api")
    val img = Jpeg.decodeColor(Jpeg.encodeGray(64, gray.length / 64, gray))
    assert(img.channels == 1 && java.util.Arrays.equals(img.pixels, gray))
  }

  test("asColorJpegMedia → parseColorMeta round-trips the color block rule") {
    import spark.implicits._
    val docs = Seq((1L, "color end to end"), (2L, "")).toDF("doc_id", "text")
    val metas = Jpeg.parseColorMeta(Jpeg.asColorJpegMedia(docs)).collect()
      .map(m => m.doc_id -> m).toMap
    val md = java.security.MessageDigest.getInstance("MD5")
    for ((id, text) <- Seq((1L, "color end to end"), (2L, ""))) {
      val (yP, cbP, crP, h) = Jpeg.colorPlanesOf(text)
      val exp = new Array[Byte](64 * h * 3)
      var s = 0L
      for (y <- 0 until h; x <- 0 until 64) {
        val (r, g, b) = ycc2rgb(yP(y * 64 + x) & 0xff,
          cbP((y / 2) * 32 + x / 2) & 0xff, crP((y / 2) * 32 + x / 2) & 0xff)
        val o = (y * 64 + x) * 3
        exp(o) = r.toByte; exp(o + 1) = g.toByte; exp(o + 2) = b.toByte
        s += r + g + b
      }
      val hex = exp.map(v => f"${v & 0xff}%02x").mkString
      val m = metas(id)
      assert(m.width == 64 && m.height == h && m.channels == 3 &&
        m.n_pixels == 64 * h)
      assert(m.rgb_md5 ==
        md.digest(hex.getBytes("US-ASCII")).map(b => f"$b%02x").mkString)
      assert(m.rgb_sum == s, s"doc $id")
    }
  }

  test("asJpegMedia → parseMeta round-trips the block rule end to end") {
    import spark.implicits._
    val docs = Seq(
      (1L, "hello jpeg multimodal"),
      (2L, "z" * 40), // 5 block-rows
      (3L, "")        // empty → one all-dots block-row
    ).toDF("doc_id", "text")
    val metas = Jpeg.parseMeta(Jpeg.asJpegMedia(docs)).collect()
      .map(m => m.doc_id -> m).toMap
    val md = java.security.MessageDigest.getInstance("MD5")
    for ((id, text) <- Seq((1L, "hello jpeg multimodal"), (2L, "z" * 40), (3L, ""))) {
      val pix = Jpeg.blockPixelsOf(text)
      val m = metas(id)
      assert(m.width == 64 && m.height == pix.length / 64 && m.n_pixels == pix.length)
      assert(m.pixel_md5 == md.digest(pix).map(b => f"$b%02x").mkString, s"doc $id")
      assert(m.pixel_sum == pix.map(_ & 0xff).map(_.toLong).sum)
    }
    assert(metas(2L).height == 5 * 8)
  }
}
