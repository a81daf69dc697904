package graft

import graft.operators.Multimodal
import graft.operators.Multimodal.Png
import org.scalatest.funsuite.AnyFunSuite

/** The multimodal codec under independent test: the decoder must read
  * images the JDK's OWN encoder wrote (adaptive row filters included),
  * not just our encoder's output — a codec that only round-trips itself
  * could be self-consistently wrong (same doctrine as BamSpec's
  * hand-encoded fixture).
  */
class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("PNG encode → decode round-trips pixels, dims, and format fields") {
    val rng = new scala.util.Random(17)
    for ((w, h) <- Seq((64, 3), (1, 1), (7, 11), (256, 2))) {
      val pix = Array.fill(w * h)(rng.nextInt(256).toByte)
      val img = Png.decode(Png.encodeGray(w, h, pix))
      assert(img.width == w && img.height == h)
      assert(img.bitDepth == 8 && img.colorType == 0)
      assert(java.util.Arrays.equals(img.pixels, pix), s"$w x $h")
    }
  }

  test("decoder reads the JDK ImageIO encoder's PNGs (independent filters)") {
    val rng = new scala.util.Random(23)
    for ((w, h) <- Seq((64, 8), (33, 5), (200, 40))) {
      val bi = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      val pix = Array.fill(w * h)(rng.nextInt(256).toByte)
      bi.getRaster.setDataElements(0, 0, w, h, pix)
      val out = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(bi, "png", out))
      val img = Png.decode(out.toByteArray)
      assert(img.width == w && img.height == h)
      assert(java.util.Arrays.equals(img.pixels, pix),
        s"JDK-encoded $w x $h decoded wrong")
    }
  }

  test("color encode → decodeColor round-trips all storage types") {
    val rng = new scala.util.Random(29)
    val (w, h) = (13, 7)
    // truecolor
    val rgb = Array.fill(w * h * 3)(rng.nextInt(256).toByte)
    val t2 = Png.decodeColor(Png.encodeRgb(w, h, rgb))
    assert(t2.colorType == 2 && t2.channels == 3 && t2.width == w && t2.height == h)
    for (i <- 0 until w * h; c <- 0 until 3)
      assert(t2.rgba(i * 4 + c) == rgb(i * 3 + c))
    assert((0 until w * h).forall(i => (t2.rgba(i * 4 + 3) & 0xff) == 255))
    // RGBA
    val rgba = Array.fill(w * h * 4)(rng.nextInt(256).toByte)
    val t6 = Png.decodeColor(Png.encodeRgba(w, h, rgba))
    assert(t6.colorType == 6 && t6.channels == 4)
    assert(java.util.Arrays.equals(t6.rgba, rgba))
    // palette
    val palette = Array.fill(256 * 3)(rng.nextInt(256).toByte)
    val idx = Array.fill(w * h)(rng.nextInt(256).toByte)
    val t3 = Png.decodeColor(Png.encodePalette(w, h, idx, palette))
    assert(t3.colorType == 3 && t3.channels == 1)
    for (i <- 0 until w * h) {
      val k = idx(i) & 0xff
      for (c <- 0 until 3) assert(t3.rgba(i * 4 + c) == palette(k * 3 + c))
      assert((t3.rgba(i * 4 + 3) & 0xff) == 255)
    }
    // grayscale normalizes through the color api too
    val gray = Array.fill(w * h)(rng.nextInt(256).toByte)
    val t0 = Png.decodeColor(Png.encodeGray(w, h, gray))
    assert(t0.colorType == 0 && t0.channels == 1)
    for (i <- 0 until w * h) {
      assert(t0.rgba(i * 4) == gray(i) && t0.rgba(i * 4 + 1) == gray(i) &&
        t0.rgba(i * 4 + 2) == gray(i) && (t0.rgba(i * 4 + 3) & 0xff) == 255)
    }
    // gray+alpha (type 4): gray replicates to RGB, alpha carries
    val ga = Array.fill(w * h * 2)(rng.nextInt(256).toByte)
    val t4 = Png.decodeColor(Png.encodeGrayAlpha(w, h, ga))
    assert(t4.colorType == 4 && t4.channels == 2)
    for (i <- 0 until w * h) {
      assert(t4.rgba(i * 4) == ga(i * 2) && t4.rgba(i * 4 + 1) == ga(i * 2) &&
        t4.rgba(i * 4 + 2) == ga(i * 2) && t4.rgba(i * 4 + 3) == ga(i * 2 + 1))
    }
    // the JDK reads our type-4 stream to the same raw samples (raster
    // level — getRGB would push gray through a colorspace transform)
    val b4 = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(Png.encodeGrayAlpha(w, h, ga)))
    assert(b4 != null, "JDK refused our gray+alpha PNG")
    for (y <- 0 until h; x <- 0 until w) {
      val i = (y * w + x) * 2
      assert(b4.getRaster.getSample(x, y, 0) == (ga(i) & 0xff) &&
        b4.getRaster.getSample(x, y, 1) == (ga(i + 1) & 0xff),
        s"gray+alpha mismatch $x,$y")
    }
  }

  test("JDK ImageIO reads OUR color PNGs (all three storage types)") {
    val rng = new scala.util.Random(31)
    val (w, h) = (21, 9)
    def argbOf(bytes: Array[Byte]): java.awt.image.BufferedImage = {
      val bi = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      assert(bi != null, "JDK refused our PNG")
      bi
    }
    val rgb = Array.fill(w * h * 3)(rng.nextInt(256).toByte)
    val b2 = argbOf(Png.encodeRgb(w, h, rgb))
    for (y <- 0 until h; x <- 0 until w) {
      val p = b2.getRGB(x, y); val i = (y * w + x) * 3
      assert(((p >> 16) & 0xff) == (rgb(i) & 0xff) &&
        ((p >> 8) & 0xff) == (rgb(i + 1) & 0xff) &&
        (p & 0xff) == (rgb(i + 2) & 0xff), s"rgb mismatch at $x,$y")
    }
    val rgba = Array.fill(w * h * 4)(rng.nextInt(256).toByte)
    val b6 = argbOf(Png.encodeRgba(w, h, rgba))
    for (y <- 0 until h; x <- 0 until w) {
      val p = b6.getRGB(x, y); val i = (y * w + x) * 4
      assert(((p >>> 24) & 0xff) == (rgba(i + 3) & 0xff) &&
        ((p >> 16) & 0xff) == (rgba(i) & 0xff) &&
        ((p >> 8) & 0xff) == (rgba(i + 1) & 0xff) &&
        (p & 0xff) == (rgba(i + 2) & 0xff), s"rgba mismatch at $x,$y")
    }
    val palette = Array.fill(256 * 3)(rng.nextInt(256).toByte)
    val idx = Array.fill(w * h)(rng.nextInt(256).toByte)
    val b3 = argbOf(Png.encodePalette(w, h, idx, palette))
    for (y <- 0 until h; x <- 0 until w) {
      val p = b3.getRGB(x, y); val k = idx(y * w + x) & 0xff
      assert(((p >> 16) & 0xff) == (palette(k * 3) & 0xff) &&
        ((p >> 8) & 0xff) == (palette(k * 3 + 1) & 0xff) &&
        (p & 0xff) == (palette(k * 3 + 2) & 0xff), s"palette mismatch at $x,$y")
    }
  }

  test("decodeColor reads the JDK encoder's color PNGs (adaptive filters)") {
    import java.awt.image.BufferedImage
    val rng = new scala.util.Random(37)
    for ((typ, name) <- Seq(
      (BufferedImage.TYPE_INT_RGB, "rgb"),
      (BufferedImage.TYPE_INT_ARGB, "argb"),
      (BufferedImage.TYPE_BYTE_INDEXED, "indexed"))) {
      val (w, h) = (57, 23)
      val bi = new BufferedImage(w, h, typ)
      for (y <- 0 until h; x <- 0 until w)
        bi.setRGB(x, y, rng.nextInt() |
          (if (typ == BufferedImage.TYPE_INT_ARGB) 0 else 0xff000000))
      val out = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(bi, "png", out))
      val img = Png.decodeColor(out.toByteArray)
      assert(img.width == w && img.height == h, name)
      for (y <- 0 until h; x <- 0 until w) {
        val want = bi.getRGB(x, y) // post-quantization truth for indexed
        val i = (y * w + x) * 4
        assert((img.rgba(i) & 0xff) == ((want >> 16) & 0xff) &&
          (img.rgba(i + 1) & 0xff) == ((want >> 8) & 0xff) &&
          (img.rgba(i + 2) & 0xff) == (want & 0xff) &&
          (img.rgba(i + 3) & 0xff) == ((want >>> 24) & 0xff),
          s"$name mismatch at $x,$y")
      }
    }
  }

  test("color malformed inputs are rejected loudly") {
    // palette stream stripped of its PLTE must fail by name
    val pal = Png.encodePalette(4, 2, Array.fill(8)(3.toByte),
      Array.fill(12)(0.toByte))
    val noPlte = {
      val out = new java.io.ByteArrayOutputStream()
      out.write(pal, 0, 8)
      var p = 8
      while (p < pal.length) {
        val len = ((pal(p) & 0xff) << 24) | ((pal(p + 1) & 0xff) << 16) |
          ((pal(p + 2) & 0xff) << 8) | (pal(p + 3) & 0xff)
        val tag = new String(pal, p + 4, 4, "US-ASCII")
        if (tag != "PLTE") out.write(pal, p, 12 + len)
        p += 12 + len
      }
      out.toByteArray
    }
    val e = intercept[IllegalArgumentException](Png.decodeColor(noPlte))
    assert(e.getMessage.contains("PLTE"), e.getMessage)
    // an index beyond the palette must fail, not read garbage
    val short = Png.encodePalette(4, 2, Array.fill(8)(7.toByte),
      Array.fill(12)(0.toByte)) // 4-entry PLTE, index 7 used
    val e2 = intercept[IllegalArgumentException](Png.decodeColor(short))
    assert(e2.getMessage.contains("palette index"), e2.getMessage)
    // CRC damage fails through the color path too
    val bad = Png.encodeRgb(4, 2, Array.fill(24)(9.toByte))
    bad(20) = (bad(20) ^ 0xff).toByte
    assertThrows[IllegalArgumentException](Png.decodeColor(bad))
  }

  test("asColorMedia → parseColorMeta matches the color rule end to end") {
    import spark.implicits._
    val docs = Seq((0L, "truecolor doc"), (1L, "palette doc"),
      (2L, "rgba doc"), (4L, "")).toDF("doc_id", "text")
    val metas = Multimodal.parseColorMeta(Multimodal.asColorMedia(docs))
      .collect().map(m => m.doc_id -> m).toMap
    val md = java.security.MessageDigest.getInstance("MD5")
    for ((id, text) <- Seq((0L, "truecolor doc"), (1L, "palette doc"),
      (2L, "rgba doc"), (4L, ""))) {
      val pix = Multimodal.pixelsOf(text)
      val sb = new StringBuilder
      var rgbSum = 0L; var aSum = 0L
      pix.foreach { b =>
        val (r, g, bl, a) = Multimodal.colorOf(b & 0xff)
        sb.append(f"$r%02x$g%02x$bl%02x")
        rgbSum += r + g + bl
        aSum += (if (id % 3 == 2) a else 255)
      }
      val m = metas(id)
      assert(m.color_type == (id % 3 match {
        case 0 => 2; case 1 => 3; case _ => 6 }), s"doc $id")
      assert(m.channels == (id % 3 match {
        case 0 => 3; case 1 => 1; case _ => 4 }), s"doc $id")
      assert(m.n_pixels == pix.length && m.rgb_sum == rgbSum &&
        m.alpha_sum == aSum, s"doc $id")
      assert(m.rgb_md5 == md.digest(sb.toString.getBytes("US-ASCII"))
        .map(b => f"$b%02x").mkString, s"doc $id digest")
    }
  }

  test("Adam7 interlaced PNGs decode to the sequential pixels, both codecs") {
    val rng = new scala.util.Random(41)
    // odd/sub-8 dimensions exercise empty and partial passes
    for ((w, h) <- Seq((64, 9), (7, 3), (1, 1), (8, 8), (13, 21), (3, 1))) {
      val rgb = Array.fill(w * h * 3)(rng.nextInt(256).toByte)
      val seq = Png.decodeColor(Png.encodeRgb(w, h, rgb))
      val int = Png.decodeColor(Png.encodeRgbInterlaced(w, h, rgb))
      assert(java.util.Arrays.equals(int.rgba, seq.rgba), s"$w x $h")
      // the JDK reads OUR interlaced stream to the same pixels
      val bi = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(
        Png.encodeRgbInterlaced(w, h, rgb)))
      assert(bi != null, s"JDK refused our interlaced PNG $w x $h")
      for (y <- 0 until h; x <- 0 until w) {
        val p = bi.getRGB(x, y); val i = (y * w + x) * 3
        assert(((p >> 16) & 0xff) == (rgb(i) & 0xff) &&
          ((p >> 8) & 0xff) == (rgb(i + 1) & 0xff) &&
          (p & 0xff) == (rgb(i + 2) & 0xff), s"JDK mismatch $w x $h at $x,$y")
      }
    }
    // ...and we read the JDK's OWN interlaced (progressive-mode) PNGs
    import javax.imageio.{ImageIO, ImageWriteParam}
    val (w, h) = (37, 11)
    val bi = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      bi.setRGB(x, y, rng.nextInt() | 0xff000000)
    val writer = ImageIO.getImageWritersByFormatName("png").next()
    val param = writer.getDefaultWriteParam
    param.setProgressiveMode(ImageWriteParam.MODE_DEFAULT)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    writer.write(null, new javax.imageio.IIOImage(bi, null, null), param)
    ios.close(); writer.dispose()
    val bytes = bos.toByteArray
    assert((bytes(28) & 0xff) == 1, "JDK writer did not interlace")
    val img = Png.decodeColor(bytes)
    for (y <- 0 until h; x <- 0 until w) {
      val want = bi.getRGB(x, y); val i = (y * w + x) * 4
      assert((img.rgba(i) & 0xff) == ((want >> 16) & 0xff) &&
        (img.rgba(i + 1) & 0xff) == ((want >> 8) & 0xff) &&
        (img.rgba(i + 2) & 0xff) == (want & 0xff),
        s"JDK progressive mismatch at $x,$y")
    }
  }

  test("pHash: identical payloads collide; block join complete vs brute force") {
    import spark.implicits._
    val docs = (0L until 40L)
      .map(i => (i, s"phash fixture doc $i with content ${i % 7}"))
      .toDF("doc_id", "text")
    // doc 100 duplicates doc 3's text exactly → identical decoded RGB
    val dup = Seq((100L, "phash fixture doc 3 with content 3"))
      .toDF("doc_id", "text")
    val media = graft.operators.Jpeg.asColorJpegMedia(docs.unionByName(dup))
    val hs = Multimodal.pHash(media).collect()
      .map(h => h.doc_id -> Seq(h.b0, h.b1, h.b2, h.b3)).toMap
    assert(hs(3L) == hs(100L), "identical payloads must hash identically")
    def ham(a: Seq[Int], b: Seq[Int]) =
      a.zip(b).map { case (x, y) => Integer.bitCount(x ^ y) }.sum
    val brute = (for {
      (i, hi) <- hs; (j, hj) <- hs if i < j
      d = ham(hi, hj) if d <= 3
    } yield (i, j, d)).toSet
    val got = Multimodal.pHashNearDupPairs(media, 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == brute, s"block join missed/invented pairs: $got vs $brute")
  }

  test("corrupt chunk CRC and non-PNG bytes are rejected loudly") {
    val png = Png.encodeGray(8, 2, Array.fill(16)(7.toByte))
    val bad = png.clone()
    bad(20) = (bad(20) ^ 0xff).toByte // inside IHDR body → CRC mismatch
    assertThrows[IllegalArgumentException](Png.decode(bad))
    assertThrows[IllegalArgumentException](Png.decode("nope".getBytes))
  }

  test("jpegDims walks the SOF markers of a JDK-encoded JPEG") {
    val bi = new java.awt.image.BufferedImage(
      123, 45, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val out = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(bi, "jpg", out))
    assert(Multimodal.jpegDims(out.toByteArray).contains((123, 45)))
    assert(Multimodal.jpegDims("not a jpeg".getBytes).isEmpty)
    assert(Multimodal.jpegDims(Png.encodeGray(2, 2, Array.fill(4)(0.toByte))).isEmpty)
  }

  test("asMedia → parseMeta round-trips the pixel rule end to end") {
    import spark.implicits._
    val docs = Seq(
      (1L, "hello multimodal world"),
      (2L, "x" * 200), // 4 rows
      (3L, "")         // empty → one all-dots row
    ).toDF("doc_id", "text")
    val media = Multimodal.asMedia(docs)
    val metas = Multimodal.parseMeta(media).collect()
      .map(m => m.doc_id -> m).toMap
    assert(metas(1L).width == 64 && metas(1L).height == 1)
    assert(metas(2L).height == 4 && metas(2L).n_pixels == 256)
    assert(metas(3L).height == 1)
    // digest equals the rule applied directly
    val md = java.security.MessageDigest.getInstance("MD5")
    def ruleMd5(t: String) =
      md.digest(Multimodal.pixelsOf(t)).map(b => f"$b%02x").mkString
    assert(metas(1L).pixel_md5 == ruleMd5("hello multimodal world"))
    assert(metas(3L).pixel_md5 == ruleMd5(""))
    // features over the decoded pixels
    val feats = Multimodal.extractFeatures(media).collect()
      .map(f => f.doc_id -> f).toMap
    assert(feats(2L).n_pixels == 256)
    assert(feats(2L).mean_pixel == ('x'.toInt * 200 + '.'.toInt * 56) / 256.0)
    assert(feats(2L).n_frames == 1)
  }

  test("resizeNearest samples (r·f, c·f) through a second codec round trip") {
    import spark.implicits._
    val docs = Seq(
      (1L, "abcdefghij" * 20), // 200 chars → 4 rows of 64
      (2L, "short"),           // 1 row
      (3L, "y" * 129)          // 3 rows — odd height exercises the ceil
    ).toDF("doc_id", "text")
    val media = Multimodal.asMedia(docs)
    for (f <- Seq(2, 3)) {
      val got = Multimodal.resizeNearest(media, factor = f).collect()
        .map(r => r.doc_id -> r).toMap
      docs.as[(Long, String)].collect().foreach { case (id, text) =>
        val pix = Multimodal.pixelsOf(text)
        val h = pix.length / 64
        val ow = (64 + f - 1) / f
        val oh = (h + f - 1) / f
        val expect = for (r <- 0 until oh; c <- 0 until ow)
          yield pix(r * f * 64 + c * f)
        val md = java.security.MessageDigest.getInstance("MD5")
        val r = got(id)
        assert(r.out_width == ow && r.out_height == oh, s"doc $id factor $f")
        assert(r.out_n_pixels == ow * oh)
        assert(r.out_md5 ==
          md.digest(expect.toArray).map(b => f"$b%02x").mkString,
          s"doc $id factor $f digest")
        assert(r.out_sum == expect.map(_ & 0xff).map(_.toLong).sum)
      }
    }
    intercept[IllegalArgumentException](Multimodal.resizeNearest(media, 0))
  }

  test("crossModalDedup: closure crosses modalities, one keeper per component") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val t1 = "identical image body one " * 4
    val t2 = "a completely different picture " * 4
    val t3 = "yet another unrelated payload " * 4
    // 1-2 pair by IMAGE (same payload), 2-3 pair by CAPTION (same
    // text), 4 is alone — the joint component {1,2,3} exists only if
    // the closure crosses modalities.
    val docs = Seq((1L, t1), (2L, t1), (3L, t2), (4L, t3))
      .toDF("doc_id", "text")
    val media = graft.operators.Jpeg.asColorJpegMedia(docs)
    val captions = Seq(
      (1L, "caption one unique alpha beta gamma delta"),
      (2L, "shared caption words here for pair test"),
      (3L, "shared caption words here for pair test"),
      (4L, "totally distinct words nothing in common"))
      .toDF("doc_id", "caption")
    val got = Multimodal.crossModalDedup(media, captions, "doc_id", "caption")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getInt(2))).toMap
    assert(got(1L) == (1L, 1) && got(2L) == (1L, 0) && got(3L) == (1L, 0),
      s"joint cluster wrong: $got")
    assert(got(4L) == (4L, 1))
  }
}
