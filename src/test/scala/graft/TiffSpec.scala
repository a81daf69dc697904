package graft

import graft.operators.{Multimodal, Tiff}
import org.scalatest.funsuite.AnyFunSuite

/** Baseline TIFF 6.0 codec: PackBits and early-change LZW roundtrips,
  * multi-strip assembly, malformed-payload failures, and
  * both-direction cross-validation against the JDK's javax.imageio
  * TIFF plugin (all three compressions).
  */
class TiffSpec extends AnyFunSuite {

  private def rng(seed: Long) = new scala.util.Random(seed)

  test("PackBits roundtrips literals, runs, and mixtures") {
    val r = rng(3)
    val cases = Seq(
      Array.emptyByteArray,
      Array[Byte](7),
      Array.fill[Byte](300)(5),                    // long replicate
      Array.tabulate[Byte](300)(i => i.toByte),    // long literal
      Array[Byte](1, 1, 1, 2, 3, 3, 3, 3, 4, 5, 6, 6)) ++
      (1 to 5).map { i => val a = new Array[Byte](257 + i * 13); r.nextBytes(a); a } ++
      (1 to 3).map { i => Array.tabulate[Byte](400)(j => ((j / (i * 3)) % 7).toByte) }
    cases.foreach { c =>
      val round = Tiff.unpackBits(Tiff.packBits(c), c.length)
      assert(round.toSeq == c.toSeq, s"roundtrip failed at length ${c.length}")
    }
  }

  test("TIFF LZW roundtrips, including a dictionary reset") {
    val r = rng(9)
    for (len <- Seq(0, 1, 255, 4096, 30000)) {
      val a = new Array[Byte](len)
      r.nextBytes(a)
      assert(Tiff.lzwDecode(Tiff.lzwEncode(a), len).toSeq == a.toSeq,
        s"roundtrip failed at length $len")
    }
    // force >4094 dictionary entries → ClearCode reset path: random
    // bytes give ~1 new entry per ~2 symbols, so 30k above already
    // resets; this structured one resets too and checks determinism
    val big = Array.tabulate[Byte](50000)(i => ((i * 7919) >> 3).toByte)
    assert(Tiff.lzwDecode(Tiff.lzwEncode(big), big.length).toSeq == big.toSeq)
  }

  test("LZW width boundaries: exhaustive length sweep (the EOI bug)") {
    // the decoder adds an entry for the FINAL data code (the encoder's
    // in-loop schedule does not), so when that add lands exactly on a
    // width threshold the EOI is read one bit wide — every entry-count
    // boundary is hit by some length in these sweeps (r14 regression:
    // corpus strips failed at decoder next == 511)
    val r = rng(31)
    (0 until 1300).foreach { len =>
      val a = new Array[Byte](len)
      r.nextBytes(a)
      assert(Tiff.lzwDecode(Tiff.lzwEncode(a), len).toSeq == a.toSeq,
        s"random sweep failed at length $len")
    }
    val pattern = ("abcabcadbca" * 400).getBytes("US-ASCII")
    (0 until 4000 by 7).foreach { len =>
      val a = java.util.Arrays.copyOfRange(pattern, 0, len)
      assert(Tiff.lzwDecode(Tiff.lzwEncode(a), len).toSeq == a.toSeq,
        s"repetitive sweep failed at length $len")
    }
  }

  test("encode → decode roundtrip, all compressions, gray and RGB") {
    val r = rng(17)
    for (comp <- Seq(Tiff.CompNone, Tiff.CompPackBits, Tiff.CompLzw);
         ch <- Seq(1, 3); h <- Seq(1, 8, 9, 25)) {
      val w = 16
      val pix = new Array[Byte](w * h * ch)
      r.nextBytes(pix)
      val img = Tiff.decode(Tiff.encode(w, h, ch, comp, pix))
      assert(img.width == w && img.height == h && img.channels == ch)
      assert(img.compression == comp)
      assert(img.pixels.toSeq == pix.toSeq,
        s"pixels differ (comp=$comp ch=$ch h=$h)")
    }
  }

  test("JDK ImageIO reads OUR TIFFs (all compressions) with equal RGB") {
    val r = rng(23)
    val w = 32; val h = 19
    val rgb = new Array[Byte](w * h * 3)
    r.nextBytes(rgb)
    for (comp <- Seq(Tiff.CompNone, Tiff.CompPackBits, Tiff.CompLzw)) {
      val payload = Tiff.encode(w, h, 3, comp, rgb)
      val bi = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(payload))
      assert(bi != null, s"JDK could not parse our TIFF (comp=$comp)")
      assert(bi.getWidth == w && bi.getHeight == h)
      var i = 0
      while (i < w * h) {
        val expect = ((rgb(i * 3) & 0xff) << 16) |
          ((rgb(i * 3 + 1) & 0xff) << 8) | (rgb(i * 3 + 2) & 0xff)
        assert((bi.getRGB(i % w, i / w) & 0xffffff) == expect,
          s"pixel $i differs (comp=$comp)")
        i += 1
      }
    }
  }

  test("our decoder reads the JDK TIFF writer's output (LZW + PackBits)") {
    val r = rng(29)
    val w = 24; val h = 13
    val rgb = new Array[Byte](w * h * 3)
    r.nextBytes(rgb)
    val bi = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until h; x <- 0 until w) {
      val i = (y * w + x) * 3
      bi.setRGB(x, y, ((rgb(i) & 0xff) << 16) | ((rgb(i + 1) & 0xff) << 8) |
        (rgb(i + 2) & 0xff))
    }
    // the JDK TIFF writer has no "None" compression type; uncompressed
    // coverage comes from the reads-ours + roundtrip tests
    for (compName <- Seq("LZW", "PackBits")) {
      val writer = javax.imageio.ImageIO
        .getImageWritersByFormatName("tiff").next()
      val param = writer.getDefaultWriteParam
      param.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
      param.setCompressionType(compName)
      val bos = new java.io.ByteArrayOutputStream()
      val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
      writer.setOutput(ios)
      writer.write(null, new javax.imageio.IIOImage(bi, null, null), param)
      writer.dispose(); ios.close()
      val img = Tiff.decode(bos.toByteArray)
      assert(img.width == w && img.height == h && img.channels == 3,
        s"geometry (comp=$compName)")
      assert(img.pixels.toSeq == rgb.toSeq, s"pixels differ (comp=$compName)")
    }
  }

  test("malformed payloads fail loudly") {
    intercept[IllegalArgumentException](Tiff.decode("XXNOTATIFF".getBytes))
    val good = Tiff.encode(8, 4, 1, Tiff.CompNone, new Array[Byte](32))
    intercept[IllegalArgumentException](Tiff.decode(good.take(30))) // truncated
    // corrupt a strip byte count → size mismatch must surface
    val bad = good.clone()
    // flip a bit inside the pixel area is silent (no checksum in TIFF);
    // but an out-of-range strip offset must throw: corrupt the IFD count
    bad(8) = 99.toByte
    intercept[IllegalArgumentException](Tiff.decode(bad))
  }

  test("asTiffMedia / parseTiffMeta: distributed decode matches the rule") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val docs = Seq((0L, "uncompressed doc"), (1L, "packbits doc " * 10),
      (2L, "lzw doc " * 30)).toDF("doc_id", "text")
    val meta = Tiff.parseTiffMeta(Tiff.asTiffMedia(docs)).collect()
      .map(m => m.doc_id -> m).toMap
    assert(meta(0L).compression == Tiff.CompNone)
    assert(meta(1L).compression == Tiff.CompPackBits)
    assert(meta(2L).compression == Tiff.CompLzw)
    assert(meta.values.forall(_.channels == 3))
    // digest equals the arithmetic color rule for doc 0
    val pix = Multimodal.pixelsOf("uncompressed doc")
    val hexpix = pix.map { b =>
      val v = b & 0xff
      f"$v%02x${255 - v}%02x${(v + 85) % 256}%02x"
    }.mkString
    val expect = java.security.MessageDigest.getInstance("MD5")
      .digest(hexpix.getBytes("US-ASCII")).map(b => f"$b%02x").mkString
    assert(meta(0L).rgb_md5 == expect)
  }
}
