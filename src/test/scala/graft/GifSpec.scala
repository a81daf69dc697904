package graft

import graft.operators.{Gif, Multimodal}
import org.scalatest.funsuite.AnyFunSuite

/** GIF89a codec: LZW roundtrips, interlace, animation, sub-rectangle
  * frames, malformed-payload failures, and BOTH-direction
  * cross-validation against javax.imageio's GIF reader and writer (so
  * the codec is not merely self-consistent).
  */
class GifSpec extends AnyFunSuite {

  private def rng(seed: Long) = new scala.util.Random(seed)

  private def indexedImage(w: Int, h: Int,
                           pix: Array[Byte]): java.awt.image.BufferedImage = {
    val pal = Multimodal.FixturePalette
    val r = new Array[Byte](256); val g = new Array[Byte](256)
    val b = new Array[Byte](256)
    (0 until 256).foreach { i =>
      r(i) = pal(i * 3); g(i) = pal(i * 3 + 1); b(i) = pal(i * 3 + 2)
    }
    val cm = new java.awt.image.IndexColorModel(8, 256, r, g, b)
    val bi = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, cm)
    bi.getRaster.setDataElements(0, 0, w, h, pix.clone())
    bi
  }

  private def rgbOf(frame: Gif.Frame): Array[Int] = {
    val n = frame.width * frame.height
    val out = new Array[Int](n)
    var i = 0
    while (i < n) {
      val idx = frame.indices(i) & 0xff
      out(i) = ((frame.palette(idx * 3) & 0xff) << 16) |
        ((frame.palette(idx * 3 + 1) & 0xff) << 8) |
        (frame.palette(idx * 3 + 2) & 0xff)
      i += 1
    }
    out
  }

  test("LZW roundtrips random index streams (all byte values, repeats)") {
    val r = rng(42)
    for (len <- Seq(0, 1, 2, 7, 255, 256, 4096, 20000)) {
      val data = new Array[Byte](len)
      r.nextBytes(data)
      assert(Gif.lzwDecode(Gif.lzwEncode(data, 8), 8, len).toSeq == data.toSeq,
        s"roundtrip failed at length $len")
    }
    // highly repetitive input exercises the dictionary-growth path and
    // the 12-bit freeze (deferred clear)
    val rep = Array.tabulate[Byte](60000)(i => ((i / 7) % 5).toByte)
    assert(Gif.lzwDecode(Gif.lzwEncode(rep, 8), 8, rep.length).toSeq ==
      rep.toSeq)
  }

  test("LZW width boundaries: exhaustive length sweep (the EOI bug)") {
    // the decoder adds an entry for the FINAL data code (the encoder's
    // in-loop schedule does not): when that add lands on a width
    // threshold AND the stream ends byte-aligned, EOI reads truncated —
    // LSB-first zero padding masks most cases, so sweep densely
    val r = rng(33)
    (0 until 1300).foreach { len =>
      val a = new Array[Byte](len)
      r.nextBytes(a)
      assert(Gif.lzwDecode(Gif.lzwEncode(a, 8), 8, len).toSeq == a.toSeq,
        s"random sweep failed at length $len")
    }
    val pattern = ("abcabcadbca" * 400).getBytes("US-ASCII")
    (0 until 4000 by 7).foreach { len =>
      val a = java.util.Arrays.copyOfRange(pattern, 0, len)
      assert(Gif.lzwDecode(Gif.lzwEncode(a, 8), 8, len).toSeq == a.toSeq,
        s"repetitive sweep failed at length $len")
    }
  }

  test("encode → decode roundtrip, interlaced and not, exact indices") {
    val r = rng(7)
    for (interlaced <- Seq(false, true); h <- Seq(1, 2, 5, 13)) {
      val w = 64
      val pix = new Array[Byte](w * h)
      r.nextBytes(pix)
      val payload = Gif.encode(w, h, Multimodal.FixturePalette,
        Seq(Gif.FrameSpec(0, 0, w, h, 0, interlaced, pix)))
      val d = Gif.decode(payload)
      assert(d.width == w && d.height == h && d.frames.size == 1)
      assert(d.frames.head.interlaced == interlaced)
      assert(d.frames.head.indices.toSeq == pix.toSeq,
        s"pixels differ (interlaced=$interlaced h=$h)")
    }
  }

  test("JDK ImageIO reads OUR GIFs with identical RGB (both layouts)") {
    val r = rng(11)
    for (interlaced <- Seq(false, true)) {
      val w = 64; val h = 9
      val pix = new Array[Byte](w * h)
      r.nextBytes(pix)
      val payload = Gif.encode(w, h, Multimodal.FixturePalette,
        Seq(Gif.FrameSpec(0, 0, w, h, 0, interlaced, pix)))
      val bi = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(payload))
      assert(bi != null, "JDK could not parse our GIF")
      assert(bi.getWidth == w && bi.getHeight == h)
      val ours = rgbOf(Gif.decode(payload).frames.head)
      var i = 0
      while (i < w * h) {
        assert((bi.getRGB(i % w, i / w) & 0xffffff) == ours(i),
          s"pixel $i differs (interlaced=$interlaced)")
        i += 1
      }
    }
  }

  test("our decoder reads the JDK ImageIO GIF writer's output") {
    val r = rng(13)
    val w = 40; val h = 17
    val pix = new Array[Byte](w * h)
    r.nextBytes(pix)
    val bi = indexedImage(w, h, pix)
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(bi, "gif", bos))
    val d = Gif.decode(bos.toByteArray)
    assert(d.width == w && d.height == h && d.frames.size == 1)
    // compare RGB (the JDK may permute/trim the palette; indices are
    // not comparable, decoded colors are)
    val ours = rgbOf(d.frames.head)
    var i = 0
    while (i < w * h) {
      assert((bi.getRGB(i % w, i / w) & 0xffffff) == ours(i),
        s"pixel $i differs vs JDK writer source")
      i += 1
    }
  }

  test("animated GIF: frames, delays, and per-frame pixels roundtrip") {
    val r = rng(17)
    val w = 32; val h = 6
    val frames = (0 until 4).map { f =>
      val pix = new Array[Byte](w * h)
      r.nextBytes(pix)
      Gif.FrameSpec(0, 0, w, h, 10 * (f + 1), interlaced = f % 2 == 1, pix)
    }
    val payload = Gif.encode(w, h, Multimodal.FixturePalette, frames)
    val d = Gif.decode(payload)
    assert(d.frames.size == 4)
    d.frames.zipWithIndex.foreach { case (fr, i) =>
      assert(fr.delayCs == 10 * (i + 1), s"frame $i delay")
      assert(fr.indices.toSeq == frames(i).indices.toSeq, s"frame $i pixels")
    }
    // JDK reader agrees on the frame COUNT and first-frame RGB
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(payload))
    val reader = javax.imageio.ImageIO.getImageReaders(iis).next()
    reader.setInput(iis)
    assert(reader.getNumImages(true) == 4)
    val bi0 = reader.read(0)
    val ours0 = rgbOf(d.frames.head)
    var i = 0
    while (i < w * h) {
      assert((bi0.getRGB(i % w, i / w) & 0xffffff) == ours0(i))
      i += 1
    }
    reader.dispose()
  }

  test("sub-rectangle frame with a LOCAL color table decodes in place") {
    val w = 16; val h = 8
    val full = Array.tabulate[Byte](w * h)(i => (i % 256).toByte)
    val sub = Array.tabulate[Byte](4 * 3)(i => (200 + i).toByte)
    val localPal = new Array[Byte](768)
    (0 until 256).foreach { i => localPal(i * 3) = i.toByte } // red ramp
    val payload = Gif.encode(w, h, Multimodal.FixturePalette, Seq(
      Gif.FrameSpec(0, 0, w, h, 0, interlaced = false, full),
      Gif.FrameSpec(5, 2, 4, 3, 7, interlaced = false, sub, Some(localPal))))
    val d = Gif.decode(payload)
    assert(d.frames.size == 2)
    val f1 = d.frames(1)
    assert(f1.left == 5 && f1.top == 2 && f1.width == 4 && f1.height == 3)
    assert(f1.delayCs == 7)
    assert(f1.indices.toSeq == sub.toSeq)
    assert(f1.palette.toSeq == localPal.toSeq, "local palette must win")
  }

  test("GCE transparency flag is out of scope and fails loudly") {
    val good = Gif.encode(8, 1, Multimodal.FixturePalette,
      Seq(Gif.FrameSpec(0, 0, 8, 1, 0, interlaced = false,
        Array.fill[Byte](8)(3))))
    // single frame: GCE packed byte sits at header(13) + GCT(768) + 3
    val at = 13 + 768 + 3
    assert(good(at - 2) == 0xf9.toByte && good(at - 1) == 4 && good(at) == 0,
      "fixture offset drifted")
    val trans = good.clone()
    trans(at) = (trans(at) | 0x01).toByte
    val e = intercept[IllegalArgumentException](Gif.decode(trans))
    assert(e.getMessage.contains("transparency"))
  }

  test("malformed payloads fail loudly") {
    val good = Gif.encode(64, 1, Multimodal.FixturePalette,
      Seq(Gif.FrameSpec(0, 0, 64, 1, 0, interlaced = false,
        Array.fill[Byte](64)(3))))
    intercept[IllegalArgumentException](Gif.decode("NOTAGIF".getBytes))
    intercept[IllegalArgumentException](
      Gif.decode(good.dropRight(1))) // missing trailer
    val noFrames = good.take(13 + 768) :+ 0x3b.toByte // header+GCT, trailer
    intercept[IllegalArgumentException](Gif.decode(noFrames))
    // corrupt a byte inside the LZW data: either an invalid code or a
    // pixel-count mismatch must surface, never silent garbage of the
    // wrong shape
    val corrupt = good.clone()
    corrupt(13 + 768 + 15) = (corrupt(13 + 768 + 15) ^ 0x55).toByte
    try {
      val d = Gif.decode(corrupt)
      assert(d.frames.head.indices.length == 64) // shape still declared
    } catch { case _: IllegalArgumentException => () }
  }

  test("asGifMedia / parseGifMeta: distributed decode matches the rule") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val docs = Seq((0L, "hello gif"), (1L, "interlaced row shuffle test"),
      (3L, "x" * 200)).toDF("doc_id", "text")
    val meta = Gif.parseGifMeta(Gif.asGifMedia(docs)).collect()
      .map(m => m.doc_id -> m).toMap
    assert(meta(0L).interlaced == 0 && meta(1L).interlaced == 1)
    assert(meta(0L).width == 64 && meta(0L).height == 1)
    assert(meta(3L).height == 4) // 200 chars → 4 rows of 64
    // digest equals the arithmetic rule for doc 0
    val pix = Multimodal.pixelsOf("hello gif")
    val hexpix = pix.map { b =>
      val v = b & 0xff
      f"$v%02x${255 - v}%02x${(v + 85) % 256}%02x"
    }.mkString
    val md = java.security.MessageDigest.getInstance("MD5")
    val expect = md.digest(hexpix.getBytes("US-ASCII"))
      .map(b => f"$b%02x").mkString
    assert(meta(0L).rgb_md5 == expect)
  }

  test("sampleGifFrames: stride keeps frames 0,2 with exact delays") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val docs = Seq((3L, "animate me")).toDF("doc_id", "text") // 4 frames
    val rows = Gif.sampleGifFrames(Gif.asAnimatedGifMedia(docs), 2)
      .collect().sortBy(_.frame_idx)
    assert(rows.map(_.frame_idx).toSeq == Seq(0, 2))
    assert(rows.map(_.delay_cs).toSeq == Seq(10, 30))
    assert(rows.forall(_.n_frames == 4))
  }
}
