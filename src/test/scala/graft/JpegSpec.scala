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
    // minimal progressive frame header → explicit SOF2 rejection
    val sof2 = Array(0xff, 0xd8, 0xff, 0xc2, 0x00, 0x0b,
      8, 0, 8, 0, 8, 1, 1, 0x11, 0).map(_.toByte)
    val e = intercept[IllegalArgumentException](Jpeg.decode(sof2))
    assert(e.getMessage.contains("progressive"))
    // truncated entropy stream
    val pix = Jpeg.blockPixelsOf("truncate me please")
    val ok = Jpeg.encodeGray(64, pix.length / 64, pix)
    assertThrows[IllegalArgumentException](
      Jpeg.decode(java.util.Arrays.copyOfRange(ok, 0, ok.length - 12)))
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
