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
}
