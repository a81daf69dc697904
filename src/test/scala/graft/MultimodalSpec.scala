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
}
