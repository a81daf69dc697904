package graft

import graft.operators.Tiff.Bmp
import org.scalatest.funsuite.AnyFunSuite

/** 24-bit BMP codec: roundtrips across padded widths, top-down rows,
  * malformed failures, and both-direction javax.imageio
  * cross-validation — the padding and row-order inversions live here
  * because the 64-wide oracle fixture cannot catch them (192 bytes is
  * already 4-aligned).
  */
class BmpSpec extends AnyFunSuite {

  private def rng(seed: Long) = new scala.util.Random(seed)

  test("roundtrip across widths with every padding residue") {
    val r = rng(5)
    for (w <- Seq(1, 2, 3, 4, 5, 7, 64); h <- Seq(1, 3, 8)) {
      val rgb = new Array[Byte](w * h * 3)
      r.nextBytes(rgb)
      val img = Bmp.decode(Bmp.encode(w, h, rgb))
      assert(img.width == w && img.height == h)
      assert(img.pixels.toSeq == rgb.toSeq, s"pixels differ at ${w}x$h")
    }
  }

  test("JDK ImageIO reads OUR BMPs with identical RGB") {
    val r = rng(7)
    val w = 13; val h = 9 // 39-byte rows force 1 pad byte
    val rgb = new Array[Byte](w * h * 3)
    r.nextBytes(rgb)
    val bi = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(Bmp.encode(w, h, rgb)))
    assert(bi != null && bi.getWidth == w && bi.getHeight == h)
    for (y <- 0 until h; x <- 0 until w) {
      val i = (y * w + x) * 3
      val expect = ((rgb(i) & 0xff) << 16) | ((rgb(i + 1) & 0xff) << 8) |
        (rgb(i + 2) & 0xff)
      assert((bi.getRGB(x, y) & 0xffffff) == expect, s"pixel ($x,$y)")
    }
  }

  test("our decoder reads the JDK BMP writer's output") {
    val r = rng(11)
    val w = 21; val h = 6
    val bi = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    val rgb = new Array[Byte](w * h * 3)
    r.nextBytes(rgb)
    for (y <- 0 until h; x <- 0 until w) {
      val i = (y * w + x) * 3
      bi.setRGB(x, y, ((rgb(i) & 0xff) << 16) | ((rgb(i + 1) & 0xff) << 8) |
        (rgb(i + 2) & 0xff))
    }
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(bi, "bmp", bos))
    val img = Bmp.decode(bos.toByteArray)
    assert(img.width == w && img.height == h)
    assert(img.pixels.toSeq == rgb.toSeq)
  }

  test("top-down BMPs (negative height) decode in document order") {
    val w = 4; val h = 3
    val rgb = Array.tabulate[Byte](w * h * 3)(i => i.toByte)
    val bu = Bmp.encode(w, h, rgb)
    // flip to top-down: negate the height and REVERSE the row order of
    // the pixel data so the image content stays identical
    val rowBytes = (w * 3 + 3) & ~3
    val td = bu.clone()
    val hh = java.nio.ByteBuffer.allocate(4)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(-h).array()
    System.arraycopy(hh, 0, td, 22, 4)
    for (r <- 0 until h)
      System.arraycopy(bu, 54 + (h - 1 - r) * rowBytes, td,
        54 + r * rowBytes, rowBytes)
    val img = Bmp.decode(td)
    assert(img.pixels.toSeq == rgb.toSeq, "top-down decode differs")
  }

  test("malformed payloads fail loudly") {
    intercept[IllegalArgumentException](Bmp.decode("XXNOTABMP!".getBytes))
    val good = Bmp.encode(5, 4, new Array[Byte](60))
    intercept[IllegalArgumentException](Bmp.decode(good.dropRight(8)))
    val badBpp = good.clone(); badBpp(28) = 8 // 8-bit palette: out of scope
    intercept[IllegalArgumentException](Bmp.decode(badBpp))
  }

  test("asBmpMedia / parseBmpMeta: distributed decode matches the rule") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val docs = Seq((0L, "bmp container check")).toDF("doc_id", "text")
    val m = graft.operators.Tiff.parseBmpMeta(
      graft.operators.Tiff.asBmpMedia(docs)).collect().head
    val pix = graft.operators.Multimodal.pixelsOf("bmp container check")
    val hexpix = pix.map { b =>
      val v = b & 0xff
      f"$v%02x${255 - v}%02x${(v + 85) % 256}%02x"
    }.mkString
    val expect = java.security.MessageDigest.getInstance("MD5")
      .digest(hexpix.getBytes("US-ASCII")).map(b => f"$b%02x").mkString
    assert(m.rgb_md5 == expect && m.width == 64 && m.height == 1)
  }
}
