package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Bmp, Png}

/** The BMP codec ([[graft.operators.Bmp]]): lossless round trip equals
  * the generative formula AND the PNG codec's pixels (one ground truth,
  * two containers), ImageIO cross-decodes, top-down row order is
  * honored, and out-of-scope/malformed inputs refuse cleanly. */
class BmpSpec extends AnyFunSuite {

  test("roundtrip equals the generative formula, the PNG codec, and an " +
      "independent ImageIO decode — padding widths included") {
    // widths 16,17,18,19 exercise all four 4-byte padding residues
    for ((w, h, seed) <- Seq((16, 9, 1L), (17, 9, 2L), (18, 5, 3L),
        (19, 7, 4L), (1, 1, 5L))) {
      val bytes = Bmp.encodeRgb(w, h, seed)
      val (dw, dh, px) = Bmp.decodeRgb(bytes).getOrElse(
        fail(s"undecodable ${w}x$h"))
      assert((dw, dh) == (w, h))
      for (y <- 0 until h; x <- 0 until w) {
        val o = (y * w + x) * 3
        assert((px(o) & 0xff) == Png.pixelR(x, y, seed), s"R ($x,$y)")
        assert((px(o + 1) & 0xff) == Png.pixelG(x, y, seed), s"G ($x,$y)")
        assert((px(o + 2) & 0xff) == Png.pixelB(x, y, seed), s"B ($x,$y)")
      }
      // same image through the PNG container decodes to the same buffer
      assert(px.toSeq == Png.decodeRgb(Png.encodeRgb(w, h, seed)).get._3.toSeq,
        "PNG and BMP containers must yield identical pixels")
      // ImageIO as the independent reference decoder
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      assert(img != null && img.getWidth == w && img.getHeight == h)
      for (y <- 0 until h; x <- 0 until w) {
        val rgb = img.getRGB(x, y)
        val o = (y * w + x) * 3
        assert(((rgb >> 16) & 0xff) == (px(o) & 0xff) &&
          ((rgb >> 8) & 0xff) == (px(o + 1) & 0xff) &&
          (rgb & 0xff) == (px(o + 2) & 0xff), s"ImageIO ($x,$y)")
      }
    }
  }

  test("top-down (negative height) BMPs decode with rows unflipped") {
    val (w, h, seed) = (6, 4, 9L)
    val up = Bmp.encodeRgb(w, h, seed)
    // rewrite as top-down: negate height, reverse the row blocks
    val stride = (w * 3 + 3) & ~3
    val down = up.clone()
    val negH = le4signed(-h)
    System.arraycopy(negH, 0, down, 22, 4)
    for (y <- 0 until h)
      System.arraycopy(up, 54 + (h - 1 - y) * stride, down, 54 + y * stride,
        stride)
    val got = Bmp.decodeRgb(down).getOrElse(fail("top-down undecodable"))
    assert(got._3.toSeq == Bmp.decodeRgb(up).get._3.toSeq,
      "top-down and bottom-up encodings of the same image must agree")
  }

  private def le4signed(v: Int): Array[Byte] = Array(
    (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
    ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  test("refusals: wrong magic, truncation, unsupported bpp/compression, " +
      "lying pixel offset, overflowing dims") {
    val good = Bmp.encodeRgb(10, 10, 1L)
    assert(Bmp.decodeRgb(null).isEmpty)
    assert(Bmp.decodeRgb("PM not a bmp".getBytes).isEmpty)
    assert(Bmp.decodeRgb(good.take(40)).isEmpty, "header truncation")
    assert(Bmp.decodeRgb(good.dropRight(5)).isEmpty, "pixel-array truncation")
    val bpp8 = good.clone(); bpp8(28) = 8
    assert(Bmp.decodeRgb(bpp8).isEmpty, "paletted 8-bit is out of scope")
    val rle = good.clone(); rle(30) = 1
    assert(Bmp.decodeRgb(rle).isEmpty, "RLE compression is out of scope")
    val lying = good.clone()
    System.arraycopy(le4signed(good.length), 0, lying, 10, 4)
    assert(Bmp.decodeRgb(lying).isEmpty, "pixel offset past EOF is refused")
    val big = good.clone()
    System.arraycopy(le4signed(1 << 30), 0, big, 18, 4)
    System.arraycopy(le4signed(1 << 30), 0, big, 22, 4)
    assert(Bmp.decodeRgb(big).isEmpty, "overflowing dims are refused")
  }
}
