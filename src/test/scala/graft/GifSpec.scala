package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Gif, Png}

/** The GIF codec ([[graft.operators.Gif]]): real LZW round trip
  * (dictionary growth through the 9→12-bit widths and CLEAR-at-overflow
  * — image sizes chosen to force them), interlaced row order, ImageIO
  * cross-decodes in BOTH directions, and refusal paths. */
class GifSpec extends AnyFunSuite {

  private def gray(seed: Long)(x: Int, y: Int): Int = Png.pixelR(x, y, seed)

  test("roundtrip equals the generative formula — including images big " +
      "enough to force width growth to 12 bits and a CLEAR reset") {
    // 256x256 of the generative pattern yields thousands of distinct
    // LZW sequences: the dictionary crosses 512/1024/2048/4096 (CLEAR)
    for ((w, h, seed) <- Seq((16, 9, 1L), (61, 37, 2L), (256, 256, 3L))) {
      val bytes = Gif.encodeGray(w, h, gray(seed))
      val (dw, dh, px) = Gif.decodeRgb(bytes).getOrElse(
        fail(s"undecodable ${w}x$h"))
      assert((dw, dh) == (w, h))
      for (y <- 0 until h; x <- 0 until w) {
        val o = (y * w + x) * 3
        val want = gray(seed)(x, y)
        assert((px(o) & 0xff) == want && (px(o + 1) & 0xff) == want &&
          (px(o + 2) & 0xff) == want, s"pixel ($x,$y) of ${w}x$h")
      }
    }
  }

  test("interlaced encoding decodes to the same image as sequential") {
    for ((w, h) <- Seq((23, 17), (8, 3), (5, 1), (64, 64))) {
      val seq = Gif.decodeRgb(Gif.encodeGray(w, h, gray(7L))).get._3
      val int = Gif.decodeRgb(
        Gif.encodeGray(w, h, gray(7L), interlaced = true)).get._3
      assert(int.toSeq == seq.toSeq, s"interlace mismatch at ${w}x$h")
    }
  }

  test("ImageIO decodes our GIFs; our decoder decodes ImageIO's GIFs — " +
      "both pixel-exact (GIF is lossless)") {
    val (w, h, seed) = (47, 31, 11L)
    // ours -> ImageIO
    val ours = Gif.encodeGray(w, h, gray(seed))
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(ours))
    assert(img != null && img.getWidth == w && img.getHeight == h)
    for (y <- 0 until h; x <- 0 until w)
      assert((img.getRGB(x, y) & 0xff) == gray(seed)(x, y),
        s"ImageIO pixel ($x,$y)")
    // ImageIO -> ours (indexed image with its own palette)
    val src = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w)
      src.getRaster.setSample(x, y, 0, (x * 3 + y * 11 + x * y) % 256)
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(src, "gif", bos))
    val (dw, dh, px) = Gif.decodeRgb(bos.toByteArray).getOrElse(
      fail("our decoder must accept a stock ImageIO GIF"))
    assert((dw, dh) == (w, h))
    val ref = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(bos.toByteArray))
    for (y <- 0 until h; x <- 0 until w) {
      val rgb = ref.getRGB(x, y)
      val o = (y * w + x) * 3
      assert(((rgb >> 16) & 0xff) == (px(o) & 0xff) &&
        ((rgb >> 8) & 0xff) == (px(o + 1) & 0xff) &&
        (rgb & 0xff) == (px(o + 2) & 0xff), s"pixel ($x,$y)")
    }
  }

  test("refusals: garbage, truncation, corrupt LZW") {
    val good = Gif.encodeGray(20, 10, gray(1L))
    assert(Gif.decodeRgb(null).isEmpty)
    assert(Gif.decodeRgb("GIF90z nope".getBytes).isEmpty)
    assert(Gif.decodeRgb(good.take(12)).isEmpty, "header truncation")
    assert(Gif.decodeRgb(good.dropRight(6)).isEmpty,
      "mid-stream truncation must refuse")
    // corrupt the LZW payload: flip bytes in the first data sub-block —
    // decode must refuse (code beyond table / wrong pixel count), never
    // throw. Image descriptor starts after 13-byte header + 768 GCT.
    val corrupt = good.clone()
    val dataAt = 13 + 768 + 10 + 1 + 1 // descriptor + minCode + block len
    for (i <- dataAt until math.min(dataAt + 6, corrupt.length))
      corrupt(i) = 0xff.toByte
    assert(Gif.decodeRgb(corrupt).isEmpty ||
      Gif.decodeRgb(corrupt).get._3.length == 20 * 10 * 3,
      "corrupt stream either refuses or still yields a full-size buffer")
  }
}
