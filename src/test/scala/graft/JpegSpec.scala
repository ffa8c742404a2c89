package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Jpeg

/** The baseline-JPEG codec ([[graft.operators.Jpeg]]): block-constant
  * images round-trip EXACTLY through the lossy pipeline (the DC-only /
  * quant-8 design), ImageIO independently decodes our encoder's output
  * to the same pixels, our decoder matches ImageIO on ImageIO-ENCODED
  * arbitrary grayscale JPEGs within the ±1 the JPEG spec allows between
  * IDCT implementations, and malformed/out-of-scope inputs refuse
  * cleanly. */
class JpegSpec extends AnyFunSuite {

  private def blockVal(seed: Long)(bx: Int, by: Int): Int =
    (((bx * 7L + by * 13L + seed) % 256L + 256L) % 256L).toInt

  test("block-constant images round-trip bit-exactly through the lossy " +
      "pipeline, partial edge blocks included") {
    for ((w, h, seed) <- Seq((8, 8, 0L), (16, 8, 5L), (23, 17, 42L),
        (129, 65, 7L), (1, 1, 3L))) {
      val bytes = Jpeg.encodeGrayBlocks(w, h, blockVal(seed))
      val (dw, dh, px) = Jpeg.decodeGray(bytes).getOrElse(
        fail(s"undecodable ${w}x$h seed=$seed"))
      assert((dw, dh) == (w, h))
      for (y <- 0 until h; x <- 0 until w) {
        val want = blockVal(seed)(x / 8, y / 8)
        val got = px(y * w + x) & 0xff
        assert(got == want, s"pixel ($x,$y) of ${w}x$h seed=$seed: $got != $want")
      }
    }
  }

  test("ImageIO independently decodes our encoder's output to the same " +
      "pixels (DC-only blocks are exact in ANY conforming decoder)") {
    val (w, h, seed) = (40, 24, 11L)
    val bytes = Jpeg.encodeGrayBlocks(w, h, blockVal(seed))
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(bytes))
    assert(img != null, "ImageIO must accept the container")
    assert(img.getWidth == w && img.getHeight == h)
    val raster = img.getRaster
    for (y <- 0 until h; x <- 0 until w)
      assert(raster.getSample(x, y, 0) == blockVal(seed)(x / 8, y / 8),
        s"ImageIO pixel ($x,$y)")
  }

  test("our decoder matches ImageIO on an ImageIO-ENCODED arbitrary " +
      "grayscale image within the spec's IDCT tolerance") {
    val w = 37; val h = 29
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w)
      img.getRaster.setSample(x, y, 0, (x * 7 + y * 13 + x * y) % 256)
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "jpg", bos))
    val bytes = bos.toByteArray
    val (dw, dh, px) = Jpeg.decodeGray(bytes).getOrElse(
      fail("our decoder must accept a stock ImageIO baseline grayscale JPEG"))
    assert((dw, dh) == (w, h))
    val ref = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(bytes)).getRaster
    var maxDiff = 0
    for (y <- 0 until h; x <- 0 until w) {
      val d = math.abs((px(y * w + x) & 0xff) - ref.getSample(x, y, 0))
      maxDiff = math.max(maxDiff, d)
    }
    assert(maxDiff <= 1,
      s"decoders diverge by $maxDiff > 1 — more than IDCT rounding lore allows")
  }

  test("refusals: truncation, color scope, progressive scope, garbage") {
    val good = Jpeg.encodeGrayBlocks(24, 16, blockVal(1L))
    assert(Jpeg.decodeGray(null).isEmpty)
    assert(Jpeg.decodeGray(Array[Byte](1, 2, 3)).isEmpty)
    assert(Jpeg.decodeGray("not a jpeg at all".getBytes).isEmpty)
    assert(Jpeg.decodeGray(good.take(20)).isEmpty, "header-only truncation")
    assert(Jpeg.decodeGray(good.dropRight(good.length / 2)).isEmpty,
      "mid-scan truncation must refuse, not return half an image")
    // adversarial dims: 65535x65535 wraps Int in w*h — must refuse, not
    // die in a negative allocation
    val big = good.clone()
    val sof0 = big.indices.find(i =>
      (big(i) & 0xff) == 0xff && (big(i + 1) & 0xff) == 0xc0).get
    big(sof0 + 5) = 0xff.toByte; big(sof0 + 6) = 0xff.toByte // height
    big(sof0 + 7) = 0xff.toByte; big(sof0 + 8) = 0xff.toByte // width
    assert(Jpeg.decodeGray(big).isEmpty, "overflowing dims are refused")
    // a COLOR ImageIO jpeg → ncomp=3 → out of documented scope
    val rgb = new java.awt.image.BufferedImage(
      16, 16, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(rgb, "jpg", bos)
    assert(Jpeg.decodeGray(bos.toByteArray).isEmpty,
      "color baseline is refused (documented grayscale scope)")
    // progressive: flip SOF0 to SOF2 in our own container → refused
    val prog = good.clone()
    val sofAt = prog.indices.find(i =>
      (prog(i) & 0xff) == 0xff && (prog(i + 1) & 0xff) == 0xc0).get
    prog(sofAt + 1) = 0xc2.toByte
    assert(Jpeg.decodeGray(prog).isEmpty, "SOF2 (progressive) is refused")
  }

  test("restart markers: DRI/RSTn streams decode identically to plain " +
      "streams, and ImageIO agrees (the DC-reset path is live)") {
    val (w, h, seed) = (40, 24, 13L) // 5x3 = 15 MCUs
    val plain = Jpeg.decodeGray(
      Jpeg.encodeGrayBlocks(w, h, blockVal(seed))).get._3
    for (interval <- Seq(1, 3, 4, 15, 20)) {
      val rst = Jpeg.encodeGrayBlocks(w, h, blockVal(seed), interval)
      val got = Jpeg.decodeGray(rst).getOrElse(
        fail(s"restart interval $interval undecodable"))._3
      assert(got.toSeq == plain.toSeq, s"interval $interval pixels differ")
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(rst))
      assert(img != null && img.getWidth == w, s"ImageIO rejects DRI=$interval")
      for (y <- 0 until h; x <- 0 until w)
        assert(img.getRaster.getSample(x, y, 0) == blockVal(seed)(x / 8, y / 8),
          s"ImageIO pixel ($x,$y) at interval $interval")
    }
  }

  test("pixelStats reduces the decoded plane; DC prediction spans blocks " +
      "(values vary across the image)") {
    val (w, h, seed) = (64, 40, 9L)
    val s = Jpeg.pixelStats(Jpeg.encodeGrayBlocks(w, h, blockVal(seed))).get
    assert(s.width == w && s.height == h && s.nPx == w.toLong * h)
    var want = 0L
    for (y <- 0 until h; x <- 0 until w) want += blockVal(seed)(x / 8, y / 8)
    assert(s.sumG == want, s"sum ${s.sumG} != $want")
  }
}
