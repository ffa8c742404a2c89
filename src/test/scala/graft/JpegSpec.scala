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

  // ------------------------------------------------------------- color

  private def yVal(seed: Long)(bx: Int, by: Int): Int =
    (((bx * 7L + by * 13L + seed) % 256L + 256L) % 256L).toInt
  private def cbVal(seed: Long)(cx: Int, cy: Int): Int =
    (((cx * 11L + cy * 3L + 2 * seed) % 256L + 256L) % 256L).toInt
  private def crVal(seed: Long)(cx: Int, cy: Int): Int =
    (((cx * 5L + cy * 17L + 3 * seed) % 256L + 256L) % 256L).toInt

  private def wantRgb(seed: Long, sampling: Int)(x: Int, y: Int)
      : (Int, Int, Int) = {
    val (cx, cy) =
      if (sampling == 0x11) (x / 8, y / 8) else (x / 16, y / 16)
    Jpeg.ycbcrToRgb(yVal(seed)(x / 8, y / 8),
      cbVal(seed)(cx, cy), crVal(seed)(cx, cy))
  }

  test("color block-constant images round-trip bit-exactly: 4:4:4 and " +
      "4:2:0, partial edge MCUs included") {
    for (sampling <- Seq(0x11, 0x22);
         (w, h, seed) <- Seq((16, 16, 0L), (24, 16, 5L), (23, 17, 42L),
           (129, 65, 7L), (1, 1, 3L), (8, 8, 9L))) {
      val bytes = Jpeg.encodeColorBlocks(w, h, yVal(seed), cbVal(seed),
        crVal(seed), sampling)
      val (dw, dh, rgb) = Jpeg.decodeRgb(bytes).getOrElse(
        fail(s"undecodable ${w}x$h seed=$seed sampling=$sampling"))
      assert((dw, dh) == (w, h))
      for (y <- 0 until h; x <- 0 until w) {
        val want = wantRgb(seed, sampling)(x, y)
        val o = 3 * (y * w + x)
        val got = (rgb(o) & 0xff, rgb(o + 1) & 0xff, rgb(o + 2) & 0xff)
        assert(got == want,
          s"pixel ($x,$y) of ${w}x$h seed=$seed sampling=$sampling")
      }
    }
  }

  test("color restart markers round-trip to the plain-stream pixels") {
    val (w, h, seed) = (40, 24, 13L)
    for (sampling <- Seq(0x11, 0x22)) {
      val plain = Jpeg.decodeRgb(Jpeg.encodeColorBlocks(
        w, h, yVal(seed), cbVal(seed), crVal(seed), sampling)).get._3
      for (interval <- Seq(1, 3, 7)) {
        val got = Jpeg.decodeRgb(Jpeg.encodeColorBlocks(w, h, yVal(seed),
          cbVal(seed), crVal(seed), sampling, interval)).getOrElse(
          fail(s"restart interval $interval undecodable"))._3
        assert(got.toSeq == plain.toSeq,
          s"sampling=$sampling interval=$interval pixels differ")
      }
    }
  }

  test("ImageIO independently decodes our color encoder's output within " +
      "color-transform rounding tolerance") {
    // 4:4:4 with per-block varying chroma: no upsampling filter in play,
    // remaining divergence is the unpinned YCbCr->RGB rounding (±2)
    val (w, h, seed) = (32, 24, 11L)
    val bytes = Jpeg.encodeColorBlocks(w, h, yVal(seed), cbVal(seed),
      crVal(seed), 0x11)
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(bytes))
    assert(img != null && img.getWidth == w && img.getHeight == h)
    val ours = Jpeg.decodeRgb(bytes).get._3
    var maxDiff = 0
    for (y <- 0 until h; x <- 0 until w; c <- 0 until 3) {
      val theirs = (img.getRGB(x, y) >> (16 - 8 * c)) & 0xff
      val d = math.abs((ours(3 * (y * w + x) + c) & 0xff) - theirs)
      maxDiff = math.max(maxDiff, d)
    }
    assert(maxDiff <= 2,
      s"ImageIO diverges by $maxDiff > 2 on 4:4:4 constant blocks")
    // 4:2:0 solid color: constant chroma everywhere, so even fancy
    // upsampling reproduces the constant — same tolerance
    val solid = Jpeg.encodeColorBlocks(33, 18, (_, _) => 99,
      (_, _) => 180, (_, _) => 70, 0x22)
    val img2 = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(solid))
    assert(img2 != null && img2.getWidth == 33)
    val ours2 = Jpeg.decodeRgb(solid).get._3
    var maxDiff2 = 0
    for (y <- 0 until 18; x <- 0 until 33; c <- 0 until 3) {
      val theirs = (img2.getRGB(x, y) >> (16 - 8 * c)) & 0xff
      val d = math.abs((ours2(3 * (y * 33 + x) + c) & 0xff) - theirs)
      maxDiff2 = math.max(maxDiff2, d)
    }
    assert(maxDiff2 <= 2,
      s"ImageIO diverges by $maxDiff2 > 2 on solid 4:2:0")
  }

  test("our color decoder matches ImageIO on an ImageIO-ENCODED color " +
      "JPEG (gray content: upsampling-filter-neutral) within tolerance") {
    val w = 37; val h = 29
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val v = (x * 7 + y * 13 + x * y) % 256
      img.setRGB(x, y, (v << 16) | (v << 8) | v) // R=G=B -> Cb=Cr=128
    }
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "jpg", bos))
    val bytes = bos.toByteArray
    val (dw, dh, ours) = Jpeg.decodeRgb(bytes).getOrElse(
      fail("our decoder must accept a stock ImageIO baseline color JPEG"))
    assert((dw, dh) == (w, h))
    val ref = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(bytes))
    var maxDiff = 0
    for (y <- 0 until h; x <- 0 until w; c <- 0 until 3) {
      val theirs = (ref.getRGB(x, y) >> (16 - 8 * c)) & 0xff
      val d = math.abs((ours(3 * (y * w + x) + c) & 0xff) - theirs)
      maxDiff = math.max(maxDiff, d)
    }
    assert(maxDiff <= 2,
      s"decoders diverge by $maxDiff > 2 on gray-content color JPEG")
  }

  test("color refusals: sampling scope, non-interleaved scan, " +
      "progressive, truncation, gray/color cross-scope") {
    val good = Jpeg.encodeColorBlocks(24, 16, yVal(1L), cbVal(1L), crVal(1L))
    assert(Jpeg.decodeRgb(good).nonEmpty)
    assert(Jpeg.decodeRgb(null).isEmpty)
    assert(Jpeg.decodeRgb(good.take(30)).isEmpty)
    assert(Jpeg.decodeRgb(good.dropRight(good.length / 3)).isEmpty,
      "mid-scan truncation must refuse")
    def sofAt(b: Array[Byte]): Int = b.indices.find(i =>
      (b(i) & 0xff) == 0xff && (b(i + 1) & 0xff) == 0xc0).get
    // luma sampling 3x1: out of the documented {1,2} scope
    val s31 = good.clone()
    s31(sofAt(s31) + 11) = 0x31.toByte // Y component's h<<4|v byte
    assert(Jpeg.decodeRgb(s31).isEmpty, "3x1 luma sampling is refused")
    // subsampled chroma (2x1 Cb): out of scope
    val c21 = good.clone()
    c21(sofAt(c21) + 14) = 0x21.toByte
    assert(Jpeg.decodeRgb(c21).isEmpty, "subsampled chroma is refused")
    // progressive color
    val prog = good.clone()
    prog(sofAt(prog) + 1) = 0xc2.toByte
    assert(Jpeg.decodeRgb(prog).isEmpty, "SOF2 color is refused")
    // non-interleaved (single-component) scan in a 3-component frame:
    // splice a 1-component SOS over the interleaved one
    val sosAt = good.indices.find(i =>
      (good(i) & 0xff) == 0xff && (good(i + 1) & 0xff) == 0xda).get
    val ni = good.take(sosAt) ++
      Array[Byte](0xff.toByte, 0xda.toByte, 0, 8, 1, 1, 0x00, 0, 63, 0) ++
      good.drop(sosAt + 14)
    assert(Jpeg.decodeRgb(ni).isEmpty, "non-interleaved scans are refused")
    // cross-scope: the color decoder refuses grayscale frames and
    // vice versa (each owns exactly its documented ncomp)
    val gray = Jpeg.encodeGrayBlocks(24, 16, blockVal(1L))
    assert(Jpeg.decodeRgb(gray).isEmpty)
    assert(Jpeg.decodeGray(good).isEmpty)
  }

  test("pixelStatsColor reduces the decoded RGB; per-component DC " +
      "prediction spans MCUs") {
    val (w, h, seed) = (64, 40, 9L)
    for (sampling <- Seq(0x11, 0x22)) {
      val s = Jpeg.pixelStatsColor(Jpeg.encodeColorBlocks(
        w, h, yVal(seed), cbVal(seed), crVal(seed), sampling)).get
      assert(s.width == w && s.height == h && s.nPx == w.toLong * h)
      var wr = 0L; var wg = 0L; var wb = 0L
      for (y <- 0 until h; x <- 0 until w) {
        val (r, g, b) = wantRgb(seed, sampling)(x, y)
        wr += r; wg += g; wb += b
      }
      assert((s.sumR, s.sumG, s.sumB) == ((wr, wg, wb)),
        s"sampling=$sampling sums differ")
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

  // ------------------------------------------------------------------
  // Progressive (SOF2)
  // ------------------------------------------------------------------

  test("progressive: block-constant images round-trip bit-exactly " +
      "through the three-scan progression (DC first/refine + EOB runs) " +
      "and equal the baseline encoding's pixels") {
    for ((w, h, seed) <- Seq((8, 8, 0L), (16, 8, 5L), (23, 17, 42L),
        (100, 60, 7L), (129, 65, 3L))) {
      val prog = Jpeg.encodeGrayProgressiveBlocks(w, h, blockVal(seed))
      // the container really is progressive
      assert(prog.sliding(2).exists(p =>
        (p(0) & 0xff) == 0xff && (p(1) & 0xff) == 0xc2), "no SOF2 marker")
      val (dw, dh, px) = Jpeg.decodeGray(prog).getOrElse(
        fail(s"undecodable progressive ${w}x$h seed=$seed"))
      assert((dw, dh) == (w, h))
      val (_, _, base) = Jpeg.decodeGray(
        Jpeg.encodeGrayBlocks(w, h, blockVal(seed))).get
      assert(px.toSeq == base.toSeq,
        s"progressive pixels != baseline pixels at ${w}x$h")
    }
  }

  test("progressive: ImageIO independently decodes our progressive " +
      "encoder's output to the same pixels") {
    val (w, h, seed) = (41, 26, 11L)
    val bytes = Jpeg.encodeGrayProgressiveBlocks(w, h, blockVal(seed))
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(bytes))
    assert(img != null, "ImageIO must accept the progressive container")
    assert(img.getWidth == w && img.getHeight == h)
    for (y <- 0 until h; x <- 0 until w)
      assert(img.getRaster.getSample(x, y, 0) == blockVal(seed)(x / 8, y / 8),
        s"ImageIO progressive pixel ($x,$y)")
  }

  /** Encode a BufferedImage as a PROGRESSIVE JPEG via ImageIO's writer
    * (libjpeg's standard multi-scan script: interleaved DC first at
    * Al=1, banded AC firsts, AC/DC refinements — the full Annex G
    * feature set our decoder claims). */
  private def imageIoProgressive(img: java.awt.image.BufferedImage)
      : Array[Byte] = {
    val writer = javax.imageio.ImageIO
      .getImageWritersByFormatName("jpg").next()
    val p = writer.getDefaultWriteParam
    p.setProgressiveMode(javax.imageio.ImageWriteParam.MODE_DEFAULT)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
    writer.setOutput(ios)
    writer.write(null, new javax.imageio.IIOImage(img, null, null), p)
    ios.close(); writer.dispose()
    val bytes = bos.toByteArray
    assert(bytes.sliding(2).exists(q =>
      (q(0) & 0xff) == 0xff && (q(1) & 0xff) == 0xc2),
      "ImageIO did not produce a progressive (SOF2) stream")
    bytes
  }

  test("our decoder matches ImageIO on an ImageIO-ENCODED PROGRESSIVE " +
      "grayscale image (real multi-scan successive approximation) " +
      "within the spec's IDCT tolerance") {
    val w = 37; val h = 29
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w)
      img.getRaster.setSample(x, y, 0, (x * 7 + y * 13 + x * y) % 256)
    val bytes = imageIoProgressive(img)
    val (dw, dh, px) = Jpeg.decodeGray(bytes).getOrElse(
      fail("our decoder must accept a stock ImageIO progressive JPEG"))
    assert((dw, dh) == (w, h))
    val ref = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(bytes)).getRaster
    var maxDiff = 0
    for (y <- 0 until h; x <- 0 until w) {
      val d = math.abs((px(y * w + x) & 0xff) - ref.getSample(x, y, 0))
      maxDiff = math.max(maxDiff, d)
    }
    assert(maxDiff <= 1,
      s"progressive decoders diverge by $maxDiff > 1")
  }

  test("our color decoder matches ImageIO on an ImageIO-ENCODED " +
      "PROGRESSIVE color JPEG (gray content: upsampling-filter-neutral) " +
      "within tolerance") {
    val w = 37; val h = 29
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val v = (x * 7 + y * 13 + x * y) % 256
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val bytes = imageIoProgressive(img)
    val (dw, dh, ours) = Jpeg.decodeRgb(bytes).getOrElse(
      fail("our decoder must accept a stock ImageIO progressive color JPEG"))
    assert((dw, dh) == (w, h))
    val ref = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(bytes))
    var maxDiff = 0
    for (y <- 0 until h; x <- 0 until w; c <- 0 until 3) {
      val theirs = (ref.getRGB(x, y) >> (16 - 8 * c)) & 0xff
      val d = math.abs((ours(3 * (y * w + x) + c) & 0xff) - theirs)
      maxDiff = math.max(maxDiff, d)
    }
    assert(maxDiff <= 2,
      s"progressive color decoders diverge by $maxDiff > 2")
  }

  test("progressive refusals: truncation, garbage scans, arithmetic " +
      "frames, out-of-scope progressions") {
    val good = Jpeg.encodeGrayProgressiveBlocks(24, 16, blockVal(1L))
    assert(Jpeg.decodeGray(good).nonEmpty)
    assert(Jpeg.decodeGray(good.take(30)).isEmpty, "header truncation")
    assert(Jpeg.decodeGray(good.dropRight(5)).isEmpty,
      "losing EOI + tail data must refuse, not return a partial image")
    // a baseline-shaped SOS (Ss=0, Se=63) inside a progressive frame
    // violates the band constraints — the mislabeled-SOF2 refusal the
    // baseline suite also asserts
    val base = Jpeg.encodeGrayBlocks(24, 16, blockVal(1L))
    val sofAt = base.indices.find(i =>
      (base(i) & 0xff) == 0xff && (base(i + 1) & 0xff) == 0xc0).get
    val mislabeled = base.clone()
    mislabeled(sofAt + 1) = 0xc2.toByte
    assert(Jpeg.decodeGray(mislabeled).isEmpty,
      "baseline scan in a SOF2 frame is refused")
    // flip our progressive SOF2 to arithmetic-coded SOF10 (0xca)
    val arith = good.clone()
    val sof2At = arith.indices.find(i =>
      (arith(i) & 0xff) == 0xff && (arith(i + 1) & 0xff) == 0xc2).get
    arith(sof2At + 1) = 0xca.toByte
    assert(Jpeg.decodeGray(arith).isEmpty, "arithmetic SOF is refused")
    // gray/color cross-scope: a progressive GRAY frame via decodeRgb
    assert(Jpeg.decodeRgb(good).isEmpty,
      "1-component progressive is refused by the color decoder")
  }
}
