package graft.operators

/** Minimal REAL BMP codec — pure JVM — completing the common-crawl
  * image-format trio ([[Png]] = deflate/filters, [[Jpeg]] = baseline
  * DCT, this = the uncompressed workhorse). Scope: BITMAPINFOHEADER,
  * 24-bit uncompressed (BI_RGB), bottom-up or top-down row order;
  * everything else (palettes, 16/32-bit, RLE, V4/V5 headers beyond the
  * 40-byte core) returns None — refuse, don't guess.
  *
  * BMP is lossless and trivially exact, which makes it the simplest
  * member of the family to hash-oracle — but the format details the
  * decoder must get right are real and routinely fumbled: little-endian
  * multi-byte fields, BGR (not RGB) channel order, rows padded to
  * 4-byte boundaries, NEGATIVE height meaning top-down row order, and a
  * pixel-array offset that need not abut the headers. The catalog query
  * proves all of them at once: the oracle recomputes channel sums from
  * the generative formula and a single flipped row, swapped channel, or
  * mis-padded stride breaks the hash.
  *
  * Same 100 TB shape as the rest of the multimodal family: opaque
  * binary payloads, partition-wise decode, stats — never pixels —
  * across stage boundaries. */
object Bmp {

  private def le2(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
  private def le4(v: Long): Array[Byte] = Array(
    (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
    ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  /** A complete, valid bottom-up 24-bit BMP of the generative image
    * `seed` (same pixel formulas as [[Png]] — one ground truth for the
    * whole image family). Rows are written bottom-up with 4-byte
    * padding, channels in BGR order, exactly as the format demands. */
  def encodeRgb(width: Int, height: Int, seed: Long): Array[Byte] = {
    require(width > 0 && height > 0, s"encodeRgb: bad dims ${width}x$height")
    val stride = (width * 3 + 3) & ~3
    require(stride.toLong * height <= Int.MaxValue - 54,
      s"encodeRgb: ${width}x$height exceeds a single in-memory BMP")
    val dataLen = stride * height
    val out = new Array[Byte](54 + dataLen)
    // BITMAPFILEHEADER (14) + BITMAPINFOHEADER (40)
    out(0) = 'B'; out(1) = 'M'
    System.arraycopy(le4(54L + dataLen), 0, out, 2, 4)
    System.arraycopy(le4(54L), 0, out, 10, 4) // pixel array offset
    System.arraycopy(le4(40L), 0, out, 14, 4) // info header size
    System.arraycopy(le4(width.toLong), 0, out, 18, 4)
    System.arraycopy(le4(height.toLong), 0, out, 22, 4) // positive: bottom-up
    System.arraycopy(le2(1), 0, out, 26, 2) // planes
    System.arraycopy(le2(24), 0, out, 28, 2) // bpp
    // compression BI_RGB = 0, image size, ppm, palette fields: zeros
    var y = 0
    while (y < height) {
      val rowAt = 54 + (height - 1 - y) * stride // bottom-up
      var x = 0
      while (x < width) {
        val o = rowAt + x * 3
        out(o) = Png.pixelB(x, y, seed).toByte // BGR order
        out(o + 1) = Png.pixelG(x, y, seed).toByte
        out(o + 2) = Png.pixelR(x, y, seed).toByte
        x += 1
      }
      y += 1
    }
    out
  }

  private def rdLe2(b: Array[Byte], at: Int): Int =
    (b(at) & 0xff) | ((b(at + 1) & 0xff) << 8)
  private def rdLe4(b: Array[Byte], at: Int): Long =
    (b(at) & 0xffL) | ((b(at + 1) & 0xffL) << 8) |
      ((b(at + 2) & 0xffL) << 16) | ((b(at + 3) & 0xffL) << 24)

  /** REAL pixel decode of a conforming 24-bit BI_RGB BMP: header parse
    * (little-endian fields), padded-stride walk in bottom-up OR
    * top-down order, BGR→RGB, row-major RGB buffer out. None for
    * anything out of scope or malformed. */
  def decodeRgb(b: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
    if (b == null || b.length < 54 || b(0) != 'B' || b(1) != 'M') return None
    val pixelAt = rdLe4(b, 10)
    if (rdLe4(b, 14) != 40L) return None // BITMAPINFOHEADER only
    val w = rdLe4(b, 18).toInt
    val hRaw = rdLe4(b, 22).toInt // SIGNED: negative = top-down
    // abs(Int.MinValue) is still negative — reject before it slips past
    // the sign checks and wraps the pixel allocation
    if (hRaw == Int.MinValue) return None
    val topDown = hRaw < 0
    val h = math.abs(hRaw)
    if (w <= 0 || h == 0) return None
    if (rdLe2(b, 26) != 1) return None // planes
    if (rdLe2(b, 28) != 24) return None // 24-bit scope
    if (rdLe4(b, 30) != 0L) return None // BI_RGB (uncompressed) scope
    val stride = (w.toLong * 3 + 3) & ~3L
    if (w.toLong * h * 3 > Int.MaxValue - 8) return None
    if (pixelAt < 54 || pixelAt + stride * h > b.length) return None
    val px = new Array[Byte](w * h * 3)
    var y = 0
    while (y < h) {
      val srcRow = if (topDown) y else h - 1 - y
      val rowAt = (pixelAt + srcRow * stride).toInt
      var x = 0
      while (x < w) {
        val s = rowAt + x * 3
        val d = (y * w + x) * 3
        px(d) = b(s + 2) // R from BGR
        px(d + 1) = b(s + 1)
        px(d + 2) = b(s)
        x += 1
      }
      y += 1
    }
    Some((w, h, px))
  }

  /** Channel sums of the decoded image — [[Png.PixelStats]] reused so
    * the image family shares one feature row shape. */
  def pixelStats(b: Array[Byte]): Option[Png.PixelStats] =
    decodeRgb(b).map { case (w, h, px) => Png.statsFromRgb(w, h, px) }
}
