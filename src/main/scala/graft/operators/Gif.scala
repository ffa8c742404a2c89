package graft.operators

/** Minimal REAL GIF codec — pure JVM — the last member of the crawl
  * image-format family ([[Png]] deflate, [[Jpeg]] DCT, [[Bmp]]
  * uncompressed, this = LZW). Scope: GIF87a/89a, single image frame,
  * global or local color table, interlaced or sequential row order,
  * genuine variable-width LZW with code growth and CLEAR handling;
  * extension blocks are skipped. Out of scope (refuse, don't guess):
  * missing color tables, sub-8-bit... no — ANY color-table size is
  * fine (palette sizes are 2^n); what refuses is structural damage:
  * truncated streams, LZW codes beyond the table, missing trailer
  * before pixels complete.
  *
  * GIF is lossless (palette indices round-trip exactly), so the
  * catalog oracle is a straight formula re-derivation like PNG/BMP —
  * and the encoder is a REAL compressing LZW (dictionary build,
  * width growth 9→12 bits, CLEAR at table overflow), so the decoder's
  * dictionary reconstruction — including the tricky
  * "code == next entry" self-referential case — is exercised on every
  * image, not just the literal path. Bits pack LSB-FIRST (GIF's
  * little-endian bit order, the opposite of JPEG), data rides 255-byte
  * sub-blocks, and interlaced images use the 8/8/4/2 four-pass row
  * schedule — all on the oracle's hook via the round trip.
  *
  * Same 100 TB shape as the family: opaque binary payloads,
  * partition-wise decode, stats across stage boundaries. */
object Gif {

  /** A complete, valid GIF89a of the generative GRAYSCALE image
    * `pix(x, y)` (0–255): 256-entry grayscale global color table where
    * palette index i maps to gray i — so indices ARE sample values and
    * the round trip is trivially formula-checkable. Real LZW encode.
    * `interlaced = true` writes the 4-pass row order (decoder must
    * de-interlace to agree with the formula). */
  def encodeGray(width: Int, height: Int, pix: (Int, Int) => Int,
      interlaced: Boolean = false): Array[Byte] = {
    require(width > 0 && height > 0, s"encodeGray: bad dims ${width}x$height")
    require(width <= 0xffff && height <= 0xffff,
      s"encodeGray: dims ${width}x$height exceed GIF's 16-bit fields")
    require(width.toLong * height <= Int.MaxValue - 8,
      s"encodeGray: ${width}x$height exceeds a single in-memory index buffer")
    val out = new java.io.ByteArrayOutputStream()
    def le2(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    out.write("GIF89a".getBytes("US-ASCII"))
    le2(width); le2(height)
    out.write(0xf7) // GCT present, 8 bpp, 256 entries
    out.write(0); out.write(0) // background, aspect
    var i = 0
    while (i < 256) { out.write(i); out.write(i); out.write(i); i += 1 }
    out.write(0x2c) // image descriptor
    le2(0); le2(0); le2(width); le2(height)
    out.write(if (interlaced) 0x40 else 0x00)
    // pixel indices in STORAGE order (interlace permutes rows)
    val rows = if (interlaced) interlaceOrder(height) else 0 until height
    val idx = new Array[Int](width * height)
    var o = 0
    for (y <- rows; x <- 0 until width) {
      val v = pix(x, y)
      require(v >= 0 && v <= 255, s"encodeGray: pixel value $v at ($x,$y)")
      idx(o) = v; o += 1
    }
    out.write(8) // LZW min code size
    out.write(lzwEncode(idx, 8))
    out.write(0x3b) // trailer
    out.toByteArray
  }

  /** The 4-pass interlace row schedule (GIF spec appendix E): storage
    * order → display row. */
  private def interlaceOrder(h: Int): Seq[Int] =
    (0 until h by 8) ++ (4 until h by 8) ++ (2 until h by 4) ++ (1 until h by 2)

  private final class LsbBitWriter {
    val out = new java.io.ByteArrayOutputStream()
    private var acc = 0
    private var nbits = 0
    def put(code: Int, width: Int): Unit = {
      acc |= code << nbits
      nbits += width
      while (nbits >= 8) {
        out.write(acc & 0xff)
        acc >>>= 8
        nbits -= 8
      }
    }
    def finish(): Array[Byte] = {
      if (nbits > 0) out.write(acc & 0xff)
      out.toByteArray
    }
  }

  /** Real LZW compression (GIF variant): dictionary over (prefix code,
    * next symbol), code width grows 9→12, CLEAR + reset at 4096
    * entries; output packaged into ≤255-byte sub-blocks with the
    * terminating empty block. */
  private def lzwEncode(idx: Array[Int], minCode: Int): Array[Byte] = {
    val clear = 1 << minCode
    val eoi = clear + 1
    val w = new LsbBitWriter
    var width = minCode + 1
    var next = eoi + 1
    val dict = new java.util.HashMap[Long, Integer]()
    def key(prefix: Int, sym: Int): Long = (prefix.toLong << 12) | sym
    w.put(clear, width)
    var cur = idx(0)
    var i = 1
    while (i < idx.length) {
      val k = key(cur, idx(i))
      val hit = dict.get(k)
      if (hit != null) cur = hit.intValue()
      else {
        w.put(cur, width)
        dict.put(k, Integer.valueOf(next))
        next += 1
        if (next - 1 == (1 << width) && width < 12) width += 1
        if (next == 4096) {
          w.put(clear, width)
          dict.clear()
          width = minCode + 1
          next = eoi + 1
        }
        cur = idx(i)
      }
      i += 1
    }
    w.put(cur, width)
    w.put(eoi, width)
    val raw = w.finish()
    val out = new java.io.ByteArrayOutputStream()
    var p = 0
    while (p < raw.length) {
      val n = math.min(255, raw.length - p)
      out.write(n)
      out.write(raw, p, n)
      p += n
    }
    out.write(0) // block terminator
    out.toByteArray
  }

  /** REAL decode of a conforming single-frame GIF: header + color
    * table, extension skip, image descriptor (local table honored,
    * interlace de-permuted), sub-block reassembly, variable-width LZW
    * with full dictionary reconstruction. Returns row-major RGB (3
    * bytes/pixel via the palette). None on anything malformed. */
  def decodeRgb(b: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
    if (b == null || b.length < 13) return None
    val sig = new String(b, 0, 6, "US-ASCII")
    if (sig != "GIF87a" && sig != "GIF89a") return None
    def le2(at: Int): Int = (b(at) & 0xff) | ((b(at + 1) & 0xff) << 8)
    var pos = 6
    pos += 4 // logical screen w/h (frame uses its own descriptor dims)
    val packed = b(pos) & 0xff
    pos += 3
    var palette: Array[Byte] = null
    if ((packed & 0x80) != 0) {
      val n = 1 << ((packed & 0x07) + 1)
      if (pos + 3 * n > b.length) return None
      palette = java.util.Arrays.copyOfRange(b, pos, pos + 3 * n)
      pos += 3 * n
    }
    // block walk to the first image descriptor
    while (pos < b.length && (b(pos) & 0xff) == 0x21) { // extension
      pos += 2 // introducer + label
      var blk = if (pos < b.length) b(pos) & 0xff else return None
      while (blk != 0) {
        pos += 1 + blk
        if (pos >= b.length) return None
        blk = b(pos) & 0xff
      }
      pos += 1
    }
    if (pos >= b.length || (b(pos) & 0xff) != 0x2c) return None
    if (pos + 10 > b.length) return None
    val w = le2(pos + 5)
    val h = le2(pos + 7)
    val iPacked = b(pos + 9) & 0xff
    pos += 10
    if (w <= 0 || h <= 0) return None
    if ((iPacked & 0x80) != 0) { // local color table wins
      val n = 1 << ((iPacked & 0x07) + 1)
      if (pos + 3 * n > b.length) return None
      palette = java.util.Arrays.copyOfRange(b, pos, pos + 3 * n)
      pos += 3 * n
    }
    if (palette == null) return None
    val interlaced = (iPacked & 0x40) != 0
    if (pos >= b.length) return None
    val minCode = b(pos) & 0xff
    pos += 1
    if (minCode < 2 || minCode > 8) return None
    // reassemble sub-blocks
    val data = new java.io.ByteArrayOutputStream()
    var blk = if (pos < b.length) b(pos) & 0xff else return None
    while (blk != 0) {
      if (pos + 1 + blk > b.length) return None
      data.write(b, pos + 1, blk)
      pos += 1 + blk
      if (pos >= b.length) return None
      blk = b(pos) & 0xff
    }
    val stream = data.toByteArray
    // LZW decode
    val total = w * h
    if (w.toLong * h * 3 > Int.MaxValue - 8) return None
    val indices = new Array[Int](total)
    var outAt = 0
    val clear = 1 << minCode
    val eoi = clear + 1
    var width = minCode + 1
    // dictionary as (prefix link, last symbol) — O(1) append, O(len) emit
    val prefixOf = new Array[Int](4096)
    val symOf = new Array[Int](4096)
    val lenOf = new Array[Int](4096)
    var next = 0
    def reset(): Unit = {
      var c = 0
      while (c < clear) { prefixOf(c) = -1; symOf(c) = c; lenOf(c) = 1; c += 1 }
      next = eoi + 1
      width = minCode + 1
    }
    reset()
    var acc = 0L
    var nbits = 0
    var p = 0
    var prev = -1
    var done = false
    val scratch = new Array[Int](4096)
    def emit(code: Int): Boolean = {
      var n = lenOf(code)
      if (outAt + n > total) return false
      var c = code
      var j = n
      while (j > 0) { j -= 1; scratch(j) = symOf(c); c = prefixOf(c) }
      var i2 = 0
      while (i2 < n) { indices(outAt) = scratch(i2); outAt += 1; i2 += 1 }
      true
    }
    def firstSym(code: Int): Int = {
      var c = code
      while (prefixOf(c) >= 0) c = prefixOf(c)
      symOf(c)
    }
    while (!done) {
      while (nbits < width && p < stream.length) {
        acc |= (stream(p) & 0xffL) << nbits
        nbits += 8
        p += 1
      }
      if (nbits < width) return None // truncated before EOI
      val code = (acc & ((1L << width) - 1)).toInt
      acc >>>= width
      nbits -= width
      if (code == clear) { reset(); prev = -1 }
      else if (code == eoi) done = true
      else if (prev < 0) {
        if (code >= clear) return None // first code after CLEAR: literal only
        if (!emit(code)) return None
        prev = code
      } else {
        if (code < next && code != eoi && code != clear) {
          if (!emit(code)) return None
          if (next < 4096) {
            prefixOf(next) = prev; symOf(next) = firstSym(code)
            lenOf(next) = lenOf(prev) + 1
            next += 1
            if (next == (1 << width) && width < 12) width += 1
          }
          prev = code
        } else if (code == next && next < 4096) {
          // the self-referential case: entry = prev ++ first(prev)
          prefixOf(next) = prev; symOf(next) = firstSym(prev)
          lenOf(next) = lenOf(prev) + 1
          next += 1
          if (!emit(next - 1)) return None
          if (next == (1 << width) && width < 12) width += 1
          prev = next - 1
        } else return None // code beyond the table: corrupt stream
      }
      if (outAt == total && !done) {
        // all pixels decoded; accept a missing explicit EOI (lenient,
        // matches common decoders) but stop consuming
        done = true
      }
    }
    if (outAt != total) return None
    // palette lookup + de-interlace into display order
    val px = new Array[Byte](total * 3)
    val rows: Seq[Int] = if (interlaced) interlaceOrder(h) else 0 until h
    val nColors = palette.length / 3
    var storageRow = 0
    for (dispY <- rows) {
      var x = 0
      while (x < w) {
        val ci = indices(storageRow * w + x)
        if (ci >= nColors) return None
        val d = (dispY * w + x) * 3
        px(d) = palette(ci * 3)
        px(d + 1) = palette(ci * 3 + 1)
        px(d + 2) = palette(ci * 3 + 2)
        x += 1
      }
      storageRow += 1
    }
    Some((w, h, px))
  }

  /** Channel sums — shares [[Png.PixelStats]] with the rest of the
    * image family. */
  def pixelStats(b: Array[Byte]): Option[Png.PixelStats] =
    decodeRgb(b).map { case (w, h, px) => Png.statsFromRgb(w, h, px) }
}
