package graft.operators

/** Minimal REAL baseline-JPEG codec — pure JVM (no image libraries) —
  * extending the real-codec family ([[Png]] = deflate/filters,
  * [[Wav]] = RIFF/PCM) to the most common crawl image format.
  *
  * Scope (refuse, don't guess — same posture as the PNG decoder):
  * baseline sequential DCT (SOF0) AND progressive DCT (SOF2 — spectral
  * selection + successive approximation, DC and AC first/refinement
  * scans, EOB runs, interleaved and non-interleaved scan orders), 8-bit
  * quantization tables; no arithmetic/hierarchical/lossless modes.
  * [[decodeGray]] owns one-component frames; [[decodeRgb]] owns
  * three-component YCbCr with luma sampling factors in {1,2}×{1,2} and
  * unsubsampled chroma — 4:4:4, 4:2:2, 4:2:0, 4:4:0, the shapes real
  * crawl encoders emit. Both dispatch SOF2 frames to the progressive
  * scan machinery ([[encodeGrayProgressiveBlocks]] documents how a
  * multi-scan lossy mode still sits under the hash gate). Restart
  * markers are honored (DC predictor reset). Anything else returns
  * None. The color transform is pinned
  * to one INTEGER definition ([[ycbcrToRgb]]: 16.16 fixed point,
  * +32768, arithmetic shift) and chroma upsampling to sample
  * replication, because JFIF specifies neither — picking integer
  * definitions is what lets a color decode sit under a hash oracle at
  * all. The machinery exercised is the entire baseline chain: marker
  * structure, canonical huffman tables (DHT, luma + chroma classes),
  * entropy-coded segments with byte stuffing, per-component DC
  * prediction, AC run-length/EOB/ZRL coding, zigzag, dequantization,
  * the 2-D inverse DCT, MCU interleave, and subsampled plane assembly.
  *
  * Exactness story (how a LOSSY codec gets under a hash oracle): the
  * FDCT of a CONSTANT 8×8 block has a single nonzero coefficient,
  * DC = 8·(c − 128). With the DC quantizer pinned to 8 the quantized
  * DC is exactly c − 128, and ANY spec-compliant IDCT reproduces the
  * constant block bit-exactly (the IDCT of a DC-only spectrum is flat;
  * one rounding of an exact value). [[encodeGrayBlocks]] builds images
  * that are constant per 8×8 block, so encode → decode round-trips
  * losslessly THROUGH the lossy pipeline, and the catalog oracle
  * re-derives every decoded pixel from the block-level generative
  * formula relationally. Arbitrary images remain decodable (the
  * decoder is general baseline-grayscale); a spec cross-decodes
  * ImageIO-encoded JPEGs against JDK ImageIO with the ±1 tolerance the
  * JPEG spec itself allows between IDCT implementations.
  *
  * The 100 TB shape matches the rest of the multimodal family: opaque
  * binary payloads, partition-wise decode, per-image stats — never
  * pixels — across stage boundaries. */
object Jpeg {

  /** Standard luminance DC huffman table (JPEG Annex K.3.1): code
    * lengths histogram (BITS) and symbol values (HUFFVAL). */
  private val DcBits: Array[Int] =
    Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val DcVals: Array[Int] = (0 to 11).toArray

  /** Standard luminance AC huffman table (Annex K.3.2). */
  private val AcBits: Array[Int] =
    Array(0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7d)
  private val AcVals: Array[Int] = Array(
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xa1, 0x08,
    0x23, 0x42, 0xb1, 0xc1, 0x15, 0x52, 0xd1, 0xf0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0a, 0x16,
    0x17, 0x18, 0x19, 0x1a, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2a, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7a, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8a, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5, 0xa6, 0xa7,
    0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4, 0xb5, 0xb6,
    0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3, 0xc4, 0xc5,
    0xc6, 0xc7, 0xc8, 0xc9, 0xca, 0xd2, 0xd3, 0xd4,
    0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda, 0xe1, 0xe2,
    0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9, 0xea,
    0xf1, 0xf2, 0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8,
    0xf9, 0xfa)

  /** Standard chrominance DC huffman table (Annex K.3.3.1). */
  private val DcChromaBits: Array[Int] =
    Array(0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0)
  private val DcChromaVals: Array[Int] = (0 to 11).toArray

  /** Standard chrominance AC huffman table (Annex K.3.3.2). */
  private val AcChromaBits: Array[Int] =
    Array(0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77)
  private val AcChromaVals: Array[Int] = Array(
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xa1, 0xb1, 0xc1, 0x09, 0x23, 0x33, 0x52, 0xf0,
    0x15, 0x62, 0x72, 0xd1, 0x0a, 0x16, 0x24, 0x34,
    0xe1, 0x25, 0xf1, 0x17, 0x18, 0x19, 0x1a, 0x26,
    0x27, 0x28, 0x29, 0x2a, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3a, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4a, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5a, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6a, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7a, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8a, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9a, 0xa2, 0xa3, 0xa4, 0xa5,
    0xa6, 0xa7, 0xa8, 0xa9, 0xaa, 0xb2, 0xb3, 0xb4,
    0xb5, 0xb6, 0xb7, 0xb8, 0xb9, 0xba, 0xc2, 0xc3,
    0xc4, 0xc5, 0xc6, 0xc7, 0xc8, 0xc9, 0xca, 0xd2,
    0xd3, 0xd4, 0xd5, 0xd6, 0xd7, 0xd8, 0xd9, 0xda,
    0xe2, 0xe3, 0xe4, 0xe5, 0xe6, 0xe7, 0xe8, 0xe9,
    0xea, 0xf2, 0xf3, 0xf4, 0xf5, 0xf6, 0xf7, 0xf8,
    0xf9, 0xfa)

  /** Zigzag order: index i of the scan → (row, col) raster offset. */
  private val Zigzag: Array[Int] = {
    val order = Array.ofDim[Int](64)
    var i = 0
    for (s <- 0 until 15) {
      val range = if (s % 2 == 0) (s to 0 by -1) else (0 to s)
      for (r <- range if r < 8 && (s - r) < 8) {
        order(i) = r * 8 + (s - r)
        i += 1
      }
    }
    order
  }

  /** Canonical huffman: (code, length) per symbol, from BITS/HUFFVAL. */
  private def canonicalCodes(bits: Array[Int], vals: Array[Int])
      : Map[Int, (Int, Int)] = {
    var code = 0
    var k = 0
    val out = collection.mutable.Map.empty[Int, (Int, Int)]
    for (len <- 1 to 16) {
      var n = 0
      while (n < bits(len - 1)) {
        out(vals(k)) = (code, len)
        code += 1; k += 1; n += 1
      }
      code <<= 1
    }
    out.toMap
  }

  private lazy val DcEnc = canonicalCodes(DcBits, DcVals)
  private lazy val AcEnc = canonicalCodes(AcBits, AcVals)

  private final class BitWriter {
    private val out = new java.io.ByteArrayOutputStream()
    private var acc = 0
    private var nbits = 0
    def put(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        acc = (acc << 1) | ((code >>> i) & 1)
        nbits += 1
        if (nbits == 8) {
          out.write(acc)
          if (acc == 0xff) out.write(0x00) // byte stuffing
          acc = 0; nbits = 0
        }
        i -= 1
      }
    }
    /** Byte-align by padding with 1s (spec rule before any marker). */
    def alignOnes(): Unit = if (nbits > 0) {
      acc = (acc << (8 - nbits)) | ((1 << (8 - nbits)) - 1)
      out.write(acc)
      if (acc == 0xff) out.write(0x00)
      acc = 0; nbits = 0
    }
    /** A raw (unstuffed) marker inside the entropy stream — RSTn. */
    def rawMarker(m: Int): Unit = { out.write(0xff); out.write(m) }
    def finish(): Array[Byte] = { alignOnes(); out.toByteArray }
  }

  private def be2(v: Int): Array[Byte] =
    Array(((v >> 8) & 0xff).toByte, (v & 0xff).toByte)

  private def segment(marker: Int, payload: Array[Byte]): Array[Byte] =
    Array(0xff.toByte, marker.toByte) ++ be2(payload.length + 2) ++ payload

  /** The DC quantizer that makes constant blocks exact (scaladoc above);
    * AC entries are irrelevant for DC-only spectra but kept = 8 so the
    * table is honest for any input. */
  val QuantAll8: Array[Int] = Array.fill(64)(8)

  /** A complete, valid baseline grayscale JFIF whose 8×8 blocks are the
    * constants `blockVal(bx, by)` (0–255) — padded edge blocks inherit
    * their block's constant, so every MCU is genuinely constant and the
    * lossy pipeline round-trips bit-exactly (see object scaladoc). Real
    * entropy coding throughout: huffman DC differences, AC EOBs, byte
    * stuffing. */
  def encodeGrayBlocks(width: Int, height: Int,
      blockVal: (Int, Int) => Int, restartInterval: Int = 0): Array[Byte] = {
    require(width > 0 && height > 0, s"encodeGrayBlocks: bad dims ${width}x$height")
    require(restartInterval >= 0 && restartInterval <= 0xffff,
      s"encodeGrayBlocks: bad restart interval $restartInterval")
    val bw = (width + 7) / 8
    val bh = (height + 7) / 8
    val writer = new BitWriter
    var prevDc = 0
    var by = 0
    while (by < bh) {
      var bx = 0
      while (bx < bw) {
        val mcu = by * bw + bx
        if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
          // RSTn: byte-align, emit the cycling restart marker, reset the
          // DC predictor — exactly what the decoder's restart path undoes
          writer.alignOnes()
          writer.rawMarker(0xd0 + ((mcu / restartInterval - 1) % 8))
          prevDc = 0
        }
        val c = blockVal(bx, by)
        require(c >= 0 && c <= 255, s"encodeGrayBlocks: block value $c")
        val dc = c - 128 // quantized DC with q=8 (see scaladoc)
        val diff = dc - prevDc
        prevDc = dc
        val s = if (diff == 0) 0 else 32 - Integer.numberOfLeadingZeros(math.abs(diff))
        val (code, len) = DcEnc(s)
        writer.put(code, len)
        if (s > 0) {
          val bitsVal = if (diff >= 0) diff else diff + (1 << s) - 1
          writer.put(bitsVal, s)
        }
        val (eob, eobLen) = AcEnc(0x00)
        writer.put(eob, eobLen)
        bx += 1
      }
      by += 1
    }
    val dqt = Array(0x00.toByte) ++ Zigzag.indices
      .map(i => QuantAll8(i).toByte) // all-8s: zigzag order irrelevant
    val sof = Array[Byte](8) ++ be2(height) ++ be2(width) ++
      Array[Byte](1, 1, 0x11, 0)
    def dht(cls: Int, bits: Array[Int], vals: Array[Int]): Array[Byte] =
      Array((cls << 4).toByte) ++ bits.slice(0, 16).map(_.toByte) ++
        vals.map(_.toByte)
    val sos = Array[Byte](1, 1, 0x00, 0, 63, 0)
    val app0 = "JFIF".getBytes("US-ASCII") ++
      Array[Byte](0, 1, 1, 0, 0, 1, 0, 1, 0, 0)
    val dri =
      if (restartInterval > 0)
        segment(0xdd, be2(restartInterval))
      else Array.emptyByteArray
    Array(0xff.toByte, 0xd8.toByte) ++ // SOI
      segment(0xe0, app0) ++
      segment(0xdb, dqt) ++
      segment(0xc0, sof) ++
      segment(0xc4, dht(0, DcBits, DcVals)) ++
      segment(0xc4, dht(1, AcBits, AcVals)) ++
      dri ++
      segment(0xda, sos) ++
      writer.finish() ++
      Array(0xff.toByte, 0xd9.toByte) // EOI
  }

  private lazy val DcChromaEnc = canonicalCodes(DcChromaBits, DcChromaVals)

  /** A complete, valid baseline COLOR JFIF (3-component YCbCr, SOF0,
    * interleaved single scan) whose component blocks are constants —
    * the color extension of [[encodeGrayBlocks]]'s exactness story.
    * `yVal(bx, by)` gives the luma constant per 8×8 LUMA block (on the
    * MCU-padded block grid); `cbVal`/`crVal` give the chroma constants
    * per CHROMA block. Sampling:
    *   - `sampling = 0x11`: 4:4:4 — every component one block per MCU,
    *     chroma block grid == luma block grid;
    *   - `sampling = 0x22`: 4:2:0 — MCUs are 16×16 pixels, four luma
    *     blocks + one Cb + one Cr per MCU; the chroma block grid is the
    *     MCU grid.
    * Constant blocks make every spectrum DC-only with the quantizer
    * pinned to 8, so decode is bit-exact (object scaladoc) — and with
    * chroma constant per chroma block, ANY spec-legal upsampling
    * filter reproduces the constant, so even the subsampled pipeline
    * stays exact. Standard luma tables encode Y (DHT class 0/1 id 0),
    * standard chroma tables encode Cb/Cr (id 1) — the table layout
    * every real crawl JPEG uses. */
  def encodeColorBlocks(width: Int, height: Int,
      yVal: (Int, Int) => Int, cbVal: (Int, Int) => Int,
      crVal: (Int, Int) => Int, sampling: Int = 0x22,
      restartInterval: Int = 0): Array[Byte] = {
    require(width > 0 && height > 0,
      s"encodeColorBlocks: bad dims ${width}x$height")
    require(sampling == 0x11 || sampling == 0x22,
      s"encodeColorBlocks: sampling must be 0x11 (4:4:4) or 0x22 (4:2:0)")
    require(restartInterval >= 0 && restartInterval <= 0xffff,
      s"encodeColorBlocks: bad restart interval $restartInterval")
    val hs = sampling >> 4
    val vs = sampling & 0x0f
    val mcusX = (width + 8 * hs - 1) / (8 * hs)
    val mcusY = (height + 8 * vs - 1) / (8 * vs)
    val writer = new BitWriter
    var prevY = 0; var prevCb = 0; var prevCr = 0
    val (eobY, eobYLen) = AcEnc(0x00)
    val chromaAcEnc = canonicalCodes(AcChromaBits, AcChromaVals)
    val (eobC, eobCLen) = chromaAcEnc(0x00)
    def putDc(diff: Int, enc: Map[Int, (Int, Int)]): Unit = {
      val s =
        if (diff == 0) 0 else 32 - Integer.numberOfLeadingZeros(math.abs(diff))
      val (code, len) = enc(s)
      writer.put(code, len)
      if (s > 0) {
        val bitsVal = if (diff >= 0) diff else diff + (1 << s) - 1
        writer.put(bitsVal, s)
      }
    }
    var mcu = 0
    val totalMcus = mcusX * mcusY
    while (mcu < totalMcus) {
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        writer.alignOnes()
        writer.rawMarker(0xd0 + ((mcu / restartInterval - 1) % 8))
        prevY = 0; prevCb = 0; prevCr = 0
      }
      val mx = mcu % mcusX
      val my = mcu / mcusX
      // luma blocks of the MCU, raster order (spec interleave)
      var j = 0
      while (j < vs) {
        var i = 0
        while (i < hs) {
          val c = yVal(mx * hs + i, my * vs + j)
          require(c >= 0 && c <= 255, s"encodeColorBlocks: Y value $c")
          val dc = c - 128
          putDc(dc - prevY, DcEnc); prevY = dc
          writer.put(eobY, eobYLen)
          i += 1
        }
        j += 1
      }
      val cb = cbVal(mx, my)
      require(cb >= 0 && cb <= 255, s"encodeColorBlocks: Cb value $cb")
      putDc((cb - 128) - prevCb, DcChromaEnc); prevCb = cb - 128
      writer.put(eobC, eobCLen)
      val cr = crVal(mx, my)
      require(cr >= 0 && cr <= 255, s"encodeColorBlocks: Cr value $cr")
      putDc((cr - 128) - prevCr, DcChromaEnc); prevCr = cr - 128
      writer.put(eobC, eobCLen)
      mcu += 1
    }
    val dqt0 = Array(0x00.toByte) ++ Zigzag.indices.map(_ => 8.toByte)
    val dqt1 = Array(0x01.toByte) ++ Zigzag.indices.map(_ => 8.toByte)
    val sof = Array[Byte](8) ++ be2(height) ++ be2(width) ++ Array[Byte](3,
      1, sampling.toByte, 0, // Y: declared sampling, quant table 0
      2, 0x11, 1, // Cb: 1x1, quant table 1
      3, 0x11, 1) // Cr: 1x1, quant table 1
    def dht(cls: Int, id: Int, bits: Array[Int], vals: Array[Int]): Array[Byte] =
      Array(((cls << 4) | id).toByte) ++ bits.slice(0, 16).map(_.toByte) ++
        vals.map(_.toByte)
    val sos = Array[Byte](3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0)
    val app0 = "JFIF".getBytes("US-ASCII") ++
      Array[Byte](0, 1, 1, 0, 0, 1, 0, 1, 0, 0)
    val dri =
      if (restartInterval > 0) segment(0xdd, be2(restartInterval))
      else Array.emptyByteArray
    Array(0xff.toByte, 0xd8.toByte) ++
      segment(0xe0, app0) ++
      segment(0xdb, dqt0) ++ segment(0xdb, dqt1) ++
      segment(0xc0, sof) ++
      segment(0xc4, dht(0, 0, DcBits, DcVals)) ++
      segment(0xc4, dht(1, 0, AcBits, AcVals)) ++
      segment(0xc4, dht(0, 1, DcChromaBits, DcChromaVals)) ++
      segment(0xc4, dht(1, 1, AcChromaBits, AcChromaVals)) ++
      dri ++
      segment(0xda, sos) ++
      writer.finish() ++
      Array(0xff.toByte, 0xd9.toByte)
  }

  // ---------------------------------------------------------------- decode

  private final class HuffTable(bits: Array[Int], vals: Array[Int]) {
    // mincode/maxcode/valptr per length — the spec's canonical decode
    val minCode = new Array[Int](17)
    val maxCode = Array.fill[Int](17)(-1)
    val valPtr = new Array[Int](17)
    locally {
      var code = 0
      var k = 0
      for (len <- 1 to 16) {
        if (bits(len - 1) > 0) {
          valPtr(len) = k
          minCode(len) = code
          code += bits(len - 1); k += bits(len - 1)
          maxCode(len) = code - 1
        }
        code <<= 1
      }
    }
    def value(len: Int, code: Int): Int =
      vals(valPtr(len) + code - minCode(len))
  }

  private final class BitReader(b: Array[Byte], var pos: Int) {
    private var acc = 0
    private var nbits = 0
    var hitMarker = false
    /** Next bit, or -1 on end/marker. Handles FF00 unstuffing; a real
      * marker (FFxx, xx≠00 and not a fill FF) stops the stream. */
    def bit(): Int = {
      if (nbits == 0) {
        if (pos >= b.length) return -1
        var v = b(pos) & 0xff
        pos += 1
        if (v == 0xff) {
          if (pos >= b.length) { hitMarker = true; return -1 }
          val next = b(pos) & 0xff
          if (next == 0x00) pos += 1 // stuffed data byte
          else { pos -= 1; hitMarker = true; return -1 }
          v = 0xff
        }
        acc = v; nbits = 8
      }
      nbits -= 1
      (acc >>> nbits) & 1
    }
    def bits(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) {
        val x = bit()
        if (x < 0) return -1
        v = (v << 1) | x
        i += 1
      }
      v
    }
    def align(): Unit = nbits = 0
  }

  private def decodeHuff(r: BitReader, t: HuffTable): Int = {
    var code = r.bit()
    if (code < 0) return -1
    var len = 1
    while (len <= 16) {
      if (t.maxCode(len) >= 0 && code <= t.maxCode(len))
        return t.value(len, code)
      val b = r.bit()
      if (b < 0) return -1
      code = (code << 1) | b
      len += 1
    }
    -1
  }

  /** EXTEND (spec F.2.2.1): map s low bits to the signed value. */
  private def extend(v: Int, s: Int): Int =
    if (s == 0) 0 else if (v < (1 << (s - 1))) v - (1 << s) + 1 else v

  /** Naive double-precision 2-D IDCT with one final rint per sample —
    * deterministic (fixed IEEE ops, precomputed cosine table shared by
    * every call) and exact on DC-only spectra. O(64²) per block is the
    * correctness-first choice, same posture as the group-based parquet
    * reader; an AAN fast path is a drop-in swap. */
  private lazy val CosTab: Array[Double] = {
    val t = new Array[Double](64)
    for (x <- 0 until 8; u <- 0 until 8)
      t(x * 8 + u) = math.cos((2 * x + 1) * u * math.Pi / 16.0)
    t
  }

  private def idctBlock(coef: Array[Int], out: Array[Int]): Unit = {
    val c = new Array[Double](8)
    c(0) = 1.0 / math.sqrt(2.0)
    var i = 1
    while (i < 8) { c(i) = 1.0; i += 1 }
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        var sum = 0.0
        var u = 0
        while (u < 8) {
          var v = 0
          while (v < 8) {
            val s = coef(v * 8 + u)
            if (s != 0)
              sum += c(u) * c(v) * s * CosTab(x * 8 + u) * CosTab(y * 8 + v)
            v += 1
          }
          u += 1
        }
        val px = math.rint(sum / 4.0).toInt + 128
        out(y * 8 + x) = if (px < 0) 0 else if (px > 255) 255 else px
        x += 1
      }
      y += 1
    }
  }

  /** Channel sums of a decoded grayscale baseline JPEG — the feature
    * row the catalog query aggregates ([[Png.PixelStats]]' sibling;
    * sumR=sumG=sumB=the gray sum is deliberately NOT emitted — one
    * channel, one sum). */
  final case class GrayStats(width: Int, height: Int, nPx: Long, sumG: Long)

  def pixelStats(b: Array[Byte]): Option[GrayStats] = decodeGray(b).map {
    case (w, h, px) =>
      var s = 0L
      var i = 0
      while (i < px.length) { s += px(i) & 0xff; i += 1 }
      GrayStats(w, h, w.toLong * h, s)
  }

  /** REAL baseline decode (grayscale SOF0 only): marker walk, DQT/DHT
    * table collection, entropy-coded segment huffman decode with DC
    * prediction + restart handling, dequantization, inverse zigzag,
    * IDCT, crop to (w, h). None for anything out of scope or malformed. */
  def decodeGray(b: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
    if (b == null || b.length < 4 ||
        (b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8) return None
    var pos = 2
    val quant = collection.mutable.Map.empty[Int, Array[Int]]
    val dcTabs = collection.mutable.Map.empty[Int, HuffTable]
    val acTabs = collection.mutable.Map.empty[Int, HuffTable]
    var w = -1; var h = -1
    var compQuant = -1; var compDc = -1; var compAc = -1
    var restartInterval = 0
    var scanStart = -1
    while (scanStart < 0) {
      if (pos + 4 > b.length) return None
      if ((b(pos) & 0xff) != 0xff) return None
      val marker = b(pos + 1) & 0xff
      if (marker == 0xd8 || (marker >= 0xd0 && marker <= 0xd7)) {
        pos += 2 // parameterless
      } else {
        val len = ((b(pos + 2) & 0xff) << 8) | (b(pos + 3) & 0xff)
        if (len < 2 || pos + 2 + len > b.length) return None
        val seg = pos + 4
        val segLen = len - 2
        marker match {
          case 0xdb => // DQT — possibly several tables per segment
            var p = seg
            while (p < seg + segLen) {
              val pq = (b(p) & 0xff) >> 4
              val tq = b(p) & 0x0f
              if (pq != 0) return None // 16-bit tables out of scope
              if (p + 65 > seg + segLen) return None
              val t = new Array[Int](64)
              var i = 0
              while (i < 64) { t(Zigzag(i)) = b(p + 1 + i) & 0xff; i += 1 }
              quant(tq) = t
              p += 65
            }
          case 0xc4 => // DHT — possibly several tables per segment
            var p = seg
            while (p < seg + segLen) {
              val tc = (b(p) & 0xff) >> 4
              val th = b(p) & 0x0f
              if (p + 17 > seg + segLen) return None
              val bits = (0 until 16).map(i => b(p + 1 + i) & 0xff).toArray
              val n = bits.sum
              if (p + 17 + n > seg + segLen) return None
              val vals = (0 until n).map(i => b(p + 17 + i) & 0xff).toArray
              val table = new HuffTable(bits, vals)
              if (tc == 0) dcTabs(th) = table
              else if (tc == 1) acTabs(th) = table
              else return None
              p += 17 + n
            }
          case 0xc0 => // SOF0 baseline (1-component payload is 9 bytes)
            if (segLen < 9) return None
            if ((b(seg) & 0xff) != 8) return None
            h = ((b(seg + 1) & 0xff) << 8) | (b(seg + 2) & 0xff)
            w = ((b(seg + 3) & 0xff) << 8) | (b(seg + 4) & 0xff)
            val ncomp = b(seg + 5) & 0xff
            if (ncomp != 1) return None // grayscale scope (scaladoc)
            val sampling = b(seg + 7) & 0xff
            if (sampling != 0x11) return None
            compQuant = b(seg + 8) & 0xff
          case 0xc2 => // SOF2: the progressive scan machinery owns it
            return decodeProgressive(b, 1).map { case (w0, h0, planes, pw, _, _) =>
              cropPlane(w0, h0, planes(0), pw(0))
            }
          case m if m >= 0xc1 && m <= 0xcf && m != 0xc4 && m != 0xc8 =>
            return None // arithmetic/hierarchical/other SOF: out of scope
          case 0xdd => // DRI — payload is exactly 2 bytes (Lr = 4)
            if (segLen < 2) return None
            restartInterval = ((b(seg) & 0xff) << 8) | (b(seg + 1) & 0xff)
          case 0xda => // SOS
            if (segLen < 6) return None
            if ((b(seg) & 0xff) != 1) return None
            compDc = (b(seg + 2) & 0xff) >> 4
            compAc = b(seg + 2) & 0x0f
            scanStart = pos + 2 + len
          case _ => () // APPn/COM/etc skipped
        }
        if (scanStart < 0) pos += 2 + len
      }
    }
    if (w <= 0 || h <= 0) return None
    // dims are attacker-controlled 16-bit values whose product overflows
    // Int (65535² ≈ 4.3e9) — refuse before the allocation wraps negative
    if (w.toLong * h > Int.MaxValue - 8) return None
    val q = quant.getOrElse(compQuant, return None)
    val dcT = dcTabs.getOrElse(compDc, return None)
    val acT = acTabs.getOrElse(compAc, return None)
    val bw = (w + 7) / 8
    val bh = (h + 7) / 8
    val px = new Array[Byte](w * h)
    val coef = new Array[Int](64)
    val block = new Array[Int](64)
    val r = new BitReader(b, scanStart)
    var prevDc = 0
    var mcu = 0
    val totalMcus = bw * bh
    while (mcu < totalMcus) {
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        // RSTn: align, consume the marker, reset the DC predictor
        r.align()
        if (r.pos + 1 < b.length && (b(r.pos) & 0xff) == 0xff &&
            (b(r.pos + 1) & 0xff) >= 0xd0 && (b(r.pos + 1) & 0xff) <= 0xd7) {
          r.pos += 2
          r.hitMarker = false
        } else return None
        prevDc = 0
      }
      java.util.Arrays.fill(coef, 0)
      val s = decodeHuff(r, dcT)
      if (s < 0 || s > 11) return None
      val dcBits = if (s == 0) 0 else r.bits(s)
      if (dcBits < 0) return None
      prevDc += extend(dcBits, s)
      coef(0) = prevDc * q(0)
      var k = 1
      var eob = false
      while (k < 64 && !eob) {
        val rs = decodeHuff(r, acT)
        if (rs < 0) return None
        val run = rs >> 4
        val size = rs & 0x0f
        if (size == 0) {
          if (run == 15) {
            k += 16 // ZRL
            // a ZRL that pushes k past the block is structurally invalid
            // (valid encoders never emit it); refuse rather than decode
            // a misaligned stream into garbage pixels
            if (k > 63) return None
          } else eob = true // EOB
        } else {
          k += run
          if (k > 63) return None
          val vBits = r.bits(size)
          if (vBits < 0) return None
          coef(Zigzag(k)) = extend(vBits, size) * q(Zigzag(k))
          k += 1
        }
      }
      idctBlock(coef, block)
      val bx = mcu % bw
      val by = mcu / bw
      var y = 0
      while (y < 8) {
        val py = by * 8 + y
        if (py < h) {
          var x = 0
          while (x < 8) {
            val pxx = bx * 8 + x
            if (pxx < w) px(py * w + pxx) = block(y * 8 + x).toByte
            x += 1
          }
        }
        y += 1
      }
      mcu += 1
    }
    Some((w, h, px))
  }

  /** Channel sums of a decoded COLOR baseline JPEG. */
  final case class ColorStats(width: Int, height: Int, nPx: Long,
      sumR: Long, sumG: Long, sumB: Long)

  def pixelStatsColor(b: Array[Byte]): Option[ColorStats] =
    decodeRgb(b).map { case (w, h, rgb) =>
      var sr = 0L; var sg = 0L; var sb = 0L
      var i = 0
      while (i < rgb.length) {
        sr += rgb(i) & 0xff; sg += rgb(i + 1) & 0xff; sb += rgb(i + 2) & 0xff
        i += 3
      }
      ColorStats(w, h, w.toLong * h, sr, sg, sb)
    }

  /** Integer YCbCr→RGB (BT.601 constants in 16.16 fixed point, the
    * libjpeg scaling) with round-half-toward-positive via +32768 then an
    * ARITHMETIC shift (= floor division by 65536, also for negatives) —
    * chosen precisely because SQL re-derives it exactly as
    * `floor((v + 32768) / 65536.0)`. This transform is NORMATIVE for
    * this decoder: JFIF doesn't pin the rounding, so the engine picks
    * one integer definition and the oracle mirrors it. */
  @inline private def fix16(v: Int): Int = (v + 32768) >> 16
  @inline private def clamp255(v: Int): Int =
    if (v < 0) 0 else if (v > 255) 255 else v

  def ycbcrToRgb(y: Int, cb: Int, cr: Int): (Int, Int, Int) = (
    clamp255(y + fix16(91881 * (cr - 128))),
    clamp255(y - fix16(22554 * (cb - 128) + 46802 * (cr - 128))),
    clamp255(y + fix16(116130 * (cb - 128))))

  /** REAL baseline COLOR decode: 3-component YCbCr SOF0, luma sampling
    * factors in {1,2}×{1,2}, chroma 1×1 (covers 4:4:4, 4:2:2, 4:2:0,
    * 4:4:0 — the shapes real encoders emit), one interleaved scan,
    * 8-bit quant tables, restart markers honored. Chroma upsampling is
    * sample replication (each chroma sample covers its h×v luma
    * neighborhood — the spec-legal box filter, deterministic integer
    * indexing `(x / hmax, y / vmax)`). Anything else — progressive,
    * arithmetic, 16-bit tables, >2 sampling, subsampled luma,
    * non-interleaved scans — returns None, never a guess.
    * Output is interleaved RGB (3 bytes/pixel, [[ycbcrToRgb]]). */
  def decodeRgb(b: Array[Byte]): Option[(Int, Int, Array[Byte])] = {
    if (b == null || b.length < 4 ||
        (b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8) return None
    var pos = 2
    val quant = collection.mutable.Map.empty[Int, Array[Int]]
    val dcTabs = collection.mutable.Map.empty[Int, HuffTable]
    val acTabs = collection.mutable.Map.empty[Int, HuffTable]
    var w = -1; var h = -1
    // per component (SOF order): id, h, v, quant id; then SOS table ids
    var compId: Array[Int] = null
    var compH: Array[Int] = null
    var compV: Array[Int] = null
    var compQ: Array[Int] = null
    var compDc: Array[Int] = null
    var compAc: Array[Int] = null
    var restartInterval = 0
    var scanStart = -1
    while (scanStart < 0) {
      if (pos + 4 > b.length) return None
      if ((b(pos) & 0xff) != 0xff) return None
      val marker = b(pos + 1) & 0xff
      if (marker == 0xd8 || (marker >= 0xd0 && marker <= 0xd7)) {
        pos += 2
      } else {
        val len = ((b(pos + 2) & 0xff) << 8) | (b(pos + 3) & 0xff)
        if (len < 2 || pos + 2 + len > b.length) return None
        val seg = pos + 4
        val segLen = len - 2
        marker match {
          case 0xdb =>
            var p = seg
            while (p < seg + segLen) {
              val pq = (b(p) & 0xff) >> 4
              val tq = b(p) & 0x0f
              if (pq != 0) return None // 16-bit tables out of scope
              if (p + 65 > seg + segLen) return None
              val t = new Array[Int](64)
              var i = 0
              while (i < 64) { t(Zigzag(i)) = b(p + 1 + i) & 0xff; i += 1 }
              quant(tq) = t
              p += 65
            }
          case 0xc4 =>
            var p = seg
            while (p < seg + segLen) {
              val tc = (b(p) & 0xff) >> 4
              val th = b(p) & 0x0f
              if (p + 17 > seg + segLen) return None
              val bits = (0 until 16).map(i => b(p + 1 + i) & 0xff).toArray
              val n = bits.sum
              if (p + 17 + n > seg + segLen) return None
              val vals = (0 until n).map(i => b(p + 17 + i) & 0xff).toArray
              val table = new HuffTable(bits, vals)
              if (tc == 0) dcTabs(th) = table
              else if (tc == 1) acTabs(th) = table
              else return None
              p += 17 + n
            }
          case 0xc0 => // SOF0, 3 components = 15-byte payload
            if (segLen < 6) return None
            if ((b(seg) & 0xff) != 8) return None
            h = ((b(seg + 1) & 0xff) << 8) | (b(seg + 2) & 0xff)
            w = ((b(seg + 3) & 0xff) << 8) | (b(seg + 4) & 0xff)
            val ncomp = b(seg + 5) & 0xff
            if (ncomp != 3) return None // color scope ([[decodeGray]] owns 1)
            if (segLen < 6 + 3 * 3) return None
            compId = new Array[Int](3); compH = new Array[Int](3)
            compV = new Array[Int](3); compQ = new Array[Int](3)
            var c = 0
            while (c < 3) {
              compId(c) = b(seg + 6 + 3 * c) & 0xff
              val hv = b(seg + 7 + 3 * c) & 0xff
              compH(c) = hv >> 4; compV(c) = hv & 0x0f
              compQ(c) = b(seg + 8 + 3 * c) & 0xff
              c += 1
            }
            // scope: chroma unsubsampled relative to itself (1x1), luma
            // factors 1..2 — the shapes real baseline encoders produce
            if (compH(1) != 1 || compV(1) != 1 ||
                compH(2) != 1 || compV(2) != 1) return None
            if (compH(0) < 1 || compH(0) > 2 ||
                compV(0) < 1 || compV(0) > 2) return None
          case 0xc2 => // SOF2: the progressive scan machinery owns it
            return decodeProgressive(b, 3).map {
              case (w0, h0, planes, pw, ch, cv) =>
                assembleRgb(w0, h0, planes, pw, ch(0), cv(0))
            }
          case m if m >= 0xc1 && m <= 0xcf && m != 0xc4 && m != 0xc8 =>
            return None // arithmetic/hierarchical/other SOF: out of scope
          case 0xdd =>
            if (segLen < 2) return None
            restartInterval = ((b(seg) & 0xff) << 8) | (b(seg + 1) & 0xff)
          case 0xda =>
            if (compId == null) return None // SOS before SOF0
            if (segLen < 1 + 2 * 3 + 3) return None
            if ((b(seg) & 0xff) != 3) return None // interleaved 3-comp scan
            compDc = new Array[Int](3); compAc = new Array[Int](3)
            var c = 0
            while (c < 3) {
              val sid = b(seg + 1 + 2 * c) & 0xff
              // scan components must be the frame's, in frame order
              if (sid != compId(c)) return None
              compDc(c) = (b(seg + 2 + 2 * c) & 0xff) >> 4
              compAc(c) = b(seg + 2 + 2 * c) & 0x0f
              c += 1
            }
            scanStart = pos + 2 + len
          case _ => ()
        }
        if (scanStart < 0) pos += 2 + len
      }
    }
    if (w <= 0 || h <= 0 || compId == null) return None
    if (w.toLong * h > (Int.MaxValue - 8) / 3) return None
    val hmax = compH(0) // chroma is 1x1, so luma's factors ARE the max
    val vmax = compV(0)
    val mcusX = (w + 8 * hmax - 1) / (8 * hmax)
    val mcusY = (h + 8 * vmax - 1) / (8 * vmax)
    // per-component planes at their own (MCU-padded) resolution
    val planeW = new Array[Int](3)
    val planeH = new Array[Int](3)
    val planes = new Array[Array[Byte]](3)
    val q = new Array[Array[Int]](3)
    val dcT = new Array[HuffTable](3)
    val acT = new Array[HuffTable](3)
    var c = 0
    while (c < 3) {
      planeW(c) = mcusX * compH(c) * 8
      planeH(c) = mcusY * compV(c) * 8
      if (planeW(c).toLong * planeH(c) > Int.MaxValue - 8) return None
      planes(c) = new Array[Byte](planeW(c) * planeH(c))
      q(c) = quant.getOrElse(compQ(c), return None)
      dcT(c) = dcTabs.getOrElse(compDc(c), return None)
      acT(c) = acTabs.getOrElse(compAc(c), return None)
      c += 1
    }
    val coef = new Array[Int](64)
    val block = new Array[Int](64)
    val r = new BitReader(b, scanStart)
    val prevDc = new Array[Int](3)
    var mcu = 0
    val totalMcus = mcusX * mcusY

    // one entropy-coded 8x8 block of component c, placed at block
    // coords (bx, by) on that component's plane; false = malformed
    def decodeBlock(ci: Int, bx: Int, by: Int): Boolean = {
      java.util.Arrays.fill(coef, 0)
      val s = decodeHuff(r, dcT(ci))
      if (s < 0 || s > 11) return false
      val dcBits = if (s == 0) 0 else r.bits(s)
      if (dcBits < 0) return false
      prevDc(ci) += extend(dcBits, s)
      coef(0) = prevDc(ci) * q(ci)(0)
      var k = 1
      var eob = false
      while (k < 64 && !eob) {
        val rs = decodeHuff(r, acT(ci))
        if (rs < 0) return false
        val run = rs >> 4
        val size = rs & 0x0f
        if (size == 0) {
          if (run == 15) {
            k += 16
            if (k > 63) return false // ZRL overrun: structurally invalid
          } else eob = true
        } else {
          k += run
          if (k > 63) return false
          val vBits = r.bits(size)
          if (vBits < 0) return false
          coef(Zigzag(k)) = extend(vBits, size) * q(ci)(Zigzag(k))
          k += 1
        }
      }
      idctBlock(coef, block)
      val pw = planeW(ci)
      val plane = planes(ci)
      val x0 = bx * 8
      val y0 = by * 8
      var y = 0
      while (y < 8) {
        var x = 0
        val row = (y0 + y) * pw + x0
        while (x < 8) {
          plane(row + x) = block(y * 8 + x).toByte
          x += 1
        }
        y += 1
      }
      true
    }

    while (mcu < totalMcus) {
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        r.align()
        if (r.pos + 1 < b.length && (b(r.pos) & 0xff) == 0xff &&
            (b(r.pos + 1) & 0xff) >= 0xd0 && (b(r.pos + 1) & 0xff) <= 0xd7) {
          r.pos += 2
          r.hitMarker = false
        } else return None
        prevDc(0) = 0; prevDc(1) = 0; prevDc(2) = 0
      }
      val mx = mcu % mcusX
      val my = mcu / mcusX
      var ci = 0
      while (ci < 3) {
        var j = 0
        while (j < compV(ci)) {
          var i = 0
          while (i < compH(ci)) {
            if (!decodeBlock(ci, mx * compH(ci) + i, my * compV(ci) + j))
              return None
            i += 1
          }
          j += 1
        }
        ci += 1
      }
      mcu += 1
    }
    // upsample (sample replication) + color transform, cropped to (w, h)
    val rgb = new Array[Byte](3 * w * h)
    val yPlane = planes(0); val cbPlane = planes(1); val crPlane = planes(2)
    val ypw = planeW(0); val cpw = planeW(1)
    var py = 0
    while (py < h) {
      val cRow = (py / vmax) * cpw
      val yRow = py * ypw
      var px = 0
      while (px < w) {
        val yv = yPlane(yRow + px) & 0xff
        val cb = (cbPlane(cRow + px / hmax) & 0xff) - 128
        val cr = (crPlane(cRow + px / hmax) & 0xff) - 128
        // [[ycbcrToRgb]] inlined: no per-pixel tuple in the hot loop
        val o = 3 * (py * w + px)
        rgb(o) = clamp255(yv + fix16(91881 * cr)).toByte
        rgb(o + 1) = clamp255(yv - fix16(22554 * cb + 46802 * cr)).toByte
        rgb(o + 2) = clamp255(yv + fix16(116130 * cb)).toByte
        px += 1
      }
      py += 1
    }
    Some((w, h, rgb))
  }

  // ====================================================================
  // Progressive DCT (SOF2) — ITU T.81 Annex G.
  //
  // A progressive frame spreads each block's 64 coefficients over many
  // scans: DC and AC bands arrive separately (spectral selection), and
  // each band can arrive one bit-plane at a time (successive
  // approximation, Ah/Al). Decoding therefore holds EVERY block's
  // coefficient vector across scans and runs dequantize + IDCT once,
  // after the last scan. The entropy machinery adds two shapes baseline
  // lacks: EOB RUNS (one code ends a run of up to 32767 blocks in AC
  // first/refinement scans) and CORRECTION BITS (refinement scans
  // append one raw bit to every already-nonzero coefficient they pass).
  // ====================================================================

  /** Crop a decoded component plane to image dims (the progressive
    * grayscale tail). */
  private def cropPlane(w: Int, h: Int, plane: Array[Byte],
      pw: Int): (Int, Int, Array[Byte]) = {
    val out = new Array[Byte](w * h)
    var y = 0
    while (y < h) {
      System.arraycopy(plane, y * pw, out, y * w, w)
      y += 1
    }
    (w, h, out)
  }

  /** Upsample (sample replication) + YCbCr→RGB, cropped — the same
    * assembly loop as [[decodeRgb]]'s tail, for progressive planes. */
  private def assembleRgb(w: Int, h: Int, planes: Array[Array[Byte]],
      planeW: Array[Int], hmax: Int, vmax: Int): (Int, Int, Array[Byte]) = {
    val rgb = new Array[Byte](3 * w * h)
    val yPlane = planes(0); val cbPlane = planes(1); val crPlane = planes(2)
    val ypw = planeW(0); val cpw = planeW(1)
    var py = 0
    while (py < h) {
      val cRow = (py / vmax) * cpw
      val yRow = py * ypw
      var px = 0
      while (px < w) {
        val yv = yPlane(yRow + px) & 0xff
        val cb = (cbPlane(cRow + px / hmax) & 0xff) - 128
        val cr = (crPlane(cRow + px / hmax) & 0xff) - 128
        val o = 3 * (py * w + px)
        rgb(o) = clamp255(yv + fix16(91881 * cr)).toByte
        rgb(o + 1) = clamp255(yv - fix16(22554 * cb + 46802 * cr)).toByte
        rgb(o + 2) = clamp255(yv + fix16(116130 * cb)).toByte
        px += 1
      }
      py += 1
    }
    (w, h, rgb)
  }

  /** Full progressive decode to component planes.
    *
    * @param wantComps 1 (grayscale) or 3 (YCbCr) — the caller's frame
    *        shape; any other component count refuses
    * @return (w, h, planes, planeW, compH, compV) with planes at their
    *         MCU-padded per-component resolution */
  private def decodeProgressive(b: Array[Byte], wantComps: Int)
      : Option[(Int, Int, Array[Array[Byte]], Array[Int], Array[Int],
          Array[Int])] = {
    if (b == null || b.length < 4 ||
        (b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8) return None
    var pos = 2
    val quant = collection.mutable.Map.empty[Int, Array[Int]]
    val dcTabs = collection.mutable.Map.empty[Int, HuffTable]
    val acTabs = collection.mutable.Map.empty[Int, HuffTable]
    var w = -1; var h = -1; var ncomp = -1
    var compId: Array[Int] = null
    var compH: Array[Int] = null
    var compV: Array[Int] = null
    var compQ: Array[Int] = null
    var restartInterval = 0
    var hmax = 1; var vmax = 1
    var mcusX = 0; var mcusY = 0
    // per component: MCU-padded block grid (interleaved addressing) and
    // the non-interleaved block grid (ceil of the component's own
    // sample dims — T.81 A.2.2: non-interleaved scans code ONLY these)
    var planeBw: Array[Int] = null
    var planeBh: Array[Int] = null
    var soloBw: Array[Int] = null
    var soloBh: Array[Int] = null
    // coefficient store: per component, blocks × 64 ints in ZIGZAG order
    var coefs: Array[Array[Int]] = null
    // a component with NO DC scan would render as plausible mid-gray —
    // refuse instead (a valid progression always starts with DC)
    var sawDc: Array[Boolean] = null
    var sawEoi = false

    while (!sawEoi) {
      if (pos + 2 > b.length) return None
      if ((b(pos) & 0xff) != 0xff) return None
      val marker = b(pos + 1) & 0xff
      if (marker == 0xff) {
        pos += 1 // fill byte (spec-legal 0xFF padding before a marker)
      } else if (marker == 0xd8 || (marker >= 0xd0 && marker <= 0xd7)) {
        pos += 2 // parameterless (stray RST between scans is malformed
                 // but harmless to skip; scan decode consumes its own)
      } else if (marker == 0xd9) {
        sawEoi = true
      } else {
        if (pos + 4 > b.length) return None
        val len = ((b(pos + 2) & 0xff) << 8) | (b(pos + 3) & 0xff)
        if (len < 2 || pos + 2 + len > b.length) return None
        val seg = pos + 4
        val segLen = len - 2
        var nextPos = pos + 2 + len
        marker match {
          case 0xdb =>
            var p = seg
            while (p < seg + segLen) {
              val pq = (b(p) & 0xff) >> 4
              val tq = b(p) & 0x0f
              if (pq != 0) return None // 16-bit tables out of scope
              if (p + 65 > seg + segLen) return None
              val t = new Array[Int](64)
              var i = 0
              while (i < 64) { t(Zigzag(i)) = b(p + 1 + i) & 0xff; i += 1 }
              quant(tq) = t
              p += 65
            }
          case 0xc4 =>
            var p = seg
            while (p < seg + segLen) {
              val tc = (b(p) & 0xff) >> 4
              val th = b(p) & 0x0f
              if (p + 17 > seg + segLen) return None
              val bits = (0 until 16).map(i => b(p + 1 + i) & 0xff).toArray
              val n = bits.sum
              if (p + 17 + n > seg + segLen) return None
              val vals = (0 until n).map(i => b(p + 17 + i) & 0xff).toArray
              val table = new HuffTable(bits, vals)
              if (tc == 0) dcTabs(th) = table
              else if (tc == 1) acTabs(th) = table
              else return None
              p += 17 + n
            }
          case 0xdd =>
            if (segLen < 2) return None
            restartInterval = ((b(seg) & 0xff) << 8) | (b(seg + 1) & 0xff)
          case 0xc2 => // SOF2
            if (ncomp >= 0) return None // one frame per image
            if (segLen < 6) return None
            if ((b(seg) & 0xff) != 8) return None
            h = ((b(seg + 1) & 0xff) << 8) | (b(seg + 2) & 0xff)
            w = ((b(seg + 3) & 0xff) << 8) | (b(seg + 4) & 0xff)
            ncomp = b(seg + 5) & 0xff
            if (ncomp != wantComps) return None
            if (segLen < 6 + 3 * ncomp) return None
            if (w <= 0 || h <= 0) return None
            if (w.toLong * h > (Int.MaxValue - 8) / 3) return None
            compId = new Array[Int](ncomp); compH = new Array[Int](ncomp)
            compV = new Array[Int](ncomp); compQ = new Array[Int](ncomp)
            var c = 0
            while (c < ncomp) {
              compId(c) = b(seg + 6 + 3 * c) & 0xff
              val hv = b(seg + 7 + 3 * c) & 0xff
              compH(c) = hv >> 4; compV(c) = hv & 0x0f
              compQ(c) = b(seg + 8 + 3 * c) & 0xff
              c += 1
            }
            // same sampling scope as the baseline decoders
            if (ncomp == 1) {
              if (compH(0) != 1 || compV(0) != 1) return None
            } else {
              if (compH(1) != 1 || compV(1) != 1 ||
                  compH(2) != 1 || compV(2) != 1) return None
              if (compH(0) < 1 || compH(0) > 2 ||
                  compV(0) < 1 || compV(0) > 2) return None
            }
            hmax = compH(0); vmax = compV(0)
            mcusX = (w + 8 * hmax - 1) / (8 * hmax)
            mcusY = (h + 8 * vmax - 1) / (8 * vmax)
            planeBw = new Array[Int](ncomp); planeBh = new Array[Int](ncomp)
            soloBw = new Array[Int](ncomp); soloBh = new Array[Int](ncomp)
            coefs = new Array[Array[Int]](ncomp)
            sawDc = new Array[Boolean](ncomp)
            c = 0
            while (c < ncomp) {
              planeBw(c) = mcusX * compH(c)
              planeBh(c) = mcusY * compV(c)
              val nBlocks = planeBw(c).toLong * planeBh(c)
              if (nBlocks * 64 > Int.MaxValue - 8) return None
              coefs(c) = new Array[Int](nBlocks.toInt * 64)
              // the component's own sample dims (ceil scaling), blocked
              val xc = (w * compH(c) + hmax - 1) / hmax
              val yc = (h * compV(c) + vmax - 1) / vmax
              soloBw(c) = (xc + 7) / 8
              soloBh(c) = (yc + 7) / 8
              c += 1
            }
          case m if (m >= 0xc0 && m <= 0xcf) && m != 0xc2 && m != 0xc4 &&
              m != 0xc8 =>
            return None // a non-progressive SOF inside this path
          case 0xda =>
            if (ncomp < 0) return None // SOS before SOF2
            if (segLen < 1) return None
            val ns = b(seg) & 0xff
            if (ns < 1 || ns > ncomp || segLen < 1 + 2 * ns + 3) return None
            // scan components: indices into the frame's component list
            val sci = new Array[Int](ns)
            val sDc = new Array[Int](ns)
            val sAc = new Array[Int](ns)
            var i = 0
            while (i < ns) {
              val sid = b(seg + 1 + 2 * i) & 0xff
              val ci = compId.indexOf(sid)
              if (ci < 0) return None
              sci(i) = ci
              sDc(i) = (b(seg + 2 + 2 * i) & 0xff) >> 4
              sAc(i) = b(seg + 2 + 2 * i) & 0x0f
              i += 1
            }
            val ss = b(seg + 1 + 2 * ns) & 0xff
            val se = b(seg + 2 + 2 * ns) & 0xff
            val ahal = b(seg + 3 + 2 * ns) & 0xff
            val ah = ahal >> 4
            val al = ahal & 0x0f
            // progression constraints (T.81 G.1.1.1): DC band is exactly
            // [0,0] and may be interleaved; AC bands are single-component
            // and never include DC; refinement improves exactly one bit
            val isDc = ss == 0
            if (isDc && se != 0) return None
            if (!isDc && (ns != 1 || ss > se || se > 63)) return None
            if (ah != 0 && ah != al + 1) return None
            if (al > 13) return None // coefficient magnitudes cap (G.1.2.2)
            if (isDc && ns != ncomp && ns != 1) return None // subset DC
              // interleaves are legal but rare; out of scope, loudly
            val r = new BitReader(b, pos + 2 + len)
            val ok =
              if (isDc && ah == 0)
                dcFirstScan(r, b, ns, sci, sDc, al, dcTabs, coefs,
                  planeBw, soloBw, soloBh, compH, compV, mcusX, mcusY,
                  restartInterval)
              else if (isDc)
                dcRefineScan(r, b, ns, sci, al, coefs, planeBw, soloBw,
                  soloBh, compH, compV, mcusX, mcusY, restartInterval)
              else if (ah == 0)
                acFirstScan(r, b, sci(0), sAc(0), ss, se, al, acTabs,
                  coefs, planeBw, soloBw, soloBh, restartInterval)
              else
                acRefineScan(r, b, sci(0), sAc(0), ss, se, al, acTabs,
                  coefs, planeBw, soloBw, soloBh, restartInterval)
            if (!ok) return None
            if (isDc && ah == 0) sci.foreach(ci => sawDc(ci) = true)
            r.align()
            nextPos = r.pos
          case _ => () // APPn/COM
        }
        pos = nextPos
      }
    }
    if (ncomp < 0) return None
    if (!sawDc.forall(identity)) return None // component without DC data
    // all scans in: dequantize + inverse zigzag + IDCT every block
    val planes = new Array[Array[Byte]](ncomp)
    val planeW = new Array[Int](ncomp)
    val nat = new Array[Int](64)
    val block = new Array[Int](64)
    var c = 0
    while (c < ncomp) {
      val q = quant.getOrElse(compQ(c), return None)
      planeW(c) = planeBw(c) * 8
      val planeH = planeBh(c) * 8
      if (planeW(c).toLong * planeH > Int.MaxValue - 8) return None
      val plane = new Array[Byte](planeW(c) * planeH)
      val cz = coefs(c)
      var bi = 0
      val nBlocks = planeBw(c) * planeBh(c)
      while (bi < nBlocks) {
        val base = bi * 64
        var i = 0
        while (i < 64) { nat(Zigzag(i)) = cz(base + i) * q(Zigzag(i)); i += 1 }
        idctBlock(nat, block)
        val bx = bi % planeBw(c)
        val by = bi / planeBw(c)
        val x0 = bx * 8; val y0 = by * 8
        var y = 0
        while (y < 8) {
          var x = 0
          val row = (y0 + y) * planeW(c) + x0
          while (x < 8) { plane(row + x) = block(y * 8 + x).toByte; x += 1 }
          y += 1
        }
        bi += 1
      }
      planes(c) = plane
      c += 1
    }
    Some((w, h, planes, planeW, compH, compV))
  }

  /** Consume an expected RSTn at a restart boundary; false = malformed. */
  private def expectRst(r: BitReader, b: Array[Byte]): Boolean = {
    r.align()
    if (r.pos + 1 < b.length && (b(r.pos) & 0xff) == 0xff &&
        (b(r.pos + 1) & 0xff) >= 0xd0 && (b(r.pos + 1) & 0xff) <= 0xd7) {
      r.pos += 2
      r.hitMarker = false
      true
    } else false
  }

  /** DC first scans (Ah = 0): huffman DC differences, values scaled into
    * the bit-plane via << Al. Interleaved (ns = frame components, MCU
    * order) or single-component (its own block grid). */
  private def dcFirstScan(r: BitReader, b: Array[Byte], ns: Int,
      sci: Array[Int], sDc: Array[Int], al: Int,
      dcTabs: collection.mutable.Map[Int, HuffTable],
      coefs: Array[Array[Int]], planeBw: Array[Int],
      soloBw: Array[Int], soloBh: Array[Int],
      compH: Array[Int], compV: Array[Int], mcusX: Int, mcusY: Int,
      restartInterval: Int): Boolean = {
    val pred = new Array[Int](ns)
    val tabs = new Array[HuffTable](ns)
    var i = 0
    while (i < ns) {
      tabs(i) = dcTabs.getOrElse(sDc(i), return false)
      i += 1
    }
    def one(si: Int, blockIdx: Int): Boolean = {
      val s = decodeHuff(r, tabs(si))
      if (s < 0 || s > 11) return false
      val dcBits = if (s == 0) 0 else r.bits(s)
      if (dcBits < 0) return false
      pred(si) += extend(dcBits, s)
      coefs(sci(si))(blockIdx * 64) = pred(si) << al
      true
    }
    if (ns == 1) {
      val ci = sci(0)
      val total = soloBw(ci) * soloBh(ci)
      var u = 0
      while (u < total) {
        if (restartInterval > 0 && u > 0 && u % restartInterval == 0) {
          if (!expectRst(r, b)) return false
          pred(0) = 0
        }
        val bx = u % soloBw(ci)
        val by = u / soloBw(ci)
        if (!one(0, by * planeBw(ci) + bx)) return false
        u += 1
      }
    } else {
      var mcu = 0
      val totalMcus = mcusX * mcusY
      while (mcu < totalMcus) {
        if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
          if (!expectRst(r, b)) return false
          java.util.Arrays.fill(pred, 0)
        }
        val mx = mcu % mcusX
        val my = mcu / mcusX
        var si = 0
        while (si < ns) {
          val ci = sci(si)
          var j = 0
          while (j < compV(ci)) {
            var ii = 0
            while (ii < compH(ci)) {
              val bIdx = (my * compV(ci) + j) * planeBw(ci) +
                mx * compH(ci) + ii
              if (!one(si, bIdx)) return false
              ii += 1
            }
            j += 1
          }
          si += 1
        }
        mcu += 1
      }
    }
    true
  }

  /** DC refinement scans (Ah = Al + 1): ONE raw bit per block — bit Al
    * of the (two's-complement) DC coefficient. No huffman tables. */
  private def dcRefineScan(r: BitReader, b: Array[Byte], ns: Int,
      sci: Array[Int], al: Int, coefs: Array[Array[Int]],
      planeBw: Array[Int], soloBw: Array[Int], soloBh: Array[Int],
      compH: Array[Int], compV: Array[Int], mcusX: Int, mcusY: Int,
      restartInterval: Int): Boolean = {
    def one(ci: Int, blockIdx: Int): Boolean = {
      val bit = r.bit()
      if (bit < 0) return false
      if (bit == 1) coefs(ci)(blockIdx * 64) |= (1 << al)
      true
    }
    if (ns == 1) {
      val ci = sci(0)
      val total = soloBw(ci) * soloBh(ci)
      var u = 0
      while (u < total) {
        if (restartInterval > 0 && u > 0 && u % restartInterval == 0) {
          if (!expectRst(r, b)) return false
        }
        val bx = u % soloBw(ci)
        val by = u / soloBw(ci)
        if (!one(ci, by * planeBw(ci) + bx)) return false
        u += 1
      }
    } else {
      var mcu = 0
      val totalMcus = mcusX * mcusY
      while (mcu < totalMcus) {
        if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
          if (!expectRst(r, b)) return false
        }
        val mx = mcu % mcusX
        val my = mcu / mcusX
        var si = 0
        while (si < ns) {
          val ci = sci(si)
          var j = 0
          while (j < compV(ci)) {
            var ii = 0
            while (ii < compH(ci)) {
              val bIdx = (my * compV(ci) + j) * planeBw(ci) +
                mx * compH(ci) + ii
              if (!one(ci, bIdx)) return false
              ii += 1
            }
            j += 1
          }
          si += 1
        }
        mcu += 1
      }
    }
    true
  }

  /** AC first scans (Ah = 0, single component): run/size coding within
    * the band [ss, se], EOB RUNS (EOBn: size 0, run < 15 → a run of
    * 2^run + extra blocks with no further nonzeros in this band), ZRL,
    * values scaled via << Al. */
  private def acFirstScan(r: BitReader, b: Array[Byte], ci: Int, acId: Int,
      ss: Int, se: Int, al: Int,
      acTabs: collection.mutable.Map[Int, HuffTable],
      coefs: Array[Array[Int]], planeBw: Array[Int],
      soloBw: Array[Int], soloBh: Array[Int],
      restartInterval: Int): Boolean = {
    val acT = acTabs.getOrElse(acId, return false)
    val cz = coefs(ci)
    var eobrun = 0
    val total = soloBw(ci) * soloBh(ci)
    var u = 0
    while (u < total) {
      if (restartInterval > 0 && u > 0 && u % restartInterval == 0) {
        if (!expectRst(r, b)) return false
        eobrun = 0
      }
      val bx = u % soloBw(ci)
      val by = u / soloBw(ci)
      val base = (by * planeBw(ci) + bx) * 64
      if (eobrun > 0) {
        eobrun -= 1 // this block is inside a previous EOB run: no data
      } else {
        var k = ss
        var done = false
        while (k <= se && !done) {
          val rs = decodeHuff(r, acT)
          if (rs < 0) return false
          val run = rs >> 4
          val size = rs & 0x0f
          if (size == 0) {
            if (run < 15) {
              // EOBn: run length 2^run + extra; the current block is the
              // first of the run
              var extra = 0
              if (run > 0) {
                extra = r.bits(run)
                if (extra < 0) return false
              }
              eobrun = (1 << run) - 1 + extra
              done = true
            } else {
              k += 16 // ZRL
              if (k > se + 1) return false
            }
          } else {
            k += run
            if (k > se) return false
            val vBits = r.bits(size)
            if (vBits < 0) return false
            cz(base + k) = extend(vBits, size) << al
            k += 1
          }
        }
      }
      u += 1
    }
    true
  }

  /** AC refinement scans (Ah = Al + 1, single component) — T.81
    * G.1.2.3: each RS either appends a ±1·2^Al coefficient after `run`
    * ZERO-HISTORY positions or starts an EOB run; every already-nonzero
    * coefficient passed on the way (and, once in an EOB run, every
    * remaining nonzero in the band) receives one raw CORRECTION bit
    * (1 → grow magnitude by 2^Al if that bit is still unset). */
  private def acRefineScan(r: BitReader, b: Array[Byte], ci: Int, acId: Int,
      ss: Int, se: Int, al: Int,
      acTabs: collection.mutable.Map[Int, HuffTable],
      coefs: Array[Array[Int]], planeBw: Array[Int],
      soloBw: Array[Int], soloBh: Array[Int],
      restartInterval: Int): Boolean = {
    val acT = acTabs.getOrElse(acId, return false)
    val cz = coefs(ci)
    val p1 = 1 << al
    var eobrun = 0
    val total = soloBw(ci) * soloBh(ci)

    // one correction bit onto an already-nonzero coefficient
    def correct(idx: Int): Boolean = {
      val bit = r.bit()
      if (bit < 0) return false
      if (bit == 1 && (cz(idx) & p1) == 0) {
        if (cz(idx) >= 0) cz(idx) += p1 else cz(idx) -= p1
      }
      true
    }

    var u = 0
    while (u < total) {
      if (restartInterval > 0 && u > 0 && u % restartInterval == 0) {
        if (!expectRst(r, b)) return false
        eobrun = 0
      }
      val bx = u % soloBw(ci)
      val by = u / soloBw(ci)
      val base = (by * planeBw(ci) + bx) * 64
      var k = ss
      if (eobrun == 0) {
        var broke = false
        while (k <= se && !broke) {
          val rs = decodeHuff(r, acT)
          if (rs < 0) return false
          var run = rs >> 4
          val size = rs & 0x0f
          var newVal = 0
          if (size == 0) {
            if (run < 15) {
              var extra = 0
              if (run > 0) {
                extra = r.bits(run)
                if (extra < 0) return false
              }
              eobrun = (1 << run) + extra // consumed below for THIS block
              broke = true
            }
            // run == 15 (ZRL): skip 16 zero-history positions, correcting
            // nonzeros passed — run stays 15, newVal 0, fall through
          } else {
            if (size != 1) return false // refinement appends only ±1·2^Al
            val sb = r.bit()
            if (sb < 0) return false
            newVal = if (sb == 1) p1 else -p1
          }
          if (!broke) {
            // advance over the band: zero-history positions consume
            // `run`; nonzero-history positions take correction bits
            var placed = false
            while (k <= se && !placed) {
              if (cz(base + k) != 0) {
                if (!correct(base + k)) return false
                k += 1
              } else if (run > 0) {
                run -= 1
                k += 1
              } else if (newVal != 0) {
                cz(base + k) = newVal
                k += 1
                placed = true
              } else {
                // ZRL landed: its 16th zero is this position
                k += 1
                placed = true
              }
            }
            if (!placed && newVal != 0) return false // band overrun
          }
        }
      }
      if (eobrun > 0) {
        // inside an EOB run: correction bits for every remaining
        // nonzero-history coefficient of the band
        while (k <= se) {
          if (cz(base + k) != 0) {
            if (!correct(base + k)) return false
          }
          k += 1
        }
        eobrun -= 1
      }
      u += 1
    }
    true
  }

  /** Custom AC huffman table for progressive scans: the 15 EOBn symbols
    * (r<<4, r = 0..14) at length 4 each — canonical, with the all-ones
    * code unused, exactly the BITS/HUFFVAL shape the standard tables
    * follow. */
  private val AcEobBits: Array[Int] =
    Array(0, 0, 0, 15, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
  private val AcEobVals: Array[Int] = (0 to 14).map(_ << 4).toArray
  private lazy val AcEobEnc = canonicalCodes(AcEobBits, AcEobVals)

  /** A complete, valid PROGRESSIVE grayscale JFIF (SOF2) whose 8×8
    * blocks are the constants `blockVal(bx, by)` — the progressive
    * sibling of [[encodeGrayBlocks]], and the reason a multi-scan lossy
    * mode still sits under the hash gate: the DC coefficient of a
    * constant block is exact (object scaladoc), and this encoder
    * spreads exactly that DC over a REAL three-scan progression —
    *
    *   1. DC first scan at Al = 1 (huffman diffs of dc >> 1),
    *   2. DC refinement at Al = 0 (one raw bit per block: dc & 1 —
    *      two's complement guarantees (dc >> 1 << 1) | (dc & 1) = dc),
    *   3. AC first scan [1, 63] whose blocks are all empty, coded as
    *      greedy EOB RUNS (EOBn + extra bits, the [[AcEobBits]] table),
    *
    * so decode exercises the successive-approximation DC path, the
    * raw-bit refinement path, AND the EOB-run machinery, while the
    * reconstruction stays bit-exact: after both DC scans every block's
    * DC equals the baseline encoding's, and the all-zero AC band is
    * restored verbatim. */
  def encodeGrayProgressiveBlocks(width: Int, height: Int,
      blockVal: (Int, Int) => Int): Array[Byte] = {
    require(width > 0 && height > 0,
      s"encodeGrayProgressiveBlocks: bad dims ${width}x$height")
    val bw = (width + 7) / 8
    val bh = (height + 7) / 8
    // scan 1: DC first, Al = 1 — diffs in the >>1 domain
    val w1 = new BitWriter
    var prev = 0
    var by = 0
    while (by < bh) {
      var bx = 0
      while (bx < bw) {
        val c = blockVal(bx, by)
        require(c >= 0 && c <= 255, s"encodeGrayProgressiveBlocks: value $c")
        val v = (c - 128) >> 1
        val diff = v - prev
        prev = v
        val s = if (diff == 0) 0
          else 32 - Integer.numberOfLeadingZeros(math.abs(diff))
        val (code, len) = DcEnc(s)
        w1.put(code, len)
        if (s > 0) {
          val bitsVal = if (diff >= 0) diff else diff + (1 << s) - 1
          w1.put(bitsVal, s)
        }
        bx += 1
      }
      by += 1
    }
    // scan 2: DC refinement, Ah = 1, Al = 0 — raw bit (dc & 1) per block
    val w2 = new BitWriter
    by = 0
    while (by < bh) {
      var bx = 0
      while (bx < bw) {
        w2.put((blockVal(bx, by) - 128) & 1, 1)
        bx += 1
      }
      by += 1
    }
    // scan 3: AC first [1, 63], Al = 0 — every block empty: EOB runs
    val w3 = new BitWriter
    var remaining = bw * bh
    while (remaining > 0) {
      var rr = 0
      while (rr < 14 && (1 << (rr + 1)) <= remaining) rr += 1
      val runLen = math.min(remaining, (1 << (rr + 1)) - 1)
      val (code, len) = AcEobEnc(rr << 4)
      w3.put(code, len)
      if (rr > 0) w3.put(runLen - (1 << rr), rr)
      remaining -= runLen
    }
    val dqt = Array(0x00.toByte) ++ Zigzag.indices
      .map(i => QuantAll8(i).toByte)
    val sof = Array[Byte](8) ++ be2(height) ++ be2(width) ++
      Array[Byte](1, 1, 0x11, 0)
    def dht(cls: Int, bits: Array[Int], vals: Array[Int]): Array[Byte] =
      Array((cls << 4).toByte) ++ bits.slice(0, 16).map(_.toByte) ++
        vals.map(_.toByte)
    def sos(ssB: Int, seB: Int, ahal: Int): Array[Byte] =
      Array[Byte](1, 1, 0x00, ssB.toByte, seB.toByte, ahal.toByte)
    val app0 = "JFIF".getBytes("US-ASCII") ++
      Array[Byte](0, 1, 1, 0, 0, 1, 0, 1, 0, 0)
    Array(0xff.toByte, 0xd8.toByte) ++ // SOI
      segment(0xe0, app0) ++
      segment(0xdb, dqt) ++
      segment(0xc2, sof) ++ // SOF2: progressive
      segment(0xc4, dht(0, DcBits, DcVals)) ++
      segment(0xda, sos(0, 0, 0x01)) ++ w1.finish() ++ // DC first, Al=1
      segment(0xda, sos(0, 0, 0x10)) ++ w2.finish() ++ // DC refine
      segment(0xc4, dht(1, AcEobBits, AcEobVals)) ++
      segment(0xda, sos(1, 63, 0x00)) ++ w3.finish() ++ // AC first
      Array(0xff.toByte, 0xd9.toByte) // EOI
  }
}
