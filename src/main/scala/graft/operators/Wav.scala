package graft.operators

/** Minimal REAL WAV/PCM codec — pure JVM, no audio libraries — the audio
  * sibling of [[Png]]: [[encodePcm16]] builds a genuine RIFF/WAVE
  * container (fmt chunk, 16-bit mono PCM, little-endian data chunk) of a
  * deterministic generative signal, [[pcmStats]] decodes any conforming
  * WAV back (RIFF walk → fmt validation → sample read) and reduces the
  * ACTUAL decoded samples to statistics. Scope: PCM format 1 at
  * 16 bits, plus G.711 µ-law/A-law (formats 7/6, 8-bit — the telephony
  * companding codecs, expanded by the exact integer maps
  * [[mulawExpand]]/[[alawExpand]]); anything else returns None —
  * refuse, don't guess.
  *
  * PCM "decode" is byte-exact sample extraction (the container carries
  * raw samples), so this proves the CONTAINER layer — header layout,
  * chunk walk, byte order, width — the same way `q_png_pixel_decode`
  * proves PNG's compression layer: the catalog oracle recomputes the
  * statistics from the generative formula without seeing a WAV byte,
  * and a spec cross-decodes with `javax.sound.sampled` (JDK) as an
  * independent reference decoder. Same 100 TB shape as the rest of the
  * multimodal family: payloads in a binary column, decode partition-
  * wise, only per-item stats cross stage boundaries. */
object Wav {

  /** Decoded-sample statistics: count, sum, min, max over signed 16-bit
    * samples, plus the parsed rate/channels. */
  final case class PcmStats(sampleRate: Int, channels: Int, nSamples: Long,
      sumS: Long, minS: Int, maxS: Int)

  /** The generative signal — trivially SQL-expressible on purpose:
    * sample i of stream `seed` is ((i·31337 + seed) mod 65536) − 32768. */
  def sample(i: Long, seed: Long): Int =
    ((((i * 31337L + seed) % 65536L) + 65536L) % 65536L - 32768L).toInt

  private def le16(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
  private def le32(v: Long): Array[Byte] = Array(
    (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
    ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  /** A complete, valid mono 16-bit PCM WAV of `nSamples` generative
    * samples. */
  def encodePcm16(nSamples: Int, sampleRate: Int, seed: Long): Array[Byte] = {
    require(nSamples > 0, s"encodePcm16: bad args ($nSamples, $sampleRate)")
    encodePcm16Samples(
      Array.tabulate(nSamples)(i => sample(i.toLong, seed)), sampleRate)
  }

  /** Buffer-input encoder — [[encodePcm16]] (generative) and
    * [[resamplePcm16]] (resampled) both delegate here. */
  def encodePcm16Samples(samples: Array[Int], sampleRate: Int): Array[Byte] = {
    val nSamples = samples.length
    require(nSamples > 0 && sampleRate > 0,
      s"encodePcm16Samples: bad args ($nSamples, $sampleRate)")
    // 44-byte header + 2 bytes/sample must fit one JVM byte array; past
    // this, nSamples * 2 wraps Int and the RIFF size fields would lie.
    require(nSamples <= (Int.MaxValue - 44) / 2,
      s"encodePcm16Samples: $nSamples samples overflows a single in-memory WAV")
    val dataLen = nSamples * 2
    val out = new java.io.ByteArrayOutputStream(44 + dataLen)
    out.write("RIFF".getBytes("US-ASCII"))
    out.write(le32(36L + dataLen)) // riff payload size
    out.write("WAVE".getBytes("US-ASCII"))
    out.write("fmt ".getBytes("US-ASCII"))
    out.write(le32(16L)) // fmt chunk size
    out.write(le16(1)) // PCM
    out.write(le16(1)) // mono
    out.write(le32(sampleRate.toLong))
    out.write(le32(sampleRate.toLong * 2)) // byte rate
    out.write(le16(2)) // block align
    out.write(le16(16)) // bits per sample
    out.write("data".getBytes("US-ASCII"))
    out.write(le32(dataLen.toLong))
    var i = 0
    while (i < nSamples) {
      require(samples(i) >= -32768 && samples(i) <= 32767,
        s"encodePcm16Samples: sample ${samples(i)} out of 16-bit range")
      out.write(le16(samples(i) & 0xffff))
      i += 1
    }
    out.toByteArray
  }

  /** Full-sample decode — (rate, channels, samples); the materializing
    * face [[pcmStats]]' streaming reduction doesn't need but
    * [[resamplePcm16]] does. Same scope/refusal rules as [[pcmStats]]. */
  def decodePcm16(b: Array[Byte]): Option[(Int, Int, Array[Int])] =
    pcmStats(b).flatMap { st =>
      // the chunk walk validated everything; re-walk for the data span
      // (and the format code — pcmStats also accepts G.711, whose
      // 1-byte samples this 16-bit reader must not touch)
      var i = 12
      var dataOff = -1; var dataLen = -1L
      while (i + 8 <= b.length && dataOff < 0) {
        val tpe = new String(b, i, 4, "US-ASCII")
        val len = u32(b, i + 4)
        if (tpe == "fmt " && u16(b, i + 8) != 1) return None
        if (tpe == "data") { dataOff = i + 8; dataLen = len }
        i += 8 + len.toInt + (len.toInt & 1)
      }
      if (dataLen / 2 > Int.MaxValue - 8) return None
      val n = (dataLen / 2).toInt
      val out = new Array[Int](n)
      var j = 0
      while (j < n) {
        val v = u16(b, dataOff + j * 2)
        out(j) = if (v >= 0x8000) v - 0x10000 else v
        j += 1
      }
      Some((st.sampleRate, st.channels, out))
    }

  /** REAL audio resample: decode → EXACT-INTEGER linear resample →
    * re-encode — the 1-D audio sibling of [[Png.resizeRgb]]'s bilinear,
    * with the identical arithmetic contract (center-aligned mapping
    * over denominator 2·outN, edge clamp, one floor division) so an SQL
    * oracle re-derives every output sample. Signed samples are shifted
    * to [0, 65535] before blending so the division is plain
    * non-negative integer division — the affine shift commutes with the
    * blend exactly ((den−f)+f = den), and both engines' `/`/`//`
    * agree on non-negative operands (floor vs truncate never differs
    * there). MONO only (multi-channel needs a per-channel pass —
    * refuse, don't guess); None exactly when the decode refuses. */
  def resamplePcm16(b: Array[Byte], outN: Int,
      outRate: Int): Option[Array[Byte]] = {
    require(outN > 0 && outRate > 0,
      s"resamplePcm16: bad args ($outN, $outRate)")
    decodePcm16(b).flatMap { case (_, channels, src) =>
      if (channels != 1 || src.isEmpty) None
      else Some(encodePcm16Samples(resampleLinear(src, outN), outRate))
    }
  }

  /** The exact-integer linear kernel on raw sample buffers (see
    * [[resamplePcm16]] for the arithmetic contract). */
  def resampleLinear(src: Array[Int], outN: Int): Array[Int] = {
    val n = src.length
    require(n > 0 && outN > 0, s"resampleLinear: bad args ($n, $outN)")
    val den = 2L * outN
    Array.tabulate(outN) { i =>
      val num = (2L * i + 1L) * n - outN
      val i0 = if (num < 0L) 0 else (num / den).toInt
      val f = if (num < 0L) 0L else num % den
      val i1 = math.min(i0 + 1, n - 1)
      val u0 = src(i0) + 32768L
      val u1 = src(i1) + 32768L
      (((den - f) * u0 + f * u1) / den).toInt - 32768
    }
  }

  private def u16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
  private def u32(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
      ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)

  // ——— G.711 (ITU-T): µ-law and A-law 8-bit companded telephony audio —
  // WAVE format codes 7 and 6. The expansions are EXACT integer maps
  // (segment + mantissa → 13/14-bit linear), so a companded WAV decodes
  // under the hash gate like PCM does; javax.sound.sampled cross-checks
  // the constants in the spec. ———

  /** µ-law byte → linear sample (G.711 µ-law expansion: complement,
    * then ((8·mantissa + 132) << exponent) − 132, sign from bit 7). */
  def mulawExpand(code: Int): Int = {
    val u = ~code & 0xff
    val exponent = (u >> 4) & 0x07
    val mantissa = u & 0x0f
    val mag = (((mantissa << 3) + 0x84) << exponent) - 0x84
    if ((u & 0x80) != 0) -mag else mag
  }

  /** A-law byte → linear sample (G.711 A-law expansion: XOR 0x55;
    * segment 0 → 16·m + 8, segment s ≥ 1 → (16·m + 264) << (s−1);
    * bit 7 SET means positive — the A-law sign convention). */
  def alawExpand(code: Int): Int = {
    val a = code ^ 0x55
    val seg = (a >> 4) & 0x07
    val m = a & 0x0f
    val t =
      if (seg == 0) (m << 4) + 8
      else ((m << 4) + 0x108) << (seg - 1)
    if ((a & 0x80) != 0) t else -t
  }

  /** A complete, valid mono G.711 WAV of `nSamples` generative CODE
    * bytes (`code(i) = (i·31 + seed) mod 256` — trivially
    * SQL-expressible so the oracle can re-derive the expanded
    * samples). `aLaw = false` → µ-law (format 7), true → A-law
    * (format 6). */
  def encodeG711(nSamples: Int, sampleRate: Int, seed: Long,
      aLaw: Boolean): Array[Byte] = {
    require(nSamples > 0 && sampleRate > 0,
      s"encodeG711: bad args ($nSamples, $sampleRate)")
    require(nSamples <= Int.MaxValue - 64,
      s"encodeG711: $nSamples samples overflows a single in-memory WAV")
    val out = new java.io.ByteArrayOutputStream(44 + nSamples)
    val dataLen = nSamples + (nSamples & 1) // word-aligned chunk body
    out.write("RIFF".getBytes("US-ASCII"))
    out.write(le32(36L + dataLen))
    out.write("WAVE".getBytes("US-ASCII"))
    out.write("fmt ".getBytes("US-ASCII"))
    out.write(le32(16L))
    out.write(le16(if (aLaw) 6 else 7)) // WAVE_FORMAT_ALAW / _MULAW
    out.write(le16(1)) // mono
    out.write(le32(sampleRate.toLong))
    out.write(le32(sampleRate.toLong)) // byte rate: 1 byte/sample
    out.write(le16(1)) // block align
    out.write(le16(8)) // bits per sample
    out.write("data".getBytes("US-ASCII"))
    out.write(le32(nSamples.toLong))
    var i = 0
    while (i < nSamples) {
      out.write((((i.toLong * 31L + seed) % 256L + 256L) % 256L).toInt)
      i += 1
    }
    if ((nSamples & 1) == 1) out.write(0) // pad byte
    out.toByteArray
  }

  // ——— IMA/DVI ADPCM (WAVE format 0x11) — 4-bit adaptive differential
  // PCM, the classic 4× lossy audio compressor. The codec is a pure
  // integer STATE MACHINE (predictor + step index per block), so even
  // though it is lossy, encode→decode is exactly reproducible — and the
  // catalog oracle replays the whole state machine per block through a
  // recursive CTE, putting a genuinely compressed audio format under
  // the hash gate. Blocks are INDEPENDENT in this writer's profile
  // (header predictor = the block's true first sample, step index reset
  // to 0), which is also what makes the replay parallel per block. ———

  /** Step-size table (IMA ADPCM reference algorithm, 89 entries). */
  val ImaStepTable: Array[Int] = Array(
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31,
    34, 37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143,
    157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544,
    598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707,
    1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871,
    5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899,
    15289, 16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767)

  /** Step-index adjustment per code magnitude (low 3 bits). */
  val ImaIndexTable: Array[Int] = Array(-1, -1, -1, -1, 2, 4, 6, 8)

  /** One decoder step: (predictor, index, 4-bit code) → next state.
    * The returned predictor IS the decoded sample. */
  def imaDecodeStep(pred: Int, index: Int, code: Int): (Int, Int) = {
    val st = ImaStepTable(index)
    var diff = st >> 3
    if ((code & 1) != 0) diff += st >> 2
    if ((code & 2) != 0) diff += st >> 1
    if ((code & 4) != 0) diff += st
    val p0 = if ((code & 8) != 0) pred - diff else pred + diff
    val p = math.max(-32768, math.min(32767, p0))
    val i = math.max(0, math.min(88, index + ImaIndexTable(code & 7)))
    (p, i)
  }

  /** One encoder step: quantize (sample − predictor) against the
    * current step size into the 4-bit code (sign + 3 magnitude bits).
    * The caller advances state with [[imaDecodeStep]] — encoder and
    * decoder share one state trajectory by construction. */
  def imaEncodeStep(pred: Int, index: Int, sample: Int): Int = {
    val st = ImaStepTable(index)
    var diff = sample - pred
    var code = 0
    if (diff < 0) { code = 8; diff = -diff }
    if (diff >= st) { code |= 4; diff -= st }
    if (diff >= (st >> 1)) { code |= 2; diff -= st >> 1 }
    if (diff >= (st >> 2)) code |= 1
    code
  }

  /** Samples per IMA block in this writer's profile: 1 header sample +
    * 64 coded nibbles = 32 data bytes; blockAlign 36. */
  val ImaSamplesPerBlock = 65
  private val ImaBlockAlign = 4 + (ImaSamplesPerBlock - 1) / 2

  /** A complete, valid mono IMA-ADPCM WAV of the generative signal
    * ([[sample]]): fmt (format 0x11, 4-bit, samplesPerBlock in the
    * extension), a `fact` chunk carrying the true sample count, and
    * independent 36-byte blocks (header = first sample + index 0;
    * 64 low-nibble-first codes; the last block zero-padded — `fact`
    * bounds the decode). */
  def encodeImaAdpcm(nSamples: Int, sampleRate: Int, seed: Long): Array[Byte] = {
    require(nSamples > 0 && sampleRate > 0,
      s"encodeImaAdpcm: bad args ($nSamples, $sampleRate)")
    val spb = ImaSamplesPerBlock
    val nBlocks = (nSamples + spb - 1) / spb
    require(nBlocks.toLong * ImaBlockAlign <= Int.MaxValue - 128,
      s"encodeImaAdpcm: $nSamples samples overflows a single in-memory WAV")
    val dataLen = nBlocks * ImaBlockAlign
    val out = new java.io.ByteArrayOutputStream(60 + dataLen)
    out.write("RIFF".getBytes("US-ASCII"))
    out.write(le32(52L + dataLen)) // "WAVE" + (8+20) fmt + (8+4) fact + (8+dataLen)
    out.write("WAVE".getBytes("US-ASCII"))
    out.write("fmt ".getBytes("US-ASCII"))
    out.write(le32(20L))
    out.write(le16(0x11)) // WAVE_FORMAT_IMA_ADPCM
    out.write(le16(1)) // mono
    out.write(le32(sampleRate.toLong))
    out.write(le32(sampleRate.toLong * ImaBlockAlign / spb)) // avg byte rate
    out.write(le16(ImaBlockAlign))
    out.write(le16(4)) // bits per (coded) sample
    out.write(le16(2)) // cbSize
    out.write(le16(spb)) // samplesPerBlock
    out.write("fact".getBytes("US-ASCII"))
    out.write(le32(4L))
    out.write(le32(nSamples.toLong))
    out.write("data".getBytes("US-ASCII"))
    out.write(le32(dataLen.toLong))
    var b = 0
    while (b < nBlocks) {
      val start = b * spb
      val len = math.min(spb, nSamples - start)
      var pred = sample(start.toLong, seed)
      var index = 0
      out.write(le16(pred & 0xffff))
      out.write(0) // step index (this profile resets per block)
      out.write(0) // reserved
      var k = 1
      var low = -1
      while (k < len) {
        val code = imaEncodeStep(pred, index, sample((start + k).toLong, seed))
        val st = imaDecodeStep(pred, index, code)
        pred = st._1; index = st._2
        if (low < 0) low = code
        else { out.write(low | (code << 4)); low = -1 }
        k += 1
      }
      if (low >= 0) { out.write(low); low = -1 } // odd tail: high nibble 0
      // zero-pad the block to blockAlign (fact bounds the decode)
      val written = 4 + (len - 1 + 1) / 2
      var pad = ImaBlockAlign - written
      while (pad > 0) { out.write(0); pad -= 1 }
      b += 1
    }
    out.toByteArray
  }

  /** Full IMA-ADPCM decode: (rate, samples). None for anything out of
    * scope (stereo, missing fact, incoherent block geometry) or
    * malformed. */
  def decodeImaAdpcm(b: Array[Byte]): Option[(Int, Array[Int])] = {
    if (b == null || b.length < 44 ||
        b(0) != 'R' || b(1) != 'I' || b(2) != 'F' || b(3) != 'F' ||
        b(8) != 'W' || b(9) != 'A' || b(10) != 'V' || b(11) != 'E')
      return None
    var i = 12
    var rate = -1; var spb = -1; var blockAlign = -1
    var factN = -1L
    var dataOff = -1; var dataLen = -1L
    while (i + 8 <= b.length) {
      val tpe = new String(b, i, 4, "US-ASCII")
      val len = u32(b, i + 4)
      if (len < 0 || i + 8 + len > b.length) return None
      tpe match {
        case "fmt " =>
          if (len < 20) return None
          if (u16(b, i + 8) != 0x11) return None
          if (u16(b, i + 10) != 1) return None // mono scope
          rate = u32(b, i + 12).toInt
          blockAlign = u16(b, i + 20)
          if (u16(b, i + 22) != 4) return None // 4-bit codes
          spb = u16(b, i + 26)
          if (rate <= 0 || spb < 2 || (spb - 1) % 2 != 0 ||
              blockAlign != 4 + (spb - 1) / 2) return None
        case "fact" =>
          if (len < 4) return None
          factN = u32(b, i + 8)
        case "data" => dataOff = i + 8; dataLen = len
        case _ => ()
      }
      i += 8 + len.toInt + (len.toInt & 1)
    }
    if (rate < 0 || dataOff < 0 || factN <= 0) return None
    val nBlocks = ((factN + spb - 1) / spb).toInt
    if (nBlocks.toLong * blockAlign > dataLen) return None
    if (factN > Int.MaxValue - 8) return None
    val outArr = new Array[Int](factN.toInt)
    var o = 0
    var blk = 0
    while (blk < nBlocks) {
      val base = dataOff + blk * blockAlign
      val len = math.min(spb.toLong, factN - blk.toLong * spb).toInt
      var pred = u16(b, base) match {
        case v if v >= 0x8000 => v - 0x10000
        case v => v
      }
      var index = b(base + 2) & 0xff
      if (index > 88 || (b(base + 3) & 0xff) != 0) return None
      outArr(o) = pred; o += 1
      var k = 1
      while (k < len) {
        val byteAt = base + 4 + (k - 1) / 2
        val code =
          if ((k - 1) % 2 == 0) b(byteAt) & 0x0f
          else (b(byteAt) >> 4) & 0x0f
        val st = imaDecodeStep(pred, index, code)
        pred = st._1; index = st._2
        outArr(o) = pred; o += 1
        k += 1
      }
      blk += 1
    }
    Some((rate, outArr))
  }

  /** Windowed audio features over DECODED samples — the audio
    * feature-extract stage beside the image family's pixel stats:
    * non-overlapping windows of `win` samples, per-window ENERGY
    * (Σ s², exact long — 400 × 32767² fits comfortably), stream-wide
    * ZERO CROSSINGS (adjacent pairs with strictly negative product —
    * a zero sample never crosses, the deterministic rule an oracle can
    * mirror), reduced to (n_windows, zcr, max window energy, total
    * energy). Pure integer arithmetic end to end. The tail window
    * (fewer than `win` samples) counts like any other. */
  final case class AudioFeatures(nWindows: Long, zeroCrossings: Long,
      maxWindowEnergy: Long, totalEnergy: Long)

  def audioFeatures(samples: Array[Int], win: Int): AudioFeatures = {
    require(win > 0, s"audioFeatures: window must be positive, got $win")
    require(samples.nonEmpty, "audioFeatures: empty sample buffer")
    var zcr = 0L
    var total = 0L
    var maxE = Long.MinValue
    var wE = 0L
    var i = 0
    while (i < samples.length) {
      val s = samples(i).toLong
      wE += s * s
      total += s * s
      if (i > 0 && samples(i - 1).toLong * s < 0) zcr += 1
      if ((i + 1) % win == 0 || i + 1 == samples.length) {
        if (wE > maxE) maxE = wE
        wE = 0L
      }
      i += 1
    }
    AudioFeatures((samples.length.toLong + win - 1) / win, zcr, maxE, total)
  }

  /** REAL decode of a conforming WAV — 16-bit PCM (format 1), G.711
    * µ-law (7), or A-law (6), any channel count: RIFF/WAVE validation,
    * chunk walk to fmt + data, sample extraction (byte-exact for PCM;
    * the exact integer expansion for companded formats), stats. None
    * for anything out of scope or malformed (truncated chunks, other
    * formats, depth/format mismatches). */
  def pcmStats(b: Array[Byte]): Option[PcmStats] = {
    if (b == null || b.length < 44 ||
        b(0) != 'R' || b(1) != 'I' || b(2) != 'F' || b(3) != 'F' ||
        b(8) != 'W' || b(9) != 'A' || b(10) != 'V' || b(11) != 'E')
      return None
    var i = 12
    var rate = -1; var channels = -1; var fmt = -1
    var dataOff = -1; var dataLen = -1L
    while (i + 8 <= b.length && (rate < 0 || dataOff < 0)) {
      val tpe = new String(b, i, 4, "US-ASCII")
      val len = u32(b, i + 4)
      if (len < 0 || i + 8 + len > b.length) return None
      tpe match {
        case "fmt " =>
          if (len < 16) return None
          fmt = u16(b, i + 8)
          channels = u16(b, i + 10)
          rate = u32(b, i + 12).toInt
          val bits = u16(b, i + 22)
          fmt match {
            case 1 => if (bits != 16) return None // PCM scope: 16-bit
            case 6 | 7 => if (bits != 8) return None // G.711 is 8-bit
            case 0x11 => // IMA ADPCM: the block decoder owns it
              return decodeImaAdpcm(b).map { case (r, samples) =>
                var sum = 0L; var mn = Int.MaxValue; var mx = Int.MinValue
                var j = 0
                while (j < samples.length) {
                  val s = samples(j)
                  sum += s
                  if (s < mn) mn = s
                  if (s > mx) mx = s
                  j += 1
                }
                PcmStats(r, 1, samples.length.toLong, sum, mn, mx)
              }
            case _ => return None // other formats: refuse, don't guess
          }
          if (channels < 1 || rate <= 0) return None
        case "data" => dataOff = i + 8; dataLen = len
        case _ => () // ancillary chunks skipped
      }
      i += 8 + len.toInt + (len.toInt & 1) // chunks are word-aligned
    }
    if (rate < 0 || dataOff < 0) return None
    if (fmt == 1 && dataLen % 2 != 0) return None
    val n = if (fmt == 1) dataLen / 2 else dataLen
    var sum = 0L; var mn = Int.MaxValue; var mx = Int.MinValue
    var j = 0L
    while (j < n) {
      val s = fmt match {
        case 1 => u16(b, dataOff + (j * 2).toInt) match {
          case v if v >= 0x8000 => v - 0x10000
          case v => v
        }
        case 6 => alawExpand(b(dataOff + j.toInt) & 0xff)
        case 7 => mulawExpand(b(dataOff + j.toInt) & 0xff)
      }
      sum += s
      if (s < mn) mn = s
      if (s > mx) mx = s
      j += 1
    }
    if (n == 0) None
    else Some(PcmStats(rate, channels, n, sum, mn, mx))
  }
}
