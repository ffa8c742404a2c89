package graft.operators

/** Minimal REAL WAV/PCM codec — pure JVM, no audio libraries — the audio
  * sibling of [[Png]]: [[encodePcm16]] builds a genuine RIFF/WAVE
  * container (fmt chunk, 16-bit mono PCM, little-endian data chunk) of a
  * deterministic generative signal, [[pcmStats]] decodes any conforming
  * 16-bit PCM WAV back (RIFF walk → fmt validation → sample read) and
  * reduces the ACTUAL decoded samples to statistics. Scope: PCM
  * format 1, 16-bit; anything else (compressed formats, other depths)
  * returns None — refuse, don't guess.
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
    require(nSamples > 0 && sampleRate > 0,
      s"encodePcm16: bad args ($nSamples, $sampleRate)")
    // 44-byte header + 2 bytes/sample must fit one JVM byte array; past
    // this, nSamples * 2 wraps Int and the RIFF size fields would lie.
    require(nSamples <= (Int.MaxValue - 44) / 2,
      s"encodePcm16: $nSamples samples overflows a single in-memory WAV")
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
    var i = 0L
    while (i < nSamples) {
      out.write(le16(sample(i, seed) & 0xffff))
      i += 1
    }
    out.toByteArray
  }

  private def u16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
  private def u32(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
      ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)

  /** REAL PCM decode of a conforming WAV (16-bit PCM, any channel
    * count): RIFF/WAVE validation, chunk walk to fmt + data, signed
    * little-endian sample extraction, stats. None for anything out of
    * scope or malformed (truncated chunks, non-PCM formats, other bit
    * depths). */
  def pcmStats(b: Array[Byte]): Option[PcmStats] = {
    if (b == null || b.length < 44 ||
        b(0) != 'R' || b(1) != 'I' || b(2) != 'F' || b(3) != 'F' ||
        b(8) != 'W' || b(9) != 'A' || b(10) != 'V' || b(11) != 'E')
      return None
    var i = 12
    var rate = -1; var channels = -1; var bits = -1
    var dataOff = -1; var dataLen = -1L
    while (i + 8 <= b.length && (rate < 0 || dataOff < 0)) {
      val tpe = new String(b, i, 4, "US-ASCII")
      val len = u32(b, i + 4)
      if (len < 0 || i + 8 + len > b.length) return None
      tpe match {
        case "fmt " =>
          if (len < 16) return None
          val fmt = u16(b, i + 8)
          if (fmt != 1) return None // PCM only
          channels = u16(b, i + 10)
          rate = u32(b, i + 12).toInt
          bits = u16(b, i + 22)
          if (bits != 16 || channels < 1 || rate <= 0) return None
        case "data" => dataOff = i + 8; dataLen = len
        case _ => () // ancillary chunks skipped
      }
      i += 8 + len.toInt + (len.toInt & 1) // chunks are word-aligned
    }
    if (rate < 0 || dataOff < 0 || dataLen % 2 != 0) return None
    val n = dataLen / 2
    var sum = 0L; var mn = Int.MaxValue; var mx = Int.MinValue
    var j = 0L
    while (j < n) {
      val s = u16(b, dataOff + (j * 2).toInt) match {
        case v if v >= 0x8000 => v - 0x10000
        case v => v
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
