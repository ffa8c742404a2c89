package graft.operators

/** Minimal REAL AVI (RIFF) container codec — pure JVM — making the
  * VIDEO modality's demux stage genuine: [[Multimodal.sampleFrames]]
  * slices raw bytes as a stand-in for demuxing; this module writes and
  * walks an actual RIFF/AVI structure (the same chunk discipline as
  * [[Wav]]'s RIFF walk, plus LIST recursion), so "video → frames" is a
  * real container parse, and each extracted frame is a complete BMP
  * decoded by the independently-verified [[Bmp]] codec.
  *
  * Scope: AVI with uncompressed DIB frames (`00db` chunks — each a full
  * BMP file body in this writer's profile), plus, in the A/V profile
  * ([[encodeAv]]/[[demuxAv]]), an interleaved 16-bit mono PCM audio
  * stream (`01wb` chunks) and an `idx1` index. The encoder writes a
  * conforming header set (avih + strl/strh/strf per stream) so the
  * file is honest AVI, and the decoder needs only the RIFF discipline:
  * validate RIFF/'AVI ', recurse into LISTs, collect `00db`/`00dc`
  * frame chunks in order, honor word alignment. [[demuxAv]] also
  * parses the `idx1` chunk and VERIFIES every entry against the actual
  * movi layout (fourcc, size, offset in either the movi-relative or
  * absolute convention) — an index that contradicts the structure is
  * refused, and the audio stream is re-assembled and decoded through
  * the independently-verified [[Wav]] codec. Anything structurally
  * damaged returns None — refuse, don't guess.
  *
  * No JDK AVI reader exists for a cross-check (ImageIO is stills-only);
  * instead the FRAMES are cross-checked — they decode through [[Bmp]],
  * whose own oracle/ImageIO verification already stands — and the
  * catalog query hash-checks the whole demux→decode chain against the
  * generative formula. Same 100 TB shape as the family: opaque binary
  * payloads, partition-wise demux, stats across stage boundaries. */
object Avi {

  private def le4(v: Long): Array[Byte] = Array(
    (v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
    ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)

  private def chunk(id: String, payload: Array[Byte]): Array[Byte] = {
    val pad = if (payload.length % 2 == 1) Array[Byte](0) else Array.emptyByteArray
    id.getBytes("US-ASCII") ++ le4(payload.length.toLong) ++ payload ++ pad
  }

  private def list(tpe: String, payload: Array[Byte]): Array[Byte] =
    chunk("LIST", tpe.getBytes("US-ASCII") ++ payload)

  /** A complete, valid single-stream AVI whose frames are the BMPs of
    * the generative images `seed + frameNo` (one ground truth across
    * the whole image/video family). Frame f's pixel (x, y) is therefore
    * [[Png.pixelR]]/G/B at seed `seed + f` — exactly re-derivable. */
  def encode(width: Int, height: Int, nFrames: Int, seed: Long,
      fps: Int = 10): Array[Byte] = {
    require(width > 0 && height > 0 && nFrames > 0 && fps > 0,
      s"Avi.encode: bad args (${width}x$height, $nFrames frames, $fps fps)")
    val frames = (0 until nFrames).map(f =>
      chunk("00db", Bmp.encodeRgb(width, height, seed + f)))
    val frameMax = frames.map(_.length).max
    val avih = le4(1000000L / fps) ++ le4(0L) ++ le4(0L) ++
      le4(0x10L /* AVIF_HASINDEX off; flags: none needed */) ++
      le4(nFrames.toLong) ++ le4(0L) ++ le4(1L) ++ le4(frameMax.toLong) ++
      le4(width.toLong) ++ le4(height.toLong) ++
      le4(0L) ++ le4(0L) ++ le4(0L) ++ le4(0L)
    val strh = "vids".getBytes("US-ASCII") ++ "DIB ".getBytes("US-ASCII") ++
      le4(0L) ++ le4(0L) ++ le4(0L) ++ le4(1L) ++ le4(fps.toLong) ++
      le4(0L) ++ le4(nFrames.toLong) ++ le4(frameMax.toLong) ++
      le4(-1L & 0xffffffffL) ++ le4(0L) ++
      Array[Byte](0, 0, 0, 0, 0, 0, 0, 0) // rcFrame
    // strf for vids = BITMAPINFOHEADER
    val strf = le4(40L) ++ le4(width.toLong) ++ le4(height.toLong) ++
      Array[Byte](1, 0, 24, 0) ++ le4(0L) ++ le4(0L) ++
      le4(0L) ++ le4(0L) ++ le4(0L) ++ le4(0L)
    val hdrl = list("hdrl",
      chunk("avih", avih) ++ list("strl", chunk("strh", strh) ++ chunk("strf", strf)))
    val movi = list("movi", frames.toArray.flatten)
    val body = "AVI ".getBytes("US-ASCII") ++ hdrl ++ movi
    "RIFF".getBytes("US-ASCII") ++ le4(body.length.toLong) ++ body
  }

  private def rdLe4(b: Array[Byte], at: Int): Long =
    (b(at) & 0xffL) | ((b(at + 1) & 0xffL) << 8) |
      ((b(at + 2) & 0xffL) << 16) | ((b(at + 3) & 0xffL) << 24)

  /** REAL demux: RIFF/'AVI ' validation, recursive LIST walk, ordered
    * `00db`/`00dc` frame extraction with word alignment. Returns the
    * raw frame payloads (each a BMP in this profile); None on
    * structural damage. */
  def demuxFrames(b: Array[Byte]): Option[Seq[Array[Byte]]] = {
    if (b == null || b.length < 12) return None
    if (b(0) != 'R' || b(1) != 'I' || b(2) != 'F' || b(3) != 'F') return None
    val riffLen = rdLe4(b, 4)
    if (riffLen < 4 || 8 + riffLen > b.length) return None
    if (b(8) != 'A' || b(9) != 'V' || b(10) != 'I' || b(11) != ' ') return None
    val frames = collection.mutable.ArrayBuffer.empty[Array[Byte]]
    // walk(start, end): chunks of a list body; recurse into LISTs
    def walk(start: Int, end: Int): Boolean = {
      var i = start
      while (i + 8 <= end) {
        val id = new String(b, i, 4, "US-ASCII")
        val len = rdLe4(b, i + 4)
        if (len < 0 || i + 8 + len > end) return false
        if (id == "LIST") {
          if (len < 4) return false
          if (!walk(i + 12, i + 8 + len.toInt)) return false
        } else if (id == "00db" || id == "00dc") {
          frames += java.util.Arrays.copyOfRange(b, i + 8, i + 8 + len.toInt)
        }
        i += 8 + len.toInt + (len.toInt & 1) // word alignment
      }
      i == end || i == end - 1 // tolerate ONE trailing pad byte, not garbage
    }
    if (!walk(12, (8 + riffLen).toInt)) return None
    if (frames.isEmpty) None else Some(frames.toSeq)
  }

  /** Per-frame pixel stats of a demuxed AVI: demux → [[Bmp.pixelStats]]
    * per frame. None if the container OR any frame refuses — a video
    * with one bad frame is a bad video, not a shorter one. */
  def frameStats(b: Array[Byte]): Option[Seq[(Int, Png.PixelStats)]] =
    demuxFrames(b).flatMap { frames =>
      val decoded = frames.zipWithIndex.map { case (f, i) =>
        Bmp.pixelStats(f).map(i -> _)
      }
      if (decoded.exists(_.isEmpty)) None else Some(decoded.map(_.get))
    }

  // ——— MJPEG profile: JPEG-compressed frames ———

  /** A complete, valid MJPEG AVI: the same RIFF scaffolding as
    * [[encode]], but each `00dc` frame is a complete baseline COLOR
    * JPEG ([[Jpeg.encodeColorBlocks]], constant component blocks —
    * frame f's generative seed is `seed + f`), the stream handler is
    * `MJPG`, and `biCompression` carries the `MJPG` fourcc. Motion
    * JPEG is what real capture hardware and legacy pipelines emit:
    * every frame is independently decodable, which is exactly why the
    * partition-wise decode model fits it — no inter-frame state.
    *
    * @param sampling luma sampling of every frame (0x11 = 4:4:4,
    *        0x22 = 4:2:0), forwarded to the JPEG encoder */
  def encodeMjpeg(width: Int, height: Int, nFrames: Int, seed: Long,
      sampling: Int = 0x11, fps: Int = 10): Array[Byte] = {
    require(width > 0 && height > 0 && nFrames > 0 && fps > 0,
      s"Avi.encodeMjpeg: bad args (${width}x$height, $nFrames frames, $fps fps)")
    val frames = (0 until nFrames).map { f =>
      val fSeed = seed + f
      chunk("00dc", Jpeg.encodeColorBlocks(width, height,
        (bx, by) => (((bx * 7L + by * 13L + fSeed) % 256L + 256L) % 256L).toInt,
        (cx, cy) => (((cx * 11L + cy * 3L + 2 * fSeed) % 256L + 256L) % 256L).toInt,
        (cx, cy) => (((cx * 5L + cy * 17L + 3 * fSeed) % 256L + 256L) % 256L).toInt,
        sampling))
    }
    val frameMax = frames.map(_.length).max
    val avih = le4(1000000L / fps) ++ le4(0L) ++ le4(0L) ++
      le4(0x10L) ++
      le4(nFrames.toLong) ++ le4(0L) ++ le4(1L) ++ le4(frameMax.toLong) ++
      le4(width.toLong) ++ le4(height.toLong) ++
      le4(0L) ++ le4(0L) ++ le4(0L) ++ le4(0L)
    val strh = "vids".getBytes("US-ASCII") ++ "MJPG".getBytes("US-ASCII") ++
      le4(0L) ++ le4(0L) ++ le4(0L) ++ le4(1L) ++ le4(fps.toLong) ++
      le4(0L) ++ le4(nFrames.toLong) ++ le4(frameMax.toLong) ++
      le4(-1L & 0xffffffffL) ++ le4(0L) ++
      Array[Byte](0, 0, 0, 0, 0, 0, 0, 0)
    // BITMAPINFOHEADER with biCompression = the 'MJPG' fourcc
    val strf = le4(40L) ++ le4(width.toLong) ++ le4(height.toLong) ++
      Array[Byte](1, 0, 24, 0) ++ "MJPG".getBytes("US-ASCII") ++ le4(0L) ++
      le4(0L) ++ le4(0L) ++ le4(0L) ++ le4(0L)
    val hdrl = list("hdrl",
      chunk("avih", avih) ++ list("strl", chunk("strh", strh) ++ chunk("strf", strf)))
    val movi = list("movi", frames.toArray.flatten)
    val body = "AVI ".getBytes("US-ASCII") ++ hdrl ++ movi
    "RIFF".getBytes("US-ASCII") ++ le4(body.length.toLong) ++ body
  }

  /** The FIRST stream header's (fccType, handler) fourccs, or None on
    * structural damage — how a demuxer learns what the frame payloads
    * ARE before feeding them to a pixel codec. */
  private[operators] def firstStreamHandler(b: Array[Byte]): Option[(String, String)] = {
    if (b == null || b.length < 12) return None
    if (b(0) != 'R' || b(1) != 'I' || b(2) != 'F' || b(3) != 'F') return None
    val riffLen = rdLe4(b, 4)
    if (riffLen < 4 || 8 + riffLen > b.length) return None
    if (b(8) != 'A' || b(9) != 'V' || b(10) != 'I' || b(11) != ' ') return None
    var found: Option[(String, String)] = None
    def walk(start: Int, end: Int): Boolean = {
      var i = start
      while (i + 8 <= end && found.isEmpty) {
        val id = new String(b, i, 4, "US-ASCII")
        val len = rdLe4(b, i + 4)
        if (len < 0 || i + 8 + len > end) return false
        if (id == "LIST") {
          if (len < 4) return false
          if (!walk(i + 12, i + 8 + len.toInt)) return false
        } else if (id == "strh") {
          if (len < 8) return false
          found = Some((new String(b, i + 8, 4, "US-ASCII"),
            new String(b, i + 12, 4, "US-ASCII")))
        }
        i += 8 + len.toInt + (len.toInt & 1)
      }
      true
    }
    if (!walk(12, (8 + riffLen).toInt)) return None
    found
  }

  /** Per-frame pixel stats of an MJPEG AVI: the stream header must
    * declare `vids`/`MJPG` (feeding DIB payloads to a JPEG decoder — or
    * vice versa — is a data bug this check makes loud), then demux →
    * [[Jpeg.pixelStatsColor]] per frame. None if the container, the
    * declared codec, OR any frame refuses. */
  def mjpegFrameStats(b: Array[Byte]): Option[Seq[(Int, Jpeg.ColorStats)]] =
    firstStreamHandler(b) match {
      case Some(("vids", "MJPG")) =>
        demuxFrames(b).flatMap { frames =>
          val decoded = frames.zipWithIndex.map { case (f, i) =>
            Jpeg.pixelStatsColor(f).map(i -> _)
          }
          if (decoded.exists(_.isEmpty)) None else Some(decoded.map(_.get))
        }
      case _ => None
    }

  // ——— A/V profile: interleaved audio + idx1 index ———

  /** A complete, valid TWO-stream AVI: stream 0 = DIB video (the same
    * generative BMP frames as [[encode]]), stream 1 = 16-bit mono PCM
    * audio, interleaved `00db`/`01wb` per frame, followed by a
    * conforming `idx1` index (AVIIF_KEYFRAME entries, movi-relative
    * offsets) with AVIF_HASINDEX set in avih. Audio is the CONTINUOUS
    * generative signal [[Wav.sample]] at seed `seed`, sliced
    * `samplesPerFrame` per chunk — so sample i of the re-assembled
    * stream is exactly `Wav.sample(i, seed)`, re-derivable in SQL. */
  def encodeAv(width: Int, height: Int, nFrames: Int, seed: Long,
      fps: Int = 10, audioRate: Int = 8000,
      samplesPerFrame: Int = 160): Array[Byte] = {
    require(width > 0 && height > 0 && nFrames > 0 && fps > 0 &&
      audioRate > 0 && samplesPerFrame > 0,
      s"Avi.encodeAv: bad args (${width}x$height, $nFrames frames)")
    val moviChunks = (0 until nFrames).flatMap { f =>
      val pcm = new Array[Byte](samplesPerFrame * 2)
      var i = 0
      while (i < samplesPerFrame) {
        val s = Wav.sample(f.toLong * samplesPerFrame + i, seed) & 0xffff
        pcm(i * 2) = (s & 0xff).toByte
        pcm(i * 2 + 1) = ((s >> 8) & 0xff).toByte
        i += 1
      }
      Seq(("00db", Bmp.encodeRgb(width, height, seed + f)), ("01wb", pcm))
    }
    // movi body + the index over it: entry offsets are movi-relative
    // (measured from the 'movi' fourcc — first chunk at offset 4, the
    // original AVI convention)
    val moviBody = new java.io.ByteArrayOutputStream()
    val idx = new java.io.ByteArrayOutputStream()
    moviChunks.foreach { case (id, payload) =>
      idx.write(id.getBytes("US-ASCII"))
      idx.write(le4(0x10L)) // AVIIF_KEYFRAME
      idx.write(le4(4L + moviBody.size()))
      idx.write(le4(payload.length.toLong))
      moviBody.write(chunk(id, payload))
    }
    val frameMax = moviChunks.collect { case ("00db", p) => p.length }.max
    val audioMax = samplesPerFrame * 2
    val avih = le4(1000000L / fps) ++ le4(0L) ++ le4(0L) ++
      le4(0x10L) ++ // flags: AVIF_HASINDEX — idx1 IS written below
      le4(nFrames.toLong) ++ le4(0L) ++ le4(2L) ++ le4(frameMax.toLong) ++
      le4(width.toLong) ++ le4(height.toLong) ++
      le4(0L) ++ le4(0L) ++ le4(0L) ++ le4(0L)
    val strhV = "vids".getBytes("US-ASCII") ++ "DIB ".getBytes("US-ASCII") ++
      le4(0L) ++ le4(0L) ++ le4(0L) ++ le4(1L) ++ le4(fps.toLong) ++
      le4(0L) ++ le4(nFrames.toLong) ++ le4(frameMax.toLong) ++
      le4(-1L & 0xffffffffL) ++ le4(0L) ++
      Array[Byte](0, 0, 0, 0, 0, 0, 0, 0) // rcFrame
    val strfV = le4(40L) ++ le4(width.toLong) ++ le4(height.toLong) ++
      Array[Byte](1, 0, 24, 0) ++ le4(0L) ++ le4(0L) ++
      le4(0L) ++ le4(0L) ++ le4(0L) ++ le4(0L)
    val totalSamples = nFrames.toLong * samplesPerFrame
    val strhA = "auds".getBytes("US-ASCII") ++ le4(0L) /* no handler */ ++
      le4(0L) ++ le4(0L) ++ le4(0L) ++ le4(1L) ++ le4(audioRate.toLong) ++
      le4(0L) ++ le4(totalSamples) ++ le4(audioMax.toLong) ++
      le4(-1L & 0xffffffffL) ++ le4(2L) /* sampleSize: PCM16 mono */ ++
      Array[Byte](0, 0, 0, 0, 0, 0, 0, 0)
    // strf for auds = WAVEFORMAT: PCM, mono, 16-bit
    val strfA = Array[Byte](1, 0, 1, 0) ++ le4(audioRate.toLong) ++
      le4(audioRate.toLong * 2) ++ Array[Byte](2, 0, 16, 0)
    val hdrl = list("hdrl", chunk("avih", avih) ++
      list("strl", chunk("strh", strhV) ++ chunk("strf", strfV)) ++
      list("strl", chunk("strh", strhA) ++ chunk("strf", strfA)))
    val movi = list("movi", moviBody.toByteArray)
    val body = "AVI ".getBytes("US-ASCII") ++ hdrl ++ movi ++
      chunk("idx1", idx.toByteArray)
    "RIFF".getBytes("US-ASCII") ++ le4(body.length.toLong) ++ body
  }

  /** Demuxed two-stream container: ordered video frame payloads, the
    * audio stream's concatenated little-endian PCM bytes, and the
    * audio format parsed from the `auds` strf. */
  final case class AvDemux(video: Seq[Array[Byte]], audio: Array[Byte],
      audioRate: Int, audioChannels: Int)

  /** REAL A/V demux with index verification: RIFF walk, `auds` strf
    * parse (PCM-16 only — refuse other audio formats), ordered
    * collection of video (`00db`/`00dc`) and audio (`NNwb`) chunks,
    * then the `idx1` cross-check — entry count, fourccs, sizes, and
    * offsets must all match the movi layout (offsets may follow either
    * the movi-relative or the absolute-file convention, but must be
    * CONSISTENT). A missing, short, or contradicting index refuses:
    * an index that lies about the structure is structural damage. */
  def demuxAv(b: Array[Byte]): Option[AvDemux] = {
    if (b == null || b.length < 12) return None
    if (b(0) != 'R' || b(1) != 'I' || b(2) != 'F' || b(3) != 'F') return None
    val riffLen = rdLe4(b, 4)
    if (riffLen < 4 || 8 + riffLen > b.length) return None
    if (b(8) != 'A' || b(9) != 'V' || b(10) != 'I' || b(11) != ' ') return None
    val end = (8 + riffLen).toInt
    val video = collection.mutable.ArrayBuffer.empty[Array[Byte]]
    val audio = new java.io.ByteArrayOutputStream()
    // (fourcc, abs offset of chunk HEADER, payload size) in movi order
    val moviSeen =
      collection.mutable.ArrayBuffer.empty[(String, Int, Int)]
    var moviPos = -1 // abs offset of the 'movi' fourcc
    var idx1: Array[Byte] = null
    var audRate = -1; var audCh = -1
    // strh/strf pairing inside the current strl
    var pendingType: String = null
    def walk(start: Int, bodyEnd: Int, inMovi: Boolean): Boolean = {
      var i = start
      while (i + 8 <= bodyEnd) {
        val id = new String(b, i, 4, "US-ASCII")
        val len = rdLe4(b, i + 4)
        if (len < 0 || i + 8 + len > bodyEnd) return false
        val ilen = len.toInt
        if (id == "LIST") {
          if (len < 4) return false
          val tpe = new String(b, i + 8, 4, "US-ASCII")
          if (tpe == "movi" && moviPos < 0) moviPos = i + 8
          if (!walk(i + 12, i + 8 + ilen, inMovi || tpe == "movi"))
            return false
        } else if (id == "strh") {
          if (ilen < 4) return false
          pendingType = new String(b, i + 8, 4, "US-ASCII")
        } else if (id == "strf" && pendingType == "auds") {
          pendingType = null
          if (ilen < 16) return false
          val fmt = (b(i + 8) & 0xff) | ((b(i + 9) & 0xff) << 8)
          audCh = (b(i + 10) & 0xff) | ((b(i + 11) & 0xff) << 8)
          audRate = rdLe4(b, i + 12).toInt
          val bits = (b(i + 22) & 0xff) | ((b(i + 23) & 0xff) << 8)
          if (fmt != 1 || bits != 16 || audCh < 1 || audRate <= 0)
            return false // non-PCM16 audio: out of scope, refuse
        } else if (id == "00db" || id == "00dc") {
          if (inMovi) {
            video += java.util.Arrays.copyOfRange(b, i + 8, i + 8 + ilen)
            moviSeen += ((id, i, ilen))
          }
        } else if (inMovi && id.length == 4 && id(0).isDigit &&
            id(1).isDigit && id(2) == 'w' && id(3) == 'b') {
          audio.write(b, i + 8, ilen)
          moviSeen += ((id, i, ilen))
        } else if (id == "idx1") {
          idx1 = java.util.Arrays.copyOfRange(b, i + 8, i + 8 + ilen)
        }
        i += 8 + ilen + (ilen & 1) // word alignment
      }
      i == bodyEnd || i == bodyEnd - 1 // tolerate ONE trailing pad byte
    }
    if (!walk(12, end, inMovi = false)) return None
    // both streams required in this profile; idx1 required too
    if (video.isEmpty || audio.size() == 0 || audRate <= 0 ||
        moviPos < 0 || idx1 == null) return None
    // index verification: one 16-byte entry per movi chunk, in order
    if (idx1.length != moviSeen.length * 16) return None
    // convention fixed by the FIRST entry, then enforced for all
    val firstOff = rdLe4(idx1, 8)
    val relative = firstOff == (moviSeen.head._2 - moviPos).toLong
    var k = 0
    while (k < moviSeen.size) {
      val (ckid, absOff, size) = moviSeen(k)
      val e = k * 16
      if (new String(idx1, e, 4, "US-ASCII") != ckid) return None
      if (rdLe4(idx1, e + 12) != size.toLong) return None
      val want = if (relative) (absOff - moviPos).toLong else absOff.toLong
      if (rdLe4(idx1, e + 8) != want) return None
      k += 1
    }
    Some(AvDemux(video.toSeq, audio.toByteArray, audRate, audCh))
  }

  /** Full A/V decode: per-frame [[Bmp.pixelStats]] + the audio stream
    * re-wrapped as a WAV (header synthesized from the parsed strf) and
    * decoded through the verified [[Wav.pcmStats]] path. None if the
    * container, the index, any frame, or the audio refuses. */
  def avStats(b: Array[Byte])
      : Option[(Seq[(Int, Png.PixelStats)], Wav.PcmStats)] =
    demuxAv(b).flatMap { av =>
      val decoded = av.video.zipWithIndex.map { case (f, i) =>
        Bmp.pixelStats(f).map(i -> _)
      }
      if (decoded.exists(_.isEmpty)) None
      else {
        val wav = new java.io.ByteArrayOutputStream(44 + av.audio.length)
        wav.write("RIFF".getBytes("US-ASCII"))
        wav.write(le4(36L + av.audio.length))
        wav.write("WAVE".getBytes("US-ASCII"))
        wav.write("fmt ".getBytes("US-ASCII"))
        wav.write(le4(16L))
        wav.write(Array[Byte](1, 0)) // PCM
        wav.write(Array[Byte]((av.audioChannels & 0xff).toByte,
          ((av.audioChannels >> 8) & 0xff).toByte))
        wav.write(le4(av.audioRate.toLong))
        wav.write(le4(av.audioRate.toLong * 2 * av.audioChannels))
        wav.write(Array[Byte]((2 * av.audioChannels).toByte, 0, 16, 0))
        wav.write("data".getBytes("US-ASCII"))
        wav.write(le4(av.audio.length.toLong))
        wav.write(av.audio)
        Wav.pcmStats(wav.toByteArray).map(a => (decoded.map(_.get), a))
      }
    }
}
