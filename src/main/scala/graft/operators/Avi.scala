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
  * BMP file body in this writer's profile), single video stream, no
  * index required (players want idx1; a demuxer doesn't). The encoder
  * writes a conforming header set (avih + strl/strh/strf) so the file
  * is honest AVI, and the decoder needs only the RIFF discipline:
  * validate RIFF/'AVI ', recurse into LISTs, collect `00db`/`00dc`
  * frame chunks in order, honor word alignment. Anything structurally
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
}
