package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Avi, Bmp, Png}

/** The AVI container ([[graft.operators.Avi]]): real RIFF/LIST demux —
  * frame count/order/content exact, word alignment honored, structural
  * damage refused. Frames are BMPs, so frame content verifies through
  * the independently ImageIO-checked BMP codec. */
class AviSpec extends AnyFunSuite {

  test("demux returns every frame in order, bit-identical to the BMPs " +
      "that went in — odd-length payload alignment included") {
    // odd width → odd BMP size is impossible (stride pads to 4), so odd
    // CHUNK lengths need a synthetic frame; cover via the real encoder
    // first, then a hand-built odd-payload chunk below
    for ((w, h, nf, seed) <- Seq((9, 7, 3, 5L), (16, 16, 1, 1L), (8, 3, 5, 9L))) {
      val avi = Avi.encode(w, h, nf, seed)
      val frames = Avi.demuxFrames(avi).getOrElse(fail(s"undemuxable $w x $h"))
      assert(frames.length == nf)
      for (f <- 0 until nf)
        assert(frames(f).toSeq == Bmp.encodeRgb(w, h, seed + f).toSeq,
          s"frame $f bytes")
    }
  }

  test("frameStats decodes every frame through the BMP codec and matches " +
      "the generative formula per frame") {
    val (w, h, nf, seed) = (12, 10, 4, 77L)
    val stats = Avi.frameStats(Avi.encode(w, h, nf, seed)).get
    assert(stats.map(_._1) == (0 until nf))
    for ((f, s) <- stats) {
      assert(s.width == w && s.height == h)
      var wantR = 0L; var wantG = 0L; var wantB = 0L
      for (y <- 0 until h; x <- 0 until w) {
        wantR += Png.pixelR(x, y, seed + f)
        wantG += Png.pixelG(x, y, seed + f)
        wantB += Png.pixelB(x, y, seed + f)
      }
      assert((s.sumR, s.sumG, s.sumB) == ((wantR, wantG, wantB)), s"frame $f")
    }
  }

  test("odd-length chunks are word-aligned in the walk (hand-built list)") {
    // RIFF('AVI ' LIST('movi' 00db[3 bytes + pad] 00db[bmp])) — if the
    // walk misses the pad byte it lands mid-stream and refuses
    val bmp = Bmp.encodeRgb(4, 2, 3L)
    def le4(v: Int) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    val odd = "00db".getBytes ++ le4(3) ++ Array[Byte](1, 2, 3, 0) // padded
    val even = "00db".getBytes ++ le4(bmp.length) ++ bmp
    val moviBody = "movi".getBytes ++ odd ++ even
    val movi = "LIST".getBytes ++ le4(moviBody.length) ++ moviBody
    val body = "AVI ".getBytes ++ movi
    val avi = "RIFF".getBytes ++ le4(body.length) ++ body
    val frames = Avi.demuxFrames(avi).getOrElse(fail("aligned walk failed"))
    assert(frames.length == 2)
    assert(frames(0).toSeq == Seq[Byte](1, 2, 3))
    assert(frames(1).toSeq == bmp.toSeq)
    // frameStats refuses: frame 0 is not a BMP — a video with one bad
    // frame is a bad video
    assert(Avi.frameStats(avi).isEmpty)
  }

  test("refusals: wrong magic, lying lengths, truncation, no frames") {
    val good = Avi.encode(8, 8, 2, 1L)
    assert(Avi.demuxFrames(null).isEmpty)
    assert(Avi.demuxFrames("RIFFxxxxWAVE".getBytes).isEmpty, "not AVI")
    assert(Avi.demuxFrames(good.take(30)).isEmpty, "truncated header")
    assert(Avi.demuxFrames(good.dropRight(10)).isEmpty,
      "truncated movi list (RIFF length now lies)")
    val lying = good.clone()
    // corrupt the first frame chunk's length to sail past its list end
    val at = new String(good, "ISO-8859-1").indexOf("00db")
    assert(at > 0)
    lying(at + 4) = 0xff.toByte; lying(at + 5) = 0xff.toByte
    assert(Avi.demuxFrames(lying).isEmpty, "lying chunk length is refused")
    // 2-7 junk bytes inside a list body (more than the single legal pad
    // byte) must refuse, not silently truncate the frame list
    def le4(v: Int) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    val bmp = Bmp.encodeRgb(4, 2, 3L)
    for (junk <- 2 to 7) {
      val moviBody = "movi".getBytes ++
        ("00db".getBytes ++ le4(bmp.length) ++ bmp) ++
        Array.fill[Byte](junk)(0x5a)
      val movi = "LIST".getBytes ++ le4(moviBody.length) ++ moviBody
      val body = "AVI ".getBytes ++ movi
      val avi = "RIFF".getBytes ++ le4(body.length) ++ body
      assert(Avi.demuxFrames(avi).isEmpty,
        s"$junk trailing junk bytes must refuse")
    }
  }

  test("A/V profile: interleaved audio re-assembles to the continuous " +
      "generative signal, frames unchanged, idx1 verified") {
    import graft.operators.Wav
    val (w, h, nf, seed, spf) = (9, 7, 3, 5L, 40)
    val avi = Avi.encodeAv(w, h, nf, seed, samplesPerFrame = spf)
    val av = Avi.demuxAv(avi).getOrElse(fail("undemuxable A/V AVI"))
    assert(av.video.length == nf)
    for (f <- 0 until nf)
      assert(av.video(f).toSeq == Bmp.encodeRgb(w, h, seed + f).toSeq,
        s"frame $f bytes")
    assert(av.audioRate == 8000 && av.audioChannels == 1)
    assert(av.audio.length == nf * spf * 2)
    // the concatenated chunks ARE the continuous signal: sample i of
    // the stream equals Wav.sample(i, seed) across chunk boundaries
    val (frames, audio) = Avi.avStats(avi).get
    assert(frames.map(_._1) == (0 until nf))
    var sum = 0L; var mn = Int.MaxValue; var mx = Int.MinValue
    for (i <- 0 until nf * spf) {
      val s = Wav.sample(i.toLong, seed)
      sum += s; mn = math.min(mn, s); mx = math.max(mx, s)
    }
    assert(audio.nSamples == nf * spf)
    assert((audio.sumS, audio.minS, audio.maxS) == ((sum, mn, mx)))
    // the video-only demux still works on the A/V file (skips audio)
    assert(Avi.demuxFrames(avi).get.length == nf)
  }

  test("A/V profile: a lying idx1 refuses — size, offset, fourcc, and " +
      "entry-count drift all detected") {
    val good = Avi.encodeAv(8, 8, 2, 1L, samplesPerFrame = 16)
    assert(Avi.demuxAv(good).isDefined)
    val at = new String(good, "ISO-8859-1").indexOf("idx1")
    assert(at > 0)
    val entries = at + 8
    // offset field of entry 0 (bytes 8-11 of the entry)
    val badOff = good.clone(); badOff(entries + 8) = 99.toByte
    assert(Avi.demuxAv(badOff).isEmpty, "wrong offset must refuse")
    // size field of entry 1 (bytes 12-15)
    val badSize = good.clone(); badSize(entries + 16 + 12) = 1.toByte
    assert(Avi.demuxAv(badSize).isEmpty, "wrong size must refuse")
    // fourcc of entry 0
    val badId = good.clone(); badId(entries) = 'x'.toByte
    assert(Avi.demuxAv(badId).isEmpty, "wrong fourcc must refuse")
    // shrink the idx1 chunk length by one entry: count mismatch
    val lenAt = at + 4
    val len = (good(lenAt) & 0xff) | ((good(lenAt + 1) & 0xff) << 8) |
      ((good(lenAt + 2) & 0xff) << 16) | ((good(lenAt + 3) & 0xff) << 24)
    val short = good.dropRight(16).clone()
    val newLen = len - 16
    short(lenAt) = (newLen & 0xff).toByte
    short(lenAt + 1) = ((newLen >> 8) & 0xff).toByte
    short(lenAt + 2) = ((newLen >> 16) & 0xff).toByte
    short(lenAt + 3) = ((newLen >> 24) & 0xff).toByte
    // RIFF length must shrink too or the walk refuses for THAT reason
    val riffLen = ((short(4) & 0xff) | ((short(5) & 0xff) << 8) |
      ((short(6) & 0xff) << 16) | ((short(7) & 0xff) << 24)) - 16
    short(4) = (riffLen & 0xff).toByte
    short(5) = ((riffLen >> 8) & 0xff).toByte
    short(6) = ((riffLen >> 16) & 0xff).toByte
    short(7) = ((riffLen >> 24) & 0xff).toByte
    assert(Avi.demuxAv(short).isEmpty, "missing index entries must refuse")
    // a video-only file (no audio stream, no index) refuses in demuxAv
    assert(Avi.demuxAv(Avi.encode(8, 8, 2, 1L)).isEmpty,
      "single-stream file is out of the A/V profile's scope")
  }

  test("MJPEG profile: every frame decodes through the JPEG codec to " +
      "the generative pixels, both samplings") {
    for ((w, h, nf, seed, sampling) <- Seq((24, 16, 3, 5L, 0x11),
        (33, 18, 2, 9L, 0x22))) {
      val avi = Avi.encodeMjpeg(w, h, nf, seed, sampling)
      val stats = Avi.mjpegFrameStats(avi).getOrElse(
        fail(s"MJPEG demux+decode failed at ${w}x$h sampling=$sampling"))
      assert(stats.map(_._1) == (0 until nf))
      // frame f equals a directly-encoded JPEG of the same seed
      stats.foreach { case (f, s) =>
        val fSeed = seed + f
        val direct = graft.operators.Jpeg.pixelStatsColor(
          graft.operators.Jpeg.encodeColorBlocks(w, h,
            (bx, by) => (((bx * 7L + by * 13L + fSeed) % 256L + 256L) % 256L).toInt,
            (cx, cy) => (((cx * 11L + cy * 3L + 2 * fSeed) % 256L + 256L) % 256L).toInt,
            (cx, cy) => (((cx * 5L + cy * 17L + 3 * fSeed) % 256L + 256L) % 256L).toInt,
            sampling)).get
        assert(s == direct, s"frame $f stats diverge from the direct JPEG")
      }
    }
  }

  test("MJPEG refusals: handler mismatch in BOTH directions, bad frame") {
    // a DIB container through the MJPEG path: declared handler refuses
    assert(Avi.mjpegFrameStats(Avi.encode(8, 8, 2, 1L)).isEmpty,
      "DIB frames must not be fed to the JPEG decoder")
    // an MJPEG container through the BMP path: frames aren't BMPs
    assert(Avi.frameStats(Avi.encodeMjpeg(8, 8, 2, 1L)).isEmpty,
      "JPEG frames must not be fed to the BMP decoder")
    // corrupt one frame's JPEG magic: the whole video refuses
    val avi = Avi.encodeMjpeg(16, 16, 2, 3L)
    val soiAt = avi.indices.find(i => i > 64 &&
      (avi(i) & 0xff) == 0xff && (avi(i + 1) & 0xff) == 0xd8).get
    val bad = avi.clone()
    bad(soiAt + 1) = 0x00.toByte
    assert(Avi.mjpegFrameStats(bad).isEmpty,
      "a video with one undecodable frame is a bad video")
  }
}
