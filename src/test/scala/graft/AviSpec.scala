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
}
