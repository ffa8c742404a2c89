package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Avi, Bmp, Gif, Jpeg, Png, Wav}

/** Seeded mutation fuzz over every codec's decode path: random buffers
  * and bit-flipped valid containers must REFUSE (None) or decode —
  * never throw, never hang. The refusal contract ("refuse, don't
  * guess") is load-bearing for the multimodal pipeline: a crawl shard's
  * corrupt payload must not kill the stage. Deterministic seeds keep
  * the spec reproducible. */
class CodecFuzzSpec extends AnyFunSuite {

  private val decoders: Seq[(String, Array[Byte] => Any)] = Seq(
    "png" -> (b => Png.pixelStats(b)),
    "png_adam7" -> (b => Png.pixelStats(b)),
    "png_gray" -> (b => Png.pixelStats(b)),
    "png_palette" -> (b => Png.pixelStats(b)),
    "png_rgba" -> (b => Png.pixelStats(b)),
    "jpeg" -> (b => Jpeg.pixelStats(b)),
    "jpeg_progressive" -> (b => Jpeg.pixelStats(b)),
    "jpeg_color" -> (b => Jpeg.pixelStatsColor(b)),
    "jpeg_color420" -> (b => Jpeg.pixelStatsColor(b)),
    "bmp" -> (b => Bmp.pixelStats(b)),
    "gif" -> (b => Gif.pixelStats(b)),
    "wav" -> (b => Wav.pcmStats(b)),
    "wav_ulaw" -> (b => Wav.pcmStats(b)),
    "wav_alaw" -> (b => Wav.pcmStats(b)),
    "wav_adpcm" -> (b => Wav.pcmStats(b)),
    "avi" -> (b => Avi.frameStats(b)),
    "avi_mjpeg" -> (b => Avi.mjpegFrameStats(b)),
    "avi_av" -> (b => Avi.avStats(b)))

  private def seeds(name: String): Array[Byte] = name match {
    case "png" => Png.encodeRgb(21, 13, 7L)
    case "png_adam7" => Png.encodeRgb(21, 13, 7L, interlaced = true)
    case "png_gray" => Png.encodeGray8(21, 13, 7L)
    case "png_palette" => Png.encodePalette(21, 13, 7L, interlaced = true)
    case "png_rgba" => Png.encodeRgba(21, 13, 7L)
    case "jpeg_progressive" => Jpeg.encodeGrayProgressiveBlocks(24, 16,
      (bx, by) => (bx * 7 + by * 13) % 256)
    case "jpeg" => Jpeg.encodeGrayBlocks(24, 16,
      (bx, by) => (bx * 7 + by * 13) % 256)
    case "jpeg_color" => Jpeg.encodeColorBlocks(24, 16,
      (bx, by) => (bx * 7 + by * 13) % 256,
      (cx, cy) => (cx * 11 + cy * 3) % 256,
      (cx, cy) => (cx * 5 + cy * 17) % 256, 0x11)
    case "jpeg_color420" => Jpeg.encodeColorBlocks(33, 18,
      (bx, by) => (bx * 7 + by * 13) % 256,
      (cx, cy) => (cx * 11 + cy * 3) % 256,
      (cx, cy) => (cx * 5 + cy * 17) % 256, 0x22)
    case "bmp" => Bmp.encodeRgb(21, 13, 7L)
    case "gif" => Gif.encodeGray(21, 13, (x, y) => (x + y) % 256)
    case "wav" => Wav.encodePcm16(300, 8000, 7L)
    case "wav_ulaw" => Wav.encodeG711(300, 8000, 7L, aLaw = false)
    case "wav_alaw" => Wav.encodeG711(300, 8000, 7L, aLaw = true)
    case "wav_adpcm" => Wav.encodeImaAdpcm(300, 8000, 7L)
    case "avi" => Avi.encode(10, 8, 3, 7L)
    case "avi_mjpeg" => Avi.encodeMjpeg(10, 8, 3, 7L)
    case "avi_av" => Avi.encodeAv(10, 8, 3, 7L, samplesPerFrame = 40)
  }

  test("random garbage never throws in any decoder") {
    val rnd = new scala.util.Random(42)
    for (_ <- 0 until 200; (name, dec) <- decoders) {
      val b = new Array[Byte](rnd.nextInt(600))
      rnd.nextBytes(b)
      try dec(b) catch {
        case e: Throwable =>
          fail(s"$name threw on random input (len ${b.length}): $e")
      }
    }
  }

  test("bit-flipped valid containers never throw in any decoder") {
    val rnd = new scala.util.Random(1234)
    for ((name, dec) <- decoders) {
      val base = seeds(name)
      for (trial <- 0 until 300) {
        val b = base.clone()
        // 1-8 mutations: single-bit flips and whole-byte stomps, biased
        // toward the header where the structural fields live
        val n = 1 + rnd.nextInt(8)
        for (_ <- 0 until n) {
          val at = if (rnd.nextBoolean()) rnd.nextInt(math.min(64, b.length))
            else rnd.nextInt(b.length)
          if (rnd.nextBoolean()) b(at) = (b(at) ^ (1 << rnd.nextInt(8))).toByte
          else b(at) = rnd.nextInt(256).toByte
        }
        try dec(b) catch {
          case e: Throwable =>
            fail(s"$name threw on mutation trial $trial: $e\n" +
              s"mutated bytes vs original at: ${
                b.indices.filter(i => b(i) != base(i)).mkString(",")}")
        }
      }
    }
  }

  test("truncations at every prefix length never throw in any decoder") {
    for ((name, dec) <- decoders) {
      val base = seeds(name)
      // every prefix of the first 128 bytes + 32 spread across the rest
      val cuts = (0 until math.min(128, base.length)) ++
        (base.length / 4 to base.length by math.max(1, base.length / 32))
      for (len <- cuts) {
        try dec(base.take(len)) catch {
          case e: Throwable =>
            fail(s"$name threw on truncation to $len bytes: $e")
        }
      }
    }
  }
}
