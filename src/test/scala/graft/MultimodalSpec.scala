package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal
import graft.operators.Multimodal.{Codec, ImageHeaders, MediaRow}

/** Multimodal plumbing specs: binary payload round-trip, decode
  * determinism (real header parse + stub byte features), partition-batch
  * shape, and metadata-only column pruning. */
class MultimodalSpec extends SparkSpec {

  test("Codec: checksum/histogram are exact byte statistics") {
    val row = MediaRow(1L, "image", "abc".getBytes("UTF-8"), 640, 480, 0, 0L)
    val f = Codec.decode(row)
    assert(f.byte_len == 3L)
    assert(f.checksum == 97L + 98L + 99L) // 'a'+'b'+'c'
    assert(math.abs(f.histogram.sum - 1.0f) < 1e-6) // normalized
    // bucket of 'a' (97 % 16 = 1): 1/3 of mass; 'b'→2, 'c'→3
    assert(math.abs(f.histogram(1) - 1f / 3f) < 1e-6)
    assert(f.img_format.isEmpty, "plain text must not parse as an image")
  }

  test("ImageHeaders parses real PNG/BMP/GIF/JPEG headers, rejects lookalikes") {
    def be4(v: Int) = Array[Byte](
      (v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)
    def le4(v: Int) = be4(v).reverse
    def le2(v: Int) = Array[Byte](v.toByte, (v >>> 8).toByte)
    def be2(v: Int) = Array[Byte]((v >>> 8).toByte, v.toByte)
    val png = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a) ++
      be4(13) ++ "IHDR".getBytes ++ be4(800) ++ be4(600) ++
      Array[Byte](8, 6, 0, 0, 0) ++ be4(0)
    assert(ImageHeaders.parse(png).contains(("png", 800, 600)))
    val gif = "GIF89a".getBytes ++ le2(320) ++ le2(200) ++ Array[Byte](0, 0)
    assert(ImageHeaders.parse(gif).contains(("gif", 320, 200)))
    val bmp = "BM".getBytes ++ le4(1000) ++ le4(0) ++ le4(54) ++
      le4(40) ++ le4(1024) ++ le4(-768) // top-down: negative height
    assert(ImageHeaders.parse(bmp).contains(("bmp", 1024, 768)))
    val jpeg = Array[Byte](0xff.toByte, 0xd8.toByte) ++
      Array[Byte](0xff.toByte, 0xe0.toByte) ++ be2(16) ++ new Array[Byte](14) ++ // APP0
      Array[Byte](0xff.toByte, 0xc0.toByte) ++ be2(17) ++ Array[Byte](8) ++
      be2(480) ++ be2(640) ++ new Array[Byte](10)
    assert(ImageHeaders.parse(jpeg).contains(("jpeg", 640, 480)))
    // lookalikes that must NOT parse: text starting "BM" (nonzero
    // reserved words), truncated PNG, null, empty
    assert(ImageHeaders.parse("BMW is a carmaker, says doc".getBytes).isEmpty)
    assert(ImageHeaders.parse(png.take(20)).isEmpty)
    assert(ImageHeaders.parse(null).isEmpty)
    assert(ImageHeaders.parse(Array.emptyByteArray).isEmpty)
  }

  test("fromDocuments → extractFeatures round-trips content bytes exactly") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val media = Multimodal.fromDocuments(docs)
    val feats = Multimodal.extractFeatures(spark, media)
    // image rows carry the 33-byte PNG header; others are raw text bytes
    val expected = when(pmod(col("doc_id"), lit(3)) === 0,
      length(col("text")).cast("long") + Multimodal.PngHeaderLen)
      .otherwise(length(col("text")).cast("long"))
    val joined = feats.join(docs, col("media_id") === col("doc_id"))
      .select(col("doc_id"), col("byte_len"), expected.as("n"))
      .filter(col("byte_len") =!= col("n"))
    assert(joined.count() == 0) // ASCII corpus: byte_len == char count (+hdr)
    assert(feats.count() == docs.count())
  }

  test("every image row's synthetic PNG header decodes to the derived dims") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val feats = Multimodal.extractFeatures(spark,
      Multimodal.fromDocuments(docs))
    val img = rows(feats.filter(col("modality") === "image")
      .select(col("media_id"), col("img_format"), col("img_w"), col("img_h")))
    assert(img.nonEmpty)
    img.foreach { r =>
      val id = r.getLong(0)
      assert(r.getString(1) == "png", s"doc $id")
      assert(r.getInt(2) == (id % 240 + 16).toInt, s"doc $id width")
      assert(r.getInt(3) == (id * 7 % 240 + 16).toInt, s"doc $id height")
    }
    // non-image payloads (raw text) never false-positive
    assert(feats.filter(col("modality") =!= "image" &&
      col("img_format").isNotNull).count() == 0)
  }

  test("modality split is the deterministic doc_id % 3 round-robin") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val m = Multimodal.fromDocuments(docs)
      .select(col("media_id"), col("modality")).collect()
    m.foreach { r =>
      val expect = (r.getLong(0) % 3) match {
        case 0 => "image"; case 1 => "audio"; case _ => "video"
      }
      assert(r.getString(1) == expect)
    }
  }

  test("metadata-only query prunes the binary column from the scan") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    Multimodal.fromDocuments(docs)
      .write.mode("overwrite").parquet("/tmp/graft_media_test")
    val media = spark.read.parquet("/tmp/graft_media_test")
    val metaOnly = media.filter(col("modality") === "audio")
      .select(col("media_id"), col("sample_rate"))
    val scanned = metaOnly.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).mkString("\n")
    // the binary payload must NOT appear in the scan's ReadSchema
    assert(scanned.contains("ReadSchema"))
    assert(!scanned.contains("content"),
      s"binary column not pruned from scan:\n$scanned")
  }

  test("sampleFrames: byte-exact slices, stride, short tail, video-only, no shuffle") {
    // filter, not limit: limit inserts its own exchange, which would
    // pollute the no-shuffle assertion on the frame fan-out below
    val media = Multimodal.fromDocuments(
      spark.read.parquet(s"$sfDir/documents.parquet").filter(col("doc_id") < 50))
    val frames = Multimodal.sampleFrames(media, frameBytes = 64, everyNth = 2)
    val byId = rows(frames).groupBy(_.getLong(0))
    val src = rows(media.filter(col("modality") === "video")
      .select(col("media_id"), col("content")))
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    assert(byId.keySet == src.filter(_._2.nonEmpty).keySet,
      "every non-empty video sampled, nothing else")
    byId.foreach { case (id, fs) =>
      val content = src(id)
      val nFrames = (content.length + 63) / 64
      val wantNos = (0L until nFrames.toLong).filter(_ % 2 == 0)
      assert(fs.map(_.getLong(1)).sorted == wantNos, s"media $id frame nos")
      fs.foreach { f =>
        val no = f.getLong(1).toInt
        val want = content.slice(no * 64, math.min((no + 1) * 64, content.length))
        assert(java.util.Arrays.equals(f.getAs[Array[Byte]](2), want),
          s"media $id frame $no bytes")
      }
    }
    // the fan-out is map-side: no Exchange anywhere in the frame plan
    val plan = frames.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"frame sampling must not shuffle:\n$plan")
  }

  test("Png codec: adversarial containers refuse cleanly — no hang, " +
    "no throw, no one-sided size check") {
    import graft.operators.Png
    def be4(v: Long): Array[Byte] = Array(((v >>> 24) & 0xff).toByte,
      ((v >>> 16) & 0xff).toByte, ((v >>> 8) & 0xff).toByte, (v & 0xff).toByte)
    def mkChunk(tpe: String, data: Array[Byte]): Array[Byte] = {
      val t = tpe.getBytes("US-ASCII")
      val crc = new java.util.zip.CRC32(); crc.update(t); crc.update(data)
      be4(data.length.toLong) ++ t ++ data ++ be4(crc.getValue)
    }
    val sig = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
    def ihdr(w: Int, h: Int): Array[Byte] =
      be4(w.toLong) ++ be4(h.toLong) ++ Array[Byte](8, 2, 0, 0, 0)
    // (1) 31-bit chunk length: Int arithmetic would wrap the bounds
    // check negative and throw out of the chunk walk
    val hugeLen = sig ++ be4(0x7fffffffL) ++ "IHDR".getBytes("US-ASCII") ++
      new Array[Byte](16)
    assert(Png.pixelStats(hugeLen).isEmpty, "oversized chunk length")
    // (2) IHDR dims whose h*(1+3w) overflows Int: must refuse, not
    // throw NegativeArraySizeException from the buffer allocation
    val hugeDims = sig ++ mkChunk("IHDR", ihdr(0x40000000, 4)) ++
      mkChunk("IDAT", Array[Byte](0x78, 0x01)) ++
      mkChunk("IEND", Array.emptyByteArray)
    assert(Png.pixelStats(hugeDims).isEmpty, "overflowing dimensions")
    // (3) zlib header with the FDICT bit set: Inflater stalls at
    // needsDictionary (0 bytes, not finished, input present) — the
    // decoder must refuse instead of spinning forever
    val fdict = sig ++ mkChunk("IHDR", ihdr(4, 4)) ++
      mkChunk("IDAT", Array(0x78.toByte, 0xbb.toByte, 1, 2, 3, 4, 5)) ++
      mkChunk("IEND", Array.emptyByteArray)
    assert(Png.pixelStats(fdict).isEmpty, "preset-dictionary stream")
    // (4) oversized payload: IDAT inflating to MORE rows than the IHDR
    // declares is as malformed as inflating to fewer
    val donor = Png.encodeRgb(4, 5, 9L) // inflates to 5 rows
    var i = 8; var donorIdat: Array[Byte] = null
    while (donorIdat == null) {
      val len = ((donor(i) & 0xff) << 24) | ((donor(i + 1) & 0xff) << 16) |
        ((donor(i + 2) & 0xff) << 8) | (donor(i + 3) & 0xff)
      if (new String(donor, i + 4, 4, "US-ASCII") == "IDAT")
        donorIdat = donor.slice(i + 8, i + 8 + len)
      i += 12 + len
    }
    val oversized = sig ++ mkChunk("IHDR", ihdr(4, 4)) ++
      mkChunk("IDAT", donorIdat) ++ mkChunk("IEND", Array.emptyByteArray)
    assert(Png.pixelStats(oversized).isEmpty,
      "stream inflating past the declared height must refuse")
    // and the sibling donor at the DECLARED size still decodes — the
    // refusals above aren't rejecting everything
    assert(Png.pixelStats(Png.encodeRgb(4, 4, 9L)).isDefined)
  }

  test("Png codec: roundtrip equals the generative formula AND an " +
    "independent JDK ImageIO decode, for every filter type") {
    import graft.operators.Png
    // heights >= 5 exercise all five per-row filters (filter = y % 5)
    for ((w, h, seed) <- Seq((17, 9, 3L), (1, 7, 11L), (64, 5, 0L), (3, 200, 42L))) {
      val bytes = Png.encodeRgb(w, h, seed)
      // 1) our decoder reconstructs exactly the generative pixels
      val s = Png.pixelStats(bytes).getOrElse(fail(s"undecodable ${w}x$h"))
      var (er, eg, eb) = (0L, 0L, 0L)
      for (y <- 0 until h; x <- 0 until w) {
        er += Png.pixelR(x, y, seed); eg += Png.pixelG(x, y, seed)
        eb += Png.pixelB(x, y, seed)
      }
      assert((s.width, s.height, s.nPx) == ((w, h, w.toLong * h)))
      assert((s.sumR, s.sumG, s.sumB) == ((er, eg, eb)),
        s"decode drift at ${w}x$h seed=$seed")
      // 2) independent reference decoder: JDK ImageIO agrees pixel-wise
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      assert(img != null, "ImageIO rejected our PNG — encoder is non-conforming")
      assert(img.getWidth == w && img.getHeight == h)
      var (ir, ig, ib) = (0L, 0L, 0L)
      for (y <- 0 until h; x <- 0 until w) {
        val rgb = img.getRGB(x, y)
        ir += (rgb >> 16) & 0xff; ig += (rgb >> 8) & 0xff; ib += rgb & 0xff
      }
      assert((ir, ig, ib) == ((er, eg, eb)),
        s"ImageIO disagrees with the formula at ${w}x$h — encoder bug")
    }
    // refusal paths: garbage, truncation, unsupported color type
    assert(Png.pixelStats(null).isEmpty)
    assert(Png.pixelStats("not a png at all".getBytes).isEmpty)
    val full = Png.encodeRgb(8, 8, 1L)
    assert(Png.pixelStats(full.take(full.length - 20)).isEmpty,
      "truncated stream must refuse, not guess")
    // a real grayscale PNG from an INDEPENDENT encoder (ImageIO) now
    // decodes — gray replicates to RGB; this all-zero 4x4 sums to 0
    val gray = new java.awt.image.BufferedImage(
      4, 4, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(gray, "png", bos)
    val gs = Png.pixelStats(bos.toByteArray)
    assert(gs.exists(s => s.width == 4 && s.height == 4 &&
      s.sumR == 0 && s.sumG == 0 && s.sumB == 0),
      s"ImageIO grayscale must decode: $gs")
    // 16-bit stays out of scope — refuse, don't guess
    val deep = new java.awt.image.BufferedImage(
      4, 4, java.awt.image.BufferedImage.TYPE_USHORT_GRAY)
    val bos16 = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(deep, "png", bos16)
    assert(Png.pixelStats(bos16.toByteArray).isEmpty,
      "16-bit depth is refused")
  }

  test("Png codec: all five color types decode to the formula and " +
      "agree with ImageIO, sequential and Adam7") {
    import graft.operators.Png
    def expect(w: Int, h: Int, seed: Long,
        f: (Int, Int) => (Int, Int, Int)): (Long, Long, Long) = {
      var (er, eg, eb) = (0L, 0L, 0L)
      for (y <- 0 until h; x <- 0 until w) {
        val (r, g, bl) = f(x, y); er += r; eg += g; eb += bl
      }
      (er, eg, eb)
    }
    val cases: Seq[(String, (Int, Int, Long, Boolean) => Array[Byte],
        (Int, Int, Long) => (Int, Int) => (Int, Int, Int))] = Seq(
      ("gray", (w, h, s, il) => Png.encodeGray8(w, h, s, il),
        (_, _, s) => (x, y) => {
          val g = Png.pixelR(x, y, s); (g, g, g)
        }),
      ("palette", (w, h, s, il) => Png.encodePalette(w, h, s, il),
        (_, _, s) => (x, y) => {
          val i = Png.pixelR(x, y, s); (i, 255 - i, (i * 7) % 256)
        }),
      ("rgba", (w, h, s, il) => Png.encodeRgba(w, h, s, il),
        (_, _, s) => (x, y) =>
          (Png.pixelR(x, y, s), Png.pixelG(x, y, s), Png.pixelB(x, y, s))),
      ("gray_alpha", (w, h, s, il) => Png.encodeGrayAlpha(w, h, s, il),
        (_, _, s) => (x, y) => {
          val g = Png.pixelR(x, y, s); (g, g, g)
        }))
    for ((name, enc, truth) <- cases;
         (w, h, seed) <- Seq((17, 9, 3L), (8, 8, 7L), (1, 5, 2L));
         il <- Seq(false, true)) {
      val bytes = enc(w, h, seed, il)
      val s = Png.pixelStats(bytes).getOrElse(
        fail(s"undecodable $name ${w}x$h interlaced=$il"))
      val (er, eg, eb) = expect(w, h, seed, truth(w, h, seed))
      assert((s.sumR, s.sumG, s.sumB) == ((er, eg, eb)),
        s"$name ${w}x$h interlaced=$il decode drift")
      // independent reference decoder agrees pixel-wise. Gray types
      // compare on the RASTER (band 0): getRGB would route the gray
      // colorspace through a nonlinear gray→sRGB conversion — a
      // display transform, not the stored samples. RGB(A)/palette
      // compare on getRGB (PNG alpha is non-premultiplied; samples
      // come back as stored).
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      assert(img != null, s"ImageIO rejected our $name PNG")
      var (ir, ig, ib) = (0L, 0L, 0L)
      val grayType = name == "gray" || name == "gray_alpha"
      for (y <- 0 until h; x <- 0 until w) {
        if (grayType) {
          val g = img.getRaster.getSample(x, y, 0)
          ir += g; ig += g; ib += g
        } else {
          val rgb = img.getRGB(x, y)
          ir += (rgb >> 16) & 0xff; ig += (rgb >> 8) & 0xff; ib += rgb & 0xff
        }
      }
      assert((ir, ig, ib) == ((er, eg, eb)),
        s"ImageIO disagrees on $name ${w}x$h interlaced=$il")
    }
    // palette refusals: missing PLTE, index past the palette
    val pal = Png.encodePalette(8, 8, 1L)
    val noPlte = {
      // excise the PLTE chunk (length 768 + 12 overhead)
      val at = new String(pal, "ISO-8859-1").indexOf("PLTE") - 4
      pal.take(at) ++ pal.drop(at + 12 + 768)
    }
    assert(Png.pixelStats(noPlte).isEmpty, "palette without PLTE")
  }

  test("Png codec: Adam7 interlaced encode decodes pixel-identical to " +
    "sequential, agrees with ImageIO, and handles pass-empty tiny dims") {
    import graft.operators.Png
    // dims chosen to cover: all 7 passes populated (>=8x8), passes
    // empty in x (w < 8), in y (h < 8), and the 1-pixel degenerate
    // image where ONLY pass 1 exists
    for ((w, h, seed) <- Seq((17, 9, 3L), (64, 5, 0L), (3, 200, 42L),
        (8, 8, 7L), (7, 7, 5L), (2, 2, 1L), (1, 1, 9L), (1, 13, 2L))) {
      val seq = Png.encodeRgb(w, h, seed)
      val adam = Png.encodeRgb(w, h, seed, interlaced = true)
      assert(!java.util.Arrays.equals(seq, adam),
        s"interlaced bytes must differ from sequential at ${w}x$h")
      val (dw, dh, px) = Png.decodeRgb(adam).getOrElse(
        fail(s"undecodable Adam7 ${w}x$h"))
      val (_, _, pxSeq) = Png.decodeRgb(seq).get
      assert((dw, dh) == ((w, h)))
      assert(px.toSeq == pxSeq.toSeq,
        s"Adam7 deinterlace drift at ${w}x$h seed=$seed")
      // independent reference decoder on the INTERLACED bytes
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(adam))
      assert(img != null,
        s"ImageIO rejected our Adam7 PNG at ${w}x$h — non-conforming")
      for (y <- 0 until h; x <- 0 until w) {
        val rgb = img.getRGB(x, y)
        val o = (y * w + x) * 3
        assert(((rgb >> 16) & 0xff, (rgb >> 8) & 0xff, rgb & 0xff) ==
          ((px(o) & 0xff, px(o + 1) & 0xff, px(o + 2) & 0xff)),
          s"ImageIO disagrees at ($x,$y) of ${w}x$h")
      }
    }
    // refusal: truncating the interlaced stream must refuse
    val full = Png.encodeRgb(16, 16, 1L, interlaced = true)
    assert(Png.pixelStats(full.take(full.length - 20)).isEmpty,
      "truncated Adam7 stream must refuse, not guess")
    // resize consumes interlaced input through the same decode core
    assert(Png.resizeRgb(full, 5, 5).isDefined)
  }

  test("Wav codec: roundtrip equals the generative formula AND an " +
    "independent javax.sound decode; refusal paths hold") {
    import graft.operators.Wav
    for ((n, seed) <- Seq((500, 7L), (1, 0L), (4499, 123L))) {
      val bytes = Wav.encodePcm16(n, 16000, seed)
      val s = Wav.pcmStats(bytes).getOrElse(fail(s"undecodable n=$n"))
      var (es, emn, emx) = (0L, Int.MaxValue, Int.MinValue)
      for (i <- 0L until n.toLong) {
        val v = Wav.sample(i, seed)
        es += v; emn = math.min(emn, v); emx = math.max(emx, v)
      }
      assert((s.sampleRate, s.channels, s.nSamples) == ((16000, 1, n.toLong)))
      assert((s.sumS, s.minS, s.maxS) == ((es, emn, emx)),
        s"decode drift at n=$n seed=$seed")
      // independent reference: JDK javax.sound parses the same container
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val fmt = ais.getFormat
      assert(fmt.getSampleRate == 16000f && fmt.getChannels == 1 &&
        fmt.getSampleSizeInBits == 16, fmt.toString)
      val pcm = ais.readAllBytes()
      assert(pcm.length == n * 2)
      var js = 0L
      for (i <- 0 until n) {
        val v = (pcm(2 * i) & 0xff) | ((pcm(2 * i + 1) & 0xff) << 8)
        js += (if (v >= 0x8000) v - 0x10000 else v)
      }
      assert(js == es, "javax.sound disagrees with the formula — encoder bug")
    }
    assert(Wav.pcmStats(null).isEmpty)
    assert(Wav.pcmStats("RIFFnot really a wav".getBytes).isEmpty)
    val full = Wav.encodePcm16(100, 8000, 1L)
    assert(Wav.pcmStats(full.take(60)).isEmpty,
      "truncated data chunk must refuse, not guess")
    // a float-format WAV via javax.sound → non-PCM16 → refused
    assert(Wav.pcmStats(full.patch(20, Array[Byte](3, 0), 2)).isEmpty,
      "non-PCM format codes are refused")
  }

  test("Wav codec: G.711 mu-law/A-law expansion matches javax.sound's " +
    "independent converters sample for sample; container + refusals hold") {
    import graft.operators.Wav
    // the expansions themselves, against the JDK's converters over ALL
    // 256 codes: encode a WAV whose data is exactly the byte ramp, let
    // javax.sound convert to linear 16-bit PCM, compare
    for (aLaw <- Seq(false, true)) {
      val name = if (aLaw) "A-law" else "mu-law"
      // ramp of all 256 codes via the generative formula: seed 0,
      // code(i) = 31 i mod 256 covers all residues (gcd(31, 256) = 1)
      val n = 256
      val bytes = Wav.encodeG711(n, 8000, 0L, aLaw)
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val enc = ais.getFormat.getEncoding.toString
      assert(enc == (if (aLaw) "ALAW" else "ULAW"),
        s"container must declare $name, got $enc")
      val pcmFmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1,
        true, false)
      val pcm = javax.sound.sampled.AudioSystem
        .getAudioInputStream(pcmFmt, ais).readAllBytes()
      assert(pcm.length == n * 2)
      for (i <- 0 until n) {
        val code = (i * 31) % 256
        val ours = if (aLaw) Wav.alawExpand(code) else Wav.mulawExpand(code)
        val v = (pcm(2 * i) & 0xff) | ((pcm(2 * i + 1) & 0xff) << 8)
        val theirs = if (v >= 0x8000) v - 0x10000 else v
        assert(ours == theirs,
          s"$name code $code: ours $ours != javax.sound $theirs")
      }
      // pcmStats decodes the same container to the expanded stats
      val s = Wav.pcmStats(bytes).getOrElse(fail(s"undecodable $name WAV"))
      var (es, emn, emx) = (0L, Int.MaxValue, Int.MinValue)
      for (i <- 0 until n) {
        val code = (i * 31) % 256
        val v = if (aLaw) Wav.alawExpand(code) else Wav.mulawExpand(code)
        es += v; emn = math.min(emn, v); emx = math.max(emx, v)
      }
      assert((s.sampleRate, s.nSamples, s.sumS, s.minS, s.maxS) ==
        ((8000, n.toLong, es, emn, emx)), s"$name stats drift")
      // full-scale extremes present in the all-codes ramp (the
      // 16-bit-scaled G.711 convention javax.sound also uses)
      if (!aLaw) assert(emn == -32124 && emx == 32124,
        s"mu-law full-scale should be ±32124, got [$emn, $emx]")
      else assert(emn == -32256 && emx == 32256,
        s"A-law full-scale should be ±32256, got [$emn, $emx]")
    }
    // a G.711 container through the 16-bit reader refuses
    assert(Wav.decodePcm16(Wav.encodeG711(100, 8000, 1L, aLaw = false)).isEmpty,
      "G.711 bytes must not be read as 16-bit PCM")
    // odd sample count: word-aligned data chunk still decodes
    assert(Wav.pcmStats(Wav.encodeG711(101, 8000, 2L, aLaw = true))
      .exists(_.nSamples == 101L), "odd-length G.711 data chunk")
    // lying bit depth refuses: G.711 is 8-bit by definition
    val g = Wav.encodeG711(50, 8000, 3L, aLaw = false)
    assert(Wav.pcmStats(g.patch(34, Array[Byte](16, 0), 2)).isEmpty,
      "16-bit mu-law is a malformed container")
  }

  test("Wav.audioFeatures: zero samples never cross; tail windows count; " +
    "energies are exact") {
    import graft.operators.Wav
    // [1,-1,0,-1,1], win 2: crossings at (1,-1) and (-1,1) only — the
    // pairs through zero have product 0, NOT a crossing
    val f = Wav.audioFeatures(Array(1, -1, 0, -1, 1), 2)
    assert(f.zeroCrossings == 2, s"zcr ${f.zeroCrossings}")
    assert(f.nWindows == 3, s"windows ${f.nWindows} (tail must count)")
    assert(f.maxWindowEnergy == 2 && f.totalEnergy == 4,
      s"energies ${f.maxWindowEnergy}/${f.totalEnergy}")
    // full-scale square wave: every adjacent pair crosses; energy exact
    val sq = Array.tabulate(800)(i => if (i % 2 == 0) 32767 else -32768)
    val g = Wav.audioFeatures(sq, 400)
    assert(g.zeroCrossings == 799 && g.nWindows == 2)
    assert(g.totalEnergy ==
      400L * 32767L * 32767L + 400L * 32768L * 32768L)
    intercept[IllegalArgumentException](Wav.audioFeatures(Array.empty, 10))
    intercept[IllegalArgumentException](Wav.audioFeatures(Array(1), 0))
  }

  test("Wav codec: IMA ADPCM block roundtrip follows the state machine " +
    "exactly; block starts are lossless; container refusals hold") {
    import graft.operators.Wav
    for ((n, seed) <- Seq((65, 0L), (137, 42L), (500, 7L), (66, 3L))) {
      val bytes = Wav.encodeImaAdpcm(n, 8000, seed)
      val (rate, got) = Wav.decodeImaAdpcm(bytes).getOrElse(
        fail(s"undecodable ADPCM n=$n seed=$seed"))
      assert(rate == 8000 && got.length == n)
      // reference: run the shared state machine directly (proves the
      // nibble packing, block headers, and fact-bounded tail — the
      // container layer — against the arithmetic layer)
      val want = new Array[Int](n)
      var o = 0
      var b = 0
      while (b * 65 < n) {
        val start = b * 65
        val len = math.min(65, n - start)
        var pred = Wav.sample(start.toLong, seed)
        var idx = 0
        want(o) = pred; o += 1
        for (k <- 1 until len) {
          val c = Wav.imaEncodeStep(pred, idx, Wav.sample((start + k).toLong, seed))
          val st = Wav.imaDecodeStep(pred, idx, c)
          pred = st._1; idx = st._2
          want(o) = pred; o += 1
        }
        b += 1
      }
      assert(got.toSeq == want.toSeq, s"ADPCM decode drift at n=$n seed=$seed")
      // block-start samples ride in the header: LOSSLESS at every block
      for (blk <- 0 until (n + 64) / 65)
        assert(got(blk * 65) == Wav.sample((blk * 65).toLong, seed),
          s"block $blk header sample must be exact")
      // pcmStats reduces the same samples
      val s = Wav.pcmStats(bytes).get
      assert((s.nSamples, s.sumS, s.minS, s.maxS) ==
        ((n.toLong, want.map(_.toLong).sum, want.min, want.max)))
    }
    // the declared RIFF size must match the actual stream (our own walk
    // tolerates a lie here, so pin it explicitly for external readers)
    val good = Wav.encodeImaAdpcm(200, 8000, 1L)
    val riffLen = (good(4) & 0xff) | ((good(5) & 0xff) << 8) |
      ((good(6) & 0xff) << 16) | ((good(7) & 0xff) << 24)
    assert(riffLen == good.length - 8,
      s"declared RIFF size $riffLen != actual ${good.length - 8}")
    // refusals
    assert(Wav.decodeImaAdpcm(good.take(50)).isEmpty, "truncation")
    assert(Wav.decodePcm16(good).isEmpty,
      "ADPCM bytes must not be read as 16-bit PCM")
    // stereo out of scope: patch channel count
    assert(Wav.decodeImaAdpcm(good.patch(22, Array[Byte](2, 0), 2)).isEmpty,
      "stereo ADPCM is refused")
    // lying blockAlign (fmt offset 32) refuses: geometry must cohere
    assert(Wav.decodeImaAdpcm(good.patch(32, Array[Byte](40, 0), 2)).isEmpty,
      "incoherent blockAlign/samplesPerBlock is refused")
    // a corrupt step index (> 88) in a block header refuses
    val dataAt = {
      var i = 12; var at = -1
      while (at < 0) {
        val tpe = new String(good, i, 4, "US-ASCII")
        val len = (good(i + 4) & 0xff) | ((good(i + 5) & 0xff) << 8) |
          ((good(i + 6) & 0xff) << 16) | ((good(i + 7) & 0xff) << 24)
        if (tpe == "data") at = i + 8 else i += 8 + len + (len & 1)
      }
      at
    }
    assert(Wav.decodeImaAdpcm(good.patch(dataAt + 2, Array[Byte](99), 1)).isEmpty,
      "step index beyond the table is refused")
  }

  test("resizeImage: real decode → bilinear → re-encode; identity is " +
      "pixel-exact; refusal on non-PNG") {
    import graft.operators.Png
    val png = Png.encodeRgb(17, 9, 42L)
    // identity dims: center-aligned integer mapping has fx = fy = 0 at
    // every pixel, so the round trip must be byte-exact on the pixels
    val id = Multimodal.resizeImage(png, 17, 9).get
    assert(Png.decodeRgb(id).get._3.toSeq == Png.decodeRgb(png).get._3.toSeq,
      "identity resize must reproduce the source pixels exactly")
    // downscale: output is itself a valid PNG with the target dims
    val down = Multimodal.resizeImage(png, 5, 3).get
    val (dw, dh, _) = Png.decodeRgb(down).get
    assert((dw, dh) == (5, 3))
    // upscale of a constant image stays constant (edge clamp + blending
    // of equal taps can produce nothing else)
    val const = Png.encodeRgbPixels(2, 2, Array.fill[Byte](12)(77))
    val up = Png.decodeRgb(Multimodal.resizeImage(const, 7, 5).get).get._3
    assert(up.forall(_ == 77), "constant image must resize to itself")
    // deterministic
    assert(Multimodal.resizeImage(png, 5, 3).get.toSeq == down.toSeq)
    // refusal: not a PNG → None (refuse, don't guess)
    assert(Multimodal.resizeImage("not a png".getBytes, 4, 4).isEmpty)
    assert(Multimodal.resizeImage(null, 4, 4).isEmpty)
  }

  test("resizeImage: ImageIO independently decodes the resized PNG and " +
      "agrees with the bilinear kernel's pixels") {
    import graft.operators.Png
    val png = Png.encodeRgb(31, 23, 7L)
    val resized = Multimodal.resizeImage(png, 12, 8).get
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(resized))
    assert(img.getWidth == 12 && img.getHeight == 8)
    val expect = Png.bilinear(Png.decodeRgb(png).get._3, 31, 23, 12, 8)
    for (y <- 0 until 8; x <- 0 until 12) {
      val rgb = img.getRGB(x, y)
      val o = (y * 12 + x) * 3
      assert(((rgb >> 16) & 0xff) == (expect(o) & 0xff), s"R at ($x,$y)")
      assert(((rgb >> 8) & 0xff) == (expect(o + 1) & 0xff), s"G at ($x,$y)")
      assert((rgb & 0xff) == (expect(o + 2) & 0xff), s"B at ($x,$y)")
    }
  }

  test("resamplePcm16: identity is sample-exact; constant invariance; " +
    "javax.sound decodes the output; mono-only refusal") {
    import graft.operators.Wav
    val wav = Wav.encodePcm16(500, 16000, 42L)
    val (_, _, src0) = Wav.decodePcm16(wav).get
    // identity outN: center-aligned mapping has f = 0 at every sample
    val id = Wav.resamplePcm16(wav, 500, 16000).get
    assert(Wav.decodePcm16(id).get._3.toSeq == src0.toSeq,
      "identity resample must reproduce the samples exactly")
    // constant signal resamples to itself at any length
    val const = Wav.encodePcm16Samples(Array.fill(100)(1234), 16000)
    val up = Wav.decodePcm16(Wav.resamplePcm16(const, 333, 8000).get).get._3
    assert(up.forall(_ == 1234), "constant signal must resample to itself")
    // downsample: deterministic, right length, right header rate
    val down = Wav.resamplePcm16(wav, 123, 8000).get
    val st = Wav.pcmStats(down).get
    assert(st.nSamples == 123 && st.sampleRate == 8000 && st.channels == 1)
    assert(Wav.resamplePcm16(wav, 123, 8000).get.toSeq == down.toSeq)
    // javax.sound as the independent container check
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(down))
    assert(ais.getFormat.getSampleRate == 8000f &&
      ais.getFormat.getChannels == 1)
    // stereo is refused (mono-only scope): patch the fmt channel count
    val stereo = wav.clone()
    stereo(22) = 2 // fmt channels (LE lo byte)
    assert(Wav.resamplePcm16(stereo, 100, 8000).isEmpty,
      "multi-channel resample must refuse, not interleave wrongly")
    // out-of-range sample values are rejected by the buffer encoder
    val bad = intercept[IllegalArgumentException] {
      Wav.encodePcm16Samples(Array(70000), 8000)
    }
    assert(bad.getMessage.contains("range"))
  }
}
