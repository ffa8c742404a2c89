package graft

import graft.core.Tables
import graft.operators.Multimodal

/** Multimodal catalog entry: binary-payload plumbing exercised end to end
  * (documents → media table → partition-wise stub decode → rollup). The
  * oracle recomputes byte_len/checksum from the text in SQL — exact
  * integers, so the compare validates the whole binary path including the
  * UTF-8 encode.
  *
  * The mirror is BYTE-true, not character-true: `octet_length(encode())`
  * counts UTF-8 bytes, and the checksum expands each code point to its
  * UTF-8 byte SUM arithmetically (1–4 bytes: the continuation/lead-byte
  * constants collapse to 320/480/624 plus the code point's base-64
  * digits) — so the compare stays exact even for multi-byte text, where
  * the previous `length`/`ascii` mirror would diverge. */
object MultimodalQueries {

  private val utf8ByteSum: String =
    """CASE
      |  WHEN ascii(c) < 128 THEN ascii(c)
      |  WHEN ascii(c) < 2048 THEN 320 + ascii(c) // 64 + ascii(c) % 64
      |  WHEN ascii(c) < 65536
      |    THEN 480 + ascii(c) // 4096 + (ascii(c) // 64) % 64 + ascii(c) % 64
      |  ELSE 624 + ascii(c) // 262144 + (ascii(c) // 4096) % 64
      |       + (ascii(c) // 64) % 64 + ascii(c) % 64
      |END""".stripMargin

  /** The round-5 columns additionally verify the REAL PNG header parse:
    * image rows carry a genuine 33-byte signature+IHDR prefix whose
    * dimensions derive from doc_id, so the oracle re-computes the
    * expected decoded width/height (and the header's byte/checksum
    * contribution: fixed-part sum 747 + w + h, since both dims fit one
    * byte) arithmetically — a wrong parse offsets n_decoded/total_w/
    * total_h AND the checksums. */
  val qModalityStats = QueryDef("q_multimodal_stats",
    (spark, dir) => Multimodal.modalityStats(
      spark, Multimodal.fromDocuments(Tables.documents(spark, dir))),
    Some(s"""SELECT modality, CAST(count(*) AS BIGINT) AS n,
            |       CAST(sum(tb + hdr_len) AS BIGINT) AS total_bytes,
            |       CAST(sum(ts + hdr_sum) AS BIGINT) AS total_checksum,
            |       CAST(count(w) AS BIGINT) AS n_decoded,
            |       CAST(sum(w) AS BIGINT) AS total_w,
            |       CAST(sum(h) AS BIGINT) AS total_h
            |FROM (SELECT
            |        CASE CAST(doc_id % 3 AS INT)
            |          WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video'
            |        END AS modality,
            |        COALESCE(octet_length(encode(text)), 0) AS tb,
            |        COALESCE(list_sum(list_apply(string_split_regex(text, ''),
            |                                     c -> $utf8ByteSum)), 0) AS ts,
            |        CASE WHEN doc_id % 3 = 0 AND text IS NOT NULL
            |             THEN ${Multimodal.PngHeaderLen} ELSE 0 END AS hdr_len,
            |        CASE WHEN doc_id % 3 = 0 AND text IS NOT NULL
            |             THEN ${Multimodal.PngHeaderFixedByteSum}
            |                  + (doc_id % 240 + 16) + ((doc_id * 7) % 240 + 16)
            |             ELSE 0 END AS hdr_sum,
            |        CASE WHEN doc_id % 3 = 0 AND text IS NOT NULL
            |             THEN doc_id % 240 + 16 END AS w,
            |        CASE WHEN doc_id % 3 = 0 AND text IS NOT NULL
            |             THEN (doc_id * 7) % 240 + 16 END AS h
            |      FROM documents)
            |GROUP BY modality ORDER BY modality""".stripMargin))

  /** REAL pixel decode, end to end ([[graft.operators.Png]]): each image
    * row becomes a COMPLETE valid PNG (zlib-deflated scanlines whose
    * per-row filters cycle through all five PNG filter types, real
    * CRC32 chunks) of the deterministic generative image, then the
    * decoder inflates, reconstructs every filter, and reduces the
    * DECODED pixels to channel sums. The oracle recomputes the same
    * sums from the generative formula relationally — it never sees a
    * PNG byte — so agreement proves the entire
    * deflate → inflate → unfilter chain lossless on every image. Both
    * synth and decode run partition-wise (the mapPartitions decoder
    * contract of [[Multimodal.extractFeatures]]); only per-image stats
    * cross stage boundaries. A spec additionally cross-decodes with JDK
    * ImageIO as an independent reference decoder. */
  val qPngDecode = QueryDef("q_png_pixel_decode",
    (spark, dir) => {
      import spark.implicits._
      import org.apache.spark.sql.functions._
      val dims = Tables.documents(spark, dir)
        .filter(pmod(col("doc_id"), lit(3)) === 0) // the image-modality ids
        .select(col("doc_id").as("media_id"),
          Multimodal.pngWidth(col("doc_id")).as("w"),
          Multimodal.pngHeight(col("doc_id")).as("h"))
        // codec parallelism follows MEDIA COUNT, not input bytes — the
        // id-scale dims scan is one small-file partition (SCALE.md r13)
        .repartition(spark.sparkContext.defaultParallelism, col("media_id"))
        .as[(Long, Int, Int)]
      val media = dims.mapPartitions(_.map { case (id, w, h) =>
        // both scanline layouts on real data: even ids Adam7-interlaced,
        // odd sequential — the decoder must reconstruct both (the GIF
        // entry's alternating-interlace pattern)
        (id, graft.operators.Png.encodeRgb(w, h, id,
          interlaced = id % 2 == 0))
      }).toDF("media_id", "content")
      media.as[(Long, Array[Byte])].mapPartitions(_.map { case (id, bytes) =>
        val s = graft.operators.Png.pixelStats(bytes).getOrElse(
          sys.error(s"undecodable synthesized PNG for media_id=$id"))
        (id, s.width, s.height, s.nPx, s.sumR, s.sumG, s.sumB)
      }).toDF("media_id", "width", "height", "n_px", "sum_r", "sum_g", "sum_b")
        .orderBy("media_id")
    },
    Some("""WITH dims AS (
           |  SELECT doc_id AS media_id,
           |         CAST((doc_id % 240) + 16 AS INT) AS width,
           |         CAST(((doc_id * 7) % 240) + 16 AS INT) AS height
           |  FROM documents WHERE doc_id % 3 = 0
           |), px AS (
           |  SELECT media_id, width, height,
           |         unnest(generate_series(0, CAST(width AS BIGINT) * height - 1)) AS p
           |  FROM dims
           |), t AS (
           |  SELECT media_id, width, height, p % width AS x, p // width AS y
           |  FROM px
           |)
           |SELECT media_id, width, height,
           |       CAST(count(*) AS BIGINT) AS n_px,
           |       CAST(sum((x*7 + y*13 + media_id) % 256) AS BIGINT) AS sum_r,
           |       CAST(sum((x*11 + y*3 + 2*media_id) % 256) AS BIGINT) AS sum_g,
           |       CAST(sum((x*5 + y*17 + 3*media_id) % 256) AS BIGINT) AS sum_b
           |FROM t GROUP BY media_id, width, height
           |ORDER BY media_id""".stripMargin))

  /** REAL pixel RESIZE, end to end ([[graft.operators.Png.resizeRgb]]):
    * every image doc is synthesized as a full PNG, decoded, resampled
    * to 24×18 with the EXACT-INTEGER bilinear kernel (center-aligned,
    * edge-clamped, floor-divided — specified in integer arithmetic
    * precisely so this oracle exists), re-encoded as a new PNG, and
    * decoded AGAIN for channel sums — so one hash match proves the
    * whole decode → resample → re-encode → decode chain. The oracle
    * re-derives every output pixel relationally from the generative
    * formula: source taps x0/x1/y0/y1 and fractions fx/fy come from
    * the same integer mapping (numX = (2·ox+1)·w − outW over
    * denominator 2·outW, negative ⇒ edge clamp), and the blended value
    * is the same single floor division — integers end to end, nothing
    * to drift. Min source dims (16×16) are SMALLER than 24×18, so both
    * the upscale clamp path and downscale averaging are exercised on
    * real catalog data. */
  val qPngResize = QueryDef("q_png_resize",
    (spark, dir) => {
      import spark.implicits._
      import org.apache.spark.sql.functions._
      val dims = Tables.documents(spark, dir)
        .filter(pmod(col("doc_id"), lit(3)) === 0) // the image-modality ids
        .select(col("doc_id").as("media_id"),
          Multimodal.pngWidth(col("doc_id")).as("w"),
          Multimodal.pngHeight(col("doc_id")).as("h"))
        // codec parallelism follows MEDIA COUNT, not input bytes — the
        // id-scale dims scan is one small-file partition (SCALE.md r13)
        .repartition(spark.sparkContext.defaultParallelism, col("media_id"))
        .as[(Long, Int, Int)]
      dims.mapPartitions(_.map { case (id, w, h) =>
        val png = graft.operators.Png.encodeRgb(w, h, id)
        val resized = graft.operators.Png.resizeRgb(png, 24, 18).getOrElse(
          sys.error(s"unresizable synthesized PNG for media_id=$id"))
        val s = graft.operators.Png.pixelStats(resized).getOrElse(
          sys.error(s"undecodable resized PNG for media_id=$id"))
        (id, s.width, s.height, s.nPx, s.sumR, s.sumG, s.sumB)
      }).toDF("media_id", "width", "height", "n_px", "sum_r", "sum_g", "sum_b")
        .orderBy("media_id")
    },
    Some("""WITH dims AS (
           |  SELECT doc_id AS media_id,
           |         CAST((doc_id % 240) + 16 AS BIGINT) AS w,
           |         CAST(((doc_id * 7) % 240) + 16 AS BIGINT) AS h
           |  FROM documents WHERE doc_id % 3 = 0
           |), grid AS (
           |  SELECT media_id, w, h, p % 24 AS ox, p // 24 AS oy
           |  FROM (SELECT media_id, w, h,
           |          unnest(generate_series(0, 24 * 18 - 1)) AS p
           |        FROM dims)
           |), c AS (
           |  SELECT media_id, w, h,
           |    CASE WHEN (2*ox+1)*w - 24 < 0 THEN 0
           |         ELSE ((2*ox+1)*w - 24) // 48 END AS x0,
           |    CASE WHEN (2*ox+1)*w - 24 < 0 THEN 0
           |         ELSE ((2*ox+1)*w - 24) % 48 END AS fx,
           |    CASE WHEN (2*oy+1)*h - 18 < 0 THEN 0
           |         ELSE ((2*oy+1)*h - 18) // 36 END AS y0,
           |    CASE WHEN (2*oy+1)*h - 18 < 0 THEN 0
           |         ELSE ((2*oy+1)*h - 18) % 36 END AS fy
           |  FROM grid
           |), d AS (
           |  SELECT media_id, x0, fx, y0, fy,
           |         LEAST(x0 + 1, w - 1) AS x1, LEAST(y0 + 1, h - 1) AS y1
           |  FROM c
           |), v AS (
           |  SELECT media_id,
           |    ((36-fy)*((48-fx)*((x0*7 + y0*13 + media_id) % 256)
           |              + fx*((x1*7 + y0*13 + media_id) % 256))
           |     + fy*((48-fx)*((x0*7 + y1*13 + media_id) % 256)
           |           + fx*((x1*7 + y1*13 + media_id) % 256))) // 1728 AS r,
           |    ((36-fy)*((48-fx)*((x0*11 + y0*3 + 2*media_id) % 256)
           |              + fx*((x1*11 + y0*3 + 2*media_id) % 256))
           |     + fy*((48-fx)*((x0*11 + y1*3 + 2*media_id) % 256)
           |           + fx*((x1*11 + y1*3 + 2*media_id) % 256))) // 1728 AS g,
           |    ((36-fy)*((48-fx)*((x0*5 + y0*17 + 3*media_id) % 256)
           |              + fx*((x1*5 + y0*17 + 3*media_id) % 256))
           |     + fy*((48-fx)*((x0*5 + y1*17 + 3*media_id) % 256)
           |           + fx*((x1*5 + y1*17 + 3*media_id) % 256))) // 1728 AS b
           |  FROM d
           |)
           |SELECT media_id, CAST(24 AS INT) AS width, CAST(18 AS INT) AS height,
           |       CAST(count(*) AS BIGINT) AS n_px,
           |       CAST(sum(r) AS BIGINT) AS sum_r,
           |       CAST(sum(g) AS BIGINT) AS sum_g,
           |       CAST(sum(b) AS BIGINT) AS sum_b
           |FROM v GROUP BY media_id ORDER BY media_id""".stripMargin))

  /** REAL BMP pixel decode, end to end ([[graft.operators.Bmp]]) —
    * completing the crawl image-format trio. Each image doc becomes a
    * complete 24-bit bottom-up BMP of the SAME generative image as
    * [[qPngDecode]] (one ground truth, three container formats), so the
    * oracle SQL is byte-identical to the PNG entry's — and a flipped
    * row order, swapped BGR channel, or mis-padded stride breaks the
    * hash. The format details on the hook are exactly the ones decoders
    * routinely fumble: little-endian fields, BGR order, 4-byte row
    * padding, bottom-up layout, free-positioned pixel array. */
  val qBmpDecode = QueryDef("q_bmp_pixel_decode",
    (spark, dir) => {
      import spark.implicits._
      import org.apache.spark.sql.functions._
      val dims = Tables.documents(spark, dir)
        .filter(pmod(col("doc_id"), lit(3)) === 0) // the image-modality ids
        .select(col("doc_id").as("media_id"),
          Multimodal.pngWidth(col("doc_id")).as("w"),
          Multimodal.pngHeight(col("doc_id")).as("h"))
        // codec parallelism follows MEDIA COUNT, not input bytes — the
        // id-scale dims scan is one small-file partition (SCALE.md r13)
        .repartition(spark.sparkContext.defaultParallelism, col("media_id"))
        .as[(Long, Int, Int)]
      dims.mapPartitions(_.map { case (id, w, h) =>
        val s = graft.operators.Bmp.pixelStats(
          graft.operators.Bmp.encodeRgb(w, h, id)).getOrElse(
          sys.error(s"undecodable synthesized BMP for media_id=$id"))
        (id, s.width, s.height, s.nPx, s.sumR, s.sumG, s.sumB)
      }).toDF("media_id", "width", "height", "n_px", "sum_r", "sum_g", "sum_b")
        .orderBy("media_id")
    },
    // identical mirror to q_png_pixel_decode: same generative truth,
    // different container — the two codecs corroborate each other
    Some("""WITH dims AS (
           |  SELECT doc_id AS media_id,
           |         CAST((doc_id % 240) + 16 AS INT) AS width,
           |         CAST(((doc_id * 7) % 240) + 16 AS INT) AS height
           |  FROM documents WHERE doc_id % 3 = 0
           |), px AS (
           |  SELECT media_id, width, height,
           |         unnest(generate_series(0, CAST(width AS BIGINT) * height - 1)) AS p
           |  FROM dims
           |), t AS (
           |  SELECT media_id, width, height, p % width AS x, p // width AS y
           |  FROM px
           |)
           |SELECT media_id, width, height,
           |       CAST(count(*) AS BIGINT) AS n_px,
           |       CAST(sum((x*7 + y*13 + media_id) % 256) AS BIGINT) AS sum_r,
           |       CAST(sum((x*11 + y*3 + 2*media_id) % 256) AS BIGINT) AS sum_g,
           |       CAST(sum((x*5 + y*17 + 3*media_id) % 256) AS BIGINT) AS sum_b
           |FROM t GROUP BY media_id, width, height
           |ORDER BY media_id""".stripMargin))

  /** REAL GIF pixel decode, end to end ([[graft.operators.Gif]]) —
    * the LZW member completing the image family. Each image doc becomes
    * a GIF89a of the generative GRAYSCALE image (palette index i = gray
    * i, so indices ARE sample values), through a REAL compressing LZW
    * encoder — dictionary growth, 9→12-bit width transitions, CLEAR at
    * table overflow — and the decoder reconstructs the dictionary
    * (including the self-referential code case) to get every index
    * back. GIF is lossless, so the oracle is a straight formula
    * re-derivation; the sum_gray column matches the JPEG entry's
    * pixel formula at per-PIXEL grain (vs JPEG's per-block), so the
    * two lossy-vs-lossless paths are deliberately distinguishable. */
  val qGifDecode = QueryDef("q_gif_pixel_decode",
    (spark, dir) => {
      import spark.implicits._
      import org.apache.spark.sql.functions._
      val dims = Tables.documents(spark, dir)
        .filter(pmod(col("doc_id"), lit(3)) === 0) // the image-modality ids
        .select(col("doc_id").as("media_id"),
          Multimodal.pngWidth(col("doc_id")).as("w"),
          Multimodal.pngHeight(col("doc_id")).as("h"))
        // codec parallelism follows MEDIA COUNT, not input bytes — the
        // id-scale dims scan is one small-file partition (SCALE.md r13)
        .repartition(spark.sparkContext.defaultParallelism, col("media_id"))
        .as[(Long, Int, Int)]
      dims.mapPartitions(_.map { case (id, w, h) =>
        val bytes = graft.operators.Gif.encodeGray(w, h,
          (x, y) => graft.operators.Png.pixelR(x, y, id),
          interlaced = id % 2 == 0) // both row orders on real data
        val s = graft.operators.Gif.pixelStats(bytes).getOrElse(
          sys.error(s"undecodable synthesized GIF for media_id=$id"))
        (id, s.width, s.height, s.nPx, s.sumR)
      }).toDF("media_id", "width", "height", "n_px", "sum_gray")
        .orderBy("media_id")
    },
    Some("""WITH dims AS (
           |  SELECT doc_id AS media_id,
           |         CAST((doc_id % 240) + 16 AS INT) AS width,
           |         CAST(((doc_id * 7) % 240) + 16 AS INT) AS height
           |  FROM documents WHERE doc_id % 3 = 0
           |), px AS (
           |  SELECT media_id, width, height,
           |         unnest(generate_series(0, CAST(width AS BIGINT) * height - 1)) AS p
           |  FROM dims
           |), t AS (
           |  SELECT media_id, width, height, p % width AS x, p // width AS y
           |  FROM px
           |)
           |SELECT media_id, width, height,
           |       CAST(count(*) AS BIGINT) AS n_px,
           |       CAST(sum((x*7 + y*13 + media_id) % 256) AS BIGINT) AS sum_gray
           |FROM t GROUP BY media_id, width, height
           |ORDER BY media_id""".stripMargin))

  /** REAL baseline-JPEG pixel decode, end to end
    * ([[graft.operators.Jpeg]]) — the lossy-codec member of the
    * real-codec family, on the most common crawl image format. Each
    * image doc becomes a complete baseline grayscale JFIF (real
    * canonical huffman tables, DC prediction, AC EOBs, byte stuffing,
    * quantization, IDCT) whose 8×8 blocks are CONSTANT, which makes the
    * lossy pipeline bit-exact (DC-only spectra with the DC quantizer
    * pinned to 8 — see the Jpeg scaladoc), so a hash oracle exists for
    * a codec that normally admits only tolerance checks: DuckDB
    * recomputes the decoded sums from the block-level generative
    * formula without touching a JPEG byte. The full huffman → dequant →
    * IDCT chain is on the hook — a one-bit table error scrambles every
    * DC difference (exactly the bug the spec's shifted-BITS test
    * caught). ImageIO cross-decodes both our encoder's output and
    * arbitrary ImageIO-encoded JPEGs in JpegSpec. */
  val qJpegDecode = QueryDef("q_jpeg_pixel_decode",
    (spark, dir) => {
      import spark.implicits._
      import org.apache.spark.sql.functions._
      val dims = Tables.documents(spark, dir)
        .filter(pmod(col("doc_id"), lit(3)) === 0) // the image-modality ids
        .select(col("doc_id").as("media_id"),
          Multimodal.pngWidth(col("doc_id")).as("w"),
          Multimodal.pngHeight(col("doc_id")).as("h"))
        // codec parallelism follows MEDIA COUNT, not input bytes — the
        // id-scale dims scan is one small-file partition (SCALE.md r13)
        .repartition(spark.sparkContext.defaultParallelism, col("media_id"))
        .as[(Long, Int, Int)]
      dims.mapPartitions(_.map { case (id, w, h) =>
        val bytes = graft.operators.Jpeg.encodeGrayBlocks(w, h,
          (bx, by) => (((bx * 7L + by * 13L + id) % 256L + 256L) % 256L).toInt)
        val s = graft.operators.Jpeg.pixelStats(bytes).getOrElse(
          sys.error(s"undecodable synthesized JPEG for media_id=$id"))
        (id, s.width, s.height, s.nPx, s.sumG)
      }).toDF("media_id", "width", "height", "n_px", "sum_gray")
        .orderBy("media_id")
    },
    Some("""WITH dims AS (
           |  SELECT doc_id AS media_id,
           |         CAST((doc_id % 240) + 16 AS BIGINT) AS width,
           |         CAST(((doc_id * 7) % 240) + 16 AS BIGINT) AS height
           |  FROM documents WHERE doc_id % 3 = 0
           |), px AS (
           |  SELECT media_id, width, height,
           |         unnest(generate_series(0, width * height - 1)) AS p
           |  FROM dims
           |), t AS (
           |  SELECT media_id, width, height,
           |         (p % width) // 8 AS bx, (p // width) // 8 AS by
           |  FROM px
           |)
           |SELECT media_id, CAST(width AS INT) AS width,
           |       CAST(height AS INT) AS height,
           |       CAST(count(*) AS BIGINT) AS n_px,
           |       CAST(sum((bx * 7 + by * 13 + media_id) % 256) AS BIGINT)
           |         AS sum_gray
           |FROM t GROUP BY media_id, width, height
           |ORDER BY media_id""".stripMargin))

  /** REAL PROGRESSIVE JPEG decode, end to end — the other JPEG mode
    * real crawls contain in volume (SOF2 multi-scan: spectral selection
    * + successive approximation). Same generative pixels and oracle as
    * [[qJpegDecode]], but the bytes go through
    * [[graft.operators.Jpeg.encodeGrayProgressiveBlocks]]'s REAL
    * three-scan progression — DC first at Al=1, DC bit-refinement at
    * Al=0, and an AC scan coded entirely as EOB RUNS — so the
    * cross-scan coefficient accumulation, the successive-approximation
    * bit assembly ((dc>>1<<1)|(dc&1) = dc), and the EOB-run machinery
    * are all under the hash gate; the full Annex G feature set (banded
    * AC firsts, AC refinement correction bits, interleaved DC) is
    * cross-decoded against ImageIO's progressive writer in
    * [[graft.JpegSpec]]. A dropped refinement bit, a mis-counted EOB
    * run, or a scan applied to the wrong band breaks the hash. */
  val qJpegProgressiveDecode = QueryDef("q_jpeg_progressive_decode",
    (spark, dir) => {
      import spark.implicits._
      import org.apache.spark.sql.functions._
      val dims = Tables.documents(spark, dir)
        .filter(pmod(col("doc_id"), lit(3)) === 0) // the image-modality ids
        .select(col("doc_id").as("media_id"),
          Multimodal.pngWidth(col("doc_id")).as("w"),
          Multimodal.pngHeight(col("doc_id")).as("h"))
        // codec parallelism follows MEDIA COUNT, not input bytes — the
        // id-scale dims scan is one small-file partition (SCALE.md r13)
        .repartition(spark.sparkContext.defaultParallelism, col("media_id"))
        .as[(Long, Int, Int)]
      dims.mapPartitions(_.map { case (id, w, h) =>
        val bytes = graft.operators.Jpeg.encodeGrayProgressiveBlocks(w, h,
          (bx, by) => (((bx * 7L + by * 13L + id) % 256L + 256L) % 256L).toInt)
        val s = graft.operators.Jpeg.pixelStats(bytes).getOrElse(
          sys.error(s"undecodable synthesized progressive JPEG for media_id=$id"))
        (id, s.width, s.height, s.nPx, s.sumG)
      }).toDF("media_id", "width", "height", "n_px", "sum_gray")
        .orderBy("media_id")
    },
    Some("""WITH dims AS (
           |  SELECT doc_id AS media_id,
           |         CAST((doc_id % 240) + 16 AS BIGINT) AS width,
           |         CAST(((doc_id * 7) % 240) + 16 AS BIGINT) AS height
           |  FROM documents WHERE doc_id % 3 = 0
           |), px AS (
           |  SELECT media_id, width, height,
           |         unnest(generate_series(0, width * height - 1)) AS p
           |  FROM dims
           |), t AS (
           |  SELECT media_id, width, height,
           |         (p % width) // 8 AS bx, (p // width) // 8 AS by
           |  FROM px
           |)
           |SELECT media_id, CAST(width AS INT) AS width,
           |       CAST(height AS INT) AS height,
           |       CAST(count(*) AS BIGINT) AS n_px,
           |       CAST(sum((bx * 7 + by * 13 + media_id) % 256) AS BIGINT)
           |         AS sum_gray
           |FROM t GROUP BY media_id, width, height
           |ORDER BY media_id""".stripMargin))

  /** REAL baseline COLOR JPEG decode, end to end
    * ([[graft.operators.Jpeg.decodeRgb]]) — the most common crawl image
    * format in its most common FORM: 3-component YCbCr, interleaved
    * scan, standard luma+chroma huffman tables, with BOTH samplings on
    * real catalog data (even ids 4:4:4, odd ids 4:2:0 — so the MCU
    * interleave, per-component DC predictors, chroma-plane assembly,
    * and subsampled upsampling path are all under the hash gate).
    * Exactness: constant component blocks are DC-only spectra (quant
    * 8), chroma constant per chroma block makes upsampling exact, and
    * the YCbCr→RGB transform is pinned to integer 16.16 fixed point —
    * so DuckDB re-derives every RGB channel sum from the generative
    * formulas plus the same floor arithmetic, no JPEG bytes involved.
    * A one-bit error in any chroma table, a swapped Cb/Cr plane, a
    * mis-ordered MCU, or an off-by-one in the fixed-point rounding
    * breaks the hash. */
  val qJpegColorDecode = QueryDef("q_jpeg_color_decode",
    (spark, dir) => {
      import spark.implicits._
      import org.apache.spark.sql.functions._
      val dims = Tables.documents(spark, dir)
        .filter(pmod(col("doc_id"), lit(3)) === 0) // the image-modality ids
        .select(col("doc_id").as("media_id"),
          Multimodal.pngWidth(col("doc_id")).as("w"),
          Multimodal.pngHeight(col("doc_id")).as("h"))
        // codec parallelism follows MEDIA COUNT, not input bytes — the
        // id-scale dims scan is one small-file partition (SCALE.md r13)
        .repartition(spark.sparkContext.defaultParallelism, col("media_id"))
        .as[(Long, Int, Int)]
      dims.mapPartitions(_.map { case (id, w, h) =>
        val sampling = if (id % 2 == 0) 0x11 else 0x22
        val bytes = graft.operators.Jpeg.encodeColorBlocks(w, h,
          (bx, by) => (((bx * 7L + by * 13L + id) % 256L + 256L) % 256L).toInt,
          (cx, cy) => (((cx * 11L + cy * 3L + 2 * id) % 256L + 256L) % 256L).toInt,
          (cx, cy) => (((cx * 5L + cy * 17L + 3 * id) % 256L + 256L) % 256L).toInt,
          sampling)
        val s = graft.operators.Jpeg.pixelStatsColor(bytes).getOrElse(
          sys.error(s"undecodable synthesized color JPEG for media_id=$id"))
        (id, s.width, s.height, s.nPx, s.sumR, s.sumG, s.sumB)
      }).toDF("media_id", "width", "height", "n_px", "sum_r", "sum_g", "sum_b")
        .orderBy("media_id")
    },
    Some("""WITH dims AS (
           |  SELECT doc_id AS media_id,
           |         CAST((doc_id % 240) + 16 AS BIGINT) AS width,
           |         CAST(((doc_id * 7) % 240) + 16 AS BIGINT) AS height
           |  FROM documents WHERE doc_id % 3 = 0
           |), px AS (
           |  SELECT media_id, width, height,
           |         unnest(generate_series(0, width * height - 1)) AS p
           |  FROM dims
           |), t AS (
           |  SELECT media_id, width, height,
           |         (p % width) // 8 AS bx, (p // width) // 8 AS by,
           |         CASE WHEN media_id % 2 = 0 THEN (p % width) // 8
           |              ELSE (p % width) // 16 END AS cx,
           |         CASE WHEN media_id % 2 = 0 THEN (p // width) // 8
           |              ELSE (p // width) // 16 END AS cy
           |  FROM px
           |), v AS (
           |  SELECT media_id, width, height,
           |         (bx * 7 + by * 13 + media_id) % 256 AS yv,
           |         (cx * 11 + cy * 3 + 2 * media_id) % 256 - 128 AS cb,
           |         (cx * 5 + cy * 17 + 3 * media_id) % 256 - 128 AS cr
           |  FROM t
           |), rgb AS (
           |  SELECT media_id, width, height,
           |    LEAST(255, GREATEST(0, yv + CAST(floor(
           |      (91881 * cr + 32768) / 65536.0) AS BIGINT))) AS r,
           |    LEAST(255, GREATEST(0, yv - CAST(floor(
           |      (22554 * cb + 46802 * cr + 32768) / 65536.0) AS BIGINT))) AS g,
           |    LEAST(255, GREATEST(0, yv + CAST(floor(
           |      (116130 * cb + 32768) / 65536.0) AS BIGINT))) AS b
           |  FROM v
           |)
           |SELECT media_id, CAST(width AS INT) AS width,
           |       CAST(height AS INT) AS height,
           |       CAST(count(*) AS BIGINT) AS n_px,
           |       CAST(sum(r) AS BIGINT) AS sum_r,
           |       CAST(sum(g) AS BIGINT) AS sum_g,
           |       CAST(sum(b) AS BIGINT) AS sum_b
           |FROM rgb GROUP BY media_id, width, height
           |ORDER BY media_id""".stripMargin))

  /** REAL PCM decode, end to end ([[graft.operators.Wav]]) — the audio
    * sibling of [[qPngDecode]]: each audio-modality doc becomes a
    * complete valid mono 16-bit PCM WAV of the generative signal, the
    * decoder walks the RIFF container and extracts the actual signed
    * samples, and the oracle recomputes count/sum/min/max from the
    * formula relationally — container layout, byte order, and sample
    * width are all on the hook. Partition-wise synth and decode, stats
    * only across stages; `javax.sound.sampled` cross-decodes in the
    * spec. */
  val qWavDecode = QueryDef("q_wav_pcm_decode",
    (spark, dir) => {
      import spark.implicits._
      import org.apache.spark.sql.functions._
      val dims = Tables.documents(spark, dir)
        .filter(pmod(col("doc_id"), lit(3)) === 1) // the audio-modality ids
        .select(col("doc_id").as("media_id"),
          (pmod(col("doc_id"), lit(4000)) + 500).cast("int").as("n"))
        // codec parallelism follows MEDIA COUNT, not input bytes — the
        // id-scale dims scan is one small-file partition (SCALE.md r13)
        .repartition(spark.sparkContext.defaultParallelism, col("media_id"))
        .as[(Long, Int)]
      val media = dims.mapPartitions(_.map { case (id, n) =>
        (id, graft.operators.Wav.encodePcm16(n, 16000, id))
      }).toDF("media_id", "content")
      media.as[(Long, Array[Byte])].mapPartitions(_.map { case (id, bytes) =>
        val s = graft.operators.Wav.pcmStats(bytes).getOrElse(
          sys.error(s"undecodable synthesized WAV for media_id=$id"))
        (id, s.sampleRate, s.nSamples, s.sumS, s.minS.toLong, s.maxS.toLong)
      }).toDF("media_id", "sample_rate", "n_samples", "sum_s", "min_s", "max_s")
        .orderBy("media_id")
    },
    Some("""WITH dims AS (
           |  SELECT doc_id AS media_id,
           |         CAST((doc_id % 4000) + 500 AS BIGINT) AS n
           |  FROM documents WHERE doc_id % 3 = 1
           |), t AS (
           |  SELECT media_id, n,
           |         (unnest(generate_series(0, n - 1)) * 31337 + media_id)
           |           % 65536 - 32768 AS s
           |  FROM dims
           |)
           |SELECT media_id, CAST(16000 AS INT) AS sample_rate,
           |       CAST(count(*) AS BIGINT) AS n_samples,
           |       CAST(sum(s) AS BIGINT) AS sum_s,
           |       CAST(min(s) AS BIGINT) AS min_s,
           |       CAST(max(s) AS BIGINT) AS max_s
           |FROM t GROUP BY media_id ORDER BY media_id""".stripMargin))

  /** REAL audio resample, end to end
    * ([[graft.operators.Wav.resamplePcm16]]) — the audio sibling of
    * [[qPngResize]], same exact-integer kernel family: each audio doc's
    * generative WAV is decoded, linearly resampled to a fixed 777
    * samples at 8 kHz (center-aligned integer mapping, edge clamp, one
    * floor division on shifted-unsigned values), re-encoded as a new
    * WAV, and decoded AGAIN for stats — one hash match covers
    * decode → resample → re-encode → decode. The oracle re-derives
    * every output sample from the generative formula with the same
    * integer ops; downsampling AND upsampling both occur on real
    * catalog data (source lengths 500–4499 straddle 777). */
  val qWavResample = QueryDef("q_wav_resample",
    (spark, dir) => {
      import spark.implicits._
      import org.apache.spark.sql.functions._
      val dims = Tables.documents(spark, dir)
        .filter(pmod(col("doc_id"), lit(3)) === 1) // the audio-modality ids
        .select(col("doc_id").as("media_id"),
          (pmod(col("doc_id"), lit(4000)) + 500).cast("int").as("n"))
        // codec parallelism follows MEDIA COUNT, not input bytes — the
        // id-scale dims scan is one small-file partition (SCALE.md r13)
        .repartition(spark.sparkContext.defaultParallelism, col("media_id"))
        .as[(Long, Int)]
      dims.mapPartitions(_.map { case (id, n) =>
        val wav = graft.operators.Wav.encodePcm16(n, 16000, id)
        val res = graft.operators.Wav.resamplePcm16(wav, 777, 8000)
          .getOrElse(sys.error(s"unresamplable WAV for media_id=$id"))
        val s = graft.operators.Wav.pcmStats(res).getOrElse(
          sys.error(s"undecodable resampled WAV for media_id=$id"))
        (id, s.sampleRate, s.nSamples, s.sumS, s.minS.toLong, s.maxS.toLong)
      }).toDF("media_id", "sample_rate", "n_samples", "sum_s", "min_s", "max_s")
        .orderBy("media_id")
    },
    Some("""WITH dims AS (
           |  SELECT doc_id AS media_id,
           |         CAST((doc_id % 4000) + 500 AS BIGINT) AS n
           |  FROM documents WHERE doc_id % 3 = 1
           |), grid AS (
           |  SELECT media_id, n, unnest(generate_series(0, 776)) AS i
           |  FROM dims
           |), m AS (
           |  SELECT media_id, n, i, (2*i + 1) * n - 777 AS num
           |  FROM grid
           |), c AS (
           |  SELECT media_id, n,
           |    CASE WHEN num < 0 THEN 0 ELSE num // 1554 END AS i0,
           |    CASE WHEN num < 0 THEN 0 ELSE num % 1554 END AS f
           |  FROM m
           |), d AS (
           |  SELECT media_id, i0, f, LEAST(i0 + 1, n - 1) AS i1
           |  FROM c
           |), v AS (
           |  SELECT media_id,
           |    ((1554 - f) * ((i0 * 31337 + media_id) % 65536)
           |     + f * ((i1 * 31337 + media_id) % 65536)) // 1554 - 32768 AS s
           |  FROM d
           |)
           |SELECT media_id, CAST(8000 AS INT) AS sample_rate,
           |       CAST(count(*) AS BIGINT) AS n_samples,
           |       CAST(sum(s) AS BIGINT) AS sum_s,
           |       CAST(min(s) AS BIGINT) AS min_s,
           |       CAST(max(s) AS BIGINT) AS max_s
           |FROM v GROUP BY media_id ORDER BY media_id""".stripMargin))

  /** REAL video demux + frame decode, end to end
    * ([[graft.operators.Avi]]) — the video modality's container stage
    * made genuine (previously `sampleFrames` sliced raw bytes as a
    * demux stand-in). Each video doc becomes a conforming single-stream
    * AVI whose frames are BMPs of the generative images at seed
    * media_id + frame_no; the demuxer walks the actual RIFF/LIST
    * structure (word alignment included) and every extracted frame
    * decodes through the independently-verified BMP codec. The oracle
    * re-derives all per-frame channel sums from the formula — a
    * mis-walked list, swallowed pad byte, or frame-order slip breaks
    * the hash. 1→n fan-out happens INSIDE the partition (flatMap);
    * only per-frame stats cross stage boundaries. */
  /** G.711 companded-audio decode under the hash gate — the telephony
    * codecs (µ-law WAVE format 7 on even media ids, A-law format 6 on
    * odd) beside [[qWavDecode]]'s linear PCM: each audio doc becomes a
    * G.711 WAV of generative CODE bytes, and the decoder must walk the
    * container, pick the right expansion, and apply the exact integer
    * segment/mantissa map ([[graft.operators.Wav.mulawExpand]] /
    * `alawExpand`). The oracle re-derives every expanded sample from
    * the code formula + the closed-form expansions (complement vs XOR
    * 0x55, opposite sign conventions, shifted segments) — one wrong
    * constant, a swapped expansion, or a sign-convention slip breaks
    * min/sum/max. The spec cross-decodes against javax.sound.sampled's
    * independent ULAW/ALAW converters, sample for sample. */
  val qWavG711Decode = QueryDef("q_wav_g711_decode",
    (spark, dir) => {
      import spark.implicits._
      import org.apache.spark.sql.functions._
      val dims = Tables.documents(spark, dir)
        .filter(pmod(col("doc_id"), lit(3)) === 1) // the audio-modality ids
        .select(col("doc_id").as("media_id"),
          (pmod(col("doc_id"), lit(4000)) + 500).cast("int").as("n"))
        // codec parallelism follows MEDIA COUNT, not input bytes — the
        // id-scale dims scan is one small-file partition (SCALE.md r13)
        .repartition(spark.sparkContext.defaultParallelism, col("media_id"))
        .as[(Long, Int)]
      dims.mapPartitions(_.map { case (id, n) =>
        val bytes = graft.operators.Wav.encodeG711(n, 8000, id,
          aLaw = id % 2 == 1)
        val s = graft.operators.Wav.pcmStats(bytes).getOrElse(
          sys.error(s"undecodable synthesized G.711 WAV for media_id=$id"))
        (id, s.sampleRate, s.nSamples, s.sumS, s.minS.toLong, s.maxS.toLong)
      }).toDF("media_id", "sample_rate", "n_samples", "sum_s", "min_s", "max_s")
        .orderBy("media_id")
    },
    Some("""WITH dims AS (
           |  SELECT doc_id AS media_id,
           |         CAST((doc_id % 4000) + 500 AS BIGINT) AS n
           |  FROM documents WHERE doc_id % 3 = 1
           |), codes AS (
           |  SELECT media_id,
           |         (unnest(generate_series(0, n - 1)) * 31 + media_id)
           |           % 256 AS c
           |  FROM dims
           |), ex AS (
           |  SELECT media_id,
           |    CASE WHEN media_id % 2 = 0 THEN
           |      -- mu-law: complement, ((8m + 132) << e) - 132, bit 7 = minus
           |      CASE WHEN (255 - c) >= 128
           |           THEN -((((255 - c) % 16) * 8 + 132)
           |                  * (1 << (((255 - c) // 16) % 8)) - 132)
           |           ELSE  ((((255 - c) % 16) * 8 + 132)
           |                  * (1 << (((255 - c) // 16) % 8)) - 132) END
           |    ELSE
           |      -- A-law: XOR 0x55, segment map, bit 7 SET = plus
           |      CASE WHEN xor(c, 85) >= 128 THEN
           |        CASE WHEN (xor(c, 85) // 16) % 8 = 0
           |             THEN (xor(c, 85) % 16) * 16 + 8
           |             ELSE ((xor(c, 85) % 16) * 16 + 264)
           |                  * (1 << ((xor(c, 85) // 16) % 8 - 1)) END
           |      ELSE
           |        -(CASE WHEN (xor(c, 85) // 16) % 8 = 0
           |               THEN (xor(c, 85) % 16) * 16 + 8
           |               ELSE ((xor(c, 85) % 16) * 16 + 264)
           |                    * (1 << ((xor(c, 85) // 16) % 8 - 1)) END)
           |      END
           |    END AS s
           |  FROM codes
           |)
           |SELECT media_id, CAST(8000 AS INT) AS sample_rate,
           |       CAST(count(*) AS BIGINT) AS n_samples,
           |       CAST(sum(s) AS BIGINT) AS sum_s,
           |       CAST(min(s) AS BIGINT) AS min_s,
           |       CAST(max(s) AS BIGINT) AS max_s
           |FROM ex GROUP BY media_id ORDER BY media_id""".stripMargin))

  /** IMA ADPCM decode under the hash gate — a genuinely COMPRESSED
    * (4×, lossy) audio codec beside PCM and G.711: each audio doc is
    * encoded to 4-bit adaptive-differential blocks
    * ([[graft.operators.Wav.encodeImaAdpcm]]) and decoded back through
    * the real block walk ([[graft.operators.Wav.decodeImaAdpcm]] —
    * header predictor, nibble stream, per-sample predictor/step-index
    * state machine, fact-bounded tail). Lossy yet hash-checked: the
    * codec is a pure integer state machine, so the oracle REPLAYS it —
    * a recursive CTE steps every block's 64 quantize/reconstruct
    * transitions (encoder and decoder share one trajectory by
    * construction), something only possible because blocks are
    * independent in this profile (header = true first sample, index
    * reset). One wrong step-table entry, clamp, or nibble order breaks
    * min/sum/max. */
  val qWavAdpcmDecode = QueryDef("q_wav_adpcm_decode",
    (spark, dir) => {
      import spark.implicits._
      import org.apache.spark.sql.functions._
      val dims = Tables.documents(spark, dir)
        .filter(pmod(col("doc_id"), lit(3)) === 1) // the audio-modality ids
        .select(col("doc_id").as("media_id"),
          (pmod(col("doc_id"), lit(4000)) + 500).cast("int").as("n"))
        // codec parallelism follows MEDIA COUNT, not input bytes — the
        // id-scale dims scan is one small-file partition (SCALE.md r13)
        .repartition(spark.sparkContext.defaultParallelism, col("media_id"))
        .as[(Long, Int)]
      dims.mapPartitions(_.map { case (id, n) =>
        val bytes = graft.operators.Wav.encodeImaAdpcm(n, 8000, id)
        val s = graft.operators.Wav.pcmStats(bytes).getOrElse(
          sys.error(s"undecodable synthesized ADPCM WAV for media_id=$id"))
        (id, s.sampleRate, s.nSamples, s.sumS, s.minS.toLong, s.maxS.toLong)
      }).toDF("media_id", "sample_rate", "n_samples", "sum_s", "min_s", "max_s")
        .orderBy("media_id")
    },
    Some {
      val steps = graft.operators.Wav.ImaStepTable.mkString("[", ", ", "]")
      val idxs = graft.operators.Wav.ImaIndexTable.mkString("[", ", ", "]")
      s"""WITH RECURSIVE dims AS (
         |  SELECT doc_id AS media_id,
         |         CAST((doc_id % 4000) + 500 AS BIGINT) AS n
         |  FROM documents WHERE doc_id % 3 = 1
         |), blocks AS (
         |  SELECT media_id,
         |         unnest(generate_series(0, (n + 64) // 65 - 1)) AS b, n
         |  FROM dims
         |), init AS (
         |  SELECT media_id, 65 * b AS start, LEAST(65, n - 65 * b) AS len,
         |         ((65 * b * 31337 + media_id) % 65536) - 32768 AS pred,
         |         CAST(0 AS BIGINT) AS idx, CAST(0 AS BIGINT) AS k
         |  FROM blocks
         |), steps AS (
         |  -- k = 0 is the block's header sample; each recursion step is
         |  -- one encoder-quantize + decoder-reconstruct transition
         |  SELECT media_id, start, len, k, pred, idx FROM init
         |  UNION ALL
         |  SELECT media_id, start, len, k + 1,
         |         GREATEST(-32768, LEAST(32767,
         |           CASE WHEN sgn = 8 THEN pred - diff
         |                ELSE pred + diff END)),
         |         GREATEST(0, LEAST(88, idx + $idxs[b4 + b2 + b1 + 1]))
         |  FROM (
         |    SELECT media_id, start, len, k, pred, idx,
         |      (((start + k + 1) * 31337 + media_id) % 65536) - 32768 AS sin,
         |      $steps[idx + 1] AS st,
         |      CASE WHEN sin < pred THEN 8 ELSE 0 END AS sgn,
         |      abs(sin - pred) AS d0,
         |      CASE WHEN d0 >= st THEN 4 ELSE 0 END AS b4,
         |      d0 - (b4 // 4) * st AS d1,
         |      CASE WHEN d1 >= st // 2 THEN 2 ELSE 0 END AS b2,
         |      d1 - (b2 // 2) * (st // 2) AS d2,
         |      CASE WHEN d2 >= st // 4 THEN 1 ELSE 0 END AS b1,
         |      (st >> 3) + b1 * (st >> 2) + (b2 // 2) * (st >> 1)
         |        + (b4 // 4) * st AS diff
         |    FROM steps
         |  ) WHERE k + 1 < len
         |)
         |SELECT media_id, CAST(8000 AS INT) AS sample_rate,
         |       CAST(count(*) AS BIGINT) AS n_samples,
         |       CAST(sum(pred) AS BIGINT) AS sum_s,
         |       CAST(min(pred) AS BIGINT) AS min_s,
         |       CAST(max(pred) AS BIGINT) AS max_s
         |FROM steps GROUP BY media_id ORDER BY media_id""".stripMargin
    })

  /** Audio FEATURE EXTRACTION under the hash gate — the audio twin of
    * the pixel-stats stages: each audio doc decodes through the real
    * PCM chain and reduces to windowed features
    * ([[graft.operators.Wav.audioFeatures]]: 400-sample window
    * energies, stream zero-crossings, exact integer arithmetic end to
    * end), so the oracle re-derives every feature from the generative
    * signal with plain integer SQL — window bucketing, the
    * strictly-negative-product crossing rule, and the tail-window
    * handling all pinned. The decode is genuinely in the loop: a
    * byte-order or sign slip in the PCM reader shifts every energy. */
  val qWavFeatures = QueryDef("q_wav_features",
    (spark, dir) => {
      import spark.implicits._
      import org.apache.spark.sql.functions._
      val dims = Tables.documents(spark, dir)
        .filter(pmod(col("doc_id"), lit(3)) === 1) // the audio-modality ids
        .select(col("doc_id").as("media_id"),
          (pmod(col("doc_id"), lit(4000)) + 500).cast("int").as("n"))
        // codec parallelism follows MEDIA COUNT, not input bytes — the
        // id-scale dims scan is one small-file partition (SCALE.md r13)
        .repartition(spark.sparkContext.defaultParallelism, col("media_id"))
        .as[(Long, Int)]
      dims.mapPartitions(_.map { case (id, n) =>
        val bytes = graft.operators.Wav.encodePcm16(n, 16000, id)
        val (_, _, samples) = graft.operators.Wav.decodePcm16(bytes)
          .getOrElse(sys.error(s"undecodable WAV for media_id=$id"))
        val f = graft.operators.Wav.audioFeatures(samples, 400)
        (id, f.nWindows, f.zeroCrossings, f.maxWindowEnergy, f.totalEnergy)
      }).toDF("media_id", "n_windows", "zcr", "max_window_energy",
        "total_energy")
        .orderBy("media_id")
    },
    Some("""WITH dims AS (
           |  SELECT doc_id AS media_id,
           |         CAST((doc_id % 4000) + 500 AS BIGINT) AS n
           |  FROM documents WHERE doc_id % 3 = 1
           |), s AS (
           |  SELECT media_id, n, i,
           |         (i * 31337 + media_id) % 65536 - 32768 AS v
           |  FROM (SELECT media_id, n,
           |          unnest(generate_series(0, n - 1)) AS i FROM dims)
           |), wins AS (
           |  SELECT media_id, i // 400 AS w, sum(v * v) AS we
           |  FROM s GROUP BY media_id, w
           |), zc AS (
           |  SELECT media_id,
           |         sum(CASE WHEN prod < 0 THEN 1 ELSE 0 END) AS zcr
           |  FROM (SELECT media_id, v * lag(v) OVER
           |          (PARTITION BY media_id ORDER BY i) AS prod FROM s)
           |  GROUP BY media_id
           |)
           |SELECT w.media_id,
           |       CAST(count(*) AS BIGINT) AS n_windows,
           |       CAST(any_value(zc.zcr) AS BIGINT) AS zcr,
           |       CAST(max(w.we) AS BIGINT) AS max_window_energy,
           |       CAST(sum(w.we) AS BIGINT) AS total_energy
           |FROM wins w JOIN zc ON w.media_id = zc.media_id
           |GROUP BY w.media_id ORDER BY w.media_id""".stripMargin))

  val qAviFrameDecode = QueryDef("q_avi_frame_decode",
    (spark, dir) => {
      import spark.implicits._
      import org.apache.spark.sql.functions._
      val dims = Tables.documents(spark, dir)
        .filter(pmod(col("doc_id"), lit(3)) === 2) // the video-modality ids
        .select(col("doc_id").as("media_id"),
          (pmod(col("doc_id"), lit(56)) + 8).cast("int").as("w"),
          (pmod(col("doc_id") * 7, lit(56)) + 8).cast("int").as("h"),
          (pmod(col("doc_id"), lit(4)) + 2).cast("int").as("nf"))
        // codec parallelism follows MEDIA COUNT, not input bytes — the
        // id-scale dims scan is one small-file partition (SCALE.md r13)
        .repartition(spark.sparkContext.defaultParallelism, col("media_id"))
        .as[(Long, Int, Int, Int)]
      dims.mapPartitions(_.flatMap { case (id, w, h, nf) =>
        val avi = graft.operators.Avi.encode(w, h, nf, id)
        val stats = graft.operators.Avi.frameStats(avi).getOrElse(
          sys.error(s"undemuxable synthesized AVI for media_id=$id"))
        stats.map { case (frameNo, s) =>
          (id, frameNo.toLong, s.width, s.height, s.nPx,
            s.sumR, s.sumG, s.sumB)
        }
      }).toDF("media_id", "frame_no", "width", "height", "n_px",
        "sum_r", "sum_g", "sum_b")
        .orderBy("media_id", "frame_no")
    },
    Some("""WITH dims AS (
           |  SELECT doc_id AS media_id,
           |         CAST((doc_id % 56) + 8 AS BIGINT) AS w,
           |         CAST(((doc_id * 7) % 56) + 8 AS BIGINT) AS h,
           |         CAST((doc_id % 4) + 2 AS BIGINT) AS nf
           |  FROM documents WHERE doc_id % 3 = 2
           |), fr AS (
           |  SELECT media_id, w, h,
           |         unnest(generate_series(0, nf - 1)) AS frame_no
           |  FROM dims
           |), px AS (
           |  SELECT media_id, w, h, frame_no,
           |         unnest(generate_series(0, w * h - 1)) AS p
           |  FROM fr
           |), t AS (
           |  SELECT media_id, frame_no, w, h, p % w AS x, p // w AS y
           |  FROM px
           |)
           |SELECT media_id, frame_no,
           |       CAST(w AS INT) AS width, CAST(h AS INT) AS height,
           |       CAST(count(*) AS BIGINT) AS n_px,
           |       CAST(sum((x*7 + y*13 + media_id + frame_no) % 256) AS BIGINT)
           |         AS sum_r,
           |       CAST(sum((x*11 + y*3 + 2*(media_id + frame_no)) % 256) AS BIGINT)
           |         AS sum_g,
           |       CAST(sum((x*5 + y*17 + 3*(media_id + frame_no)) % 256) AS BIGINT)
           |         AS sum_b
           |FROM t GROUP BY media_id, frame_no, w, h
           |ORDER BY media_id, frame_no""".stripMargin))

  /** MJPEG video decode, end to end — the codec COMPOSITION the video
    * family was building toward: a real RIFF/AVI container whose
    * `00dc` frames are complete baseline COLOR JPEGs
    * ([[graft.operators.Avi.encodeMjpeg]] /
    * [[graft.operators.Avi.mjpegFrameStats]]), the dominant legacy
    * capture format. The demuxer verifies the stream header declares
    * `vids`/`MJPG` before feeding frames to the JPEG decoder (payload
    * type is data, not assumption), then every frame runs the full
    * baseline color chain — entropy decode, dequant, IDCT, chroma
    * upsampling (both samplings, split by media id), fixed-point
    * YCbCr→RGB. The oracle re-derives every frame's channel sums from
    * the generative formulas + the pinned transform, so a torn
    * container, a frame fed to the wrong codec, or any JPEG-stage
    * drift breaks the hash. Per-frame independence is WHY MJPEG fits
    * the 100 TB partition-wise decode model: no inter-frame state, so
    * frames scale out exactly like still images. */
  val qAviMjpegDecode = QueryDef("q_avi_mjpeg_decode",
    (spark, dir) => {
      import spark.implicits._
      import org.apache.spark.sql.functions._
      val dims = Tables.documents(spark, dir)
        .filter(pmod(col("doc_id"), lit(3)) === 2) // the video-modality ids
        .select(col("doc_id").as("media_id"),
          (pmod(col("doc_id"), lit(56)) + 8).cast("int").as("w"),
          (pmod(col("doc_id") * 7, lit(56)) + 8).cast("int").as("h"),
          (pmod(col("doc_id"), lit(4)) + 2).cast("int").as("nf"))
        // codec parallelism follows MEDIA COUNT, not input bytes — the
        // id-scale dims scan is one small-file partition (SCALE.md r13)
        .repartition(spark.sparkContext.defaultParallelism, col("media_id"))
        .as[(Long, Int, Int, Int)]
      dims.mapPartitions(_.flatMap { case (id, w, h, nf) =>
        val sampling = if (id % 2 == 0) 0x11 else 0x22
        val avi = graft.operators.Avi.encodeMjpeg(w, h, nf, id, sampling)
        val stats = graft.operators.Avi.mjpegFrameStats(avi).getOrElse(
          sys.error(s"undemuxable synthesized MJPEG AVI for media_id=$id"))
        stats.map { case (frameNo, s) =>
          (id, frameNo.toLong, s.width, s.height, s.nPx,
            s.sumR, s.sumG, s.sumB)
        }
      }).toDF("media_id", "frame_no", "width", "height", "n_px",
        "sum_r", "sum_g", "sum_b")
        .orderBy("media_id", "frame_no")
    },
    Some("""WITH dims AS (
           |  SELECT doc_id AS media_id,
           |         CAST((doc_id % 56) + 8 AS BIGINT) AS w,
           |         CAST(((doc_id * 7) % 56) + 8 AS BIGINT) AS h,
           |         CAST((doc_id % 4) + 2 AS BIGINT) AS nf
           |  FROM documents WHERE doc_id % 3 = 2
           |), fr AS (
           |  SELECT media_id, w, h,
           |         unnest(generate_series(0, nf - 1)) AS frame_no
           |  FROM dims
           |), px AS (
           |  SELECT media_id, w, h, frame_no,
           |         unnest(generate_series(0, w * h - 1)) AS p
           |  FROM fr
           |), t AS (
           |  SELECT media_id, frame_no, w, h,
           |         (p % w) // 8 AS bx, (p // w) // 8 AS by,
           |         CASE WHEN media_id % 2 = 0 THEN (p % w) // 8
           |              ELSE (p % w) // 16 END AS cx,
           |         CASE WHEN media_id % 2 = 0 THEN (p // w) // 8
           |              ELSE (p // w) // 16 END AS cy
           |  FROM px
           |), v AS (
           |  SELECT media_id, frame_no, w, h,
           |         (bx * 7 + by * 13 + media_id + frame_no) % 256 AS yv,
           |         (cx * 11 + cy * 3 + 2 * (media_id + frame_no)) % 256 - 128 AS cb,
           |         (cx * 5 + cy * 17 + 3 * (media_id + frame_no)) % 256 - 128 AS cr
           |  FROM t
           |), rgb AS (
           |  SELECT media_id, frame_no, w, h,
           |    LEAST(255, GREATEST(0, yv + CAST(floor(
           |      (91881 * cr + 32768) / 65536.0) AS BIGINT))) AS r,
           |    LEAST(255, GREATEST(0, yv - CAST(floor(
           |      (22554 * cb + 46802 * cr + 32768) / 65536.0) AS BIGINT))) AS g,
           |    LEAST(255, GREATEST(0, yv + CAST(floor(
           |      (116130 * cb + 32768) / 65536.0) AS BIGINT))) AS b
           |  FROM v
           |)
           |SELECT media_id, frame_no,
           |       CAST(w AS INT) AS width, CAST(h AS INT) AS height,
           |       CAST(count(*) AS BIGINT) AS n_px,
           |       CAST(sum(r) AS BIGINT) AS sum_r,
           |       CAST(sum(g) AS BIGINT) AS sum_g,
           |       CAST(sum(b) AS BIGINT) AS sum_b
           |FROM rgb GROUP BY media_id, frame_no, w, h
           |ORDER BY media_id, frame_no""".stripMargin))

  /** The PNG color-type matrix under the hash gate: each image doc
    * becomes ONE of the five depth-8 color types by id — grayscale
    * (id%4=0), palette (1), RGBA (2), gray+alpha (3) — half of them
    * Adam7-interlaced (id%2), every row decoding through
    * [[graft.operators.Png.pixelStats]]'s single RGB-landing decode
    * path. The oracle re-derives each type's RGB from the generative
    * formulas (palette indirection included: entry i = (i, 255−i,
    * (i·7) mod 256)) — a wrong PLTE lookup, a mis-replicated gray, a
    * leaked alpha byte, or a bpp-confused filter reconstruction all
    * break the hash. RGB itself (color 2) is `q_png_pixel_decode`'s
    * row — the five types split across the two entries cover the
    * codec's full decode scope. */
  val qPngColorTypes = QueryDef("q_png_color_types",
    (spark, dir) => {
      import spark.implicits._
      import org.apache.spark.sql.functions._
      val dims = Tables.documents(spark, dir)
        .filter(pmod(col("doc_id"), lit(3)) === 0) // the image-modality ids
        .select(col("doc_id").as("media_id"),
          Multimodal.pngWidth(col("doc_id")).as("w"),
          Multimodal.pngHeight(col("doc_id")).as("h"))
        // codec parallelism follows MEDIA COUNT, not input bytes — the
        // id-scale dims scan is one small-file partition (SCALE.md r13)
        .repartition(spark.sparkContext.defaultParallelism, col("media_id"))
        .as[(Long, Int, Int)]
      dims.mapPartitions(_.map { case (id, w, h) =>
        val il = id % 2 == 0
        val bytes = (id % 4) match {
          case 0 => graft.operators.Png.encodeGray8(w, h, id, il)
          case 1 => graft.operators.Png.encodePalette(w, h, id, il)
          case 2 => graft.operators.Png.encodeRgba(w, h, id, il)
          case _ => graft.operators.Png.encodeGrayAlpha(w, h, id, il)
        }
        val s = graft.operators.Png.pixelStats(bytes).getOrElse(
          sys.error(s"undecodable synthesized PNG type for media_id=$id"))
        (id, s.width, s.height, s.nPx, s.sumR, s.sumG, s.sumB)
      }).toDF("media_id", "width", "height", "n_px", "sum_r", "sum_g",
        "sum_b")
        .orderBy("media_id")
    },
    Some("""WITH dims AS (
           |  SELECT doc_id AS media_id,
           |         CAST((doc_id % 240) + 16 AS INT) AS width,
           |         CAST(((doc_id * 7) % 240) + 16 AS INT) AS height,
           |         doc_id % 4 AS t
           |  FROM documents WHERE doc_id % 3 = 0
           |), px AS (
           |  SELECT media_id, width, height, t,
           |         unnest(generate_series(0, CAST(width AS BIGINT) * height - 1)) AS p
           |  FROM dims
           |), s AS (
           |  SELECT media_id, width, height, t,
           |         (p % width * 7 + p // width * 13 + media_id) % 256 AS pr,
           |         (p % width * 11 + p // width * 3 + 2*media_id) % 256 AS pg,
           |         (p % width * 5 + p // width * 17 + 3*media_id) % 256 AS pb
           |  FROM px
           |)
           |SELECT media_id, width, height,
           |       CAST(count(*) AS BIGINT) AS n_px,
           |       CAST(sum(pr) AS BIGINT) AS sum_r,
           |       CAST(sum(CASE WHEN t = 1 THEN 255 - pr
           |                     WHEN t = 2 THEN pg ELSE pr END) AS BIGINT)
           |         AS sum_g,
           |       CAST(sum(CASE WHEN t = 1 THEN (pr * 7) % 256
           |                     WHEN t = 2 THEN pb ELSE pr END) AS BIGINT)
           |         AS sum_b
           |FROM s GROUP BY media_id, width, height
           |ORDER BY media_id""".stripMargin))

  /** Two-stream (A/V) AVI demux with INDEX verification, end to end
    * ([[graft.operators.Avi.encodeAv]]/[[Avi.avStats]]): each video doc
    * becomes an interleaved `00db`+`01wb` AVI with an `idx1` chunk; the
    * demuxer cross-checks every index entry against the actual movi
    * layout (a lying index refuses), frames decode through the verified
    * BMP codec, and the audio stream is re-assembled and decoded
    * through the verified WAV codec. One row per media with BOTH
    * streams' aggregates — a slipped chunk, mis-ordered interleave,
    * swallowed pad byte, or index drift breaks the hash. The oracle
    * re-derives the video channel sums AND the continuous audio signal
    * ([[graft.operators.Wav.sample]]) from the two generative formulas. */
  val qAviAvDemux = QueryDef("q_avi_av_demux",
    (spark, dir) => {
      import spark.implicits._
      import org.apache.spark.sql.functions._
      val dims = Tables.documents(spark, dir)
        .filter(pmod(col("doc_id"), lit(3)) === 2) // the video-modality ids
        .select(col("doc_id").as("media_id"),
          (pmod(col("doc_id"), lit(56)) + 8).cast("int").as("w"),
          (pmod(col("doc_id") * 7, lit(56)) + 8).cast("int").as("h"),
          (pmod(col("doc_id"), lit(4)) + 2).cast("int").as("nf"),
          (pmod(col("doc_id"), lit(7)) * 20 + 40).cast("int").as("spf"))
        // codec parallelism follows MEDIA COUNT, not input bytes — the
        // id-scale dims scan is one small-file partition (SCALE.md r13)
        .repartition(spark.sparkContext.defaultParallelism, col("media_id"))
        .as[(Long, Int, Int, Int, Int)]
      dims.mapPartitions(_.map { case (id, w, h, nf, spf) =>
        val avi = graft.operators.Avi.encodeAv(w, h, nf, id,
          samplesPerFrame = spf)
        val (frames, audio) = graft.operators.Avi.avStats(avi).getOrElse(
          sys.error(s"undemuxable synthesized A/V AVI for media_id=$id"))
        (id, frames.size.toLong,
          frames.map(_._2.sumR).sum, frames.map(_._2.sumG).sum,
          frames.map(_._2.sumB).sum,
          audio.nSamples, audio.sumS, audio.minS, audio.maxS)
      }).toDF("media_id", "n_frames", "sum_r", "sum_g", "sum_b",
        "n_samples", "sum_s", "min_s", "max_s")
        .orderBy("media_id")
    },
    Some("""WITH dims AS (
           |  SELECT doc_id AS media_id,
           |         CAST((doc_id % 56) + 8 AS BIGINT) AS w,
           |         CAST(((doc_id * 7) % 56) + 8 AS BIGINT) AS h,
           |         CAST((doc_id % 4) + 2 AS BIGINT) AS nf,
           |         CAST((doc_id % 7) * 20 + 40 AS BIGINT) AS spf
           |  FROM documents WHERE doc_id % 3 = 2
           |), fr AS (
           |  SELECT media_id, w, h, nf,
           |         unnest(generate_series(0, nf - 1)) AS frame_no
           |  FROM dims
           |), px AS (
           |  SELECT media_id, w, h, nf, frame_no,
           |         unnest(generate_series(0, w * h - 1)) AS p
           |  FROM fr
           |), vt AS (
           |  SELECT media_id, nf,
           |         CAST(sum((p % w * 7 + p // w * 13 + media_id + frame_no)
           |           % 256) AS BIGINT) AS sum_r,
           |         CAST(sum((p % w * 11 + p // w * 3
           |           + 2*(media_id + frame_no)) % 256) AS BIGINT) AS sum_g,
           |         CAST(sum((p % w * 5 + p // w * 17
           |           + 3*(media_id + frame_no)) % 256) AS BIGINT) AS sum_b
           |  FROM px GROUP BY media_id, nf
           |), au AS (
           |  SELECT media_id,
           |         unnest(generate_series(0, nf * spf - 1)) AS i
           |  FROM dims
           |), at_ AS (
           |  SELECT media_id,
           |         CAST((i * 31337 + media_id) % 65536 - 32768 AS BIGINT) AS s
           |  FROM au
           |), ast AS (
           |  SELECT media_id, CAST(count(*) AS BIGINT) AS n_samples,
           |         CAST(sum(s) AS BIGINT) AS sum_s,
           |         CAST(min(s) AS INT) AS min_s, CAST(max(s) AS INT) AS max_s
           |  FROM at_ GROUP BY media_id
           |)
           |SELECT vt.media_id, CAST(vt.nf AS BIGINT) AS n_frames,
           |       vt.sum_r, vt.sum_g, vt.sum_b,
           |       ast.n_samples, ast.sum_s, ast.min_s, ast.max_s
           |FROM vt JOIN ast ON vt.media_id = ast.media_id
           |ORDER BY vt.media_id""".stripMargin))

  def all: Seq[QueryDef] =
    Seq(qModalityStats, qPngDecode, qPngResize, qJpegDecode,
      qJpegProgressiveDecode,
      qJpegColorDecode, qBmpDecode, qGifDecode, qWavDecode, qWavG711Decode,
      qWavAdpcmDecode, qWavResample, qWavFeatures,
      qAviFrameDecode, qAviMjpegDecode, qAviAvDemux, qPngColorTypes)
}
