package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing: opaque `binary` content
  * + typed metadata, with decode / feature-extraction as partition-wise
  * typed transforms.
  *
  * Design for 100 TB: media bytes ride in a BINARY column next to typed
  * metadata, so relational pruning (modality/size/meta filters) happens in
  * the parquet scan WITHOUT touching the payload — column pruning skips
  * the bytes entirely for metadata-only queries. Decode/feature-extract is
  * a `mapPartitions` batch transform (one decoder init per partition, not
  * per row), the Scala-side analog of a vectorized pandas-UDF stage.
  *
  * ⚠ STUB DECODER: the container has no image/audio codecs, so
  * [[StubCodec]] computes deterministic fake "features" (byte statistics)
  * in place of a real decode. The Spark-side contract — schema, typed
  * encoders, partition-wise batching, pruning behavior — is the real,
  * tested surface; swap [[StubCodec.decode]] for a JNI/codec call in
  * production.
  */
object Multimodal {

  /** A media row: content is opaque bytes; meta is modality-specific. */
  case class MediaRow(
      media_id: Long,
      modality: String, // "image" | "audio" | "video"
      content: Array[Byte],
      width: Int, height: Int, // image/video
      sample_rate: Int, // audio
      duration_ms: Long) // audio/video

  /** Extracted features per media item. */
  case class MediaFeatures(
      media_id: Long,
      modality: String,
      byte_len: Long,
      checksum: Long, // sum of unsigned byte values
      histogram: Array[Float]) // 16-bucket normalized byte histogram

  /** STUB for the real decoder: deterministic byte statistics standing in
    * for decoded-pixel / PCM features. Pure function of the bytes. */
  object StubCodec {
    val HistogramBuckets = 16

    def decode(row: MediaRow): MediaFeatures = {
      // a NULL payload (missing text upstream) is an empty media item,
      // not a task-killing NPE
      val bytes =
        if (row.content == null) Array.emptyByteArray else row.content
      var checksum = 0L
      val counts = new Array[Long](HistogramBuckets)
      var i = 0
      while (i < bytes.length) {
        val u = bytes(i) & 0xff
        checksum += u
        counts(u % HistogramBuckets) += 1
        i += 1
      }
      val n = math.max(bytes.length, 1).toFloat
      MediaFeatures(row.media_id, row.modality, bytes.length.toLong, checksum,
        counts.map(c => c / n))
    }
  }

  /** Derive a deterministic media table from the documents corpus: text
    * bytes as the payload, modality round-robin by id, synthetic meta.
    * (Stands in for `spark.read.format("binaryFile")` over a media lake.) */
  def fromDocuments(docs: DataFrame): DataFrame = {
    val modality = element_at(
      array(lit("image"), lit("audio"), lit("video")),
      (pmod(col("doc_id"), lit(3)) + lit(1)).cast("int"))
    docs.select(
      col("doc_id").as("media_id"),
      modality.as("modality"),
      encode(col("text"), "UTF-8").as("content"),
      when(modality === "audio", lit(0)).otherwise(lit(640)).as("width"),
      when(modality === "audio", lit(0)).otherwise(lit(480)).as("height"),
      when(modality === "audio", lit(16000)).otherwise(lit(0)).as("sample_rate"),
      (col("n_chars") * 10L).as("duration_ms"))
  }

  /** Partition-wise decode → features. Typed `mapPartitions` so a real
    * decoder initializes once per partition (the batch shape that matters
    * when each decode is ms-scale and the codec init is 100ms-scale). */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // real impl: val codec = Codec.acquire(); rows.map(codec.decode)
      rows.map(StubCodec.decode)
    }
  }

  /** DataFrame convenience: media frame → features frame. */
  def extractFeatures(spark: SparkSession, media: DataFrame): DataFrame = {
    import spark.implicits._
    extractFeatures(media.as[MediaRow]).toDF()
  }

  /** Per-modality feature rollup (the oracle-checkable aggregate face;
    * checksum/byte sums are exact integers → cross-engine stable). */
  def modalityStats(spark: SparkSession, media: DataFrame): DataFrame =
    extractFeatures(spark, media)
      .groupBy("modality")
      .agg(count(lit(1)).as("n"),
        sum("byte_len").as("total_bytes"),
        sum("checksum").as("total_checksum"))
      .orderBy("modality")

  /** One sampled frame of a video payload. */
  case class Frame(media_id: Long, frame_no: Long, frame: Array[Byte])

  /** Frame sampling: slice each video payload into fixed-size frames and
    * keep every `everyNth` one — the 1→n fan-out of video preprocessing
    * (decode-free here: frames are byte slices, standing in for container
    * demuxing the way [[StubCodec]] stands in for decoding; the Spark
    * shape — per-row explode inside the scan, no shuffle, frame count
    * bounded by payload size — is the real contract). Short final slices
    * are kept (a real demuxer emits the tail frame too). Non-video rows
    * pass through the filter upstream of the explode, so their payloads
    * are never sliced. */
  def sampleFrames(media: DataFrame, frameBytes: Int,
      everyNth: Int): DataFrame = {
    require(frameBytes > 0 && everyNth > 0,
      s"sampleFrames: need frameBytes > 0 and everyNth > 0, " +
        s"got ($frameBytes, $everyNth)")
    media.filter(col("modality") === "video" && col("content").isNotNull &&
        length(col("content")) > 0)
      .select(col("media_id"), col("content"),
        // exact integer frame count: ceil(len / frameBytes)
        explode(sequence(lit(0L),
          expr(s"(length(content) + ${frameBytes - 1}) div $frameBytes") - 1))
          .as("frame_no"))
      .filter(col("frame_no") % everyNth === 0)
      // substring on BINARY slices bytes (1-based start); the tail frame
      // is naturally short
      .select(col("media_id"), col("frame_no"),
        expr(s"substring(content, frame_no * $frameBytes + 1, $frameBytes)")
          .as("frame"))
  }

  /** "Resize" stub: deterministic downsample of a payload to at most
    * `targetBytes` by keeping every stride-th byte — the plumbing twin
    * of a pixel resize (real impl swaps the kernel; the column contract
    * — binary in, smaller binary out, pure per-row — is what the
    * pipeline depends on). */
  def resizeStub(payload: Array[Byte], targetBytes: Int): Array[Byte] = {
    require(targetBytes > 0, "resizeStub: targetBytes must be positive")
    if (payload == null || payload.length <= targetBytes) payload
    else {
      val out = new Array[Byte](targetBytes)
      var i = 0
      while (i < targetBytes) {
        out(i) = payload((i.toLong * payload.length / targetBytes).toInt)
        i += 1
      }
      out
    }
  }
}
