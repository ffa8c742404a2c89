package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal
import graft.operators.Multimodal.{MediaRow, StubCodec}

/** Multimodal plumbing specs: binary payload round-trip, stub-decode
  * determinism, partition-batch shape, and metadata-only column pruning. */
class MultimodalSpec extends SparkSpec {

  test("StubCodec: checksum/histogram are exact byte statistics") {
    val row = MediaRow(1L, "image", "abc".getBytes("UTF-8"), 640, 480, 0, 0L)
    val f = StubCodec.decode(row)
    assert(f.byte_len == 3L)
    assert(f.checksum == 97L + 98L + 99L) // 'a'+'b'+'c'
    assert(math.abs(f.histogram.sum - 1.0f) < 1e-6) // normalized
    // bucket of 'a' (97 % 16 = 1): 1/3 of mass; 'b'→2, 'c'→3
    assert(math.abs(f.histogram(1) - 1f / 3f) < 1e-6)
  }

  test("fromDocuments → extractFeatures round-trips content bytes exactly") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val media = Multimodal.fromDocuments(docs)
    val feats = Multimodal.extractFeatures(spark, media)
    val joined = feats.join(docs, col("media_id") === col("doc_id"))
      .select(col("doc_id"), col("byte_len"), length(col("text")).cast("long").as("n"))
      .filter(col("byte_len") =!= col("n"))
    assert(joined.count() == 0) // ASCII corpus: byte_len == char count
    assert(feats.count() == docs.count())
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

  test("resizeStub: bounds, determinism, endpoints, pass-through") {
    val payload = Array.tabulate[Byte](1000)(i => (i % 251).toByte)
    val r = Multimodal.resizeStub(payload, 100)
    assert(r.length == 100)
    assert(r(0) == payload(0), "first byte preserved")
    assert(java.util.Arrays.equals(r, Multimodal.resizeStub(payload, 100)))
    assert(Multimodal.resizeStub(payload, 2000) eq payload, "no-op upscale")
    assert(Multimodal.resizeStub(null, 10) == null)
  }
}
