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
}
