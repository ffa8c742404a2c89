package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.sources.{GraftMaintenance, GraftVersionFeed}

/** The version-feed streaming source ([[graft.sources.GraftVersionFeed]]):
  * one metadata row per commit across the FULL writer alphabet,
  * restart-stable version-number offsets, history skipping via
  * `versionFeedFrom`. The end-to-end hash gate is
  * `q_stream_version_feed`; these pin the offset mechanics. */
class GraftVersionFeedSpec extends SparkSpec {

  private val fmt = "graft.sources.GraftParquetTableProvider"

  private def tmp(name: String): String = {
    val d = Files.createTempDirectory(s"graft_vf_$name").toFile
    d.delete()
    d.getAbsolutePath
  }

  private def docs = spark.read.parquet(s"$sfDir/documents.parquet")
    .select("doc_id", "lang", "n_chars")

  private def slice(k: Int) =
    docs.filter(pmod(col("doc_id"), lit(4)) === k)

  private def append(t: String, k: Int): Unit =
    slice(k).write.format(fmt).option("path", t).mode("append").save()

  /** Drain the feed at `t` through checkpoint `ck`, returning the
    * (version, n_rows) rows this run emitted. */
  private def drain(t: String, ck: String,
      extra: Map[String, String] = Map.empty): Seq[(Long, Long)] = {
    val acc = collection.mutable.ArrayBuffer.empty[(Long, Long)]
    var r = spark.readStream.format(fmt).option("path", t)
      .option(GraftVersionFeed.OptionKey, "true")
    extra.foreach { case (k, v) => r = r.option(k, v) }
    val q = r.load().writeStream
      .option("checkpointLocation", ck)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
        val got = b.select("version", "n_rows").collect()
        acc.synchronized {
          got.foreach(x => acc += ((x.getLong(0), x.getLong(1))))
        }
        ()
      }.start()
    q.awaitTermination()
    acc.sortBy(_._1).toSeq
  }

  test("one signal per commit across the writer alphabet; counts track") {
    val t = tmp("alpha"); val ck = tmp("alpha_ck")
    append(t, 0)                                   // v1
    append(t, 1)                                   // v2
    val n01 = slice(0).count() + slice(1).count()
    GraftMaintenance.delete(spark, t,              // v3: COW rewrite
      pmod(col("doc_id"), lit(8)) === 0)
    val n3 = spark.read.format(fmt).option("path", t).load().count()
    GraftMaintenance.compact(spark, t)             // v4: repack
    val got = drain(t, ck)
    assert(got.map(_._1) == Seq(1L, 2L, 3L, 4L))
    assert(got(0)._2 == slice(0).count())
    assert(got(1)._2 == n01)
    assert(got(2)._2 == n3, "post-delete signal must carry the live count")
    assert(got(3)._2 == n3, "compaction repacks, rows unchanged")
  }

  test("checkpoint restart resumes after the last version; from skips history") {
    val t = tmp("resume"); val ck = tmp("resume_ck")
    append(t, 0); append(t, 1)                     // v1, v2
    assert(drain(t, ck).map(_._1) == Seq(1L, 2L))
    assert(drain(t, ck).isEmpty, "nothing new: no signal")
    append(t, 2)                                   // v3
    assert(drain(t, ck).map(_._1) == Seq(3L),
      "restart must emit only versions after the checkpointed offset")
    // fresh checkpoint with versionFeedFrom: history skipped
    val got = drain(t, tmp("resume_ck2"),
      Map(GraftVersionFeed.FromKey -> "2"))
    assert(got.map(_._1) == Seq(3L))
  }
}
