package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.sources.{GraftTableLog}

/** Idempotent batch appends via the `txnId` write option (the Delta
  * txnAppId:txnVersion discipline, one string): a replayed append with
  * an already-committed txnId must commit NOTHING. End-to-end consumer:
  * [[graft.sources.GraftCdc]] / `q_stream_cdc_feed`. */
class TxnAppendSpec extends SparkSpec {

  private val fmt = "graft.sources.GraftParquetTableProvider"

  private def tmp(name: String): String = {
    val d = Files.createTempDirectory(s"graft_txn_$name").toFile
    d.delete()
    d.getAbsolutePath
  }

  private def docs = spark.read.parquet(s"$sfDir/documents.parquet")
    .select("doc_id", "lang", "n_chars")

  private def count(t: String): Long =
    spark.read.format(fmt).option("path", t).load().count()

  test("a replayed txnId append is a no-op; distinct ids commit") {
    val t = tmp("replay")
    val a = docs.filter(col("doc_id") % 4 === 0)
    a.write.format(fmt).option("path", t).option("txnId", "app-0")
      .mode("append").save()
    val n0 = count(t)
    val v0 = GraftTableLog.latestVersion(t).get
    // replay: same txnId, even different rows — dropped at commit
    docs.filter(col("doc_id") % 4 === 1)
      .write.format(fmt).option("path", t).option("txnId", "app-0")
      .mode("append").save()
    assert(count(t) == n0, "a replayed txnId must not duplicate rows")
    assert(GraftTableLog.latestVersion(t).contains(v0),
      "a replayed txnId must not commit a version")
    // the next batch id commits normally
    docs.filter(col("doc_id") % 4 === 1)
      .write.format(fmt).option("path", t).option("txnId", "app-1")
      .mode("append").save()
    assert(count(t) > n0)
    assert(GraftTableLog.latestVersion(t).get > v0)
  }

  test("txnId refuses overwrite and branch routes; bad ids refuse") {
    val t = tmp("refuse")
    docs.limit(10).write.format(fmt).option("path", t)
      .mode("append").save()
    def fails(body: => Unit): Boolean =
      try { body; false } catch { case e: Throwable =>
        Iterator.iterate(e)(_.getCause).takeWhile(_ != null).take(8)
          .exists(_.getMessage != null) }
    assert(fails {
      docs.limit(5).write.format(fmt).option("path", t)
        .option("txnId", "x-1").mode("overwrite").save()
    }, "txnId + overwrite must refuse")
    assert(fails {
      docs.limit(5).write.format(fmt).option("path", t)
        .option("txnId", "bad id with spaces").mode("append").save()
    }, "a txnId that cannot name a marker file must refuse")
  }
}
