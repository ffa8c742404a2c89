package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** PARTITIONED tables as a streaming SOURCE (round 12): the connector
  * writes partition values INTO the data files (the Iceberg
  * convention), so the stream's flat splits emit them correctly — the
  * old blanket refusal becomes a per-file FOOTER PROOF at admission.
  * A foreign directory-only file (values live only in `col=value/`)
  * refuses loudly, naming the file, instead of null-filling. */
class PartitionedStreamSpec extends SparkSpec {

  private val fmt = "graft.sources.GraftParquetTableProvider"

  private def docs = spark.read.parquet(s"$sfDir/documents.parquet")
    .select("doc_id", "lang", "n_chars")

  private def tmp(prefix: String): String = {
    val p = s"${sys.props("java.io.tmpdir")}/${prefix}_" +
      java.util.UUID.randomUUID().toString
    val hp = new org.apache.hadoop.fs.Path(p)
    hp.getFileSystem(spark.sparkContext.hadoopConfiguration).deleteOnExit(hp)
    p
  }

  private def drain(table: String, ckpt: String): Seq[(Long, String)] = {
    val got = new java.util.concurrent.ConcurrentLinkedQueue[(Long, String)]()
    val q = spark.readStream.format(fmt).option("path", table)
      .schema(docs.schema).load()
      .writeStream.option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (b: DataFrame, _: Long) =>
        b.select("doc_id", "lang").collect()
          .foreach(r => got.add((r.getLong(0), r.getString(1)))); ()
      }.start()
    q.awaitTermination()
    import scala.jdk.CollectionConverters._
    got.asScala.toSeq
  }

  test("a partitioned table streams with exact partition-column values") {
    val table = tmp("graft_pstream")
    val ckpt = tmp("graft_pstream_ck")
    val first = docs.limit(30)
    first.write.format(fmt).option("path", table)
      .option("partitionBy", "lang").mode("append").save()
    val want = first.collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val got = drain(table, ckpt)
    assert(got.toSet == want,
      "streamed rows must carry the exact partition values")
    assert(got.size == want.size)
    // appended partitioned files flow incrementally, values intact
    val more = docs.filter(col("doc_id") >= 30).limit(10)
    more.write.format(fmt).option("path", table)
      .option("partitionBy", "lang").mode("append").save()
    val second = drain(table, ckpt)
    assert(second.toSet ==
      more.collect().map(r => (r.getLong(0), r.getString(1))).toSet,
      "resume must stream only the new files, with their values")
  }

  test("a directory-only foreign file refuses at admission, by name") {
    val table = tmp("graft_pstream_foreign")
    val ckpt = tmp("graft_pstream_foreign_ck")
    docs.limit(10).write.format(fmt).option("path", table)
      .option("partitionBy", "lang").mode("append").save()
    // plant a Hive-style foreign file: correct directory, but the lang
    // column exists ONLY in the directory name, not in the data
    val foreignDir = new java.io.File(s"$table/lang=zz")
    docs.limit(3).drop("lang").coalesce(1)
      .write.mode("append").parquet(foreignDir.getAbsolutePath)
    // the built-in writer leaves _SUCCESS markers; harmless (underscore)
    val e = intercept[Exception] {
      drain(table, ckpt)
    }
    def msgs(t: Throwable): String =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(x => Option(x.getMessage).getOrElse("")).mkString(" | ")
    assert(msgs(e).contains("does not carry partition"), msgs(e).take(400))
  }
}
