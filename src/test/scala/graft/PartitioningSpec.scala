package graft

import org.apache.spark.sql.functions._
import graft.sources.Sinks

/** Partitioned-write pruning: a filter on the partition column must
  * reach the scan as a PartitionFilter and cut the files read. */
class PartitioningSpec extends SparkSpec {

  test("partition filter prunes non-matching partitions from the scan") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val path = java.nio.file.Files.createTempDirectory("graft_part").toString
    Sinks.parquetPartitioned(docs, path, "lang")
    val back = spark.read.parquet(path).filter(col("lang") === "fr")
    val scan = back.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).mkString("\n")
    assert(scan.contains("PartitionFilters"), scan)
    assert(scan.contains("lang"), scan)
    // count must match the unpartitioned filter
    val expected = docs.filter(col("lang") === "fr").count()
    assert(back.count() == expected && expected > 0)
    // physically: only the lang=fr directory is listed in the scanned files
    val scannedFiles = back.queryExecution.executedPlan.collectLeaves()
      .collect { case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.inputRDDs().flatMap(_.partitions).collect {
          case p: org.apache.spark.sql.execution.datasources.FilePartition =>
            p.files.map(_.filePath.toString).toSeq
        }.flatten
      }.flatten
    assert(scannedFiles.nonEmpty && scannedFiles.forall(_.contains("lang=fr")),
      scannedFiles.mkString("\n"))
  }

  test("compact: many small files become few sized files, content untouched") {
    import org.apache.spark.sql.functions._
    val path = "/tmp/graft_compact_test"
    val src = spark.read.parquet(s"$sfDir/lineitem.parquet")
    // simulate a streaming ingest's small-file spray: 64 tiny files
    src.repartition(64).write.mode("overwrite").parquet(path)
    def parquetFiles = new java.io.File(path).listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(parquetFiles == 64)
    val before = rows(spark.read.parquet(path)
      .agg(count(lit(1)), sum("l_quantity").cast("decimal(28,4)"))).head
    graft.sources.Sinks.compact(spark, path, targetFileMB = 128)
    // a few MB of data @ 128 MB target → exactly one file
    assert(parquetFiles == 1, s"expected 1 compacted file, got $parquetFiles")
    val after = rows(spark.read.parquet(path)
      .agg(count(lit(1)), sum("l_quantity").cast("decimal(28,4)"))).head
    assert(after == before, "compaction must not change content")
    assert(!new java.io.File(path + "_compact_tmp").exists())
    assert(!new java.io.File(path + "_compact_old").exists())
  }

  test("jsonlSharded: shard count, manifest, roundtrip, reproducible routing") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("lang"), col("source")).filter(col("doc_id") < 60)
    def write(path: String) =
      Sinks.jsonlSharded(docs, path, shards = 4, col("doc_id"))
    val p1 = java.nio.file.Files.createTempDirectory("graft_jsonl").toString
    write(p1)
    val parts = new java.io.File(p1).listFiles()
      .filter(_.getName.startsWith("part-")).sortBy(_.getName)
    assert(parts.length == 4, s"expected 4 shards: ${parts.map(_.getName).toSeq}")
    // manifest: valid JSON, counts match the data and the listing
    val manifest = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(p1, "_manifest.json")), "UTF-8")
    assert(manifest.contains("\"n_shards\": 4"), manifest)
    assert(manifest.contains(s"\"n_rows\": ${docs.count()}"), manifest)
    parts.foreach(p => assert(manifest.contains(p.getName), s"${p.getName} missing"))
    // roundtrip content
    val back = spark.read.json(p1)
    assert(back.count() == docs.count())
    assert(rows(back.select("doc_id")).map(_.getLong(0)).toSet ==
      rows(docs.select("doc_id")).map(_.getLong(0)).toSet)
    // reproducible routing: a second export shards identically
    def membership(path: String): Map[String, Set[Long]] =
      new java.io.File(path).listFiles().filter(_.getName.startsWith("part-"))
        .sortBy(_.getName).zipWithIndex.map { case (f, i) =>
          i.toString -> scala.io.Source.fromFile(f).getLines()
            .map(l => """"doc_id":(\d+)""".r.findFirstMatchIn(l).get.group(1).toLong)
            .toSet
        }.toMap
    val p2 = java.nio.file.Files.createTempDirectory("graft_jsonl2").toString
    write(p2)
    assert(membership(p1) == membership(p2),
      "hash routing must be a pure function of the data")
  }

  test("compact refuses a Hive-partitioned dataset instead of flattening it") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val path = java.nio.file.Files.createTempDirectory("graft_part_refuse").toString
    Sinks.parquetPartitioned(docs, path, "lang")
    val e = intercept[IllegalArgumentException] {
      Sinks.compact(spark, path)
    }
    assert(e.getMessage.contains("partition"), e.getMessage)
    // the dataset is untouched: partition directories still present
    val back = spark.read.parquet(path)
    assert(back.count() == docs.count())
    assert(back.columns.contains("lang"))
  }
}
