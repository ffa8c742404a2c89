package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.types._
import graft.streaming.StatefulOps
import graft.streaming.StatefulOps.Keyed
import graft.sources.Sources

/** flatMapGroupsWithState custom-state semantics + csv/json source
  * round-trips. */
class StatefulSourcesSpec extends SparkSpec {

  test("firstSeenWithDupCount emits once per key across micro-batches") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val stream = MemoryStream[Keyed]
    val q = StatefulOps.firstSeenWithDupCount(stream.toDS())
      .writeStream.format("memory").queryName("first_seen")
      .outputMode("append").start()
    try {
      stream.addData(Keyed(1L, "a"), Keyed(1L, "a2"), Keyed(2L, "b"))
      q.processAllAvailable()
      stream.addData(Keyed(1L, "a3"), Keyed(3L, "c")) // key 1 suppressed
      q.processAllAvailable()
    } finally q.stop()
    val out = spark.table("first_seen")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(out == Set((1L, "a", 1L), (2L, "b", 0L), (3L, "c", 0L)))
  }

  test("transformWithState running totals accumulate across micro-batches") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    // transformWithState's contract: RocksDB-backed state store
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val stream = MemoryStream[StatefulOps.KeyedValue]
      val q = StatefulOps.runningTotals(stream.toDS())
        .writeStream.format("memory").queryName("running_totals")
        .outputMode("update").start()
      try {
        stream.addData(StatefulOps.KeyedValue(1L, 10.0),
          StatefulOps.KeyedValue(1L, 5.0), StatefulOps.KeyedValue(2L, 1.0))
        q.processAllAvailable()
        stream.addData(StatefulOps.KeyedValue(1L, 2.5),
          StatefulOps.KeyedValue(3L, 7.0))
        q.processAllAvailable()
      } finally q.stop()
      // update mode: one refreshed row per touched key per batch; the
      // LATEST row per key is the running total
      val latest = spark.table("running_totals")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .groupBy(_._1).map { case (k, rs) => k -> rs.maxBy(_._2) }
      assert(latest(1L) == ((1L, 3L, 17.5)))
      assert(latest(2L) == ((2L, 1L, 1.0)))
      assert(latest(3L) == ((3L, 1L, 7.0)))
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
      case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  test("csv source round-trip preserves schema and rows") {
    import spark.implicits._
    val df = Seq((1L, "x", 1.5), (2L, "y", 2.5)).toDF("id", "name", "v")
    val path = java.nio.file.Files.createTempDirectory("graft_csv").toString
    graft.sources.Sinks.csvWithHeader(df, path)
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType),
      StructField("v", DoubleType)))
    val back = Sources.csv(spark, path, schema)
    assert(back.collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
      .toSet == Set((1L, "x", 1.5), (2L, "y", 2.5)))
  }

  test("orc round-trip preserves rows; filter and projection are pushed") {
    import org.apache.spark.sql.functions._
    val path = "/tmp/graft_orc_test"
    val src = spark.read.parquet(s"$sfDir/documents.parquet")
    graft.sources.Sinks.orc(src, path)
    val back = Sources.orc(spark, path)
    assert(back.count() == src.count())
    assert(back.schema == src.schema)
    val q = back.filter(col("lang") === "en").select("doc_id", "lang")
    val scan = q.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).mkString("\n")
    assert(scan.contains("PushedFilters") && scan.contains("lang"),
      s"no pushed filter in ORC scan:\n$scan")
    assert(!scan.contains("text,") && !scan.contains("n_chars"),
      s"projection not pruned in ORC scan:\n$scan")
    assert(q.count() ==
      src.filter(col("lang") === "en").count())
  }

  test("json source round-trip preserves schema and rows") {
    import spark.implicits._
    val df = Seq((1L, "x"), (2L, "y")).toDF("id", "name")
    val path = java.nio.file.Files.createTempDirectory("graft_json").toString
    df.write.mode("overwrite").json(path)
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("name", StringType)))
    val back = Sources.json(spark, path, schema)
    assert(back.collect().map(r => (r.getLong(0), r.getString(1))).toSet ==
      Set((1L, "x"), (2L, "y")))
  }
}
