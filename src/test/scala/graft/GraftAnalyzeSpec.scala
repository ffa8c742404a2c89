package graft

import org.apache.spark.sql.functions._
import graft.sources.{GraftAnalyze, GraftParquetTable}

/** Table-level column statistics ([[graft.sources.GraftAnalyze]]):
  * the ANALYZE pass, its persisted sidecar, and the DSv2 statistics
  * surface — exact metadata row counts and per-column NDVs reaching
  * the catalyst planner (CBO join estimation). */
class GraftAnalyzeSpec extends SparkSpec {

  private val fmt = "graft.sources.GraftParquetTableProvider"
  private val cat = "graft_an_spec"
  private lazy val warehouse = {
    val d = java.nio.file.Files
      .createTempDirectory("graft_an_warehouse_").toFile.getAbsolutePath
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", d)
    d
  }

  private def docs = spark.read.parquet(s"$sfDir/documents.parquet")
    .select("doc_id", "lang", "n_chars")

  private def mkTable(name: String): String = {
    val p = s"$warehouse/corp/$name"
    docs.coalesce(2).write.format(fmt).option("path", p)
      .mode("append").save()
    p
  }

  private def read(p: String) =
    spark.read.format(fmt).option("path", p).load()

  test("analyze: exact rows, exact nulls, HLL NDV within tolerance") {
    val p = mkTable("a1")
    val ts = GraftAnalyze.analyze(spark, p)
    val n = docs.count()
    assert(ts.rows == n)
    val trueLangs = docs.select("lang").distinct().count()
    val trueIds = n // doc_id unique
    assert(ts.cols("lang").nullCount == 0)
    // HLL++ at default rsd 5%: tiny cardinalities are near-exact
    assert(math.abs(ts.cols("lang").ndv - trueLangs) <= 1)
    assert(math.abs(ts.cols("doc_id").ndv - trueIds).toDouble / trueIds
      < 0.1)
    val ls = ts.cols("lang")
    assert(ls.avgLen.exists(_ >= 2) && ls.maxLen.exists(_ >= 2))
    assert(ts.cols("n_chars").avgLen.isEmpty,
      "length moments only for string/binary")
    // persisted + re-readable (cache cleared by a fresh read path)
    assert(new java.io.File(p, GraftAnalyze.StatsFile).exists())
    assert(GraftAnalyze.read(p).contains(ts))
  }

  test("exact metadata numRows reaches the plan; filtered scans opt out") {
    val p = mkTable("a2")
    val n = docs.count()
    // unfiltered scan: rowCount from the manifest, zero data I/O
    val st = read(p).queryExecution.optimizedPlan.stats
    assert(st.rowCount.contains(BigInt(n)),
      s"expected exact rowCount $n from the manifest, got ${st.rowCount}")
    // a DELETE's DV subtracts from the metadata count
    spark.conf.set(GraftParquetTable.ModeConf, "merge-on-read")
    try spark.sql(s"DELETE FROM $cat.corp.a2 WHERE doc_id < 10")
    finally spark.conf.set(GraftParquetTable.ModeConf, "copy-on-write")
    val st2 = read(p).queryExecution.optimizedPlan.stats
    assert(st2.rowCount.contains(BigInt(n - 10)),
      s"DV positions must subtract: ${st2.rowCount}")
    // filtered scan: selectivity is the planner's problem, not ours
    val stF = read(p).filter(col("n_chars") > 100)
      .queryExecution.optimizedPlan.stats
    assert(stF.rowCount.isEmpty || stF.rowCount.exists(_ < BigInt(n)),
      "a pushed filter must not claim the full table's row count")
    // a pushed LIMIT caps the claim
    val stL = read(p).limit(5).queryExecution.optimizedPlan.stats
    assert(stL.rowCount.forall(_ <= BigInt(5)),
      s"a pushed limit must cap the row count: ${stL.rowCount}")
  }

  test("detail surfaces analyzed version, bloom spec and coverage") {
    val p = mkTable("a4")
    val d0 = spark.sql(
      s"CALL $cat.system.detail(table => 'corp.a4')").head()
    assert(d0.isNullAt(7) && d0.getString(8) == "" && d0.getInt(9) == 0,
      s"pre-analyze detail must be empty on the new columns: $d0")
    spark.sql(s"CALL $cat.system.analyze(table => 'corp.a4')")
    spark.sql(s"CALL $cat.system.build_bloom(table => 'corp.a4', " +
      "columns => 'doc_id')")
    // an append AFTER the build stays covered (write-time sidecars)
    docs.limit(3).coalesce(1).write.format(fmt).option("path", p)
      .mode("append").save()
    val d = spark.sql(
      s"CALL $cat.system.detail(table => 'corp.a4')").head()
    assert(!d.isNullAt(7), "analyzed_version must be recorded")
    assert(d.getString(8) == "doc_id")
    assert(d.getInt(9) == graft.sources.GraftParquetV2.listFiles(p).size,
      s"every live file must be bloom-covered: $d")
  }

  test("CALL system.analyze: NDVs flow into catalyst attribute stats") {
    mkTable("a3")
    val out = spark.sql(
      s"CALL $cat.system.analyze(table => 'corp.a3')").collect()
    assert(out.map(_.getString(0)).toSet ==
      Set("doc_id", "lang", "n_chars"))
    assert(out.forall(r =>
      r.getLong(r.fieldIndex("row_count")) == docs.count()))
    val p = s"$warehouse/corp/a3"
    val withCbo = read(p).queryExecution.optimizedPlan.stats
    val attr = withCbo.attributeStats.find(_._1.name == "lang")
    assert(attr.isDefined, s"lang attribute stats missing: $withCbo")
    val cs = attr.get._2
    assert(cs.distinctCount.exists(_ >= 1), s"NDV missing: $cs")
    assert(cs.nullCount.contains(BigInt(0)), s"null count: $cs")
  }
}
