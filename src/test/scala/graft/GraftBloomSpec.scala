package graft

import org.apache.spark.sql.functions._
import graft.sources.{GraftBloom, GraftParquetTable, GraftParquetV2, GraftScanTelemetry}

/** Per-file bloom-filter sidecars ([[graft.sources.GraftBloom]]):
  * equality file-skipping for high-cardinality UNSORTED columns that
  * zone maps cannot prune. Soundness (no false negatives → a skip is a
  * proof), conservatism (missing/stale sidecars read, never skip
  * wrongly), the SQL `CALL system.build_bloom` face, and the interplay
  * with appends, deletes, and the In-list cap.
  *
  * Probe values are deliberately INTERIOR to every file's [min, max] —
  * at the domain edges the zone maps refute first and the bloom path
  * never runs (that short-circuit is itself the cheapest outcome).
  * Telemetry asserts use `> 0`: Spark plans input partitions more than
  * once per query, so absolute counts are a planner implementation
  * detail (the [[SourcesV2Spec]] zone-map convention). */
class GraftBloomSpec extends SparkSpec {

  private val fmt = "graft.sources.GraftParquetTableProvider"
  private val cat = "graft_bloom_spec"
  private lazy val warehouse = {
    val d = java.nio.file.Files
      .createTempDirectory("graft_bloom_warehouse_").toFile.getAbsolutePath
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", d)
    d
  }

  private def docs = spark.read.parquet(s"$sfDir/documents.parquet")
    .select("doc_id", "lang", "n_chars")

  /** Two-file table split by doc_id PARITY — both files' [min, max]
    * span (almost) the whole id domain, so zone maps refute no
    * INTERIOR value: the exact shape where only a membership sketch
    * skips files. */
  private def mkTable(name: String): String = {
    val p = s"$warehouse/corp/$name"
    docs.filter(pmod(col("doc_id"), lit(2)) === 0).coalesce(1)
      .write.format(fmt).option("path", p).mode("append").save()
    docs.filter(pmod(col("doc_id"), lit(2)) === 1).coalesce(1)
      .write.format(fmt).option("path", p).mode("append").save()
    p
  }

  private def read(p: String) =
    spark.read.format(fmt).option("path", p).load()

  /** The MEDIAN even doc_id — even (present only in the even-parity
    * file) and interior to the odd file's id range, so only the bloom
    * sidecar can prove the odd file holds nothing. */
  private lazy val midEven: Long = {
    val evens = docs.filter(pmod(col("doc_id"), lit(2)) === 0)
      .select("doc_id").orderBy("doc_id").collect().map(_.getLong(0))
    evens(evens.length / 2)
  }

  /** A lang value strictly between the real min and max langs and
    * absent from the corpus — interior to every file's string zone
    * map, refutable only by the sidecars. */
  private lazy val ghostLang: String = {
    val langs = docs.select("lang").distinct().collect()
      .map(_.getString(0)).sorted
    assert(langs.length >= 2, "need a lang range to sit inside")
    langs.head + "0"
  }

  private def bloomSkips: Long = GraftScanTelemetry.bloomSkippedFiles.sum()

  test("build writes one sidecar per (live file, column)") {
    val p = mkTable("b1")
    val out = GraftBloom.build(spark, p, Seq("doc_id", "lang"))
    assert(out.map(o => (o._1, o._2)).toSet == Set(("doc_id", 2), ("lang", 2)))
    assert(out.forall(_._3 > 0L), "sidecar bytes must be reported")
    val dir = new java.io.File(p, GraftBloom.BloomDir)
    assert(dir.listFiles().count(_.getName.endsWith(".bloom")) == 4)
  }

  test("interior point lookup bloom-skips the file the value cannot be in") {
    val p = mkTable("b2")
    GraftBloom.build(spark, p, Seq("doc_id"))
    GraftScanTelemetry.reset()
    val got = read(p).filter(col("doc_id") === midEven).collect()
    assert(got.map(_.getLong(0)).toSeq == Seq(midEven))
    assert(GraftScanTelemetry.skippedFiles.sum() == 0,
      "an interior value must be invisible to the zone maps")
    assert(bloomSkips > 0, "the odd-parity file must be bloom-skipped")
  }

  test("interior IN-list over one parity bloom-skips the other file") {
    val p = mkTable("b3")
    GraftBloom.build(spark, p, Seq("doc_id"))
    val evens = docs.filter(pmod(col("doc_id"), lit(2)) === 0)
      .select("doc_id").orderBy("doc_id").collect().map(_.getLong(0))
    val mid = evens.length / 2
    val probes = evens.slice(mid - 1, mid + 2) // three interior evens
    GraftScanTelemetry.reset()
    val got = read(p).filter(col("doc_id").isin(probes.map(Long.box): _*))
      .count()
    assert(got == probes.length)
    assert(bloomSkips > 0)
  }

  test("interior absent string bloom-skips EVERY file - zero splits, zero rows") {
    val p = mkTable("b4")
    GraftBloom.build(spark, p, Seq("lang"))
    GraftScanTelemetry.reset()
    assert(read(p).filter(col("lang") === ghostLang).count() == 0)
    assert(GraftScanTelemetry.skippedFiles.sum() == 0,
      "ghost lang is inside every file's string zone map")
    assert(bloomSkips >= 2, "both files must be bloom-refuted")
    // a real lang present in both files skips nothing and counts exact
    val real = docs.select("lang").distinct().collect()
      .map(_.getString(0)).sorted.head
    GraftScanTelemetry.reset()
    assert(read(p).filter(col("lang") === real).count() ==
      docs.filter(col("lang") === real).count())
    assert(bloomSkips == 0)
  }

  test("appended file without a sidecar is conservatively read; rebuild re-covers") {
    val p = mkTable("b5")
    GraftBloom.build(spark, p, Seq("lang"))
    // append a third file holding the ghost lang AFTER the build — it
    // has no sidecar, so a ghost-lang probe must still read it
    docs.limit(5).withColumn("lang", lit(ghostLang)).coalesce(1)
      .write.format(fmt).option("path", p).mode("append").save()
    GraftScanTelemetry.reset()
    val got = read(p).filter(col("lang") === ghostLang).count()
    assert(got == 5, "the uncovered appended file must still be read")
    assert(bloomSkips > 0, "the two covered files are still refuted")
    // rebuild: the new file's sidecar now PROVES it holds the ghost
    // lang, and a never-present value refutes all three
    GraftBloom.build(spark, p, Seq("lang"))
    assert(read(p).filter(col("lang") === ghostLang).count() == 5)
    GraftScanTelemetry.reset()
    assert(read(p).filter(col("lang") === (ghostLang + "0")).count() == 0)
    assert(bloomSkips >= 3, "all three covered files refute the new ghost")
  }

  test("In-list beyond MaxProbeValues probes nothing (planner self-bound)") {
    val p = mkTable("b6")
    GraftBloom.build(spark, p, Seq("doc_id"))
    val huge = (0 until GraftBloom.MaxProbeValues + 1)
      .map(i => -1000L - i) // none present
    GraftScanTelemetry.reset()
    assert(read(p).filter(col("doc_id").isin(huge.map(Long.box): _*))
      .count() == 0)
    assert(bloomSkips == 0,
      "an over-cap In-list must skip the bloom probe entirely")
  }

  test("MOR-deleted row: bloom false positive reads, DV still excludes") {
    val p = mkTable("b7")
    GraftBloom.build(spark, p, Seq("doc_id"))
    spark.conf.set(GraftParquetTable.ModeConf, "merge-on-read")
    try spark.sql(s"DELETE FROM $cat.corp.b7 WHERE doc_id = $midEven")
    finally spark.conf.set(GraftParquetTable.ModeConf, "copy-on-write")
    // the stale sidecar still claims membership → the file is read
    // (false positive, sound) and the DV drops the row in-scan
    assert(read(p).filter(col("doc_id") === midEven).count() == 0)
    assert(read(p).count() == docs.count() - 1)
  }

  test("CALL system.build_bloom + catalog point lookup end to end") {
    mkTable("b8")
    val out = spark.sql(
      s"CALL $cat.system.build_bloom(table => 'corp.b8', " +
        "columns => 'doc_id,lang')").collect()
    assert(out.map(r => (r.getString(0), r.getInt(1))).toSet ==
      Set(("doc_id", 2), ("lang", 2)))
    assert(out.forall(_.getLong(2) > 0L))
    GraftScanTelemetry.reset()
    val got = spark.sql(
      s"SELECT doc_id FROM $cat.corp.b8 WHERE doc_id = $midEven").collect()
    assert(got.map(_.getLong(0)).toSeq == Seq(midEven))
    assert(bloomSkips > 0)
  }

  test("non-bloomable column type and unknown column are refused") {
    val p = mkTable("b9")
    val e1 = intercept[IllegalArgumentException](
      GraftBloom.build(spark, p, Seq("nope")))
    assert(e1.getMessage.contains("not in table schema"))
    val p2 = s"$warehouse/corp/b9d"
    docs.withColumn("score", col("n_chars") * 0.5).coalesce(1)
      .write.format(fmt).option("path", p2).mode("append").save()
    val e2 = intercept[IllegalArgumentException](
      GraftBloom.build(spark, p2, Seq("score")))
    assert(e2.getMessage.contains("only integral and string"))
  }

  test("explain surfaces BloomProbes for a bloomed table") {
    val p = mkTable("b10")
    GraftBloom.build(spark, p, Seq("doc_id"))
    val df = read(p).filter(col("doc_id") === midEven)
    val plan = df.queryExecution.executedPlan.toString()
    assert(plan.contains("BloomProbes: [doc_id]"), plan)
  }

  test("persisted spec: appends MAINTAIN sidecars - no rebuild needed") {
    val p = mkTable("b12")
    GraftBloom.build(spark, p, Seq("lang")) // persists _graft_bloom_spec
    assert(new java.io.File(p, GraftBloom.SpecFile).exists())
    // append a file holding the ghost lang; the WRITE itself must
    // cover it (task-side exact-size sidecar, no build call)
    docs.limit(5).withColumn("lang", lit(ghostLang)).coalesce(1)
      .write.format(fmt).option("path", p).mode("append").save()
    val dir = new java.io.File(p, GraftBloom.BloomDir)
    assert(dir.listFiles().count(_.getName.endsWith(".bloom")) == 3,
      "the append must have written its own sidecar")
    // a never-present value now bloom-refutes ALL THREE files —
    // including the just-appended one, proving write-time coverage
    GraftScanTelemetry.reset()
    assert(read(p).filter(col("lang") === (ghostLang + "0")).count() == 0)
    assert(bloomSkips >= 3)
    // and the appended file's own content still answers exactly
    assert(read(p).filter(col("lang") === ghostLang).count() == 5)
  }

  test("write-time sidecars size EXACTLY and cover catalog INSERT INTO") {
    mkTable("b13")
    spark.sql(s"CALL $cat.system.build_bloom(table => 'corp.b13', " +
      "columns => 'doc_id')")
    val nextId = docs.count() * 10
    spark.sql(s"INSERT INTO $cat.corp.b13 VALUES " +
      s"($nextId, '$ghostLang', 7)")
    val p = s"$warehouse/corp/b13"
    val dir = new java.io.File(p, GraftBloom.BloomDir)
    assert(dir.listFiles().count(_.getName.endsWith(".bloom")) == 3,
      "the SQL INSERT must have written its own sidecar")
    // the single-row file's sidecar is sized for 64 items (the floor),
    // not a default guess — tiny appends stay tiny
    val newest = dir.listFiles().filter(_.getName.endsWith(".bloom"))
      .minBy(_.length())
    assert(newest.length() < 4096,
      s"1-row sidecar should be near the 64-item floor, got ${newest.length()}")
    assert(spark.sql(
      s"SELECT count(*) AS n FROM $cat.corp.b13 WHERE doc_id = $nextId")
      .head().getLong(0) == 1L)
  }

  test("spec column absent from a staged file degrades to no sidecar") {
    // unit-level: a staged file whose footer lacks the spec column (or
    // carries it as a non-bloomable primitive) yields NO sidecar — the
    // conservative-read contract, not a wrong skip and not a crash
    val p = mkTable("b14")
    val f = graft.sources.GraftParquetV2.listFiles(p).head
    val conf = new org.apache.hadoop.conf.Configuration()
    val fp = new org.apache.hadoop.fs.Path(f)
    assert(GraftBloom.buildForStaged(conf, fp, p, Seq("nope"), 0.01).isEmpty)
    // and a real column yields exactly one sidecar at the final spot
    val made = GraftBloom.buildForStaged(conf, fp, p, Seq("lang"), 0.01)
    assert(made.size == 1 &&
      made.head.getName == s"${fp.getName}.lang.bloom")
  }

  test("compaction and MOR update images re-cover through the write path") {
    val p = mkTable("b15")
    GraftBloom.build(spark, p, Seq("lang"))
    // compaction rewrites everything through the connector writer —
    // with a persisted spec the PACKED files arrive already covered
    graft.sources.GraftMaintenance.compact(spark, p)
    val live = graft.sources.GraftParquetV2.listFiles(p)
      .map(f => new org.apache.hadoop.fs.Path(f).getName).toSet
    val dir = new java.io.File(p, GraftBloom.BloomDir)
    val covered = dir.listFiles().map(_.getName)
      .filter(_.endsWith(".lang.bloom"))
      .map(_.stripSuffix(".lang.bloom")).toSet
    assert(live.subsetOf(covered),
      s"every packed file must carry a sidecar; live=$live covered=$covered")
    GraftScanTelemetry.reset()
    assert(read(p).filter(col("lang") === ghostLang).count() == 0)
    assert(bloomSkips > 0, "packed files bloom-refute the ghost lang")
    // a MOR UPDATE's appended image file is covered too
    spark.conf.set(GraftParquetTable.ModeConf, "merge-on-read")
    try spark.sql(s"UPDATE $cat.corp.b15 SET lang = '$ghostLang' " +
      s"WHERE doc_id = $midEven")
    finally spark.conf.set(GraftParquetTable.ModeConf, "copy-on-write")
    val live2 = graft.sources.GraftParquetV2.listFiles(p)
      .map(f => new org.apache.hadoop.fs.Path(f).getName).toSet
    val covered2 = dir.listFiles().map(_.getName)
      .filter(_.endsWith(".lang.bloom"))
      .map(_.stripSuffix(".lang.bloom")).toSet
    assert(live2.subsetOf(covered2),
      "the MOR update's image file must carry a sidecar")
    assert(read(p).filter(col("lang") === ghostLang)
      .head().getLong(0) == midEven)
  }

  test("runtime join keys (DPP) bloom-skip fact files zone maps cannot") {
    // HASH-bucketed fact: every file's id range spans the domain, so
    // the star-join's runtime In(id, dimKeys) is invisible to zone
    // maps — only the sidecars can drop whole fact files
    val p = s"$warehouse/corp/b16"
    val fact = spark.range(4000L)
      .select(col("id"), (col("id") * 3).as("v"))
    (0 until 4).foreach { b =>
      fact.filter(pmod(hash(col("id")), lit(4)) === b).coalesce(1)
        .write.format(fmt).option("path", p).mode("append").save()
    }
    GraftBloom.build(spark, p, Seq("id"))
    // dim keys all in ONE hash bucket → three fact files hold none;
    // the dim carries a SELECTIVE filter (Spark's runtime-filter
    // injection requires one on the build side)
    // INTERIOR keys (median stretch of the bucket) so the statically
    // inferred In — Catalyst propagates the dim filter through the
    // join — cannot be zone-refuted; only the sidecars prune
    val bucket0 = fact.filter(pmod(hash(col("id")), lit(4)) === 0)
      .select("id").orderBy("id").collect().map(_.getLong(0))
    val keys = bucket0.slice(bucket0.length / 2, bucket0.length / 2 + 5)
    val dimPath = s"$warehouse/corp/b16_dim"
    spark.range(4000L).select(col("id").as("fid"),
        concat(lit("d"), col("id")).as("name"))
      .coalesce(1).write.mode("overwrite").parquet(dimPath)
    val dim = spark.read.parquet(dimPath)
      .filter(col("fid").isin(keys.map(Long.box): _*))
    GraftScanTelemetry.reset()
    val j = read(p).join(dim, col("id") === col("fid"))
      .select("id", "v")
    val got = j.collect().map(_.getLong(0)).toSet
    assert(got == keys.toSet)
    assert(GraftScanTelemetry.skippedFiles.sum() == 0,
      "interior keys must be invisible to the zone maps")
    assert(bloomSkips >= 3,
      "the three keyless fact files must be bloom-skipped from the " +
        "inferred + runtime join keys")
  }

  test("COW row-level ops rewrite ONLY the bloom-surviving candidates") {
    // a point DELETE on a hash-distributed key: zone maps see every
    // file as a candidate (full-range min/max) — without the sidecars
    // a 1-row COW delete would rewrite the WHOLE table; with them the
    // keyless file is refuted from the candidate set and carries
    // untouched. The write-amplification story at 100 TB.
    val p = mkTable("b17")
    GraftBloom.build(spark, p, Seq("doc_id"))
    val archBefore =
      graft.sources.GraftTableLog.archivedStatuses(p).size
    graft.sources.GraftMaintenance.delete(spark, p,
      col("doc_id") === midEven)
    val archAfter =
      graft.sources.GraftTableLog.archivedStatuses(p).size
    assert(archAfter - archBefore == 1,
      "only the even-parity file may be archived by the rewrite")
    assert(read(p).count() == docs.count() - 1)
    // the rewritten file re-covered itself at write time (spec
    // persisted): the deleted key is interior, absent everywhere, and
    // now refuted by BOTH sidecars — the fresh one no longer holds it
    GraftScanTelemetry.reset()
    assert(read(p).filter(col("doc_id") === midEven).count() == 0)
    assert(bloomSkips >= 2, "rewritten + untouched files both refute")
  }

  test("build reaps orphaned sidecars after an overwrite") {
    val p = mkTable("b11")
    GraftBloom.build(spark, p, Seq("doc_id"))
    val dir = new java.io.File(p, GraftBloom.BloomDir)
    assert(dir.listFiles().count(_.getName.endsWith(".bloom")) == 2)
    // overwrite with every third doc: ids 0, 3, 6, … — id 1 is
    // interior to the survivor's range yet absent
    docs.filter(pmod(col("doc_id"), lit(3)) === 0).coalesce(1)
      .write.format(fmt).option("path", p).mode("overwrite").save()
    GraftBloom.build(spark, p, Seq("doc_id"))
    // the two pre-overwrite sidecars are orphans (their files archived)
    // and must be reaped; exactly the one live file is covered
    assert(dir.listFiles().count(_.getName.endsWith(".bloom")) == 1)
    GraftScanTelemetry.reset()
    assert(read(p).filter(col("doc_id") === 1L).count() == 0)
    assert(bloomSkips > 0)
  }

  /** Files larger than the session's split size used to shatter the
    * build read across tasks — each task renamed in a sidecar hashed
    * from only ITS split's values, and the last-rename survivor was a
    * PARTIAL filter whose false negatives silently skipped live rows.
    * The build now reads in a child session sized one-file-one-split,
    * so a hostile parent conf (here: 4 KB splits, far below the data
    * files) must neither fail the build nor corrupt a single probe. */
  test("build is immune to tiny session split sizes (no partial sidecars)") {
    val p = mkTable("b18")
    val prevMax = spark.conf.getOption("spark.sql.files.maxPartitionBytes")
    val prevCost = spark.conf.getOption("spark.sql.files.openCostInBytes")
    try {
      spark.conf.set("spark.sql.files.maxPartitionBytes", "4096")
      spark.conf.set("spark.sql.files.openCostInBytes", "0")
      // sanity: the parent session WOULD split these files
      assert(spark.read.parquet(GraftParquetV2.listFiles(p): _*)
        .rdd.getNumPartitions > 2,
        "precondition: parent split conf shatters the files")
      val out = GraftBloom.build(spark, p, Seq("doc_id", "lang"))
      assert(out.forall(_._2 == 2),
        s"every column covers both files: $out")
    } finally {
      prevMax.fold(spark.conf.unset("spark.sql.files.maxPartitionBytes"))(
        spark.conf.set("spark.sql.files.maxPartitionBytes", _))
      prevCost.fold(spark.conf.unset("spark.sql.files.openCostInBytes"))(
        spark.conf.set("spark.sql.files.openCostInBytes", _))
    }
    // no false negatives anywhere: every live doc_id still returns its
    // row through the bloomed point-lookup path
    val ids = docs.select("doc_id").collect().map(_.getLong(0))
    val sample = ids.sorted.grouped(math.max(1, ids.length / 16))
      .map(_.head).toSeq
    sample.foreach { id =>
      assert(read(p).filter(col("doc_id") === id).count() == 1,
        s"doc_id=$id wrongly bloom-skipped — partial sidecar")
    }
    // and the sketch still refutes: the median EVEN id is interior to
    // the odd file's zone map, so only a complete bloom sidecar proves
    // the odd file holds nothing — one row back, one file skipped
    GraftScanTelemetry.reset()
    assert(read(p).filter(col("doc_id") === midEven).count() == 1)
    assert(bloomSkips > 0)
  }
}
