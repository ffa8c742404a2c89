package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.{EqualTo, GreaterThan}
import graft.sources.GraftParquetScan

/** The graft DataSource V2 connector: pushdown really lands in the scan
  * (projection pruned, filters claimed by the connector), and results are
  * bit-identical to the built-in parquet source across filter shapes —
  * including the SQL three-valued cases a boolean evaluator gets wrong. */
class SourcesV2Spec extends SparkSpec {

  private def viaV2(path: String): DataFrame = spark.read
    .format("graft.sources.GraftParquetTableProvider")
    .option("path", path).load()

  private def graftScan(df: DataFrame): GraftParquetScan = {
    // AQE wraps materialized subtrees in leaf QueryStageExec nodes (and
    // the whole plan in AdaptiveSparkPlanExec), so a plain collect never
    // sees a scan inside a finished stage — recurse through both
    def scans(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[GraftParquetScan] = p.collect {
      case b: BatchScanExec => b.scan match {
        case s: GraftParquetScan => Seq(s)
        case _ => Nil
      }
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        scans(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        scans(q.plan)
    }.flatten
    scans(df.queryExecution.executedPlan).headOption
      .getOrElse(fail("no GraftParquetScan in the plan"))
  }

  test("schema inference matches the built-in parquet reader") {
    val path = s"$sfDir/documents.parquet"
    assert(viaV2(path).schema == spark.read.parquet(path).schema)
  }

  test("filter and projection are pushed INTO the scan node") {
    val df = viaV2(s"$sfDir/documents.parquet")
      .filter(col("lang") === "en" && col("n_chars") > 500L)
      .select("source", "n_chars")
    val scan = graftScan(df)
    // projection pruned to what the query needs downstream of the pushed
    // filters — the filter-only column lang is NOT in the read schema
    assert(scan.readSchema().fieldNames.toSet == Set("source", "n_chars"),
      s"read schema not pruned: ${scan.readSchema()}")
    // both predicates claimed by the connector
    val pushed = scan.pushed.toSet
    assert(pushed.contains(EqualTo("lang", "en")), s"pushed: $pushed")
    assert(pushed.contains(GreaterThan("n_chars", 500L)), s"pushed: $pushed")
    // and the observability contract: .explain carries both
    assert(scan.description().contains("PushedFilters"))
    assert(scan.description().contains("ReadSchema"))
  }

  test("pushed-filter results equal the built-in source across shapes") {
    val path = s"$sfDir/documents.parquet"
    val preds = Seq(
      col("lang") === "en",
      col("n_chars") > 500L && col("lang") =!= "de",
      col("lang").isin("en", "fr") || col("n_chars") <= 100L,
      col("source").startsWith("w"),
      !(col("lang") === "en"))
    for (p <- preds) {
      val v2 = rows(viaV2(path).filter(p).select("doc_id")).map(_.getLong(0)).toSet
      val ref = rows(spark.read.parquet(path).filter(p).select("doc_id"))
        .map(_.getLong(0)).toSet
      assert(v2 == ref, s"mismatch for $p")
    }
  }

  test("three-valued logic on nulls: Not(EqualTo) drops null rows, like SQL") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_v2_nulls")
    val path = s"$dir/t.parquet"
    Seq((1L, Some("a")), (2L, Some("b")), (3L, None: Option[String]))
      .toDF("id", "s").write.mode("overwrite").parquet(path)
    val preds = Seq(
      !(col("s") === "a"),           // null s must DROP (unknown), not keep
      col("s") =!= "a" || col("id") === 3L,
      col("s").isNull,
      col("s").isNotNull && col("s") < "b")
    for (p <- preds) {
      val df = viaV2(path).filter(p)
      // the predicate really is evaluated connector-side, not by Spark
      assert(graftScan(df).pushed.nonEmpty, s"nothing pushed for $p")
      val v2 = rows(df.select("id")).map(_.getLong(0)).toSet
      val ref = rows(spark.read.parquet(path).filter(p).select("id"))
        .map(_.getLong(0)).toSet
      assert(v2 == ref, s"null semantics diverge for $p")
    }
  }

  test("unsupported-type predicates come back as residuals, results intact") {
    val path = s"$sfDir/orders.parquet"
    val cutoff = "1995-06-01"
    val df = viaV2(path).filter(col("o_orderdate") >= cutoff)
    // timestamp comparisons are not connector-evaluable: the comparison
    // stays with Spark (only the null-test is claimed — that IS
    // evaluable), and the result still matches the built-in
    assert(graftScan(df).pushed.forall(
      _.isInstanceOf[org.apache.spark.sql.sources.IsNotNull]),
      s"comparison wrongly claimed: ${graftScan(df).pushed.mkString(", ")}")
    assert(df.count() ==
      spark.read.parquet(path).filter(col("o_orderdate") >= cutoff).count())
  }

  test("count over a fully-pushed filter (empty required schema) works") {
    val path = s"$sfDir/documents.parquet"
    val n = viaV2(path).filter(col("lang") === "en").count()
    val ref = spark.read.parquet(path).filter(col("lang") === "en").count()
    assert(n == ref && n > 0)
  }

  test("global COUNT/MIN/MAX are pushed to the scan and match the built-in") {
    val path = s"$sfDir/lineitem.parquet"
    def agged(df: DataFrame) = df.agg(
      count(lit(1)).as("n"), count(col("l_quantity")).as("nq"),
      min("l_orderkey").as("mink"), max("l_orderkey").as("maxk"),
      min("l_quantity").as("minq"), max("l_quantity").as("maxq"))
    // no filter → the connector answers from footer metadata alone
    val df = agged(viaV2(path))
    val scan = graftScan(df)
    assert(scan.aggs.isDefined, "aggregation not pushed")
    assert(scan.description().contains("PushedAggregation"),
      scan.description())
    assert(rows(df) == rows(agged(spark.read.parquet(path))))
    // with a pushed filter → per-file row scan, same merge contract
    val f = col("l_quantity") >= 30.0
    val dff = agged(viaV2(path).filter(f))
    assert(graftScan(dff).aggs.isDefined, "filtered aggregation not pushed")
    assert(graftScan(dff).pushed.nonEmpty, "filter not pushed")
    assert(rows(dff) == rows(agged(spark.read.parquet(path).filter(f))))
  }

  test("pushed aggregates handle nulls: count(col) excludes, min of all-null is null") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_v2_aggnull")
    val path = s"$dir/t.parquet"
    Seq((1L, Some(10L), None: Option[Long]),
        (2L, None: Option[Long], None: Option[Long]),
        (3L, Some(7L), None: Option[Long]))
      .toDF("id", "v", "w").write.mode("overwrite").parquet(path)
    val df = viaV2(path).agg(
      count(col("v")).as("nv"), min("v").as("minv"),
      count(col("w")).as("nw"), max("w").as("maxw"))
    assert(graftScan(df).aggs.isDefined, "aggregation not pushed")
    val r = rows(df).head
    assert(r.getLong(0) == 2L && r.getLong(1) == 7L, r.toString)
    assert(r.getLong(2) == 0L && r.isNullAt(3), r.toString)
  }

  test("integral SUM is pushed; floating SUM declines the whole aggregation") {
    val path = s"$sfDir/lineitem.parquet"
    def agg(df: DataFrame) = df.agg(
      sum("l_orderkey").as("sk"), sum("l_linenumber").as("sl"),
      count(lit(1)).as("n"))
    val df = agg(viaV2(path).filter(col("l_quantity") >= 30.0))
    val scan = graftScan(df)
    assert(scan.aggs.isDefined && scan.aggs.get.exists(
      _.isInstanceOf[graft.sources.GraftAggSpec.SumCol]),
      s"sum not pushed: ${scan.description()}")
    assert(rows(df) == rows(agg(
      spark.read.parquet(path).filter(col("l_quantity") >= 30.0))))
    // a double sum in the mix → connector declines wholesale (per-file
    // partial grouping would round floating sums differently), results
    // still exact via Spark's own aggregation
    val dfl = viaV2(path).agg(sum("l_quantity").as("sq"), count(lit(1)).as("n"))
    assert(graftScan(dfl).aggs.isEmpty,
      s"floating sum must not be claimed: ${graftScan(dfl).description()}")
    assert(rows(dfl) == rows(spark.read.parquet(path)
      .agg(sum("l_quantity").as("sq"), count(lit(1)).as("n"))))
  }

  test("GROUP BY aggregation is pushed: per-file partial group rows, " +
    "Spark's final merge — results match the built-in exactly") {
    val path = s"$sfDir/documents.parquet"
    def agged(df: DataFrame) = df.groupBy("lang", "source")
      .agg(count(lit(1)).as("n"), count(col("n_chars")).as("nc"),
        min("n_chars").as("minc"), max("n_chars").as("maxc"),
        sum("n_chars").as("sumc"))
      .orderBy("lang", "source")
    val df = agged(viaV2(path))
    val scan = graftScan(df)
    assert(scan.aggs.isDefined, s"grouped aggregation not pushed: ${scan.description()}")
    assert(scan.groupBy.map(_.name) == Seq("lang", "source"),
      s"wrong pushed grouping: ${scan.description()}")
    assert(scan.description().contains("PushedGroupBy"), scan.description())
    assert(rows(df) == rows(agged(spark.read.parquet(path))))
    // with a pushed filter: same contract
    val dff = agged(viaV2(path).filter(col("n_chars") > 200L))
    assert(graftScan(dff).aggs.isDefined && graftScan(dff).pushed.nonEmpty,
      graftScan(dff).description())
    assert(rows(dff) ==
      rows(agged(spark.read.parquet(path).filter(col("n_chars") > 200L))))
  }

  test("grouped pushdown declines float group keys and distinct aggs") {
    val path = s"$sfDir/lineitem.parquet"
    // double group key → declined wholesale, Spark aggregates scan rows
    val df = viaV2(path).groupBy("l_quantity").agg(count(lit(1)).as("n"))
    assert(graftScan(df).aggs.isEmpty,
      s"float group key must not be claimed: ${graftScan(df).description()}")
    assert(df.count() ==
      spark.read.parquet(path).select("l_quantity").distinct().count())
    // distinct agg under a group → declined
    val dfd = viaV2(path).groupBy("l_linestatus")
      .agg(countDistinct("l_orderkey").as("nd"))
    assert(graftScan(dfd).aggs.isEmpty,
      s"distinct agg must not be claimed: ${graftScan(dfd).description()}")
    val v2 = rows(dfd.orderBy("l_linestatus"))
      .map(r => (r.getString(0), r.getLong(1)))
    val ref = rows(spark.read.parquet(path).groupBy("l_linestatus")
      .agg(countDistinct("l_orderkey").as("nd")).orderBy("l_linestatus"))
      .map(r => (r.getString(0), r.getLong(1)))
    assert(v2 == ref)
  }

  test("grouped pushdown handles null group keys and all-null agg inputs") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_v2_gnull")
    val path = s"$dir/t.parquet"
    Seq((Some("a"), Some(10L)), (None: Option[String], Some(5L)),
        (Some("a"), None: Option[Long]), (None: Option[String], Some(7L)),
        (Some("b"), None: Option[Long]))
      .toDF("g", "v").write.mode("overwrite").parquet(path)
    def agged(df: DataFrame) = df.groupBy("g")
      .agg(count(lit(1)).as("n"), count(col("v")).as("nv"),
        min("v").as("minv"), sum("v").as("sumv"))
      .orderBy(col("g").asc_nulls_first)
    val df = agged(viaV2(path))
    assert(graftScan(df).aggs.isDefined, graftScan(df).description())
    assert(rows(df).toString == rows(agged(spark.read.parquet(path))).toString)
  }

  test("randomized predicate parity: connector == built-in on 40 seeded filters") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    def opt[A](v: A): Option[A] = if (rnd.nextInt(5) == 0) None else Some(v)
    val data = (1L to 300L).map { id =>
      (id, opt(rnd.nextInt(20)), opt(rnd.nextLong() % 1000L),
        opt(rnd.nextDouble() * 100), opt("s" + rnd.nextInt(10)),
        opt(rnd.nextBoolean()))
    }
    val dir = java.nio.file.Files.createTempDirectory("graft_v2_fuzz")
    val path = s"$dir/t.parquet"
    data.toDF("id", "i", "l", "d", "s", "b")
      .write.mode("overwrite").parquet(path)
    // the same rows as a MANIFESTED multi-file table: every predicate
    // additionally crosses the file-level zone-map refutation (nulls,
    // every kind incl. double="other"), which must stay sound for any
    // filter shape
    val mPath = s"$dir/tm.parquet"
    graft.sources.Sinks.parquetWithStats(
      spark.read.parquet(path).repartitionByRange(4, col("id")), mPath)

    def leaf(): org.apache.spark.sql.Column = rnd.nextInt(9) match {
      case 0 => col("i") === rnd.nextInt(20)
      case 1 => col("l") > (rnd.nextLong() % 1000L)
      case 2 => col("d") <= rnd.nextDouble() * 100
      case 3 => col("s").startsWith("s" + rnd.nextInt(10))
      case 4 => col("s").isin((0 to rnd.nextInt(3)).map("s" + _): _*)
      case 5 => col("i").isNull
      case 6 => col("d").isNotNull
      case 7 => col("b") === rnd.nextBoolean()
      case _ => col("s") =!= ("s" + rnd.nextInt(10))
    }
    def pred(depth: Int): org.apache.spark.sql.Column =
      if (depth == 0) leaf()
      else rnd.nextInt(3) match {
        case 0 => pred(depth - 1) && pred(depth - 1)
        case 1 => pred(depth - 1) || pred(depth - 1)
        case _ => !pred(depth - 1)
      }
    var pushedSome = false
    for (t <- 1 to 40) {
      val p = pred(rnd.nextInt(3))
      val v2 = rows(viaV2(path).filter(p).select("id")).map(_.getLong(0)).toSet
      val ref = rows(spark.read.parquet(path).filter(p).select("id"))
        .map(_.getLong(0)).toSet
      assert(v2 == ref, s"trial $t diverged for predicate $p")
      val v2m = rows(viaV2(mPath).filter(p).select("id"))
        .map(_.getLong(0)).toSet
      assert(v2m == ref, s"trial $t MANIFESTED scan diverged for $p")
      pushedSome ||= graftScan(viaV2(path).filter(p)).pushed.nonEmpty
    }
    assert(pushedSome, "no predicate was ever pushed — the fuzz tested nothing")
  }

  test("row-group stats pruning: refuted groups are skipped without " +
    "decoding, results stay bit-identical to the built-in source") {
    import spark.implicits._
    import graft.sources.GraftScanTelemetry
    val dir = java.nio.file.Files.createTempDirectory("graft_v2_prune")
    val path = s"$dir/t.parquet"
    // one physical file, ids sorted so row-group min/max ranges are
    // disjoint; tiny block/page sizes force many row groups
    (0L until 40000L)
      .map(i => (i, s"name_${i % 97}",
        if (i < 1000 && i % 13 == 0) None else Some(i * 2), i.toDouble / 3))
      .toDF("id", "s", "v", "d")
      .coalesce(1).sortWithinPartitions("id")
      .write.mode("overwrite")
      .option("parquet.block.size", 64 * 1024)
      .option("parquet.page.size", 8 * 1024)
      .parquet(path)

    def run(df: DataFrame): (Seq[Long], Long, Long) = {
      GraftScanTelemetry.reset()
      val ids = rows(df.select("id")).map(_.getLong(0)).sorted
      (ids, GraftScanTelemetry.decodedGroups.sum(),
        GraftScanTelemetry.skippedGroups.sum())
    }

    // baseline: an unrefutable filter decodes every group
    val (all, total, sk0) = run(viaV2(path).filter(col("id") >= 0L))
    assert(all.size == 40000 && sk0 == 0L)
    assert(total >= 4, s"only $total row groups — block size option ignored, " +
      "the pruning assertions below would be vacuous")

    // selective range: most groups refuted, results exact
    val sel = col("id") >= 1000L && col("id") < 1500L
    val (got, dec, sk) = run(viaV2(path).filter(sel))
    val want = rows(spark.read.parquet(path).filter(sel).select("id"))
      .map(_.getLong(0)).sorted
    assert(got == want, "pruned scan diverged from the built-in source")
    assert(sk > 0L, "no group was skipped for a 1.25%-selective sorted range")
    assert(dec + sk == total && dec < total)

    // IsNull where only early row groups contain nulls: later groups'
    // zero null-counts refute them from footers alone
    val (withNulls, decN, skN) = run(viaV2(path).filter(col("v").isNull))
    val wantNulls = rows(spark.read.parquet(path).filter(col("v").isNull)
      .select("id")).map(_.getLong(0)).sorted
    assert(withNulls == wantNulls && withNulls.nonEmpty)
    assert(skN > 0L, "null-count refutation never fired for IsNull")
    assert(decN + skN == total)

    // equality probe outside every group's range
    val (eqNone, dec3, sk3) = run(viaV2(path).filter(col("id") === -5L))
    assert(eqNone.isEmpty && dec3 == 0L && sk3 == total)

    // Float/Double bounds are never trusted: a refutable-looking double
    // range must still decode (NaN/-0.0 stats lore)
    val (dNone, dec4, _) = run(viaV2(path).filter(col("d") < -1.0))
    assert(dNone.isEmpty && dec4 == total,
      "double-range refutation fired — float/double stats must not be trusted")

  }

  test("string compare is UTF8_BINARY byte order (supplementary chars), " +
    "and string stats pruning uses exactly that order") {
    import spark.implicits._
    import graft.sources.GraftScanTelemetry
    val dir = java.nio.file.Files.createTempDirectory("graft_v2_prune_s")
    val path = s"$dir/t.parquet"
    // strings straddling the orders that disagree: U+FFFD and U+FFFF
    // sort below supplementary U+10400 in UTF-8 byte/code-point order
    // but ABOVE it in Java's UTF-16 compareTo — Spark's UTF8_BINARY
    // collation is the byte order, and the connector must match it
    val supp = new String(Character.toChars(0x10400))
    Seq("apple", "pear", "\uFFFD", supp)
      .toDF("s").coalesce(1).write.mode("overwrite").parquet(path)

    def run(p: org.apache.spark.sql.Column): (Set[String], Long, Long) = {
      GraftScanTelemetry.reset()
      val got = rows(viaV2(path).filter(p).select("s")).map(_.getString(0)).toSet
      (got, GraftScanTelemetry.decodedGroups.sum(),
        GraftScanTelemetry.skippedGroups.sum())
    }

    // parity on the order-divergent cases — a UTF-16 evaluator returns
    // the WRONG rows for the first two (caught live by this spec:
    // > "\uFFFF" must KEEP the supplementary char)
    for (p <- Seq(col("s") > "\uFFFF", col("s") < "\uFFFF",
        col("s") === "café", col("s").startsWith("\uFFFD"),
        col("s") >= supp)) {
      val (got, _, _) = run(p)
      val want = rows(spark.read.parquet(path).filter(p).select("s"))
        .map(_.getString(0)).toSet
      assert(got == want, s"diverged on $p")
    }

    // ASCII literal outside the byte-order bounds: file skipped entirely
    val (got, dec, sk) = run(col("s") < "a")
    assert(got.isEmpty && dec == 0L && sk > 0L,
      "ASCII out-of-range literal should refute from stats alone")

    // non-ASCII refutation is trustworthy too — eval, stats, and
    // literal all share the byte order: nothing sorts strictly above
    // the supplementary max, so the file is refuted without decoding
    val (gtNone, decG, skG) = run(col("s") > supp)
    assert(gtNone.isEmpty && decG == 0L && skG > 0L,
      "byte-order string refutation should fire for > max")

    // prefix query stays correct whether or not the succ-bound fires
    val (pre, _, _) = run(col("s").startsWith("pe"))
    assert(pre == Set("pear"))
  }

  test("LIMIT is pushed to the scan (partial contract) and results are exact") {
    val path = s"$sfDir/documents.parquet"
    val df = viaV2(path).select("doc_id").limit(7)
    val scan = graftScan(df)
    assert(scan.limit == 7, s"limit not pushed: ${scan.description()}")
    assert(scan.description().contains("PushedLimit: 7"))
    // partial push: Spark's global Limit must still cap the result
    assert(df.count() == 7)
    // a limit larger than the table degrades to a full read, exactly
    val total = spark.read.parquet(path).count()
    assert(viaV2(path).limit(1000000).count() == total)
    // limit composed with a pushed filter: filter applies BEFORE limit
    val filtered = viaV2(path).filter(col("lang") === "en")
      .select("doc_id").limit(5)
    val viaBuiltin = spark.read.parquet(path)
      .filter(col("lang") === "en").select("doc_id").limit(5)
    assert(filtered.count() == viaBuiltin.count())
  }

  test("runtime filtering: a broadcast join's surviving dim keys prune " +
    "the fact scan's row groups at runtime") {
    import spark.implicits._
    import graft.sources.GraftScanTelemetry
    val dir = java.nio.file.Files.createTempDirectory("graft_v2_dpp")
    val path = s"$dir/t.parquet"
    // sorted fact, tiny blocks → many row groups with disjoint id ranges
    (0L until 40000L).map(i => (i, i * 2)).toDF("id", "v")
      .coalesce(1).sortWithinPartitions("id")
      .write.mode("overwrite")
      .option("parquet.block.size", 64 * 1024)
      .option("parquet.page.size", 8 * 1024)
      .parquet(path)
    // dim keys all land in the fact's first id stretch; the selective
    // dim predicate is what DPP turns into In(id, survivors) at runtime.
    // The dim must be FILE-backed: a LocalRelation constant-folds its
    // filter away before PartitionPruning looks for a selective
    // predicate, and the rule then declines to prune
    val dimPath = s"$dir/dim.parquet"
    (0L until 2000L).map(i => (i, s"d$i")).toDF("fid", "name")
      .write.mode("overwrite").parquet(dimPath)
    val dim = spark.read.parquet(dimPath)
    def q(fact: DataFrame): DataFrame =
      fact.join(dim.filter(col("fid") % 40L === 0L), col("id") === col("fid"))
        .select("id", "v", "name")

    GraftScanTelemetry.reset()
    val v2 = q(viaV2(path))
    val got = rows(v2)
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    val dec = GraftScanTelemetry.decodedGroups.sum()
    val sk = GraftScanTelemetry.skippedGroups.sum()

    val want = rows(q(spark.read.parquet(path)))
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(got == want, "runtime-filtered scan diverged from the built-in")
    assert(got.size == 50)

    // the dynamic filter actually landed on the scan...
    val scan = graftScan(v2)
    assert(scan.runtimeFilters.nonEmpty,
      "no runtime filter reached the scan — DPP did not fire")
    assert(scan.description().contains("RuntimeFilters"))
    // ...and it pruned: every dim key is < 2000, so row groups beyond
    // the first id stretch are refuted from footer bounds alone
    assert(sk > 0L,
      s"no row group skipped (decoded=$dec) — runtime keys did not prune")
    // all dim keys live in the first id stretch, so on this sorted
    // layout skipped groups must DOMINATE decoded ones
    assert(sk > dec, s"weak pruning: decoded=$dec skipped=$sk")
  }

  test("q_dsv2_runtime_filter: the catalog star join really receives " +
    "its dim keys as a runtime In filter") {
    val df = SparkEntry.queries("q_dsv2_runtime_filter")(spark, sfDir)
    assert(rows(df).nonEmpty)
    val rf = graftScan(df).runtimeFilters
    assert(rf.nonEmpty, "DPP did not deliver the supplier keys")
    assert(rf.exists(_.references.contains("l_suppkey")), rf.mkString(", "))
  }

  test("file-level zone maps: the write-time stats manifest prunes whole " +
    "files at planning — statically AND from runtime dim keys") {
    import spark.implicits._
    import graft.sources.GraftScanTelemetry
    val dir = java.nio.file.Files.createTempDirectory("graft_v2_manifest")
    val path = s"$dir/t.parquet"
    // 8 files with disjoint id ranges; string + DOUBLE columns so every
    // manifest kind appears — including "other", whose null bounds once
    // crashed the loader (typed tuple patterns don't match null)
    val df = spark.range(40000L)
      .select(col("id"), (col("id") * 2).as("v"),
        concat(lit("k"), (col("id") % 97).cast("string")).as("s"),
        (col("id") * 0.5).as("d"))
      .repartitionByRange(8, col("id"))
    graft.sources.Sinks.parquetWithStats(df, path)

    def run(d: DataFrame): (Set[Long], Long) = {
      GraftScanTelemetry.reset()
      val got = rows(d.select("id")).map(_.getLong(0)).toSet
      (got, GraftScanTelemetry.skippedFiles.sum())
    }
    // static filter: one narrow range → 7 of 8 files refuted at planning
    val sel = col("id") >= 10000L && col("id") < 10500L
    val (got, skf) = run(viaV2(path).filter(sel))
    assert(got == rows(spark.read.parquet(path).filter(sel).select("id"))
      .map(_.getLong(0)).toSet)
    assert(skf >= 7L, s"expected ~7 files pruned from the manifest, got $skf")
    // string-kind bounds prune too (k-prefix range outside every file? no —
    // s spans all files, so an impossible value must refute ALL files)
    val (none, skAll) = run(viaV2(path).filter(col("s") === "zzz"))
    assert(none.isEmpty && skAll >= 8L, s"string refutation: $skAll")
    // a file NOT in the manifest is still read (safety default)
    val extra = (40000L until 40010L).map(i => (i, i * 2, "x"))
      .toDF("id", "v", "s")
    extra.coalesce(1).write.mode("append").parquet(path)
    val (withExtra, _) = run(viaV2(path).filter(col("id") >= 40000L))
    assert(withExtra == (40000L until 40010L).toSet,
      s"unmanifested file must be scanned: $withExtra")
    // runtime keys drop whole files: dim keys all in the first stretch
    val dimPath = s"$dir/dim.parquet"
    (0L until 2000L).map(i => (i, s"d$i")).toDF("fid", "name")
      .write.mode("overwrite").parquet(dimPath)
    GraftScanTelemetry.reset()
    val j = viaV2(path).join(
      spark.read.parquet(dimPath).filter(col("fid") % 40L === 0L),
      col("id") === col("fid")).select("id", "name")
    assert(rows(j).size == 50)
    assert(graftScan(j).runtimeFilters.nonEmpty, "DPP did not fire")
    assert(GraftScanTelemetry.skippedFiles.sum() > 0L,
      "runtime dim keys pruned no files despite the manifest")
  }

  test("reported statistics: real on-disk size reaches the planner, so " +
    "a small connector-scanned dim can auto-broadcast") {
    val path = s"$sfDir/customer.parquet"
    // the scan reports exactly the file's on-disk bytes
    val stats = graftScan(viaV2(path).select("c_custkey"))
      .estimateStatistics()
    val onDisk = new java.io.File(path).length()
    assert(stats.sizeInBytes().getAsLong == onDisk,
      s"reported ${stats.sizeInBytes()} != on-disk $onDisk")
    // planner consequence: with a threshold between dim and fact size,
    // the v2 dim broadcasts (the default-stats behavior was
    // Long.MaxValue → sort-merge, never broadcast)
    val old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "20000")
    try {
      val dim = viaV2(path) // 6.9 KB < 20 KB
      val fact = spark.read.parquet(s"$sfDir/orders.parquet") // 35 KB
      val j = fact.join(dim, col("o_custkey") === col("c_custkey"))
        .select("o_orderkey", "c_custkey")
      assert(rows(j).nonEmpty)
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin"),
        s"v2 dim not broadcast despite reported stats:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
  }

  test("schema evolution: files predating an added column read it as " +
    "null — rows, filters, and pushed aggregates match the built-in") {
    import spark.implicits._
    import org.apache.spark.sql.types.{StructType => ST}
    val dir = java.nio.file.Files.createTempDirectory("graft_v2_evolve")
    val path = s"$dir/t.parquet"
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(path))
    def writeInto(df: DataFrame, tag: String): Unit = {
      val tmp = java.nio.file.Files.createTempDirectory(s"evolve_$tag")
      df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = java.nio.file.Files.list(tmp).toArray.map(_.toString)
        .find(_.matches(".*part-.*\\.parquet$")).get
      java.nio.file.Files.copy(java.nio.file.Paths.get(part),
        java.nio.file.Paths.get(s"$path/$tag.parquet"))
    }
    // the old file predates both `extra` (long) and `tag` (string)
    writeInto((0L until 50L).map(i => (i, i * 2)).toDF("id", "v"), "old")
    writeInto((50L until 90L).map(i => (i, i * 2, i % 7, s"g${i % 3}"))
      .toDF("id", "v", "extra", "tag"), "new")
    val evolved = new ST()
      .add("id", "long").add("v", "long").add("extra", "long")
      .add("tag", "string")
    def v2 = spark.read.format("graft.sources.GraftParquetTableProvider")
      .schema(evolved).option("path", path).load()
    def builtin = spark.read.schema(evolved).parquet(path)
    def set(df: DataFrame) = rows(df).map(_.toString).toSet

    // full rows: old-file rows carry null extra/tag
    assert(set(v2) == set(builtin))
    assert(rows(v2.filter(col("id") < 50L).select("extra"))
      .forall(_.isNullAt(0)))
    // filters over the evolved column — incl. an In wide enough for the
    // hash-set fast path (null never matches) and three-valued Not
    val preds = Seq(col("extra").isNull, col("extra").isNotNull,
      col("extra") === 3L, !(col("extra") === 3L),
      col("extra").isin(0L to 9L: _*), col("tag") === "g1")
    for (p <- preds)
      assert(set(v2.filter(p).select("id")) ==
        set(builtin.filter(p).select("id")), s"diverged for $p")
    // pushed global aggregates: count(extra) excludes the old file,
    // min/max/sum treat it as all-null
    def aggd(df: DataFrame) = df.agg(count(lit(1)).as("n"),
      count(col("extra")).as("n_extra"), min("extra").as("mn"),
      max("extra").as("mx"), sum("extra").as("sm"))
    assert(set(aggd(v2)) == set(aggd(builtin)))
    assert(graftScan(aggd(v2)).aggs.isDefined, "aggregation not pushed")
    // grouped pushdown: the old file contributes a null group
    def grouped(df: DataFrame) = df.groupBy("tag")
      .agg(count(lit(1)).as("n"), sum("v").as("sv"))
      .orderBy(col("tag").asc_nulls_first)
    assert(rows(grouped(v2)).toString == rows(grouped(builtin)).toString)
  }

  test("large In lists (the runtime-filter shape) keep exact semantics " +
    "on the hash-set fast path: -0.0, NaN, strings, longs") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_v2_inset")
    val path = s"$dir/t.parquet"
    Seq((1L, -0.0, "a"), (2L, 0.0, "b"), (3L, Double.NaN, "ab"),
      (4L, 1.5, "é"), (5L, -1.5, ""), (6L, 2.5, "z"))
      .toDF("id", "d", "s").write.mode("overwrite").parquet(path)
    // >= 8 values → compiled set; membership must match cmp semantics
    val dIn = Seq(0.0, Double.NaN, 7.0, 8.0, 9.0, 10.0, 11.0, 12.0)
    val lIn = (1L to 3L) ++ (100L to 104L)
    val sIn = Seq("a", "é", "x1", "x2", "x3", "x4", "x5", "x6")
    for (p <- Seq(col("d").isin(dIn: _*), col("id").isin(lIn: _*),
        col("s").isin(sIn: _*))) {
      val v2 = rows(viaV2(path).filter(p).select("id"))
        .map(_.getLong(0)).toSet
      val ref = rows(spark.read.parquet(path).filter(p).select("id"))
        .map(_.getLong(0)).toSet
      assert(v2 == ref, s"fast-path In diverged for $p: $v2 vs $ref")
    }
    // pin the interesting memberships: -0.0 matches In(...0.0...), NaN
    // matches In(...NaN...) — Spark's semantics, now set-backed
    assert(rows(viaV2(path).filter(col("d").isin(dIn: _*)).select("id"))
      .map(_.getLong(0)).toSet == Set(1L, 2L, 3L))
  }

  test("pushed double comparisons follow Spark's -0.0 == 0.0 semantics") {
    import spark.implicits._
    // accepted pushed filters are NOT re-checked by Spark, so the
    // connector's comparator must match SQLOrderingUtil exactly: the
    // IEEE-distinct zeros compare EQUAL (raw Double.compare would
    // order them and silently drop -0.0 rows from an EqualTo(0.0))
    val dir = java.nio.file.Files.createTempDirectory("graft_v2_negzero")
    val path = s"$dir/t.parquet"
    Seq((1L, -0.0), (2L, 0.0), (3L, -1.5), (4L, 1.5),
      (5L, Double.NaN), (6L, Double.MinPositiveValue))
      .toDF("id", "d").write.mode("overwrite").parquet(path)
    val preds = Seq(
      col("d") === 0.0, col("d") === -0.0, col("d") <=> -0.0,
      col("d") < 0.0, col("d") <= -0.0, col("d") > -0.0,
      col("d") >= 0.0, col("d") =!= 0.0, col("d") === Double.NaN)
    for (p <- preds) {
      val v2 = rows(viaV2(path).filter(p).select("id"))
        .map(_.getLong(0)).toSet
      val ref = rows(spark.read.parquet(path).filter(p).select("id"))
        .map(_.getLong(0)).toSet
      assert(v2 == ref, s"connector diverged from built-in for $p")
    }
    // the semantics, pinned explicitly: both zeros satisfy d = 0.0
    assert(rows(viaV2(path).filter(col("d") === 0.0).select("id"))
      .map(_.getLong(0)).toSet == Set(1L, 2L))
  }

  test("TopN (ORDER BY + LIMIT) is pushed: per-file bounded heaps, " +
    "results equal the built-in across directions and null orders") {
    import java.nio.file.Files
    // multi-file table with nulls in the sort key: the partial contract
    // (per-file top-N + Spark's retained global Sort) must hold across
    // file boundaries and null placement
    val dir = Files.createTempDirectory("graft_topn").toString
    val src = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("source"),
        when(pmod(col("doc_id"), lit(7)) === 0, lit(null))
          .otherwise(col("n_chars")).as("k"))
    src.repartition(4).write.mode("overwrite").parquet(dir)
    val builtIn = spark.read.parquet(dir)
    def check(sort: Seq[org.apache.spark.sql.Column], n: Int): Unit = {
      val ours = viaV2(dir).orderBy(sort: _*).limit(n)
      val scan = graftScan(ours)
      assert(scan.description().contains("PushedTopN"),
        s"topN not pushed: ${scan.description()}")
      val a = ours.collect().toSeq
      val b = builtIn.orderBy(sort: _*).limit(n).collect().toSeq
      // ties at the boundary are arbitrary in BOTH engines: compare the
      // multiset of sort-key projections, and exact rows where keys are
      // unique (doc_id tie-break makes them unique here)
      assert(a == b, s"topN mismatch for $sort limit $n")
    }
    check(Seq(col("k").asc_nulls_first, col("doc_id")), 17)
    check(Seq(col("k").asc_nulls_last, col("doc_id")), 17)
    check(Seq(col("k").desc_nulls_first, col("doc_id")), 9)
    check(Seq(col("k").desc_nulls_last, col("doc_id")), 9)
    check(Seq(col("source").desc, col("doc_id").desc), 23)
    // limit larger than the table: everything comes back
    assert(viaV2(dir).orderBy(col("doc_id")).limit(1000000).count() ==
      builtIn.count())
    // composes with pushed filters: survivors only, then top-N
    val f = viaV2(dir).filter(col("k") > 300L)
      .orderBy(col("k"), col("doc_id")).limit(5)
    val scanF = graftScan(f)
    assert(scanF.description().contains("PushedTopN") &&
      scanF.description().contains("PushedFilters"))
    assert(f.collect().toSeq ==
      builtIn.filter(col("k") > 300L)
        .orderBy(col("k"), col("doc_id")).limit(5).collect().toSeq)
  }

  test("TopN declines float keys and aggregated scans") {
    val path = s"$sfDir/lineitem.parquet"
    val fl = viaV2(path).orderBy(col("l_quantity")).limit(5)
    assert(!graftScan(fl).description().contains("PushedTopN"),
      "float sort keys must decline (NaN/-0.0 total order)")
    // still correct via Spark's own sort
    assert(fl.collect().length == 5)
  }

  test("streaming source: resume from the checkpoint reads ONLY appended " +
      "files (no dups, no loss); a shrunken table refuses; offsets " +
      "roundtrip through JSON") {
    import spark.implicits._
    val run = java.util.UUID.randomUUID().toString
    val table = s"/tmp/graft_stream_src_spec_$run"
    val ckpt = s"/tmp/graft_stream_src_spec_ckpt_$run"
    def append(ids: Range): Unit =
      ids.map(i => (i.toLong, s"v$i")).toDF("id", "v")
        .coalesce(1)
        .write.format("graft.sources.GraftParquetTableProvider")
        .option("path", table).mode("append").save()
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("v",
        org.apache.spark.sql.types.StringType)))
    def drain(): Set[Long] = {
      val got = java.util.concurrent.ConcurrentHashMap.newKeySet[Long]()
      val q = spark.readStream
        .format("graft.sources.GraftParquetTableProvider")
        .option("path", table).option("maxFilesPerTrigger", "1")
        .schema(schema).load()
        .writeStream.option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch { (b: DataFrame, _: Long) =>
          b.select("id").collect().foreach(r => got.add(r.getLong(0))); ()
        }.start()
      q.awaitTermination()
      import scala.jdk.CollectionConverters._
      got.asScala.toSet
    }
    try {
      append(0 until 10)
      append(10 until 25)
      val first = drain()
      assert(first == (0L until 25L).toSet, s"first drain: $first")
      // resume: only the NEW append flows; nothing replays
      append(25 until 30)
      val second = drain()
      assert(second == (25L until 30L).toSet,
        s"resume must read only appended files, got $second")
      // offset JSON roundtrip incl. escaping
      val off = graft.sources.GraftFileSetOffset(
        Seq("/a/plain.parquet", "/b/we\"ird\\name.parquet"))
      assert(graft.sources.GraftFileSetOffset.fromJson(off.json()) == off)
      // malformed checkpoint payloads refuse with a message, not a raw
      // index crash
      for (bad <- Seq("not json", "[\"unterminated", "[\"bad \\x esc\"]",
          "[\"trunc \\u12", "[\"dangling \\")) {
        val e = intercept[IllegalArgumentException] {
          graft.sources.GraftFileSetOffset.fromJson(bad)
        }
        assert(e.getMessage.contains("graft stream offset"),
          s"offset parse of $bad: ${e.getMessage}")
      }
      // shrink: delete an already-admitted file -> the stream refuses
      val fs = new org.apache.hadoop.fs.Path(table)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val victim = graft.sources.GraftParquetV2.listFiles(table).head
      fs.delete(new org.apache.hadoop.fs.Path(victim), false)
      val err = intercept[Exception] { drain() }
      def messages(t: Throwable): Seq[String] =
        if (t == null) Nil
        else Option(t.getMessage).toSeq ++ messages(t.getCause)
      assert(messages(err).exists(_.contains("append-only")),
        s"expected the append-only refusal, got: $err")
      // partitioned (col=value) tables STREAM since round 12: the
      // connector writes partition values INTO the data files, so the
      // flat streaming splits emit them correctly (per-file footer
      // proof at admission; PartitionedStreamSpec holds the full story)
      val pTable = s"/tmp/graft_stream_src_part_$run"
      (0 until 6).map(i => (i.toLong, s"p${i % 2}")).toDF("id", "part")
        .write.format("graft.sources.GraftParquetTableProvider")
        .option("path", pTable).option("partitionBy", "part")
        .mode("append").save()
      val pGot = java.util.concurrent.ConcurrentHashMap
        .newKeySet[(Long, String)]()
      val pq = spark.readStream
        .format("graft.sources.GraftParquetTableProvider")
        .option("path", pTable)
        .schema(org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("id",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("part",
            org.apache.spark.sql.types.StringType))))
        .load()
        .writeStream.option("checkpointLocation", pTable + "_ck")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .foreachBatch { (b: DataFrame, _: Long) =>
          b.collect().foreach(r =>
            pGot.add((r.getLong(0), r.getString(1)))); ()
        }.start()
      pq.awaitTermination()
      import scala.jdk.CollectionConverters._
      assert(pGot.asScala.toSet ==
        (0 until 6).map(i => (i.toLong, s"p${i % 2}")).toSet,
        s"partitioned stream must emit exact partition values, got $pGot")
      val pfs = new org.apache.hadoop.fs.Path(pTable)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      pfs.delete(new org.apache.hadoop.fs.Path(pTable), true)
      pfs.delete(new org.apache.hadoop.fs.Path(pTable + "_ck"), true)
    } finally {
      val fs = new org.apache.hadoop.fs.Path(table)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(table), true)
      fs.delete(new org.apache.hadoop.fs.Path(ckpt), true)
    }
  }
}
