package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, SortMergeJoinExec}
import org.apache.spark.sql.functions._
import graft.sources.GraftAnalyze

/** Equi-height histograms → CBO ([[graft.sources.GraftAnalyze]]
  * `histogram_columns` + DSv2 `columnStats().histogram`): on a SKEWED
  * join key, rows/NDV estimation averages the hot key away and prices
  * a huge join output as tiny — histogram estimation prices the hot
  * key by its own (point) bins. The headline test shows the resulting
  * PHYSICAL PLAN FLIP: NDV-only stats broadcast a ~20M-row
  * intermediate; histogram stats correctly pick the shuffle join. */
class HistogramCboSpec extends SparkSpec {

  private val fmt = "graft.sources.GraftParquetTableProvider"
  private val cat = "graft_hist_spec"
  private lazy val warehouse = {
    val d = java.nio.file.Files
      .createTempDirectory("graft_hist_warehouse_").toFile.getAbsolutePath
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", d)
    d
  }

  /** fact: 40 000 rows — 20 000 carry the hot key 0, 20 000 are
    * distinct keys 1..20 000 (ndv ≈ 20 001, so rows/NDV ≈ 2). */
  private lazy val factPath = {
    val p = s"$warehouse/sk/fact"
    import spark.implicits._
    spark.range(40000).map { i =>
      (if (i < 20000) 0L else i - 19999, i)
    }.toDF("k", "payload")
      .coalesce(4).write.format(fmt).option("path", p)
      .mode("append").save()
    p
  }

  /** dim: 2 000 rows — 1 000 carry key 0, 1 000 are distinct 1..1 000.
    * True join output: 20 000 × 1 000 + 1 000 ≈ 20M rows; rows/NDV
    * estimate: 40 000 × 2 000 / 20 001 ≈ 4 000 rows. */
  private lazy val dimPath = {
    val p = s"$warehouse/sk/dim"
    import spark.implicits._
    spark.range(2000).map { i =>
      (if (i < 1000) 0L else i - 999, i)
    }.toDF("k", "d_payload")
      .coalesce(1).write.format(fmt).option("path", p)
      .mode("append").save()
    p
  }

  /** probe side for the OUTER join: big enough that IT never
    * broadcasts under the test threshold — the broadcast decision
    * under test is about the skew-join INTERMEDIATE. */
  private lazy val probePath = {
    val p = s"$warehouse/sk/probe"
    // md5 padding keeps the parquet itself well over the test's
    // broadcast threshold — the scan's on-disk size must not qualify,
    // or the join never consults the intermediate's estimate
    spark.range(200000).toDF("payload")
      .withColumn("tag", pmod(col("payload"), lit(7)))
      .withColumn("pad", md5(col("payload").cast("string")))
      .coalesce(2).write.format(fmt).option("path", p)
      .mode("append").save()
    p
  }

  private def read(p: String) =
    spark.read.format(fmt).option("path", p).load()

  private def withConf[A](pairs: (String, String)*)(body: => A): A = {
    val prev = pairs.map { case (k, _) =>
      k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  private def collectJoins(plan: SparkPlan): Seq[SparkPlan] =
    plan.collect {
      case j: SortMergeJoinExec      => j
      case j: BroadcastHashJoinExec  => j
      case j: org.apache.spark.sql.execution.joins
        .ShuffledHashJoinExec => j
    }

  test("ANALYZE persists equi-height histograms; hot key = point bins") {
    GraftAnalyze.analyze(spark, factPath, Seq("k"), 32)
    val ts = GraftAnalyze.read(factPath).get
    val h = ts.hists("k")
    assert(h.bins.size == 32)
    assert(math.abs(h.height - 40000.0 / 32) < 1.0)
    // the hot key holds half the rows -> ~half the bins are the point
    // bin [0, 0] with ndv 1
    val pointBins = h.bins.count(b => b.lo == 0.0 && b.hi == 0.0)
    assert(pointBins >= 14 && pointBins <= 17,
      s"expected ~16 point bins at the hot key, got $pointBins: ${h.bins}")
    // range bins carry real per-bin NDVs (~625 values per bin of 1250
    // rows ... all distinct, so ndv ≈ height)
    val range = h.bins.filter(b => b.hi > b.lo)
    assert(range.nonEmpty)
    assert(range.forall(b => b.ndv > 100),
      s"range-bin NDVs implausibly small: $range")
    // histogram round-trips through the sidecar (fresh cache miss)
    val reread = {
      val m = classOf[GraftAnalyze.type]
        .getDeclaredField("cache")
      m.setAccessible(true)
      m.get(GraftAnalyze)
        .asInstanceOf[java.util.concurrent.ConcurrentHashMap[String, _]]
        .remove(factPath)
      GraftAnalyze.read(factPath).get
    }
    assert(reread.hists("k") == h)
  }

  test("histogram flips a wrong broadcast of a skew-join to shuffle") {
    // NDV-only stats first
    GraftAnalyze.analyze(spark, factPath)
    GraftAnalyze.analyze(spark, dimPath)
    GraftAnalyze.analyze(spark, probePath)
    def query() = read(factPath).join(read(dimPath), "k")
      .join(read(probePath), "payload")
      .groupBy("tag").count()
    withConf(
      "spark.sql.cbo.enabled" -> "true",
      "spark.sql.cbo.joinReorder.enabled" -> "false",
      "spark.sql.adaptive.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> (256 * 1024).toString) {

      val ndvOnlyJoins = collectJoins(query().queryExecution.sparkPlan)
      // rows/NDV averages the hot key away: the ~20M-row intermediate
      // is estimated at ~4k rows and BROADCAST into the probe join —
      // the wrong plan this spec exists to catch
      assert(ndvOnlyJoins.count(_.isInstanceOf[BroadcastHashJoinExec]) == 2,
        s"precondition: NDV-only stats should broadcast both joins:\n" +
          ndvOnlyJoins.mkString("\n"))

      // re-ANALYZE with histograms on the join key
      GraftAnalyze.analyze(spark, factPath, Seq("k"), 32)
      GraftAnalyze.analyze(spark, dimPath, Seq("k"), 32)
      val histJoins = collectJoins(query().queryExecution.sparkPlan)
      val outer = histJoins.filterNot(
        _.isInstanceOf[BroadcastHashJoinExec])
      assert(outer.size == 1,
        s"histogram stats must price the skew-join output above the " +
          s"broadcast threshold and flip the probe join to shuffle:\n" +
          histJoins.mkString("\n"))

      // and the estimate itself moved from thousands to millions
      val est = read(factPath).join(read(dimPath), "k")
        .queryExecution.optimizedPlan.stats.rowCount
      assert(est.exists(_ > BigInt(5000000)),
        s"histogram join estimate should see the hot key: $est")
    }
  }
}
