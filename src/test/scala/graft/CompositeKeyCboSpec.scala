package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
import org.apache.spark.sql.functions._
import graft.sources.GraftAnalyze

/** Composite-key join stats → planner
  * ([[graft.sources.GraftAnalyze]] `key_sets` +
  * [[graft.plans.CompositeKeyJoinRule]]): on INDEPENDENT composite
  * keys, Spark's min-card estimation prices the join by its most
  * selective SINGLE key — 40 000 × 2 000 / 200 = 400 000 rows where
  * the true tuple-NDV answer is 2 000 — so a broadcastable
  * intermediate looks megabytes big and the parent join needlessly
  * shuffles. The declared key set's tuple NDV flips the parent to a
  * broadcast join. */
class CompositeKeyCboSpec extends SparkSpec {

  private val fmt = "graft.sources.GraftParquetTableProvider"
  private lazy val warehouse = java.nio.file.Files
    .createTempDirectory("graft_ck_warehouse_").toFile.getAbsolutePath

  /** fact: 40 000 rows, every (k1, k2) tuple unique (200 × 200
    * independent keys) — ndv(k1) = ndv(k2) = 200, tuple NDV 40 000. */
  private lazy val factPath = {
    val p = s"$warehouse/fact"
    import spark.implicits._
    spark.range(40000).map { i =>
      (i % 200, (i / 200) % 200, i)
    }.toDF("k1", "k2", "payload")
      .coalesce(4).write.format(fmt).option("path", p)
      .mode("append").save()
    p
  }

  /** dim: 2 000 rows, every (k1, k2) tuple unique (200 × 10). True
    * join output: each dim tuple matches exactly one fact row →
    * 2 000 rows (~80 KB); the single-key estimate:
    * 40 000 × 2 000 / 200 = 400 000 rows (~15 MB). */
  private lazy val dimPath = {
    val p = s"$warehouse/dim"
    import spark.implicits._
    spark.range(2000).map { i =>
      (i % 200, (i / 200) % 10, i)
    }.toDF("k1", "k2", "d_payload")
      .coalesce(1).write.format(fmt).option("path", p)
      .mode("append").save()
    p
  }

  /** probe side: too big to broadcast itself under the test threshold,
    * so the broadcast decision under test is about the composite-join
    * INTERMEDIATE. */
  private lazy val probePath = {
    val p = s"$warehouse/probe"
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
    val prev = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  private def broadcasts(plan: SparkPlan): Int =
    plan.collect { case j: BroadcastHashJoinExec => j }.size

  private def dropCache(p: String): Unit = {
    val f = classOf[GraftAnalyze.type].getDeclaredField("cache")
    f.setAccessible(true)
    f.get(GraftAnalyze)
      .asInstanceOf[java.util.concurrent.ConcurrentHashMap[String, _]]
      .remove(p)
  }

  test("analyze persists tuple NDVs for declared key sets and they " +
      "round-trip through the sidecar") {
    GraftAnalyze.analyze(spark, factPath,
      keySets = Seq(Seq("k2", "k1"))) // order-normalized on write
    val ts = GraftAnalyze.read(factPath).get
    val ndv = ts.keyNdv(Seq("k1", "k2"))
    assert(math.abs(ndv - 40000L) <= 2500,
      s"tuple NDV of 40 000 independent pairs should be ~40 000, got $ndv")
    // per-column NDVs unchanged — the single-key story stays visible
    assert(math.abs(ts.cols("k1").ndv - 200L) <= 10)
    dropCache(factPath)
    assert(GraftAnalyze.read(factPath).get.keyNdv ==
      Map(Seq("k1", "k2") -> ndv))
  }

  test("declared key set flips a needless shuffle of an independent-" +
      "key composite join to broadcast") {
    // per-column stats only, first
    GraftAnalyze.analyze(spark, factPath)
    GraftAnalyze.analyze(spark, dimPath)
    GraftAnalyze.analyze(spark, probePath)
    def query() = read(factPath)
      .join(read(dimPath), Seq("k1", "k2"))
      .join(read(probePath), "payload")
      .groupBy("tag").count()
    withConf(
      "spark.sql.cbo.enabled" -> "true",
      "spark.sql.cbo.joinReorder.enabled" -> "false",
      "spark.sql.adaptive.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> (256 * 1024).toString) {
      // precondition: the single-key estimate prices the 2k-row
      // intermediate at ~400k rows (~15 MB) -> the parent shuffles
      // (the only broadcast is dim into fact)
      assert(broadcasts(query().queryExecution.sparkPlan) == 1,
        "precondition: single-key estimation should shuffle the parent")
      // declare the key set on both sides: the honest tuple NDV
      // proves the intermediate tiny and the parent broadcasts it
      GraftAnalyze.analyze(spark, factPath,
        keySets = Seq(Seq("k1", "k2")))
      GraftAnalyze.analyze(spark, dimPath,
        keySets = Seq(Seq("k1", "k2")))
      val plan = query().queryExecution.sparkPlan
      assert(broadcasts(plan) == 2,
        s"tuple-NDV stats must broadcast the tiny intermediate:\n$plan")
      // and the honest intermediate really is tiny at runtime
      assert(read(factPath).join(read(dimPath), Seq("k1", "k2"))
        .count() == 2000L)
    }
  }

  test("an explicit user strategy hint survives the rule") {
    // key sets are declared (previous test); a user's merge hint on
    // the tiny intermediate must still win over the BROADCAST pin
    GraftAnalyze.analyze(spark, factPath, keySets = Seq(Seq("k1", "k2")))
    GraftAnalyze.analyze(spark, dimPath, keySets = Seq(Seq("k1", "k2")))
    withConf(
      "spark.sql.cbo.enabled" -> "true",
      "spark.sql.adaptive.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> (256 * 1024).toString) {
      val hinted = read(factPath).join(read(dimPath), Seq("k1", "k2"))
        .hint("merge")
        .join(read(probePath), "payload")
        .groupBy("tag").count()
      val smj = hinted.queryExecution.sparkPlan.collect {
        case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
      }
      assert(smj.nonEmpty,
        "a user's explicit merge hint must win over the BROADCAST pin")
    }
  }
}
