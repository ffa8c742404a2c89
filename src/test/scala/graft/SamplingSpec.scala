package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.expr.TextHashKernels
import graft.operators.Sampling
import graft.sources.Sources

/** Specs for deterministic A-ES weighted sampling. */
class SamplingSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("w", LongType, nullable = true)))

  /** The operator's exact ranking key, recomputed independently in plain
    * Scala (same published formula, same JVM libm). */
  private def aesKey(id: Long, w: Long): Double = {
    val h = TextHashKernels.splitmix64(TextHashKernels.fnv1a64(id.toString))
    val hd = if (h >= 0) h.toDouble else h.toDouble + graft.expr.KmvAgg.TwoPow64
    math.log((hd + 0.5) / graft.expr.KmvAgg.TwoPow64) / w.toDouble
  }

  test("weightedSample matches an independent A-ES computation exactly") {
    val data = (1L to 1000L).map(i => Row(i, (i % 97) + 1))
    val df = Sources.inMemory(spark, data, schema)
    val expect = data.map(r => (r.getLong(0), r.getLong(1)))
      .sortBy { case (id, w) => (-aesKey(id, w), id) }
      .take(60).map(_._1).toSet
    val got = rows(Sampling.weightedSample(df, "id", "w", 60))
      .map(_.getLong(0)).toSet
    assert(got == expect)
  }

  test("weightedSample is partitioning-independent and excludes w <= 0 and null") {
    val data = (1L to 500L).map(i => Row(i, (i % 13) + 1)) ++
      Seq(Row(9001L, 0L), Row(9002L, -5L), Row(9003L, null))
    val df = Sources.inMemory(spark, data, schema)
    val a = rows(Sampling.weightedSample(df.repartition(1), "id", "w", 40))
      .map(_.getLong(0))
    val b = rows(Sampling.weightedSample(df.repartition(17), "id", "w", 40))
      .map(_.getLong(0))
    assert(a == b)
    assert(!a.exists(_ >= 9000L), "zero/negative/null weights must be excluded")
  }

  test("weightedSample inclusion tracks weight (PPS property)") {
    // one row with 10^6× the weight of 2000 others: its inclusion
    // probability is ≈ 1 − (tiny); a miss would be a 1-in-many-thousands
    // event under correct A-ES and a red flag under any bug that ignores
    // or inverts the weight
    val data = (1L to 2000L).map(i => Row(i, 1L)) :+ Row(7777L, 1000000L)
    val df = Sources.inMemory(spark, data, schema)
    val got = rows(Sampling.weightedSample(df, "id", "w", 10)).map(_.getLong(0))
    assert(got.contains(7777L), "the 10^6-weight row should ~always be sampled")
    assert(got.size == 10)
  }

  test("per-source sample: TopKAgg form equals the window form, window-free plan") {
    import org.apache.spark.sql.expressions.Window
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(col("n_chars").isNotNull && col("n_chars") > 0)
    val key = Sampling.aesKey(col("doc_id").cast("string"), col("n_chars"))
    val viaAgg = rows(docs.groupBy("source")
      .agg(graft.expr.TopKAgg(key, col("doc_id"), 5).as("top"))
      .select(col("source"), posexplode(col("top")).as(Seq("rank", "e")))
      .select(col("source"), col("rank"), col("e.payload").as("doc_id")))
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
    val w = Window.partitionBy("source").orderBy(desc("k"), col("doc_id"))
    val viaWindow = rows(docs.withColumn("k", key)
      .withColumn("rank", row_number().over(w) - 1)
      .filter(col("rank") < 5)
      .select(col("source"), col("rank"), col("doc_id")))
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
    assert(viaAgg == viaWindow)
    assert(viaAgg.nonEmpty)
    val plan = docs.groupBy("source")
      .agg(graft.expr.TopKAgg(key, col("doc_id"), 5).as("top"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"agg form must not plan a window:\n$plan")
  }

  test("weightedSample plans as a bounded top-k, not a global sort") {
    val df = Sources.inMemory(spark, (1L to 100L).map(i => Row(i, 1L)), schema)
    val plan = Sampling.weightedSample(df, "id", "w", 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"expected TakeOrderedAndProject in:\n$plan")
  }

  test("sampleQuantiles: close to exact quantiles, partitioning-invariant") {
    import spark.implicits._
    // two groups with known distributions: g=a uniform ids 1..4000 with
    // value = id (quantiles known exactly); g=b constant value
    val df = ((1L to 4000L).map(i => ("a", i, i.toDouble)) ++
      (4001L to 5000L).map(i => ("b", i, 7.5))).toDF("g", "id", "v")
    def run(d: org.apache.spark.sql.DataFrame) =
      rows(graft.operators.Sketches.sampleQuantiles(
        d, "g", col("id"), "v", k = 400, probs = Seq(0.25, 0.5, 0.75))
        .orderBy("g", "prob"))
        .map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap
    val q = run(df)
    // ±O(1/sqrt(k)) in quantile space: k=400 → tolerance ~0.1 generous
    assert(math.abs(q(("a", 0.25)) - 1000.0) < 4000 * 0.1, q.toString)
    assert(math.abs(q(("a", 0.5)) - 2000.0) < 4000 * 0.1, q.toString)
    assert(math.abs(q(("a", 0.75)) - 3000.0) < 4000 * 0.1, q.toString)
    assert(q(("b", 0.5)) == 7.5 && q(("b", 0.25)) == 7.5)
    // deterministic: identical (bit-exact) across partitionings
    assert(run(df.repartition(13)) == q)
  }
}
