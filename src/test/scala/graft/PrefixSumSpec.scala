package graft

import org.apache.spark.sql.functions._
import graft.operators.PrefixSum

/** Distributed prefix-sum invariants: exact agreement with the sequential
  * running total, regardless of bucketing, bounds source, or value sign. */
class PrefixSumSpec extends SparkSpec {

  private def sequential(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    var acc = 0L
    pairs.sortBy(_._1).map { case (k, v) => acc += v; k -> acc }.toMap
  }

  test("matches sequential running total on shuffled sparse keys") {
    import spark.implicits._
    val data = Seq(7L -> 3L, 100L -> 5L, 2L -> 10L, 55L -> 1L, 999L -> 2L,
      -4L -> 6L, 0L -> 0L, 500L -> 7L)
    val df = scala.util.Random.shuffle(data).toDF("k", "v").repartition(3)
    val out = PrefixSum.runningTotal(df, "k", "v", "cum", nBuckets = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out == sequential(data))
  }

  test("negative values: bucket totals are true sums, not running maxima") {
    import spark.implicits._
    val data = (0L until 50L).map(i => i -> (if (i % 3 == 0) -5L else 2L))
    val df = data.toDF("k", "v").repartition(5)
    val out = PrefixSum.runningTotal(df, "k", "v", "cum", nBuckets = 7)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out == sequential(data))
  }

  test("superset bounds frame gives identical results (empty buckets ok)") {
    import spark.implicits._
    val data = Seq(10L -> 1L, 11L -> 2L, 12L -> 3L)
    val df = data.toDF("k", "v")
    val superset = (0L until 1000L).toDF("k")
    val out = PrefixSum.runningTotal(df, "k", "v", "cum", nBuckets = 8,
      boundsFrom = Some(superset))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out == sequential(data))
  }

  test("single row, and nBuckets larger than row count") {
    import spark.implicits._
    val out = PrefixSum.runningTotal(Seq(42L -> 9L).toDF("k", "v"),
      "k", "v", "cum", nBuckets = 16)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(out.toSeq == Seq((42L, 9L)))
  }

  test("matches the global-window form on the real documents table") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"),
        graft.text.TextAnalysis.tokenCount(col("text")).as("v"))
    val viaOp = PrefixSum.runningTotal(docs, "doc_id", "v", "cum")
      .select("doc_id", "cum")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val w = org.apache.spark.sql.expressions.Window.orderBy("doc_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val viaWindow = docs.withColumn("cum", sum("v").over(w))
      .select("doc_id", "cum")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaOp == viaWindow)
  }

  test("pathological key skew: correct on both paths; sampled path balances") {
    import spark.implicits._
    // 99% of keys packed into [0, 99], one outlier at 10^9: the closed-form
    // width ~ 10^9/4 sends every dense key to bucket 0 (balance-only skew,
    // results exact); sampledBuckets=true range-partitions by the OBSERVED
    // distribution instead and spreads the dense range over many buckets
    val data = (0L until 99L).map(i => i -> (i % 7)) :+ (1000000000L -> 3L)
    val df = scala.util.Random.shuffle(data).toDF("k", "v").repartition(5)
    val expected = sequential(data)
    val closedForm = PrefixSum.runningTotal(df, "k", "v", "cum", nBuckets = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(closedForm == expected)
    val sampled = PrefixSum.runningTotal(df, "k", "v", "cum", nBuckets = 4,
      sampledBuckets = true)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(sampled == expected)
    // balance evidence: the closed-form bucket puts the 99 dense keys in
    // ONE bucket (width = (hi−lo)/n ≈ 2.5e8), while sampled range
    // partitioning spreads them across several
    val n = 4
    val width = math.max((1000000000.0 - 0) / n, 1e-12)
    val closedFormBkts = data.map { case (k, _) =>
      math.min(math.floor(k / width), (n - 1).toDouble).toInt }.distinct.size
    assert(closedFormBkts == 2, "99% of keys collapse into one closed-form bucket")
    val rangeBkts = df.repartitionByRange(n, col("k"))
      .select(spark_partition_id()).distinct().count()
    assert(rangeBkts >= 3, "sampled range partitioning should spread the dense keys")
  }

  test("fractional key domain narrower than nBuckets still partitions") {
    import spark.implicits._
    // keys in [0, 1): the old ceil-to-1 width sent ALL of these to
    // bucket 0 (serial window); (hi−lo)/n width must split them
    val data = (0 until 64).map(i => i / 64.0 -> i.toLong)
    val df = scala.util.Random.shuffle(data).toDF("k", "v").repartition(3)
    val out = PrefixSum.runningTotal(df, "k", "v", "cum", nBuckets = 8)
      .collect().map(r => r.getDouble(0) -> r.getLong(2)).toMap
    var acc = 0L
    val expected = data.sortBy(_._1).map { case (k, v) => acc += v; k -> acc }.toMap
    assert(out == expected)
    // and the bucketing genuinely used more than one bucket
    val width = math.max((data.map(_._1).max - 0.0) / 8, 1e-12)
    val bkts = data.map(d => math.min(math.floor(d._1 / width), 7.0).toInt).distinct
    assert(bkts.size >= 4, s"fractional domain should spread buckets, got $bkts")
  }

  test("sampledBuckets matches sequential on shuffled sparse keys") {
    import spark.implicits._
    val data = Seq(7L -> 3L, 100L -> 5L, 2L -> 10L, 55L -> 1L, 999L -> 2L,
      -4L -> 6L, 0L -> 0L, 500L -> 7L)
    val df = scala.util.Random.shuffle(data).toDF("k", "v").repartition(3)
    val out = PrefixSum.runningTotal(df, "k", "v", "cum", nBuckets = 4,
      sampledBuckets = true)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out == sequential(data))
  }

  test("physical plan has no un-partitioned window stage") {
    import spark.implicits._
    val df = (0L until 100L).map(i => i -> i).toDF("k", "v")
    val plan = PrefixSum.runningTotal(df, "k", "v", "cum", nBuckets = 4)
      .queryExecution.executedPlan.toString
    // every Window node must carry a partition spec (the bucket id)
    plan.split('\n').filter(_.contains("Window")).foreach { line =>
      assert(line.contains("__graft_bkt"), s"unpartitioned window: $line")
    }
  }
}
