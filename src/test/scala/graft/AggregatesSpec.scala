package graft

import org.apache.spark.sql.functions._
import graft.expr.{MinHashAgg, MinHashSig, TopKAgg}
import graft.text.TextAnalysis

/** Specs for the custom TypedImperativeAggregates. */
class AggregatesSpec extends SparkSpec {

  test("TopKAgg equals window row_number top-k on the events table") {
    val events = spark.read.parquet(s"$sfDir/events.parquet")
    val viaAgg = events.groupBy("event_type")
      .agg(TopKAgg(col("value"), col("event_id"), 5).as("top"))
      .select(col("event_type"), posexplode(col("top")).as(Seq("pos", "e")))
      .select(col("event_type"), col("e.payload").as("event_id"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("event_type").orderBy(desc("value"), col("event_id"))
    val viaWindow = events
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 5)
      .select("event_type", "event_id")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(viaAgg == viaWindow)
  }

  test("DdQuantileAgg: every estimate is within alpha relative error of " +
    "the exact quantile (the deterministic worst-case guarantee)") {
    val alpha = 0.01
    val probs = Seq(0.01, 0.25, 0.5, 0.75, 0.95, 0.99)
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
    val ests = orders.groupBy("o_orderstatus")
      .agg(graft.expr.DdQuantileAgg(
        col("o_totalprice").cast("double"), alpha, probs).as("e"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    // exact quantiles at the same rank convention: floor(p*(n-1))+1
    val exact = orders.select("o_orderstatus", "o_totalprice").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).groupBy(_._1)
      .map { case (g, vs) => g -> vs.map(_._2).sorted }
    for ((g, vs) <- exact; (p, i) <- probs.zipWithIndex) {
      val truth = vs(math.floor(p * (vs.length - 1)).toInt)
      val est = ests(g)(i)
      assert(math.abs(est - truth) <= alpha * truth + 1e-9,
        s"group $g p=$p: est $est vs exact $truth exceeds alpha=$alpha")
    }
  }

  test("DdQuantileAgg is bit-deterministic across partitionings and " +
    "equals its own merge of partial sketches") {
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
    def run(df: org.apache.spark.sql.DataFrame) = df.groupBy("o_orderstatus")
      .agg(graft.expr.DdQuantileAgg(
        col("o_totalprice").cast("double"), 0.01, Seq(0.5, 0.9)).as("e"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1).toList).toMap
    assert(run(orders.repartition(1)) == run(orders.repartition(13)),
      "bucket counts are a set function — any partitioning, same bits")
  }

  test("DdQuantileAgg guards: non-positive values and pathological " +
    "bucket ranges throw loudly; empty input yields null") {
    import spark.implicits._
    val bad = Seq(("a", -1.0)).toDF("g", "v")
    val e = intercept[Exception] {
      bad.groupBy("g").agg(graft.expr.DdQuantileAgg(
        col("v"), 0.01, Seq(0.5)).as("e")).collect()
    }
    assert(e.getMessage != null)
    val wide = Seq(("a", 1e-300), ("a", 1e300)).toDF("g", "v")
    val e2 = intercept[Exception] {
      wide.groupBy("g").agg(graft.expr.DdQuantileAgg(
        col("v"), 0.01, Seq(0.5), maxBuckets = 1).as("e")).collect()
    }
    assert(e2.getMessage != null)
    // empty input: global aggregate evaluates the empty sketch to null
    val r = Seq.empty[(String, Double)].toDF("g", "v")
      .agg(graft.expr.DdQuantileAgg(col("v"), 0.01, Seq(0.5)).as("e"))
      .collect().head
    assert(r.isNullAt(0), r.toString)
  }

  test("TopKAgg: heap handles k larger than group, ties, and merge") {
    import spark.implicits._
    val df = Seq(
      ("a", 1.0, 1L), ("a", 1.0, 2L), ("a", 2.0, 3L),
      ("b", 5.0, 4L)).toDF("g", "v", "id")
      .repartition(4) // force partial heaps + merge
    val out = df.groupBy("g").agg(TopKAgg(col("v"), col("id"), 10).as("top"))
      .select(col("g"), col("top"))
      .collect().map(r => r.getString(0) ->
        r.getSeq[org.apache.spark.sql.Row](1).map(e => (e.getDouble(0), e.getLong(1))))
      .toMap
    assert(out("a") == Seq((2.0, 3L), (1.0, 1L), (1.0, 2L))) // desc, tie by id ASC
    assert(out("b") == Seq((5.0, 4L)))
  }

  test("TopKAgg: NaN sort keys rank greatest (IEEE total order, window parity)") {
    import spark.implicits._
    val df = Seq(("a", Double.NaN, 1L), ("a", 100.0, 2L), ("a", 99.0, 3L),
      ("a", 98.0, 4L)).toDF("g", "v", "id").repartition(2)
    val out = df.groupBy("g").agg(TopKAgg(col("v"), col("id"), 3).as("top"))
      .select(col("g"), col("top")).collect().head
      .getSeq[org.apache.spark.sql.Row](1).map(e => e.getLong(1))
    // same order row_number() OVER (ORDER BY v DESC, id) yields: NaN first
    assert(out == Seq(1L, 2L, 3L))
  }

  test("MinHashAgg(group) equals MinHash of the union of shingle sets") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val agged = docs
      .select(col("lang"), MinHashSig(TextAnalysis.shingles(col("text"), 3), 64, 7L).as("sig"))
      .groupBy("lang").agg(MinHashAgg(col("sig")).as("sig"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    // union semantics: minhash over the concatenated shingle arrays per lang
    val unioned = docs
      .groupBy("lang")
      .agg(flatten(collect_list(TextAnalysis.shingles(col("text"), 3))).as("all_sh"))
      .select(col("lang"), MinHashSig(col("all_sh"), 64, 7L).as("sig"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(agged.keySet == unioned.keySet)
    agged.foreach { case (lang, sig) => assert(sig == unioned(lang), lang) }
  }

  test("minhash similarity estimate tracks exact set Jaccard across langs") {
    val exact = {
      val sh = spark.read.parquet(s"$sfDir/documents.parquet")
        .select(col("lang"), explode(TextAnalysis.shingles(col("text"), 3)).as("s"))
        .distinct()
      val sets = sh.collect().groupBy(_.getString(0))
        .view.mapValues(_.map(_.getString(1)).toSet).toMap
      for {
        (a, sa) <- sets; (b, sb) <- sets if a < b
      } yield (a, b) -> (sa & sb).size.toDouble / (sa | sb).size
    }
    val est = PipelineQueries.qLangSimilarity
      .run(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    exact.foreach { case (pair, j) =>
      assert(math.abs(est(pair) - j) < 0.15, s"$pair est=${est(pair)} exact=$j")
    }
  }

  test("typed Aggregator: WeightedMean via udaf matches the column formula") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val wmean = udaf(graft.expr.TypedAggregators.WeightedMean)
    val df = Seq(("a", 2.0, 1.0), ("a", 4.0, 3.0), ("b", 10.0, 2.0))
      .toDF("g", "v", "w")
      .repartition(3) // exercise partial merge
    val out = df.groupBy("g")
      .agg(wmean(col("v"), col("w")).as("wm"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(out("a") - (2.0 * 1.0 + 4.0 * 3.0) / 4.0) < 1e-12)
    assert(out("b") == 10.0)
  }

  test("typed Aggregator: DistinctLongCount equals countDistinct") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val events = spark.read.parquet(s"$sfDir/events.parquet")
    val dcount = udaf(graft.expr.TypedAggregators.DistinctLongCount)
    val typed = events.groupBy("event_type").agg(dcount(col("user_id")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val builtin = events.groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(typed == builtin)
  }

  test("KmvAgg: estimate within theory error; exact below k; duplicates ignored") {
    import spark.implicits._
    import graft.expr.{Fingerprint64, KmvAgg}
    val n = 20000
    // each value appears 3× — the sketch must see the SET, not the bag
    val df = (0 until 3).flatMap(_ => 0 until n)
      .map(i => s"value_$i").toDF("v")
    val k = 256
    val est = df.agg(KmvAgg(Fingerprint64(col("v")), k).as("e"))
      .head().getDouble(0)
    // (k-1)/h_k estimator: σ ≈ n/√(k−2) → 5σ ≈ 31% at k=256
    assert(math.abs(est - n) < 0.31 * n, s"estimate $est for $n distinct")
    val small = (0 until 100).map(i => s"v$i").toDF("v")
    val exact = small.agg(KmvAgg(Fingerprint64(col("v")), k).as("e"))
      .head().getDouble(0)
    assert(exact == 100.0, s"below-k must be exact, got $exact")
  }

  test("KmvAgg: partitioning and order cannot move the estimate") {
    import spark.implicits._
    import graft.expr.{Fingerprint64, KmvAgg}
    val base = (0 until 5000).map(i => s"doc_$i")
    def est(data: Seq[String], parts: Int): Double =
      data.toDF("v").repartition(parts)
        .agg(KmvAgg(Fingerprint64(col("v")), 128).as("e")).head().getDouble(0)
    val a = est(base, 1)
    val b = est(scala.util.Random.shuffle(base), 13)
    assert(a == b, s"order/partition dependence: $a vs $b")
  }

  test("KmvAgg: non-long input fails at analysis, and SQL registration works") {
    import spark.implicits._
    val df = Seq("a").toDF("v")
    val err = intercept[Exception] {
      df.agg(graft.expr.KmvAgg(col("v"), 16)).collect()
    }
    assert(err.getMessage.contains("kmv_distinct"), err.getMessage)
    df.createOrReplaceTempView("kmv_in")
    val viaSql = spark.sql(
      "SELECT kmv_distinct(fingerprint64(v), 16) AS e FROM kmv_in")
      .head().getDouble(0)
    assert(viaSql == 1.0)
  }

  test("HllAgg: harmonic branch within theory error on 20k distinct; " +
    "duplicates ignored; linear-counting branch accurate in small range") {
    import spark.implicits._
    import graft.expr.{Fingerprint64, HllAgg}
    val n = 20000
    // each value appears 3× — register maxima must see the SET, not the bag
    val df = (0 until 3).flatMap(_ => 0 until n)
      .map(i => s"value_$i").toDF("v")
    val est = df.agg(HllAgg(Fingerprint64(col("v")), 10).as("e"))
      .head().getDouble(0)
    // m=1024: σ ≈ 1.04/√m ≈ 3.25% → 5σ ≈ 16%; n=20000 > 2.5m forces
    // the harmonic estimator (the catalog corpus only reaches the
    // linear-counting branch, so the other branch is proven here)
    assert(est > 2.5 * 1024, s"expected the harmonic branch, est=$est")
    assert(math.abs(est - n) < 0.16 * n, s"estimate $est for $n distinct")
    val small = (0 until 100).map(i => s"v$i").toDF("v")
    val lc = small.agg(HllAgg(Fingerprint64(col("v")), 10).as("e"))
      .head().getDouble(0)
    // linear counting over mostly-empty registers: tight in this regime
    assert(math.abs(lc - 100.0) < 10.0, s"linear-counting estimate $lc for 100")
    // all-null input = empty multiset → 0.0 (V=m, m·ln(1))
    val empty = Seq[Option[String]](None, None).toDF("v")
      .agg(HllAgg(Fingerprint64(col("v")), 10).as("e")).head().getDouble(0)
    assert(empty == 0.0, s"empty group must estimate 0.0, got $empty")
  }

  test("HllAgg: partitioning and order cannot move the estimate") {
    import spark.implicits._
    import graft.expr.{Fingerprint64, HllAgg}
    val base = (0 until 5000).map(i => s"doc_$i")
    def est(data: Seq[String], parts: Int): Double =
      data.toDF("v").repartition(parts)
        .agg(HllAgg(Fingerprint64(col("v")), 10).as("e")).head().getDouble(0)
    val a = est(base, 1)
    val b = est(scala.util.Random.shuffle(base), 13)
    assert(a == b, s"order/partition dependence: $a vs $b")
  }

  test("HllAgg: non-long input fails at analysis, and SQL registration works") {
    import spark.implicits._
    val df = Seq("a").toDF("v")
    val err = intercept[Exception] {
      df.agg(graft.expr.HllAgg(col("v"), 10)).collect()
    }
    assert(err.getMessage.contains("hll_distinct"), err.getMessage)
    df.createOrReplaceTempView("hll_in")
    val viaSql = spark.sql(
      "SELECT hll_distinct(fingerprint64(v), 10) AS e FROM hll_in")
      .head().getDouble(0)
    // one value: V = 1023 zero registers → m·round6(ln(m/1023)) > 0
    assert(viaSql > 0.0 && viaSql < 3.0, s"one-distinct estimate $viaSql")
  }

  test("HLL sketch partials: merge of per-part sketches is bit-identical " +
    "to sketching the union; estimate face agrees with hll_distinct") {
    import spark.implicits._
    import graft.expr.{Fingerprint64, HllAgg}
    val p = 10
    // three overlapping parts — union cardinality 8000, sum of parts 12000
    val parts = Seq(
      (0 until 5000).map(i => ("a", s"v$i")),
      (2000 until 7000).map(i => ("b", s"v$i")),
      (6000 until 8000).map(i => ("c", s"v$i"))).flatten
    val df = parts.toDF("part", "v")
    // two-level: per-part sketch -> merged -> estimate
    val rolled = df.groupBy("part")
      .agg(HllAgg.sketch(Fingerprint64(col("v")), p).as("sk"))
      .agg(HllAgg.mergeSketches(col("sk"), p).as("sk"))
      .select(HllAgg.estimate(col("sk")).as("e")).head().getDouble(0)
    // direct: one sketch over the union
    val direct = df.agg(HllAgg(Fingerprint64(col("v")), p).as("e"))
      .head().getDouble(0)
    assert(rolled == direct,
      s"rollup must be LOSSLESS: merged=$rolled direct=$direct")
    assert(math.abs(rolled - 8000) < 0.16 * 8000,
      s"union estimate $rolled for 8000 distinct")
    // estimate face == hll_distinct on the same group
    val perGroup = df.groupBy("part").agg(
      HllAgg.estimate(HllAgg.sketch(Fingerprint64(col("v")), p)).as("via_sketch"),
      HllAgg(Fingerprint64(col("v")), p).as("direct"))
    perGroup.collect().foreach(r =>
      assert(r.getDouble(1) == r.getDouble(2), s"faces disagree: $r"))
    // SQL registration end to end
    df.createOrReplaceTempView("hll_roll_in")
    val viaSql = spark.sql(
      """SELECT hll_estimate(hll_merge(sk, 10)) FROM
        |  (SELECT part, hll_sketch(fingerprint64(v), 10) AS sk
        |   FROM hll_roll_in GROUP BY part)""".stripMargin)
      .head().getDouble(0)
    assert(viaSql == direct, s"SQL face $viaSql != $direct")
    // width mismatch is refused loudly, not silently mis-merged
    val err = intercept[Exception] {
      df.groupBy("part")
        .agg(HllAgg.sketch(Fingerprint64(col("v")), 10).as("sk"))
        .agg(HllAgg.mergeSketches(col("sk"), 11)).collect()
    }
    assert(err.getMessage.contains("hll_merge") ||
      err.getCause != null, err.getMessage)
  }

  test("KMV sketch partials: merge of per-part sketches is byte-identical " +
    "to sketching the union; estimate face agrees with kmv_distinct") {
    import spark.implicits._
    import graft.expr.{Fingerprint64, KmvAgg}
    val k = 64
    // three overlapping parts — union cardinality 8000, sum of parts 12000
    val parts = Seq(
      (0 until 5000).map(i => ("a", s"v$i")),
      (2000 until 7000).map(i => ("b", s"v$i")),
      (6000 until 8000).map(i => ("c", s"v$i"))).flatten
    val df = parts.toDF("part", "v")
    // canonical wire: merged partials == one-shot sketch of the union,
    // as BYTES — the k smallest of a union are the k smallest of the
    // parts' k-minima, and the sorted wire form makes that comparable
    val merged = df.groupBy("part")
      .agg(KmvAgg.sketch(Fingerprint64(col("v")), k).as("sk"))
      .agg(KmvAgg.mergeSketches(col("sk"), k).as("sk"))
      .head().getAs[Array[Byte]](0)
    val direct = df.agg(KmvAgg.sketch(Fingerprint64(col("v")), k).as("sk"))
      .head().getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(merged, direct),
      "sketch-of-union must equal merge-of-sketches byte-for-byte")
    // estimate from merged partials == one-shot kmv_distinct
    val rolled = df.groupBy("part")
      .agg(KmvAgg.sketch(Fingerprint64(col("v")), k).as("sk"))
      .agg(KmvAgg.mergeSketches(col("sk"), k).as("sk"))
      .select(KmvAgg.estimate(col("sk"), k).as("e")).head().getDouble(0)
    val oneShot = df.agg(KmvAgg(Fingerprint64(col("v")), k).as("e"))
      .head().getDouble(0)
    assert(rolled == oneShot,
      s"rollup must be LOSSLESS: merged=$rolled direct=$oneShot")
    assert(math.abs(rolled - 8000) < 0.35 * 8000,
      s"union estimate $rolled for 8000 distinct (k=$k)")
    // unsaturated group: estimate face returns the exact stored count
    val small = (0 until 10).map(i => s"s$i").toDF("v")
    val smallEst = small.agg(
      KmvAgg.estimate(KmvAgg.sketch(Fingerprint64(col("v")), k), k).as("e"))
      .head().getDouble(0)
    assert(smallEst == 10.0, s"unsaturated estimate $smallEst != 10")
    // SQL registration end to end
    df.createOrReplaceTempView("kmv_roll_in")
    val viaSql = spark.sql(
      s"""SELECT kmv_estimate(kmv_merge(sk, $k), $k) FROM
         |  (SELECT part, kmv_sketch(fingerprint64(v), $k) AS sk
         |   FROM kmv_roll_in GROUP BY part)""".stripMargin)
      .head().getDouble(0)
    assert(viaSql == oneShot, s"SQL face $viaSql != $oneShot")
    // k mismatch (sketch holds more values than the merge's k) refuses
    val err = intercept[Exception] {
      df.groupBy("part")
        .agg(KmvAgg.sketch(Fingerprint64(col("v")), 64).as("sk"))
        .agg(KmvAgg.mergeSketches(col("sk"), 8)).collect()
    }
    assert(err.getMessage != null)
    // non-canonical bytes (descending order) refuse loudly
    val bad = java.nio.ByteBuffer.allocate(4 + 16)
      .putInt(2).putLong(5L).putLong(3L).array()
    val err2 = intercept[Exception] {
      Seq(bad).toDF("sk")
        .select(KmvAgg.estimate(col("sk"), k)).collect()
    }
    assert(err2.getMessage != null)
  }

  test("CMS: estimates never undercount; wide sketch is exact; narrow collides") {
    import spark.implicits._
    import graft.operators.Sketches
    // zipf-ish bag: key_i appears (50-i) times
    val bag = (0 until 50).flatMap(i => Seq.fill(50 - i)(s"key_$i")).toDF("k")
    val truth = bag.groupBy("k").agg(count(lit(1)).as("exact")).cache()
    def ests(w: Int): Map[String, (Long, Long)] = {
      val counters = Sketches.cmsCounters(bag, "k", 4, w, 7L)
      Sketches.cmsEstimate(counters, truth, "k", 4, w, 7L)
        .collect().map(r => r.getString(0) -> (r.getLong(2), r.getLong(1))).toMap
    }
    val narrow = ests(8)
    narrow.values.foreach { case (est, exact) =>
      assert(est >= exact, s"CMS undercounted: $est < $exact") }
    // 50 keys in 8 buckets: some estimate MUST be inflated
    assert(narrow.values.exists { case (est, exact) => est > exact },
      "narrow sketch showed no collisions — hashes suspicious")
    // 4 rows × 4096 buckets for 50 keys: collisions in all 4 rows for the
    // same key are (50/4096)^4-grade unlikely → exact everywhere
    val wide = ests(4096)
    wide.values.foreach { case (est, exact) =>
      assert(est == exact, s"wide sketch inexact: $est vs $exact") }
    // absent key: estimate is well-defined (≥ 0) and cannot exceed the
    // heaviest colliding bucket
    val ghost = Sketches.cmsEstimate(
      Sketches.cmsCounters(bag, "k", 4, 8, 7L),
      Seq("never_seen").toDF("k"), "k", 4, 8, 7L)
      .head().getLong(1)
    assert(ghost >= 0L)
    truth.unpersist()
  }

  test("CMS: counter matrix is partitioning-independent") {
    import spark.implicits._
    import graft.operators.Sketches
    val bag = (0 until 500).map(i => s"t${i % 37}").toDF("k")
    def matrix(parts: Int): Set[(Int, Long, Long)] =
      Sketches.cmsCounters(bag.repartition(parts), "k", 4, 32, 11L)
        .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    assert(matrix(1) == matrix(17))
  }

  test("DD sketch partials: merge of per-part sketches is bit-identical " +
    "to sketching the union; estimate face agrees with dd_quantile_agg") {
    import spark.implicits._
    import graft.expr.{DdQuantileAgg, DdSketch}
    val alpha = 0.01
    val probs = Seq(0.5, 0.9, 0.99)
    val df = (1 to 9000).map(i => (s"p${i % 3}", (i % 977) + 0.25))
      .toDF("part", "v")
    // two-level: per-part sketch -> merged bytes == one-shot sketch bytes
    val merged = df.groupBy("part")
      .agg(DdSketch.sketch(col("v"), alpha).as("sk"))
      .agg(DdSketch.mergeSketches(col("sk")).as("sk"))
      .head().getAs[Array[Byte]](0)
    val direct = df.agg(DdSketch.sketch(col("v"), alpha).as("sk"))
      .head().getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(merged, direct),
      "sketch-of-union must equal merge-of-sketches byte-for-byte")
    // estimate from merged partials == one-shot dd_quantile_agg
    val viaPartials = df.groupBy("part")
      .agg(DdSketch.sketch(col("v"), alpha).as("sk"))
      .agg(DdSketch.mergeSketches(col("sk")).as("sk"))
      .select(DdSketch.quantiles(col("sk"), alpha, probs).as("q"))
      .head().getSeq[Double](0)
    val oneShot = df.agg(DdQuantileAgg(col("v"), alpha, probs).as("q"))
      .head().getSeq[Double](0)
    assert(viaPartials == oneShot,
      s"partials estimate $viaPartials != one-shot $oneShot")
    // relative-error guarantee holds on the rolled-up estimate
    val sorted = (1 to 9000).map(i => (i % 977) + 0.25).sorted
    probs.zip(viaPartials).foreach { case (p, est) =>
      val truth = sorted(math.floor(p * (sorted.size - 1)).toInt)
      assert(math.abs(est - truth) <= alpha * truth + 1e-9,
        s"p=$p est=$est truth=$truth exceeds alpha")
    }
    // empty/null handling: all-null group -> NULL sketch -> skipped by
    // merge; a merge over only NULLs is NULL
    val withNull = df.withColumn("v",
      when(col("part") === "p0", lit(null).cast("double")).otherwise(col("v")))
    val m2 = withNull.groupBy("part")
      .agg(DdSketch.sketch(col("v"), alpha).as("sk"))
      .agg(DdSketch.mergeSketches(col("sk")).as("sk"))
      .head().getAs[Array[Byte]](0)
    assert(m2 != null, "merge must skip NULL partials, not die on them")
    val allNull = df.limit(5).select(lit(null).cast("double").as("v"))
      .agg(DdSketch.sketch(col("v"), alpha).as("sk"))
      .select(DdSketch.mergeSketches(col("sk")))
    assert(allNull.head().isNullAt(0), "all-NULL rollup must be NULL")
    // malformed sketch binaries refuse loudly with a descriptive error,
    // not an opaque EOFException out of the stream reader
    val junk = df.limit(1)
      .select(lit(Array[Byte](1, 2, 3)).as("sk"))
      .select(DdSketch.quantiles(col("sk"), alpha, probs))
    val err = intercept[Exception] { junk.collect() }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(err).exists(_.contains("dd sketch")),
      s"expected a descriptive refusal, got: $err")
  }

  test("KMV set operations: jaccard/intersection estimates from sketches " +
    "alone track known overlaps; union is the lossless scalar merge") {
    import spark.implicits._
    import graft.expr.{Fingerprint64, KmvAgg}
    val k = 256
    // planted overlap: |A| = 6000, |B| = 6000, |A∩B| = 2000 → J = 0.2
    val a = (0 until 6000).map(i => ("a", s"v$i"))
    val b = (4000 until 10000).map(i => ("b", s"v$i"))
    val df = (a ++ b).toDF("part", "v")
    val sks = df.groupBy("part")
      .agg(KmvAgg.sketch(Fingerprint64(col("v")), k).as("sk"))
      .collect().map(r => r.getString(0) -> r.getAs[Array[Byte]](1)).toMap
    val skDf = Seq((sks("a"), sks("b"))).toDF("sa", "sb")
    val row = skDf.select(
      KmvAgg.jaccard(col("sa"), col("sb"), k).as("j"),
      KmvAgg.estimate(KmvAgg.union(col("sa"), col("sb"), k), k).as("u"))
      .head()
    val (j, u) = (row.getDouble(0), row.getDouble(1))
    // sampling error of a k=256 union sample: ±O(1/√k) ≈ ±0.0625·c;
    // generous 3σ-ish bounds that still catch a broken estimator
    assert(math.abs(j - 0.2) < 0.1, s"jaccard estimate $j for true 0.2")
    assert(math.abs(u - 10000) < 0.25 * 10000, s"union estimate $u for 10000")
    val inter = j * u
    assert(math.abs(inter - 2000) < 1200, s"intersection estimate $inter for 2000")
    // identical sketches → J = 1 exactly; disjoint small sets → 0 exactly
    assert(skDf.select(KmvAgg.jaccard(col("sa"), col("sa"), k))
      .head().getDouble(0) == 1.0)
    val dA = (0 until 50).map(i => s"x$i").toDF("v")
      .agg(KmvAgg.sketch(Fingerprint64(col("v")), k)).head().getAs[Array[Byte]](0)
    val dB = (0 until 50).map(i => s"y$i").toDF("v")
      .agg(KmvAgg.sketch(Fingerprint64(col("v")), k)).head().getAs[Array[Byte]](0)
    assert(Seq((dA, dB)).toDF("sa", "sb")
      .select(KmvAgg.jaccard(col("sa"), col("sb"), k)).head().getDouble(0) == 0.0)
    // unsaturated union of unsaturated parts is EXACT
    assert(Seq((dA, dB)).toDF("sa", "sb")
      .select(KmvAgg.estimate(KmvAgg.union(col("sa"), col("sb"), k), k))
      .head().getDouble(0) == 100.0)
    // SQL faces + k-mismatch refusal
    skDf.createOrReplaceTempView("kmv_pair_in")
    val viaSql = spark.sql(
      s"SELECT kmv_jaccard(sa, sb, $k) FROM kmv_pair_in").head().getDouble(0)
    assert(viaSql == j, s"SQL face $viaSql != $j")
    val err = intercept[Exception] {
      skDf.select(KmvAgg.jaccard(col("sa"), col("sb"), 8)).collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(err).exists(_.contains("kmv sketch")), s"got: $err")
  }

  test("sample sketch partials: merge of per-part sketches is byte-identical " +
    "to sketching the union; quantiles agree with the one-shot sample path") {
    import spark.implicits._
    import graft.expr.{Fingerprint64, SampleSketchAgg}
    val k = 64
    val probs = Seq(0.25, 0.5, 0.75, 0.95)
    // unique long ids across three parts; deterministic skewed values
    val rows = (0L until 6000L).map { i =>
      (s"p${i % 3}", i, (i % 977).toDouble * 1.25 + (i % 13).toDouble)
    }
    val df = rows.toDF("part", "id", "v")
    val hash = Fingerprint64(col("id").cast("string"))
    // canonical wire: merged partials == one-shot sketch of the union,
    // as BYTES — the k largest race keys of a union are the k largest
    // of the parts' k-largest, and the sorted wire form makes that
    // comparable directly
    val perPart = df.groupBy("part")
      .agg(SampleSketchAgg.sketch(hash, col("v"), k).as("sk"))
    val merged = perPart
      .agg(SampleSketchAgg.mergeSketches(col("sk"), k).as("sk"))
      .head().getAs[Array[Byte]](0)
    val direct = df.agg(SampleSketchAgg.sketch(hash, col("v"), k).as("sk"))
      .head().getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(merged, direct),
      "sketch-of-union must equal merge-of-sketches byte-for-byte")
    // quantiles from merged partials == the one-shot sample path
    // (Sketches.sampleQuantiles selects by the A-ES ln(u) race; the
    // sketch selects by unsigned mixed hash — ln is monotone, so the
    // SAMPLES are identical and the closed-form interpolation matches
    // bit-for-bit)
    val rolled = perPart
      .agg(SampleSketchAgg.mergeSketches(col("sk"), k).as("sk"))
      .select(posexplode(
        SampleSketchAgg.quantiles(col("sk"), k, probs)).as(Seq("pos", "q")))
      .collect().map(r => (r.getInt(0), r.getDouble(1))).toMap
    val oneShot = graft.operators.Sketches.sampleQuantiles(
        df.withColumn("g", lit("ALL")), "g", col("id"), "v", k, probs)
      .orderBy("prob")
      .collect().zipWithIndex.map { case (r, i) => (i, r.getDouble(2)) }.toMap
    assert(rolled == oneShot,
      s"rollup must be LOSSLESS vs the one-shot sample: $rolled vs $oneShot")
    // unsaturated group (n < k): the sample IS the data — quantiles are
    // the exact interpolated order statistics
    val small = Seq(("s", 1L, 10.0), ("s", 2L, 20.0), ("s", 3L, 30.0),
      ("s", 4L, 40.0), ("s", 5L, 50.0)).toDF("part", "id", "v")
    val med = small
      .agg(SampleSketchAgg.sketch(
        Fingerprint64(col("id").cast("string")), col("v"), k).as("sk"))
      .select(element_at(
        SampleSketchAgg.quantiles(col("sk"), k, Seq(0.5)), 1))
      .head().getDouble(0)
    assert(med == 30.0, s"unsaturated median $med != 30.0 (exact)")
    // SQL registration end to end
    df.createOrReplaceTempView("sample_roll_in")
    val viaSql = spark.sql(
      s"""SELECT sample_quantiles_of(sample_merge(sk, $k), $k,
         |         array(${probs.mkString(", ")})) FROM
         |  (SELECT part,
         |     sample_sketch(fingerprint64(CAST(id AS STRING)),
         |                   CAST(v AS DOUBLE), $k) AS sk
         |   FROM sample_roll_in GROUP BY part)""".stripMargin)
      .head().getSeq[Double](0)
    assert(viaSql == probs.indices.map(rolled), s"SQL face $viaSql != $rolled")
    // k mismatch (sketch holds more records than the merge's k) refuses
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    val err = intercept[Exception] {
      df.agg(SampleSketchAgg.sketch(hash, col("v"), k).as("sk"))
        .select(SampleSketchAgg.mergeSketches(col("sk"), 8)).collect()
    }
    assert(messages(err).exists(_.contains("sample sketch")),
      s"expected a descriptive k-mismatch refusal, got: $err")
    // malformed binary refuses loudly, not an opaque buffer error
    val junk = df.limit(1)
      .select(lit(Array[Byte](9, 9, 9)).as("sk"))
      .select(SampleSketchAgg.quantiles(col("sk"), k, probs))
    val err2 = intercept[Exception] { junk.collect() }
    assert(messages(err2).exists(_.contains("sample sketch")),
      s"expected a descriptive refusal, got: $err2")
  }
}
