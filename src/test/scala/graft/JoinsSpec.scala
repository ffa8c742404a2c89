package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.operators.{AsOfJoin, Joins}
import graft.sources.{Sinks, Sources}

/** Specs for as-of join, salted join, bucketed co-located join, and the
  * approximate-distinct tolerance. */
class JoinsSpec extends SparkSpec {

  test("asOf: picks the latest right row at-or-before each left time") {
    val lSchema = StructType(Seq(StructField("k", LongType, false),
      StructField("t", LongType, false), StructField("lid", LongType, false)))
    val rSchema = StructType(Seq(StructField("k", LongType, false),
      StructField("t", LongType, false), StructField("v", DoubleType, false)))
    val left = Sources.inMemory(spark, Seq(
      Row(1L, 10L, 100L), Row(1L, 20L, 101L), Row(1L, 5L, 102L),
      Row(2L, 10L, 103L)), lSchema)
    val right = Sources.inMemory(spark, Seq(
      Row(1L, 10L, 1.0), Row(1L, 15L, 2.0), Row(9L, 1L, 9.9)), rSchema)
    // latest-match-is-null case needs a nullable value column
    val rNullSchema = StructType(Seq(StructField("k", LongType, false),
      StructField("t", LongType, false), StructField("v", DoubleType, true)))
    val out = rows(AsOfJoin.asOf(left, right, Seq("k"), "t", Seq("v")))
      .map(r => r.getAs[Long]("lid") -> Option(r.getAs[Any]("asof_v"))).toMap
    assert(out(100L) == Some(1.0)) // right at exactly t=10 visible (<=)
    assert(out(101L) == Some(2.0)) // latest of {10, 15}
    assert(out(102L) == None)      // nothing at or before t=5
    assert(out(103L) == None)      // no right rows for key 2

    // a NULL-valued right row IS the latest match (DuckDB ASOF parity):
    // it must yield NULL, not resurrect the older non-null value
    val rightWithNull = Sources.inMemory(spark, Seq(
      Row(1L, 10L, 1.0), Row(1L, 15L, null)), rNullSchema)
    val out2 = rows(AsOfJoin.asOf(left, rightWithNull, Seq("k"), "t", Seq("v")))
      .map(r => r.getAs[Long]("lid") -> Option(r.getAs[Any]("asof_v"))).toMap
    assert(out2(100L) == Some(1.0)) // t=10: the non-null row
    assert(out2(101L) == None)      // t=20: latest match (t=15) is null
  }

  test("asOf: NULL keys never match (SQL equi-join semantics)") {
    val lSchema = StructType(Seq(StructField("k", LongType, true),
      StructField("t", LongType, false), StructField("lid", LongType, false)))
    val rSchema = StructType(Seq(StructField("k", LongType, true),
      StructField("t", LongType, false), StructField("v", DoubleType, false)))
    val left = Sources.inMemory(spark, Seq(
      Row(null, 20L, 100L),  // null-keyed left: survives, matches nothing
      Row(1L, 20L, 101L)), lSchema)
    val right = Sources.inMemory(spark, Seq(
      Row(null, 10L, 666.0), // null-keyed right: matches nothing at all
      Row(1L, 10L, 1.0)), rSchema)
    val out = rows(AsOfJoin.asOf(left, right, Seq("k"), "t", Seq("v")))
      .map(r => r.getAs[Long]("lid") -> Option(r.getAs[Any]("asof_v"))).toMap
    assert(out.keySet == Set(100L, 101L), "every left row must survive")
    assert(out(100L) == None, "null-keyed left must not match null-keyed right")
    assert(out(101L) == Some(1.0))
  }

  test("asOf: right-side timestamp ties break deterministically (greatest value)") {
    val lSchema = StructType(Seq(StructField("k", LongType, false),
      StructField("t", LongType, false), StructField("lid", LongType, false)))
    val rSchema = StructType(Seq(StructField("k", LongType, false),
      StructField("t", LongType, false), StructField("v", DoubleType, false)))
    val left = Sources.inMemory(spark, Seq(Row(1L, 10L, 100L)), lSchema)
    // two right rows at exactly the same (key, time): the pinned winner is
    // the sort-greatest value tuple, independent of input order/partitioning
    for (ordering <- Seq(Seq(Row(1L, 10L, 1.0), Row(1L, 10L, 2.0)),
                         Seq(Row(1L, 10L, 2.0), Row(1L, 10L, 1.0)))) {
      val right = Sources.inMemory(spark, ordering, rSchema).repartition(3)
      val out = rows(AsOfJoin.asOf(left, right, Seq("k"), "t", Seq("v")))
        .map(r => r.getAs[Long]("lid") -> r.getAs[Double]("asof_v")).toMap
      assert(out(100L) == 2.0, s"tie must resolve to the greatest value")
    }
  }

  test("saltedJoin equals plain join, and spreads the hot key") {
    val skewSchema = StructType(Seq(StructField("k", LongType, false),
      StructField("id", LongType, false)))
    val dimSchema = StructType(Seq(StructField("k", LongType, false),
      StructField("name", StringType, false)))
    // hot key 7 with 100 rows, plus a few cold keys
    val skewRows = (1L to 100L).map(i => Row(7L, i)) ++
      Seq(Row(1L, 201L), Row(2L, 202L))
    val skewed = Sources.inMemory(spark, skewRows, skewSchema)
    val dim = Sources.inMemory(spark,
      Seq(Row(7L, "hot"), Row(1L, "a"), Row(3L, "unmatched")), dimSchema)
    val plain = rows(skewed.join(dim, Seq("k")))
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    val salted = rows(Joins.saltedJoin(skewed, dim, Seq("k"), 8, col("id")))
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(salted == plain)
    assert(plain.size == 101)
  }

  test("saltedJoin: NULL saltSource rows land in bucket 0, not dropped") {
    // the 'salting must be invisible' invariant on a NULLABLE salt
    // column: a null fingerprint must coalesce to bucket 0, or the
    // inner join on (_salt) silently drops the row vs the plain join
    val skewSchema = StructType(Seq(StructField("k", LongType, false),
      StructField("id", LongType, true)))
    val dimSchema = StructType(Seq(StructField("k", LongType, false),
      StructField("name", StringType, false)))
    val skewRows = Seq(Row(7L, null), Row(7L, 1L), Row(1L, null))
    val skewed = Sources.inMemory(spark, skewRows, skewSchema)
    val dim = Sources.inMemory(spark,
      Seq(Row(7L, "hot"), Row(1L, "a")), dimSchema)
    val plain = rows(skewed.join(dim, Seq("k")))
      .map(r => (r.getLong(0), r.get(1), r.getString(2))).toSet
    val salted = rows(Joins.saltedJoin(skewed, dim, Seq("k"), 8, col("id")))
      .map(r => (r.getLong(0), r.get(1), r.getString(2))).toSet
    assert(salted == plain)
    assert(plain.size == 3)
  }

  test("AQE skew-join splits the hot key that saltedJoin handles manually") {
    // The engine's two answers to join skew must agree: Joins.saltedJoin
    // (explicit salting) and AQE's runtime skew split. Deliberately skew a
    // rides-like key, force a shuffle join, and lower the skew thresholds
    // so local-scale partitions qualify — then assert AQE actually split
    // (skew=true in the final adaptive plan) and results match the salted
    // path exactly.
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "32KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16KB",
      "spark.sql.adaptive.coalescePartitions.minPartitionSize" -> "1KB",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      import spark.implicits._
      // 50% of rows on hot key 7, each padded so the hot shuffle partition
      // dwarfs the median AND clears the size threshold; pad stays in the
      // join OUTPUT so column pruning can't slim the skewed partition away
      val pad = "x" * 200
      val skewed = spark.range(0, 20000)
        .select(when(col("id") % 2 === 0, lit(7L)).otherwise(col("id")).as("k"),
          col("id").as("rid"), lit(pad).as("pad"))
      val dim = Seq(7L -> "hot", 1L -> "a", 11L -> "b").toDF("k", "name")
      val joined = skewed.join(dim, Seq("k")).select("k", "rid", "name", "pad")
      val viaAqe = rows(joined).map(r =>
        (r.getLong(0), r.getLong(1), r.getString(2))).toSet
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE did not split the skewed partition:\n$plan")
      val viaSalt = rows(graft.operators.Joins.saltedJoin(
        skewed, dim, Seq("k"), 8, col("rid")).select("k", "rid", "name"))
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
      assert(viaAqe == viaSalt)
      // 10000 even ids + id=7 itself on the hot key, + keys 1 and 11
      assert(viaAqe.size == 10001 + 2)
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("bucketed tables join with no Exchange in the plan") {
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force non-broadcast
    try {
      val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
        .select("l_orderkey", "l_quantity")
      val ord = spark.read.parquet(s"$sfDir/orders.parquet")
        .select("o_orderkey", "o_custkey")
      Sinks.parquetBucketed(li, "li_b", "l_orderkey", 8)
      Sinks.parquetBucketed(ord, "ord_b", "o_orderkey", 8)
      try {
        val joined = spark.table("li_b")
          .join(spark.table("ord_b"), col("l_orderkey") === col("o_orderkey"))
        val plan = joined.queryExecution.executedPlan.toString
        assert(!plan.contains("Exchange"),
          s"bucketed join should not shuffle:\n$plan")
        assert(joined.count() > 0)
      } finally {
        spark.sql("DROP TABLE IF EXISTS li_b")
        spark.sql("DROP TABLE IF EXISTS ord_b")
      }
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }

  test("bloom kernel: zero false negatives, FPR near theory, order-independent blob") {
    val k = 5
    val words = new Array[Long]((1 << 17) / 64) // m = 131072 bits
    val members = (0L until 10000L).map(_ * 7919L + 13L)
    members.foreach(graft.expr.BloomKernels.add(words, k, _))
    val blob = graft.expr.BloomKernels.serialize(words, k)
    // no false negatives, ever
    members.foreach(m =>
      assert(graft.expr.BloomKernels.mightContain(blob, m), s"false negative on $m"))
    // false-positive rate ≈ (1 − e^{−kn/m})^k ≈ 0.217% at n=10k, m=128Ki, k=5
    val nonMembers = (0L until 20000L).map(_ * 7919L + 14L)
    val fps = nonMembers.count(graft.expr.BloomKernels.mightContain(blob, _))
    val theory = math.pow(1 - math.exp(-k * 10000.0 / (1 << 17)), k)
    assert(fps.toDouble / nonMembers.size <= 3 * theory + 1e-4,
      s"FPR ${fps.toDouble / nonMembers.size} vs theory $theory")
    // insertion order cannot move a bit
    val words2 = new Array[Long]((1 << 17) / 64)
    scala.util.Random.shuffle(members).foreach(
      graft.expr.BloomKernels.add(words2, k, _))
    assert(java.util.Arrays.equals(blob,
      graft.expr.BloomKernels.serialize(words2, k)))
  }

  test("bloomPrefilter: superset of matches, partitioning-independent blob, prune in plan") {
    import spark.implicits._
    val dim = spark.range(0, 500).select((col("id") * 3).as("dk"))
    val fact = spark.range(0, 20000).select((col("id") % 2000).as("fk"))
    val pruned = Joins.bloomPrefilter(fact, col("fk"), dim, col("dk"))
    val keep = rows(pruned).map(_.getLong(0))
    // every true match survives (no false negatives)…
    val trueMatches = rows(fact.join(dim, col("fk") === col("dk"), "left_semi"))
      .map(_.getLong(0))
    assert(keep.toSet.intersect(trueMatches.toSet) == trueMatches.toSet)
    // …and the prune actually bit: ≤ a handful of false positives among
    // the 1000 non-matching distinct keys at m=2^22, n=500
    assert(keep.size <= trueMatches.size + 100,
      s"prune ineffective: kept ${keep.size} vs ${trueMatches.size} true")
    // the blob is a pure function of the key set, not its partitioning
    val b1 = rows(dim.repartition(1).agg(
      graft.expr.BloomAgg(col("dk"), 1 << 16, 5).as("b"))).head.getAs[Array[Byte]](0)
    val b13 = rows(dim.repartition(13).agg(
      graft.expr.BloomAgg(col("dk"), 1 << 16, 5).as("b"))).head.getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(b1, b13))
    // the membership probe sits in the fact-side plan (map-side, pre-join)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("bloom_might_contain"), s"no bloom probe in plan:\n$plan")
  }

  test("q_bloom_join_prune equals the plain unpruned join") {
    val viaBloom = rows(Catalog.all.find(_.name == "q_bloom_join_prune").get
      .run(spark, sfDir))
    val urgent = spark.read.parquet(s"$sfDir/orders.parquet")
      .filter(col("o_orderpriority") === "1-URGENT")
      .select("o_orderkey", "o_orderdate")
    val plain = rows(spark.read.parquet(s"$sfDir/lineitem.parquet")
      .join(urgent, col("l_orderkey") === col("o_orderkey"))
      .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
      .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .cast("decimal(28,6)")).cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy("o_year"))
    assert(viaBloom == plain)
    assert(viaBloom.nonEmpty)
  }

  test("approx_count_distinct within 5% of exact on events") {
    val events = spark.read.parquet(s"$sfDir/events.parquet")
    val both = rows(events.groupBy("event_type").agg(
      countDistinct(col("user_id")).as("exact"),
      approx_count_distinct(col("user_id")).as("approx")))
    both.foreach { r =>
      val e = r.getLong(1).toDouble; val a = r.getLong(2).toDouble
      assert(math.abs(a - e) / e <= 0.05, s"${r.getString(0)}: approx $a vs exact $e")
    }
  }
}
