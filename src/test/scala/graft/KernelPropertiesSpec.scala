package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.expr.{BloomKernels, TextHashKernels, ZOrderKernels}
import graft.sources.Sources

/** Randomized (seeded, deterministic) properties for the round-4 kernels —
  * the wide-input sweeps the example-based specs can't cover. */
class KernelPropertiesSpec extends SparkSpec {

  private val rnd = new scala.util.Random(0xC0FFEE)

  test("zorder: roundtrip and axis separation hold over 20k random cells") {
    (1 to 20000).foreach { _ =>
      val x = rnd.nextInt(65536).toLong
      val y = rnd.nextInt(65536).toLong
      val z = ZOrderKernels.interleave16(x, y)
      assert(z >= 0 && z <= 0xffffffffL)
      assert(ZOrderKernels.compact16(z) == x)
      assert(ZOrderKernels.compact16(z >> 1) == y)
      // axis separation: moving only x never disturbs y's bits
      val x2 = rnd.nextInt(65536).toLong
      assert(ZOrderKernels.compact16(ZOrderKernels.interleave16(x2, y) >> 1) == y)
    }
  }

  test("bloom: no false negatives under any random partition split of inserts") {
    (1 to 20).foreach { trial =>
      val keys = Array.fill(500)(rnd.nextLong())
      val parts = 1 + rnd.nextInt(7)
      // insert each key into a random partial filter, then OR-merge
      val words = Array.fill(parts)(new Array[Long](1024))
      keys.foreach(k => BloomKernels.add(words(rnd.nextInt(parts)), 4, k))
      val merged = new Array[Long](1024)
      words.foreach(w => (0 until 1024).foreach(i => merged(i) |= w(i)))
      val blob = BloomKernels.serialize(merged, 4)
      keys.foreach(k => assert(BloomKernels.mightContain(blob, k),
        s"trial $trial: false negative"))
      // serialize/deserialize identity
      assert(java.util.Arrays.equals(
        BloomKernels.deserializeWords(blob), merged))
    }
  }

  test("splitmix64: injective on 200k distinct inputs, balanced output bits") {
    val n = 200000
    val outs = new Array[Long](n)
    var i = 0
    while (i < n) { outs(i) = TextHashKernels.splitmix64(i * 0x9E3779B9L + 7); i += 1 }
    assert(outs.distinct.length == n, "splitmix64 must be collision-free here (bijection)")
    // each output bit should be ~50% set (within 1%)
    (0 until 64).foreach { b =>
      val ones = outs.count(v => ((v >> b) & 1L) == 1L)
      assert(math.abs(ones.toDouble / n - 0.5) < 0.01, s"bit $b biased: $ones/$n")
    }
  }

  test("argmax_agg null semantics: null ords ignored, null value at max survives") {
    import org.apache.spark.sql.functions._
    val schema = StructType(Seq(
      StructField("g", LongType, false), StructField("o", LongType, true),
      StructField("v", StringType, true)))
    val df = Sources.inMemory(spark, Seq(
      Row(1L, 1L, "a"), Row(1L, 5L, null), Row(1L, 3L, "c"), // max ord holds null value
      Row(2L, null, "x"),                                    // all ords null
      Row(3L, 2L, "z"), Row(3L, null, "ignored")), schema)
    val out = rows(df.groupBy("g")
      .agg(graft.expr.ArgMaxAgg(col("o"), col("v")).as("win")))
      .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(out(1L).isEmpty, "null VALUE at the max ord must win and stay null")
    assert(out(2L).isEmpty, "group with only null ords yields null")
    assert(out(3L).contains("z"), "null-ord rows are ignored, not poisonous")
  }

  test("latestByKey equals a reference fold on random changelogs with version ties") {
    val schema = StructType(Seq(
      StructField("k", LongType, false), StructField("ver", LongType, false),
      StructField("uid", LongType, false), StructField("payload", LongType, false)))
    (1 to 5).foreach { trial =>
      // small key space + tiny version range → guaranteed version ties,
      // resolved by the unique uid tie-break
      val rows0 = (0 until 400).map { i =>
        Row(rnd.nextInt(20).toLong, rnd.nextInt(5).toLong, i.toLong, rnd.nextLong())
      }
      val df = Sources.inMemory(spark, rows0, schema).repartition(1 + rnd.nextInt(8))
      val compacted = graft.operators.Upsert.latestByKey(df, Seq("k"), "ver", "uid")
      if (trial == 1) {
        // the argmax aggregate must hash, not sort (ArgMaxAgg scaladoc)
        val plan = compacted.queryExecution.executedPlan.toString
        assert(plan.contains("ObjectHashAggregate") && !plan.contains("SortAggregate"),
          s"latestByKey must plan ObjectHashAggregate:\n$plan")
      }
      val got = rows(compacted)
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
      val want = rows0.groupBy(_.getLong(0)).map { case (_, rs) =>
        val w = rs.maxBy(r => (r.getLong(1), r.getLong(2)))
        (w.getLong(0), w.getLong(1), w.getLong(2), w.getLong(3))
      }.toSet
      assert(got == want, s"trial $trial")
    }
  }
}
