package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.expr.ZOrderKernels
import graft.sources.{Sinks, Sources}

/** Specs for the Morton-code kernel and the z-ordered parquet layout. */
class ZOrderSpec extends SparkSpec {

  test("interleave16/compact16 roundtrip and bit placement") {
    val probes = Seq(0L, 1L, 2L, 0xffffL, 0x8000L, 12345L, 54321L)
    for (x <- probes; y <- probes) {
      val z = ZOrderKernels.interleave16(x, y)
      assert(ZOrderKernels.compact16(z) == x, s"x roundtrip ($x,$y)")
      assert(ZOrderKernels.compact16(z >> 1) == y, s"y roundtrip ($x,$y)")
    }
    // interleaving: x on even bits, y on odd
    assert(ZOrderKernels.interleave16(1, 0) == 1L)
    assert(ZOrderKernels.interleave16(0, 1) == 2L)
    assert(ZOrderKernels.interleave16(0xffffL, 0xffffL) == 0xffffffffL)
    intercept[IllegalArgumentException] {
      ZOrderKernels.interleave16(65536L, 0L)
    }
  }

  test("z-ordered write bounds BOTH columns per file; single-column sort does not") {
    val schema = StructType(Seq(StructField("id", LongType, false),
      StructField("x", DoubleType, false), StructField("y", DoubleType, false)))
    // deterministic pseudo-uniform points on [0,1)^2
    val pts = (0L until 4096L).map(i =>
      Row(i, (i * 73 % 997).toDouble / 997.0, (i * 151 % 991).toDouble / 991.0))
    val df = Sources.inMemory(spark, pts, schema)
    val zPath = "/tmp/graft_zorder_test"
    val xPath = "/tmp/graft_xsort_test"
    Sinks.parquetZOrdered(df, "x", 0.0, 1.0, "y", 0.0, 1.0, zPath, files = 16)
    df.repartitionByRange(16, col("x")).sortWithinPartitions("x")
      .write.mode("overwrite").parquet(xPath)

    def fileExtents(path: String): Seq[(Double, Double)] =
      rows(spark.read.parquet(path)
        .groupBy(input_file_name()).agg(
          (max("x") - min("x")).as("ex"), (max("y") - min("y")).as("ey")))
        .map(r => (r.getDouble(1), r.getDouble(2)))

    val zExt = fileExtents(zPath)
    val xExt = fileExtents(xPath)
    assert(zExt.size >= 8, s"expected >=8 z files, got ${zExt.size}")
    val zAvgY = zExt.map(_._2).sum / zExt.size
    val xAvgY = xExt.map(_._2).sum / xExt.size
    // x-sorted files leave y unconstrained (extent ≈ 1.0 each); z-ordered
    // files must bound it materially
    assert(xAvgY > 0.9, s"x-sorted baseline should not bound y (got $xAvgY)")
    assert(zAvgY < 0.5 * xAvgY, s"z-order y-extent $zAvgY vs x-sort $xAvgY")
    // a y-only box query [0.4, 0.45] could prune most z files, none of the
    // x-sorted ones
    val zPrunable = zExt.count { case (_, _) => true } // all files considered
    val zHit = rows(spark.read.parquet(zPath)
      .groupBy(input_file_name()).agg(min("y").as("lo"), max("y").as("hi")))
      .count(r => r.getDouble(1) <= 0.45 && r.getDouble(2) >= 0.40)
    assert(zHit < zPrunable,
      s"no z file pruned for a y-box query ($zHit of $zPrunable hit)")
    // layout is a reshuffle, not a transformation: content identical
    assert(rows(spark.read.parquet(zPath)).map(_.getLong(0)).sorted ==
      (0L until 4096L))
  }

  test("parquetZOrdered clamps out-of-bounds rows instead of failing") {
    val schema = StructType(Seq(StructField("id", LongType, false),
      StructField("x", DoubleType, false), StructField("y", DoubleType, false)))
    val df = Sources.inMemory(spark,
      Seq(Row(1L, -5.0, 0.5), Row(2L, 5.0, 0.5), Row(3L, 0.5, 0.5)), schema)
    val p = "/tmp/graft_zorder_clamp"
    Sinks.parquetZOrdered(df, "x", 0.0, 1.0, "y", 0.0, 1.0, p, files = 2)
    assert(spark.read.parquet(p).count() == 3)
  }
}
