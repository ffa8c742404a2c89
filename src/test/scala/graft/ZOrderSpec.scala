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

  test("hilbert16: bijective with d2xy; consecutive indices are grid " +
      "NEIGHBORS (the locality Morton lacks); range + order guards") {
    import graft.expr.HilbertKernels
    // bijectivity on corners + a deterministic scatter
    val pts = Seq((0L, 0L), (65535L, 0L), (0L, 65535L), (65535L, 65535L)) ++
      (0 until 4096).map(i => ((i * 40503L) % 65536L, (i * 14057L) % 65536L))
    pts.foreach { case (x, y) =>
      val d = HilbertKernels.xy2d(x, y)
      assert(d >= 0L && d < 65536L * 65536L)
      assert(HilbertKernels.d2xy(d) == ((x, y)), s"roundtrip drift at ($x, $y)")
    }
    assert(pts.map((HilbertKernels.xy2d _).tupled).distinct.size ==
      pts.distinct.size, "distinct points must map to distinct indices")
    // THE Hilbert property: each step of the curve moves to a grid
    // neighbor — |dx| + |dy| = 1. Morton fails this at every quadrant
    // seam (e.g. z=1 → z=2 jumps diagonally). Checked at the curve
    // start, across a power-of-two seam, and at a large offset.
    for (base <- Seq(0L, 65534L, 1L << 20, (1L << 31) + 12345L)) {
      var (px, py) = HilbertKernels.d2xy(base)
      for (d <- base + 1 to base + 2048) {
        val (x, y) = HilbertKernels.d2xy(d)
        assert(math.abs(x - px) + math.abs(y - py) == 1,
          s"non-neighbor step at d=$d: ($px,$py) -> ($x,$y)")
        px = x; py = y
      }
    }
    // the Morton contrast, pinned: z traverses (0,0)→(1,0)→(0,1) — the
    // step from z=1 to z=2 is DIAGONAL (|dx|+|dy| = 2), the quadrant
    // seam jump Hilbert provably never makes
    import graft.expr.ZOrderKernels
    def zxy(z: Long): (Long, Long) =
      (ZOrderKernels.compact16(z), ZOrderKernels.compact16(z >> 1))
    val steps = (0L to 2L).map(zxy)
    assert(math.abs(steps(2)._1 - steps(1)._1) +
      math.abs(steps(2)._2 - steps(1)._2) == 2,
      s"expected the Morton seam jump, got $steps")
    // range guard
    intercept[IllegalArgumentException](HilbertKernels.xy2d(65536L, 0L))
    intercept[IllegalArgumentException](HilbertKernels.xy2d(0L, -1L))
    intercept[IllegalArgumentException](HilbertKernels.d2xy(-1L))
  }

  test("hilbert-ordered write bounds BOTH columns per file, like z-order") {
    val schema = StructType(Seq(StructField("id", LongType, false),
      StructField("x", DoubleType, false), StructField("y", DoubleType, false)))
    val pts = (0L until 4096L).map(i =>
      Row(i, (i * 73 % 997).toDouble / 997.0, (i * 151 % 991).toDouble / 991.0))
    val df = Sources.inMemory(spark, pts, schema)
    val hPath = "/tmp/graft_hilbert_test"
    Sinks.parquetHilbertOrdered(df, "x", 0.0, 1.0, "y", 0.0, 1.0, hPath,
      files = 16)
    val ext = rows(spark.read.parquet(hPath)
      .groupBy(input_file_name()).agg(
        (max("x") - min("x")).as("ex"), (max("y") - min("y")).as("ey")))
      .map(r => (r.getDouble(1), r.getDouble(2)))
    assert(ext.size >= 8, s"expected >=8 hilbert files, got ${ext.size}")
    val avgX = ext.map(_._1).sum / ext.size
    val avgY = ext.map(_._2).sum / ext.size
    assert(avgX < 0.5 && avgY < 0.5,
      s"hilbert files must bound both columns (got x=$avgX y=$avgY)")
    // layout is a reshuffle, not a transformation: content identical
    assert(rows(spark.read.parquet(hPath)).map(_.getLong(0)).sorted ==
      (0L until 4096L))
  }
}
