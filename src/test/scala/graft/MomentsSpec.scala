package graft

import org.apache.spark.sql.functions._
import graft.operators.Moments

/** [[graft.operators.Moments]]: order-independent moments from
  * decimal-exact power sums — bit-identical at any partitioning,
  * numerically agreeing with Spark's built-ins, exact on planted
  * closed-form cases. */
class MomentsSpec extends SparkSpec {

  private def li = spark.read.parquet(s"$sfDir/lineitem.parquet")
  private val x = col("l_quantity").cast("decimal(9,2)")
  private val y = col("l_extendedprice").cast("decimal(12,2)")

  test("bit-identical at any partitioning (the built-ins are not guaranteed this)") {
    val a = Moments.momentStats(li.repartition(2), Seq("l_returnflag"), x, y)
      .orderBy("l_returnflag").collect()
    val b = Moments.momentStats(li.repartition(17), Seq("l_returnflag"), x, y)
      .orderBy("l_returnflag").collect()
    val c = Moments.momentStats(li.coalesce(1), Seq("l_returnflag"), x, y)
      .orderBy("l_returnflag").collect()
    // exact Row equality — doubles compared bit-for-bit via ==
    assert(a.toSeq == b.toSeq && b.toSeq == c.toSeq)
  }

  test("numerically agrees with Spark's built-in aggregates") {
    val ours = Moments.momentStats(li, Seq("l_returnflag"), x, y)
      .orderBy("l_returnflag").collect()
    val ref = li.groupBy("l_returnflag")
      .agg(stddev_pop("l_quantity").as("sd"),
        skewness("l_quantity").as("sk"),
        kurtosis("l_quantity").as("ku"),
        corr("l_quantity", "l_extendedprice").as("co"))
      .orderBy("l_returnflag").collect()
    ours.zip(ref).foreach { case (o, r) =>
      assert(math.abs(o.getDouble(2) - r.getDouble(1)) < 1e-6, "stddev")
      assert(math.abs(o.getDouble(3) - r.getDouble(2)) < 1e-6, "skewness")
      assert(math.abs(o.getDouble(4) - r.getDouble(3)) < 1e-6, "kurtosis")
      assert(math.abs(o.getDouble(5) - r.getDouble(4)) < 1e-9, "corr")
    }
  }

  test("OLS on an exactly linear relation recovers slope/intercept/r2 exactly") {
    import spark.implicits._
    // y = 3x + 7 over x = 1..100, in exactly representable values
    val df = (1 to 100).map(i => (i.toDouble, 3.0 * i + 7.0, "g"))
      .toDF("xv", "yv", "g")
    val fit = Moments.linearFit(df, Seq("g"),
      col("xv").cast("decimal(9,2)"), col("yv").cast("decimal(12,2)"))
      .head()
    assert(fit.getDouble(2) == 3.0, s"slope ${fit.getDouble(2)}")
    assert(fit.getDouble(3) == 7.0, s"intercept ${fit.getDouble(3)}")
    // r² = corr·corr carries one rounding step; exact to 1 ulp-ish
    assert(math.abs(fit.getDouble(4) - 1.0) < 1e-12, s"r2 ${fit.getDouble(4)}")
  }

  test("constant column of a NON-double-representable value: stddev exactly 0, no float-dust garbage") {
    import spark.implicits._
    // 0.10 is not exactly representable in binary: the double-rounded
    // n*sxx - sx*sx is DUST (~1e-18), not 0 — the exact min==max
    // witness must catch it where a numeric zero test would not
    val df = Seq.tabulate(7)(i => (0.10, i.toDouble, "g"))
      .toDF("xv", "yv", "g")
    val m = Moments.momentStats(df, Seq("g"),
      col("xv").cast("decimal(9,2)"), col("yv").cast("decimal(12,2)"))
      .head()
    assert(m.getDouble(2) == 0.0, s"stddev of constant 0.10: ${m.getDouble(2)}")
    assert(m.isNullAt(3) && m.isNullAt(4) && m.isNullAt(5))
  }

  test("chi-squared: hand-derived 2x2, NULL rows dropped, vacuous axis yields NULL V") {
    import spark.implicits._
    // 2x2 grid: a=(x: 30 u, 10 v), b=(x: 10 u, 30 v) → n=80,
    // rowTot(x)=40? no: rows are (cat1, cat2) pairs:
    //   (a,u)=30 (a,v)=10 (b,u)=10 (b,v)=30; ra=rb=40, cu=cv=40
    //   E=20 for every cell; chi2 = 4 * (10^2/20) = 20; V = sqrt(20/80)=0.5
    val rows = Seq.fill(30)(("a","u")) ++ Seq.fill(10)(("a","v")) ++
      Seq.fill(10)(("b","u")) ++ Seq.fill(30)(("b","v")) ++
      Seq((null.asInstanceOf[String], "u"), ("a", null.asInstanceOf[String]))
    val df = rows.toDF("c1", "c2")
    val r = Moments.chiSquare(df, "c1", "c2").head()
    assert(math.abs(r.getDouble(0) - 20.0) < 1e-5, s"chi2 ${r.getDouble(0)}")
    assert(r.getLong(1) == 1L) // dof (2-1)(2-1)
    assert(r.getLong(2) == 80L) // NULL rows dropped from n
    assert(math.abs(r.getDouble(3) - 0.5) < 1e-6, s"V ${r.getDouble(3)}")
    // single-category axis: the test is vacuous — NULL V, chi2 0
    val one = Seq(("a","u"), ("a","v"), ("a","u")).toDF("c1","c2")
    val r1 = Moments.chiSquare(one, "c1", "c2").head()
    assert(r1.getLong(1) == 0L && r1.isNullAt(3))
  }

  test("mutual information: zero on independence, ln(2) nats on a perfect 2-way copy") {
    import spark.implicits._
    // perfectly dependent: b == a over two equiprobable symbols → MI = ln 2
    val dep = (Seq.fill(25)(("a","a")) ++ Seq.fill(25)(("b","b"))).toDF("c1","c2")
    val mDep = Moments.mutualInfo(dep, "c1", "c2").head()
    assert(math.abs(mDep.getDouble(0) - math.log(2.0)) < 1e-6,
      s"MI of a copy: ${mDep.getDouble(0)}")
    // independent: uniform product distribution → MI = 0
    val ind = (for { a <- Seq("a","b"); b <- Seq("u","v"); _ <- 1 to 10 }
      yield (a, b)).toDF("c1","c2")
    val mInd = Moments.mutualInfo(ind, "c1", "c2").head()
    assert(math.abs(mInd.getDouble(0)) < 1e-6, s"MI indep: ${mInd.getDouble(0)}")
    assert(mInd.getLong(2) == 4L) // observed cells
  }

  test("constant columns yield NULL (guarded), not an ANSI divide-by-zero error") {
    import spark.implicits._
    val df = Seq((1.0, 5.0, "g"), (2.0, 5.0, "g")).toDF("xv", "yv", "g")
    val m = Moments.momentStats(df, Seq("g"),
      col("xv").cast("decimal(9,2)"), col("yv").cast("decimal(12,2)"))
      .head()
    assert(m.isNullAt(5), "corr with zero y-variance must be NULL")
    // constant x: skew/kurt/corr/slope all NULL, stddev 0
    val m2 = Moments.momentStats(df, Seq("g"),
      col("yv").cast("decimal(9,2)"), col("xv").cast("decimal(12,2)"))
      .head()
    assert(m2.getDouble(2) == 0.0 && m2.isNullAt(3) && m2.isNullAt(4) &&
      m2.isNullAt(5))
    val fit = Moments.linearFit(df, Seq("g"),
      col("yv").cast("decimal(9,2)"), col("xv").cast("decimal(12,2)"))
      .head()
    assert(fit.isNullAt(2) && fit.isNullAt(3) && fit.isNullAt(4))
  }
}
