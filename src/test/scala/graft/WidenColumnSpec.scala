package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType}

/** TYPE-WIDENING schema evolution (round 15): `ALTER COLUMN … TYPE`
  * int→bigint / float→double commits a zero-row carrier and NO rewrite
  * — pre-widening files keep their narrow physical type and every read
  * path up-casts per file ([[graft.sources.GraftAggSpec.widenValue]]).
  * The tests target each pushdown path over a MIXED-WIDTH table (one
  * INT32-era file, one INT64-era file): row scan + filter pushdown
  * (zone maps compare across widths), footer-stats aggregate pushdown,
  * grouped-aggregate pushdown (narrow and wide keys must land in ONE
  * group), top-N pushdown, and the refusal surface. */
class WidenColumnSpec extends SparkSpec {

  private val fmt = "graft.sources.GraftParquetTableProvider"

  private def scratch(): String = {
    val d = java.nio.file.Files
      .createTempDirectory("graft_widen_").toFile.getAbsolutePath
    s"$d/t"
  }

  // ONE warehouse for the suite: Spark instantiates a catalog plugin
  // once per name and pins its first warehouse conf — per-test
  // warehouses under one catalog name would silently miss
  private lazy val warehouse = java.nio.file.Files
    .createTempDirectory("graft_widen_wh_").toFile.getAbsolutePath

  /** Register the graft catalog and create a fresh table identity. */
  private def catalogTable(): (String, String, String) = {
    val cat = "graft_widen"
    spark.conf.set(s"spark.sql.catalog.$cat", "graft.sources.GraftCatalog")
    spark.conf.set(s"spark.sql.catalog.$cat.warehouse", warehouse)
    val tbl = "t_" + java.util.UUID.randomUUID().toString.replace("-", "")
    (cat, tbl, s"$warehouse/sf/$tbl")
  }

  /** A mixed-width table: gen-1 `w` as INT (values 1..50, key = id),
    * widen, gen-2 `w` as BIGINT with values beyond int range. */
  private def mixedTable(): (String, String, String) = {
    import spark.implicits._
    val (cat, tbl, path) = catalogTable()
    (1 to 50).map(i => (i.toLong, i, s"g${i % 3}"))
      .toDF("id", "w", "grp")
      .withColumn("w", col("w").cast("int"))
      .write.format(fmt).option("path", path).mode("append").save()
    spark.sql(s"ALTER TABLE $cat.sf.$tbl ALTER COLUMN w TYPE bigint")
    (51 to 80).map(i => (i.toLong, 3000000000L + i, s"g${i % 3}"))
      .toDF("id", "w", "grp")
      .write.format(fmt).option("path", path).mode("append").save()
    (cat, tbl, path)
  }

  test("widen int->bigint: live schema, mixed-width scan, filters push") {
    val (_, _, path) = mixedTable()
    val head = spark.read.format(fmt).option("path", path).load()
    assert(head.schema("w").dataType == LongType)
    assert(head.count() == 80)
    // every narrow value up-cast: sum spans both eras exactly
    val expect = (1 to 50).map(_.toLong).sum +
      (51 to 80).map(3000000000L + _).sum
    assert(head.agg(sum("w")).head().getLong(0) == expect)
    // filter pushdown across widths: beyond-int-range predicate must
    // prune the narrow era (zone maps compare int stats vs long lit)
    assert(head.filter(col("w") > 2999999999L).count() == 30)
    assert(head.filter(col("w") < 100L).count() == 50)
    // exact equality on a narrow-era value through a long literal
    assert(head.filter(col("w") === 7L).count() == 1)
    // and the bounds land as LONGS in collected rows (a missed up-cast
    // class-casts here)
    assert(head.filter(col("w") === 7L).head().getAs[Long]("w") == 7L)
  }

  test("widen: footer-stats aggregate pushdown up-casts extremes") {
    val (_, _, path) = mixedTable()
    val head = spark.read.format(fmt).option("path", path).load()
    // no filters → the metadata-only fast path serves min/max/count
    val r = head.agg(min("w"), max("w"), count(lit(1))).head()
    assert(r.getLong(0) == 1L)            // INT32-era extreme, as Long
    assert(r.getLong(1) == 3000000080L)   // INT64-era extreme
    assert(r.getLong(2) == 80L)
  }

  test("widen: grouped-agg pushdown merges narrow and wide keys") {
    val (_, _, path) = mixedTable()
    val head = spark.read.format(fmt).option("path", path).load()
    // group BY the widened column: the same logical key value written
    // narrow in gen-1 must merge with wide gen-2 groups, not split
    val byW = head.groupBy("w").count()
    assert(byW.count() == 80) // all distinct here, but typed Long
    assert(byW.schema("w").dataType == LongType)
    // group by a string key, aggregate the widened column: per-group
    // min comes from the narrow era, max from the wide era
    val g = head.groupBy("grp")
      .agg(min("w").as("mn"), max("w").as("mx"), count(lit(1)).as("n"))
      .orderBy("grp").collect()
    assert(g.length == 3)
    assert(g.forall(r => r.getAs[Long]("mn") <= 50L &&
      r.getAs[Long]("mx") > 3000000000L))
  }

  test("widen: top-N pushdown orders across widths") {
    val (_, _, path) = mixedTable()
    val head = spark.read.format(fmt).option("path", path).load()
    val bottom = head.orderBy(col("w")).limit(3)
      .collect().map(_.getAs[Long]("w")).toSeq
    assert(bottom == Seq(1L, 2L, 3L))
    val top = head.orderBy(col("w").desc).limit(2)
      .collect().map(_.getAs[Long]("w")).toSeq
    assert(top == Seq(3000000080L, 3000000079L))
  }

  test("widen float->double up-casts exactly") {
    import spark.implicits._
    val (cat, tbl, path) = catalogTable()
    Seq((1L, 1.5f), (2L, 2.25f)).toDF("id", "x")
      .write.format(fmt).option("path", path).mode("append").save()
    spark.sql(s"ALTER TABLE $cat.sf.$tbl ALTER COLUMN x TYPE double")
    Seq((3L, 1e200)).toDF("id", "x")
      .write.format(fmt).option("path", path).mode("append").save()
    val head = spark.read.format(fmt).option("path", path).load()
    assert(head.schema("x").dataType == DoubleType)
    // 1.5f and 2.25f are dyadic rationals: exact as doubles
    val xs = head.orderBy("id").collect().map(_.getAs[Double]("x")).toSeq
    assert(xs == Seq(1.5, 2.25, 1e200))
    assert(head.filter(col("x") > 1e100).count() == 1)
    assert(head.agg(min("x"), max("x")).head() ==
      org.apache.spark.sql.Row(1.5, 1e200))
  }

  test("widen refusals: narrowing, cross-family, partition column") {
    import spark.implicits._
    val (cat, tbl, path) = catalogTable()
    Seq((1L, 1, 2.0)).toDF("a", "b", "c")
      .write.format(fmt).option("path", path).mode("append").save()
    // narrowing bigint -> int: refused (Spark's own up-cast analysis
    // or the catalog guard — either way it must not commit)
    intercept[Exception](
      spark.sql(s"ALTER TABLE $cat.sf.$tbl ALTER COLUMN a TYPE int"))
    // cross-family int -> double: Spark may up-cast it, the FORMAT
    // refuses (not a lossless physical widening for this reader)
    intercept[Exception](
      spark.sql(s"ALTER TABLE $cat.sf.$tbl ALTER COLUMN b TYPE double"))
    // double -> float narrowing
    intercept[Exception](
      spark.sql(s"ALTER TABLE $cat.sf.$tbl ALTER COLUMN c TYPE float"))
    // schema unchanged after all refusals
    val sch = spark.table(s"$cat.sf.$tbl").schema
    assert(sch("a").dataType == LongType)
    assert(sch("b").dataType == IntegerType)
    assert(sch("c").dataType == DoubleType)
    // partition column: its values live in directory paths — refused
    val (cat2, tbl2, _) = catalogTable()
    spark.sql(s"CREATE TABLE $cat2.sf.$tbl2 (k INT, v BIGINT) " +
      s"PARTITIONED BY (k)")
    val e = intercept[Exception](
      spark.sql(s"ALTER TABLE $cat2.sf.$tbl2 ALTER COLUMN k TYPE bigint"))
    assert(e.getMessage.toLowerCase.contains("partition"))
  }

  test("widen: pre-widening version presents its era's schema (catalog)") {
    val (cat, tbl, path) = mixedTable()
    assert(spark.sql(s"SELECT * FROM $cat.sf.$tbl VERSION AS OF 1")
      .schema("w").dataType == IntegerType)
    // raw path: live schema over era data, values up-cast
    val raw = spark.read.format(fmt).option("path", path)
      .option("versionAsOf", "1").load()
    assert(raw.schema("w").dataType == LongType)
    assert(raw.agg(max("w")).head().getLong(0) == 50L)
  }
}
