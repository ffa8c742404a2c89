import org.apache.spark.sql.SparkSession
import graft.sources.GraftConstraints

/** Round-11 constraint-enforcement overhead dry run: the same bulk
  * connector write with 0 / 1 / 3 CHECK constraints attached, at
  * sf0.01 and sf0.1. The enforcement cost is one codegen'd predicate
  * call per row per constraint inside the task writer — the expectation
  * is single-digit-percent overhead, i.e. the same order as one extra
  * WHERE clause, NOT a second pass over the data. */
object ConstraintOverheadDryRun {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fmt = "graft.sources.GraftParquetTableProvider"
    for (sf <- Seq("sf0.01", "sf0.1")) {
      val li = spark.read.parquet(s"/root/testdata/$sf/lineitem.parquet")
        .select("l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
          "l_extendedprice").cache()
      val rows = li.count() // materialize the cache: time writes only
      def timeWrite(constraints: Seq[(String, String)]): Double = {
        // best of 3: per-run scratch table, constraints added between
        // an empty-seed write and the timed bulk append
        (1 to 3).map { _ =>
          val t = s"/tmp/ck_overhead_${java.util.UUID.randomUUID()}"
          li.limit(1).coalesce(1).write.format(fmt)
            .option("path", t).mode("append").save()
          constraints.foreach { case (n, e) =>
            GraftConstraints.add(spark, t, n, e)
          }
          val t0 = System.nanoTime()
          li.write.format(fmt).option("path", t).mode("append").save()
          val s = (System.nanoTime() - t0) / 1e9
          val p = new org.apache.hadoop.fs.Path(t)
          p.getFileSystem(spark.sparkContext.hadoopConfiguration)
            .delete(p, true)
          s
        }.min
      }
      val none = timeWrite(Nil)
      val one = timeWrite(Seq("qty_pos" -> "l_quantity > 0"))
      val three = timeWrite(Seq(
        "qty_pos" -> "l_quantity > 0",
        "price_pos" -> "l_extendedprice > 0",
        "keys_pos" -> "l_orderkey >= 0 AND l_partkey >= 0 AND l_suppkey >= 0"))
      println(f"SCALEROW sf=$sf rows=$rows write_0ck_s=$none%.2f " +
        f"write_1ck_s=$one%.2f write_3ck_s=$three%.2f " +
        f"overhead_1ck=${(one / none - 1) * 100}%.1f%% " +
        f"overhead_3ck=${(three / none - 1) * 100}%.1f%%")
    }
    spark.stop()
  }
}
