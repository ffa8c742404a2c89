import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.sources.{GraftMaintenance, GraftMv, MvAgg}

/** Round-16 OPTIMIZATION attribution: per-phase wall + Spark job count
  * for the MV writer-alphabet entries (q_mv_incremental /
  * q_mv_merge_state / q_mv_hll_distinct share it), which are the three
  * most expensive bench lanes at sf0.1 (11.2 / 8.6 / 7.5 s in the
  * round-open baseline). Each phase is a writer step or a refresh; the
  * job counter shows which steps pay in scheduling round-trips rather
  * than data volume — guide §1 (measure first) before touching
  * GraftMv/GraftMaintenance internals. */
object MvPhaseDryRun {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.core.GraftSession.adopt(spark)
    val fmt = "graft.sources.GraftParquetTableProvider"
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            s: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobs.incrementAndGet()
          if (sys.env.contains("MVPHASE_TRACE")) {
            val cs = Option(s.properties.getProperty("callSite.short"))
              .getOrElse("?")
            val ex = Option(
              s.properties.getProperty("spark.sql.execution.id"))
              .getOrElse("-")
            val n = s.stageInfos.map(_.numTasks).sum
            println(s"  JOB exec=$ex $cs tasks=$n")
          }
        }
      })
    def phase[T](name: String)(f: => T): T = {
      val j0 = jobs.get(); val t0 = System.nanoTime()
      val r = f
      val w = (System.nanoTime() - t0) / 1e9
      println(f"PHASE $name%-28s ${w}%7.2f s  jobs=${jobs.get() - j0}")
      r
    }
    val orders = graft.core.Tables.orders(spark, dir)
    def slice(k: Int) = orders
      .select("o_orderkey", "o_custkey", "o_orderstatus",
        "o_totalprice", "o_orderpriority")
      .filter(pmod(col("o_orderkey"), lit(4)) === k)
    // warm input caches like the bench does
    orders.queryExecution.toRdd.count()

    for (mode <- Seq("overwrite", "merge", "hll"); rep <- 1 to 2) {
      println(s"=== mode=$mode rep=$rep ===")
      val base = s"/tmp/mvphase-${java.util.UUID.randomUUID()}"
      val table = s"$base/src"; val mv = s"$base/mv"
      val aggs =
        if (mode == "hll") Seq(MvAgg("count", "*", "cnt"),
          MvAgg("hll", "o_custkey", "nd_cust"))
        else Seq(MvAgg("count", "*", "cnt"),
          MvAgg("count", "o_custkey", "n_cust"),
          MvAgg("sum", "o_totalprice", "total_price"),
          MvAgg("avg", "o_totalprice", "avg_price"),
          MvAgg("min", "o_orderkey", "min_key"),
          MvAgg("max", "o_orderkey", "max_key"))
      val t0 = System.nanoTime()
      phase("append v1")(slice(0).write.format(fmt)
        .option("path", table).mode("append").save())
      phase("create mv")(GraftMv.create(spark, mv, table,
        Seq("o_orderpriority"), aggs, stateMerge = mode == "merge"))
      phase("append v2")(slice(1).write.format(fmt)
        .option("path", table).mode("append").save())
      phase("refresh after append")(GraftMv.refresh(spark, mv))
      phase("delete v3")(GraftMaintenance.delete(spark, table,
        col("o_totalprice") < lit(50000.0)))
      phase("refresh after delete")(GraftMv.refresh(spark, mv))
      val updates = slice(0)
        .filter(pmod(col("o_orderkey"), lit(8)) === 0)
        .withColumn("o_totalprice", col("o_totalprice") * 2)
      phase("merge v4")(GraftMaintenance.merge(spark, table,
        updates.unionByName(slice(2)), "o_orderkey"))
      phase("refresh after merge")(GraftMv.refresh(spark, mv))
      if (mode == "overwrite") {
        phase("compact v5")(GraftMaintenance.compact(spark, table))
        phase("refresh after compact")(GraftMv.refresh(spark, mv))
      }
      phase("read mv")(GraftMv.read(spark, mv)
        .orderBy("o_orderpriority").queryExecution.toRdd.count())
      println(f"TOTAL $mode ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      org.apache.hadoop.fs.FileSystem.getLocal(
        spark.sparkContext.hadoopConfiguration)
        .delete(new org.apache.hadoop.fs.Path(base), true)
    }
    spark.stop()
  }
}
