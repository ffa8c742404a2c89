import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-16 OPTIMIZATION attribution for the graph trio (pagerank /
  * sssp / bfs, 5.5/3.8/3.7 s at sf0.1 in the round-open baseline):
  * per-stage wall + job counts, plus the physical plan of one pagerank
  * iteration — the suspicion is per-iteration shuffle width (static
  * 32-partition exchanges against a checkpointed, estimate-less rank
  * frame that can never auto-broadcast). */
object GraphPhaseDryRun {
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
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val tasks = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            s: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobs.incrementAndGet()
          tasks.addAndGet(s.stageInfos.map(_.numTasks).sum)
        }
      })
    def phase[T](name: String)(f: => T): T = {
      val j0 = jobs.get(); val k0 = tasks.get(); val t0 = System.nanoTime()
      val r = f
      val w = (System.nanoTime() - t0) / 1e9
      println(f"PHASE $name%-24s ${w}%7.2f s  jobs=${jobs.get() - j0} " +
        f"tasks=${tasks.get() - k0}")
      r
    }
    val rides = graft.core.Tables.rides(spark, dir)
    rides.queryExecution.toRdd.count() // warm
    for (rep <- 1 to 2) {
      println(s"=== rep=$rep ===")
      if (sys.env.contains("GRAPH_NO_AQE"))
        spark.conf.set("spark.sql.adaptive.enabled", "false")
      phase("pagerank x1")(graft.operators.Graphs.pageRank(
        rides, "start_station_id", "end_station_id", 1)
        .queryExecution.toRdd.count())
      phase("pagerank x10")(graft.operators.Graphs.pageRank(
        rides, "start_station_id", "end_station_id", 10)
        .queryExecution.toRdd.count())
      val backbone = graft.RelationalQueries.backboneEdges(spark, dir)
      val srcNode = phase("backbone head")(backbone.select("u").head().getLong(0))
      phase("bfs")(graft.operators.Graphs.bfsDistances(
        backbone, "u", "v", srcNode, graft.RelationalQueries.BfsMaxHops)
        .queryExecution.toRdd.count())
      val wb = backbone
        .withColumn("w", pmod(col("u") * 7 + col("v") * 13, lit(9L)) + 1L)
      phase("sssp")(graft.operators.Graphs.ssspDistances(
        wb, "u", "v", "w", srcNode)
        .queryExecution.toRdd.count())
    }
    spark.stop()
  }
}
