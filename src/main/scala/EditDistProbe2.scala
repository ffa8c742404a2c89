import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
object EditDistProbe2 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val acc = new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val secs = (si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L)) / 1e3
        if (secs > 1.0) println(f"STAGE ${si.stageId}%3d tasks=${si.numTasks}%4d wall=${secs}%7.1f  ${si.name.take(60)}")
      }
    }
    spark.sparkContext.addSparkListener(acc)
    val df = graft.TextQueries.qDedupEditDist.run(spark, "/tmp/sf1")
    val t0 = System.nanoTime()
    df.queryExecution.toRdd.count()
    println(f"WALL ${(System.nanoTime()-t0)/1e9}%.2f")
    Thread.sleep(2000)
    spark.stop()
  }
}
