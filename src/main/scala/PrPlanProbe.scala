import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off probe: does the checkpointed, keyed rank frame actually give
  * an exchange-free pagerank iteration? Prints the physical plan of the
  * contribution join + rank update. */
object PrPlanProbe {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.core.GraftSession.adopt(spark)
    val nParts = 8
    val edges = graft.core.Tables.rides(spark, dir)
    val e0 = edges
      .select(col("start_station_id").cast("long").as("src"),
        col("end_station_id").cast("long").as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull).distinct()
    val e = e0.join(e0.groupBy("src").agg(count(lit(1)).as("od")), "src")
      .repartition(nParts, col("src")).localCheckpoint()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
      .repartition(nParts, col("node")).localCheckpoint()
    val pr = nodes.withColumn("pr", lit(0.001))
    val contrib = e.join(pr, col("src") === col("node"))
      .select(col("dst").as("node"),
        (col("pr") / col("od").cast("double")).cast("decimal(28,12)").as("q"))
      .groupBy("node").agg(sum("q").cast("double").as("s"))
    val base = nodes.join(contrib, Seq("node"), "left")
      .select(col("node"), (lit(0.15 / 100) +
        lit(0.85) * coalesce(col("s"), lit(0.0))).as("pr"))
    base.explain("formatted")
    spark.stop()
  }
}
