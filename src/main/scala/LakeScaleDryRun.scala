import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.sources.{GraftMaintenance, GraftParquetV2}

/** Round-9 table-format scale dry run: selective DELETE candidate
  * fraction + wall time at sf0.01 vs sf0.1 over a range-clustered
  * table. Expectation: the candidate FILE FRACTION stays ~range
  * fraction (not 100%), and delete wall time tracks the candidate
  * subset, not the table. */
object LakeScaleDryRun {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions","8")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (sf <- Seq("sf0.01", "sf0.1")) {
      val dir = s"/root/testdata/$sf"
      val t0 = System.nanoTime()
      val table = s"/tmp/lake_scale_${sf}_${java.util.UUID.randomUUID()}"
      val orders = spark.read.parquet(s"$dir/orders.parquet")
        .select("o_orderkey","o_custkey","o_orderstatus","o_totalprice","o_orderpriority")
      orders.write.format("graft.sources.GraftParquetTableProvider")
        .option("path", table).mode("append").save()
      // cluster on the key into ~12 range-disjoint files
      GraftMaintenance.compact(spark, table,
        targetFileBytes = GraftParquetV2.totalFileBytes(table) / 12,
        clusterBy = Seq("o_orderkey"))
      val files0 = GraftParquetV2.listFiles(table).size
      val maxKey = orders.agg(max("o_orderkey")).head.getLong(0)
      val tSetup = (System.nanoTime()-t0)/1e9
      // candidate count = the DELTA in archived files across the
      // delete (the compact's own archived generation must not count)
      val archivedBefore =
        graft.sources.GraftTableLog.archivedStatuses(table).size
      // delete the lowest ~1/6 of the key range
      val t1 = System.nanoTime()
      GraftMaintenance.delete(spark, table, col("o_orderkey") <= maxKey/6)
      val tDel = (System.nanoTime()-t1)/1e9
      val files1 = GraftParquetV2.listFiles(table).size
      val candidates =
        graft.sources.GraftTableLog.archivedStatuses(table).size -
          archivedBefore
      println(f"SCALEROW sf=$sf files_clustered=$files0 candidates_archived=$candidates files_after=$files1 setup_s=$tSetup%.2f delete_s=$tDel%.2f")
      val p = new org.apache.hadoop.fs.Path(table)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    }
    spark.stop()
  }
}
