package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-13 adversarial-skew dry run: cluster contraction when ONE
  * duplicate cluster spans half the corpus (boilerplate template
  * shape), at 10× and 100× the spec scale. Expectation: rounds stay
  * logarithmic (independent of corpus size for fixed block depth —
  * the structure's diameter, not its cardinality, drives rounds) and
  * wall tracks edge volume ~linearly. `runMain graft.SkewClusterDryRun`. */
object SkewClusterDryRun {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.sparkContext.setCheckpointDir(
      s"/tmp/skew_ckpt_${java.util.UUID.randomUUID()}")
    for (half <- Seq(327680L, 3276800L)) { // 10x and 100x the spec
      val chain = spark.range(half - 1)
        .filter(pmod(col("id") + 1, lit(64)) =!= 0)
        .select(col("id").as("doc_a"), (col("id") + 1).as("doc_b"))
      val hub = spark.range(half / 64)
        .select(lit(0L).as("doc_a"), (col("id") * 64).as("doc_b"))
        .filter(col("doc_b") =!= 0)
      val tail = spark.range(half / 2).select(
        (col("id") * 2 + half).as("doc_a"),
        (col("id") * 2 + half + 1).as("doc_b"))
      val pairs = chain.unionByName(hub).unionByName(tail)
      val t0 = System.nanoTime()
      val (labels, rounds, converged) =
        graft.operators.Dedup.duplicateClustersDetail(pairs, maxIter = 25)
      val giant = labels.groupBy("cluster").count()
        .orderBy(desc("count")).limit(1).collect()(0).getLong(1)
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"SKEWROW corpus=${2 * half} giant=$giant rounds=$rounds " +
        f"converged=$converged wall_s=$wall%.1f")
      require(converged && giant == half)
    }
    spark.stop()
  }
}
