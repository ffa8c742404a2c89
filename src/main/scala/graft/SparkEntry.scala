package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * The actual query definitions live in [[Catalog]]; each entry pairs the
  * Spark implementation with its DuckDB oracle SQL so they evolve in
  * lockstep. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Q-total — the reference's composite DAG (two sources, agg ⋈ cross
    * join, full-outer zero-fill). */
  def entry(spark: SparkSession): DataFrame = {
    graft.core.GraftSession.adopt(spark)
    Catalog.qTotal.run(spark, "/root/testdata/sf0.001")
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Catalog.all.map { q =>
      q.name -> { (spark: SparkSession, dir: String) =>
        graft.core.GraftSession.adopt(spark)
        q.run(spark, dir)
      }
    }.toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Catalog.all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
