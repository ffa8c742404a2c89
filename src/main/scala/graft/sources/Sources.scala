package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.StructType

/** Source surface (SURVEY §2.1).
  *
  * The reference reads exclusively via `beam.io.ReadFromBigQuery(query=...)`
  * (`/root/reference/pipelines/cycle_rides.py:43-46`) — an external engine
  * runs the SQL and the pipeline consumes dict rows — and `beam.Create`
  * literals in notebooks. Spark-native equivalents:
  *   - columnar files: `spark.read.parquet/csv/json` (vectorized parquet
  *     reader; Catalyst pushes projection+predicates into the scan);
  *   - "run SQL at the source": register the table and `spark.sql` — the
  *     engine IS the executor, the pushdown is automatic;
  *   - literals: `createDataFrame` with an explicit schema.
  */
object Sources {

  def parquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  def csv(spark: SparkSession, path: String, schema: StructType,
      header: Boolean = true): DataFrame =
    spark.read.option("header", header.toString).schema(schema).csv(path)

  def json(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** ORC — the other columnar lake format Spark ships native vectorized
    * support for; predicate pushdown and column pruning work like
    * parquet's (spec-asserted on the roundtrip). */
  def orc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** `beam.Create` analog: bounded in-memory literal source
    * (cf. `notebooks/development.ipynb` cell 3). */
  def inMemory(spark: SparkSession, rows: Seq[Row], schema: StructType): DataFrame =
    // list-based createDataFrame plans a LocalRelation — constant-foldable
    // and locally executable by Catalyst — where parallelize would force
    // an opaque ExistingRDD scan with per-row serialization
    spark.createDataFrame(
      scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava, schema)

  /** ReadFromBigQuery(query=...) analog: SQL over registered file-backed
    * views — Catalyst prunes/pushes into the scan, which is what the
    * reference gets by writing SELECT-lists into its BQ query strings. */
  def sqlOverParquet(spark: SparkSession, views: Map[String, String],
      query: String): DataFrame = {
    views.foreach { case (name, path) =>
      spark.read.parquet(path).createOrReplaceTempView(name)
    }
    spark.sql(query)
  }
}
