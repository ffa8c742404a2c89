package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Column profiling — the data-quality pass a pipeline runs before
  * training prep: per column, row count, null count, and exact distinct
  * count, as one narrow tidy frame.
  *
  * Shape: ONE aggregate computes every per-column statistic in a single
  * pass (count/count-null are partial-aggregated map-side; the exact
  * distincts expand per column the way Spark plans multi-distinct
  * aggregates), then `stack` unpivots the single row into (col_name,
  * n_rows, n_nulls, n_distinct) rows. For 100 TB profiling where exact
  * distincts are too expensive, [[graft.expr.KmvAgg]] is the drop-in
  * estimate — this operator keeps exact semantics so it can be
  * oracle-checked.
  *
  * No counterpart in the reference; part of graft's pipeline surface.
  */
object Profile {

  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile: need at least one column")
    cols.foreach(c => require(df.columns.contains(c),
      s"profile: column '$c' not in ${df.columns.mkString(",")}"))
    val aggs = cols.flatMap(c => Seq(
      count(when(col(c).isNull, 1)).as(s"${c}__nulls"),
      countDistinct(col(c)).as(s"${c}__distinct")))
    val allAggs = count(lit(1)).as("__rows") +: aggs
    val one = df.agg(allAggs.head, allAggs.tail: _*)
    val stackArgs = cols
      .map(c => s"'$c', `${c}__nulls`, `${c}__distinct`").mkString(", ")
    one.select(col("__rows"),
        expr(s"stack(${cols.length}, $stackArgs) AS (col_name, n_nulls, n_distinct)"))
      .select(col("col_name"), col("__rows").as("n_rows"),
        col("n_nulls"), col("n_distinct"))
  }
}
