package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StructField, StructType}

/** As-of join: for each left row, attach the most recent right row with
  * right.time ≤ left.time, per key — the canonical event-enrichment join
  * (trades⋈quotes, event⋈latest-state) that Spark lacks as a primitive.
  *
  * Implementation is the union-merge composition (preference (a) of the
  * engine's extension ladder): tag both sides, union, and run ONE window
  * pass per key ordered by (time, side) carrying the last right payload
  * forward. Cost: a single shuffle on the key — same as any keyed window —
  * versus the naive time-range join (quadratic per key) or a
  * sort-merge-interval join. Skewed keys behave like any window partition
  * (salt upstream if one key dominates).
  *
  * Ordering inside a timestamp tie: the right row sorts BEFORE the left
  * row (side 0 < side 1), so a right event at exactly t is visible to a
  * left event at t ("≤" semantics, matching DuckDB's ASOF JOIN).
  *
  * Right rows whose value column is NULL still count as the latest match
  * (the value carried is NULL — not an older non-null value): each value
  * rides inside a non-null struct wrapper, so `last(..., ignoreNulls)`
  * skips left-row placeholders but never a real right row.
  *
  * NULL keys follow SQL equi-join semantics: a NULL key matches NOTHING.
  * Right rows with a NULL key are dropped; left rows with a NULL key
  * survive with NULL `asof_*` values (they are never routed through the
  * window, where Spark's partitionBy would otherwise group the two
  * sides' NULLs together and "match" them).
  *
  * Ties WITHIN the right side (two right rows, same key and time) break
  * deterministically: the value structs themselves are trailing sort
  * keys, and `last` carries the sort-greatest one — so reruns and
  * retries yield the same answer regardless of input partitioning
  * (DuckDB's ASOF leaves this unspecified; we pin it).
  */
object AsOfJoin {

  /** @param left      probe side; columns kept
    * @param right     reference side; `valueCols` are attached
    * @param keyCols   equi-key columns present on both sides
    * @param timeCol   ordering column name (both sides, same type)
    * @param valueCols right columns to carry (null when no right row ≤ t)
    */
  def asOf(left: DataFrame, right: DataFrame, keyCols: Seq[String],
      timeCol: String, valueCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    def wrapType(c: String) = StructType(Seq(
      StructField("v", right.schema(c).dataType, nullable = true)))
    // keyless (global) as-of: no NULL-key handling applies
    val keyIsNull =
      if (keyCols.isEmpty) lit(false)
      else keyCols.map(col(_).isNull).reduce(_ || _)
    val lTagged = left.filter(!keyIsNull)
      .withColumn("_side", lit(1))
      .select(
        (keyCols.map(col) :+ col(timeCol) :+ col("_side")) ++
          leftCols.filterNot(c => keyCols.contains(c) || c == timeCol).map(col) ++
          valueCols.map(c => lit(null).cast(wrapType(c)).as(s"_v_$c")): _*)
    // SQL equi-join semantics: NULL keys match nothing, so null-keyed
    // right rows are dropped outright
    val rTagged = right.filter(!keyIsNull)
      .withColumn("_side", lit(0))
      .select(
        (keyCols.map(col) :+ col(timeCol) :+ col("_side")) ++
          leftCols.filterNot(c => keyCols.contains(c) || c == timeCol)
            .map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
          // non-null struct wrapper: a right row with a NULL value is
          // still "the latest match" and must not be skipped
          valueCols.map(c => struct(col(c).as("v")).as(s"_v_$c")): _*)
    // trailing _v_ sort keys: among right rows tied on (key, time), the
    // struct-greatest value is carried by `last` — a pinned, rerun-stable
    // choice (left rows sort via _side, so their placeholder NULL structs
    // never interleave with real right values at a tie). Only ORDERABLE
    // value types participate — a map-typed value column can't be a sort
    // key, and falls back to the pre-tie-break behavior (arbitrary pick
    // among exact ties) instead of failing analysis.
    val orderableValues = valueCols.filter(c =>
      org.apache.spark.sql.catalyst.expressions.RowOrdering.isOrderable(
        right.schema(c).dataType))
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(timeCol) +: col("_side") +:
        orderableValues.map(c => col(s"_v_$c")): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = lTagged.unionByName(rTagged)
      .select(col("*") +: valueCols.map(c =>
        last(col(s"_v_$c"), ignoreNulls = true).over(w)
          .getField("v").as(s"asof_$c")): _*)
      .filter(col("_side") === 1)
      .drop("_side")
      .drop(valueCols.map(c => s"_v_$c"): _*)
    // null-keyed left rows survive, unmatched (asof_* = NULL)
    val lNullKeys = left.filter(keyIsNull)
      .select(matched.columns.map(c =>
        if (valueCols.exists(v => s"asof_$v" == c))
          lit(null).cast(matched.schema(c).dataType).as(c)
        else col(c)): _*)
    matched.unionByName(lNullKeys)
  }
}
