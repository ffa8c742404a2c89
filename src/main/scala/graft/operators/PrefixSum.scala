package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed prefix sum (running total) — the scale-safe replacement for
  * `sum(v) OVER (ORDER BY k)`.
  *
  * A global un-partitioned window forces every row into ONE task
  * (Spark logs `WindowExec: No Partition Defined`): correct at any SF,
  * serial at all of them — the classic 100 TB scale-killer. This operator
  * computes the identical result with the textbook two-pass scheme
  * (Blelloch's scan, applied at partition granularity):
  *
  *   1. assign each row a contiguous RANGE bucket of the order key
  *      (cheap closed-form arithmetic over the key bounds — no sampling,
  *      so the bucketing is deterministic and the plan needs no extra
  *      pass the way `repartitionByRange`'s RangePartitioner does);
  *   2. per-bucket local cumsum — a PARTITIONED window, so all buckets
  *      run in parallel after one hash shuffle;
  *   3. per-bucket totals → exclusive per-bucket offsets via a tiny
  *      broadcast theta-join (≤ nBuckets² rows — no global window, so
  *      step 3 introduces no single-partition stage either);
  *   4. row result = local cumsum + bucket offset.
  *
  * Bucket boundaries are correctness-NEUTRAL: any contiguous range split
  * of the key domain yields the same running total, so the bounds used
  * for bucketing may come from a cheap SUPERSET frame (e.g. the raw
  * table before expensive filtering) — empty buckets cost nothing. That
  * also means skew in the key distribution affects only balance, never
  * results; pick `nBuckets` ≈ shuffle parallelism.
  *
  * Contract: `orderCol` is numeric, non-null, and unique per row (ties
  * would make any running total order-ambiguous); `valueCol` is numeric
  * (may be negative — bucket totals are true sums, not running maxima).
  */
object PrefixSum {

  /** Adds `cumCol` = inclusive running total of `valueCol` in `orderCol`
    * order.
    *
    * @param boundsFrom optional frame to take the key bounds from — any
    *        superset of `df`'s keys works; pass the cheap raw table when
    *        `df` is the tail of an expensive pipeline, so the bounds pass
    *        doesn't recompute it
    * @param nBuckets   range-bucket count; ≤ 0 → the session's
    *        `spark.sql.shuffle.partitions`
    */
  def runningTotal(df: DataFrame, orderCol: String, valueCol: String,
      cumCol: String, nBuckets: Int = -1,
      boundsFrom: Option[DataFrame] = None): DataFrame = {
    val n =
      if (nBuckets > 0) nBuckets
      else df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val src = boundsFrom.getOrElse(df)
    val bounds = src.agg(
      min(col(orderCol)).as("__graft_lo"), max(col(orderCol)).as("__graft_hi"))

    // closed-form contiguous range bucket: floor((k - lo) / width), width
    // sized so n buckets cover [lo, hi]; least() guards the hi edge
    val width = greatest(
      ceil((col("__graft_hi") - col("__graft_lo") + 1) / lit(n)), lit(1.0))
    val bucketed = df.crossJoin(broadcast(bounds))
      .withColumn("__graft_bkt",
        least(floor((col(orderCol) - col("__graft_lo")) / width),
          lit(n - 1)).cast("int"))
      .drop("__graft_lo", "__graft_hi")

    // pass 1: per-bucket local running totals — partitioned window, all
    // buckets in parallel after one hash shuffle on the bucket id
    val w = Window.partitionBy("__graft_bkt").orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = bucketed.withColumn("__graft_local",
      sum(col(valueCol)).over(w))

    // pass 2: bucket totals, aggregated OVER THE WINDOW OUTPUT so the
    // bucket-shuffle exchange is reused (ReusedExchange in the plan) and
    // the upstream pipeline is not recomputed for this tiny side
    val totals = local.groupBy("__graft_bkt")
      .agg(sum(col(valueCol)).as("__graft_bsum"))

    // exclusive prefix of bucket totals: offset(b) = Σ totals(b' < b).
    // A tiny broadcast theta-join (≤ n² rows), NOT a global window — the
    // whole point is zero un-partitioned window stages anywhere.
    val offsets = totals
      .join(broadcast(totals.select(col("__graft_bkt").as("__graft_b2"),
        col("__graft_bsum").as("__graft_s2"))),
        col("__graft_b2") < col("__graft_bkt"), "left")
      .groupBy("__graft_bkt")
      .agg(coalesce(sum("__graft_s2"), lit(0)).as("__graft_off"))

    local.join(broadcast(offsets), "__graft_bkt")
      .withColumn(cumCol, col("__graft_local") + col("__graft_off"))
      .drop("__graft_bkt", "__graft_local", "__graft_off")
  }
}
