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
  *   3. per-bucket totals → exclusive per-bucket offsets: the ≤ nBuckets
  *      totals are gathered into ONE sorted array and scanned once with
  *      an `aggregate` higher-order function — O(nBuckets) work on
  *      metadata-scale data, no global window, no quadratic join (at
  *      10k+ shuffle partitions a naive b'<b theta-join would be ~10^8
  *      comparisons);
  *   4. row result = local cumsum + bucket offset.
  *
  * Bucket boundaries are correctness-NEUTRAL: any contiguous range split
  * of the key domain yields the same running total, so the bounds used
  * for bucketing may come from a cheap SUPERSET frame (e.g. the raw
  * table before expensive filtering) — empty buckets cost nothing. That
  * also means skew in the key distribution affects only balance, never
  * results; pick `nBuckets` ≈ shuffle parallelism. For pathological key
  * domains (99% of keys inside one closed-form range), `sampledBuckets =
  * true` swaps step 1 for `repartitionByRange`'s sampled RangePartitioner
  * — balanced buckets at the cost of one extra sampling pass over `df`.
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
    * @param sampledBuckets use `repartitionByRange` (sampled range
    *        partitioning) instead of the closed-form arithmetic bucket —
    *        balanced even on pathological key domains, at the cost of
    *        the RangePartitioner's extra sampling pass over `df`
    *        (`boundsFrom` is ignored on this path)
    */
  def runningTotal(df: DataFrame, orderCol: String, valueCol: String,
      cumCol: String, nBuckets: Int = -1,
      boundsFrom: Option[DataFrame] = None,
      sampledBuckets: Boolean = false): DataFrame = {
    val n =
      if (nBuckets > 0) nBuckets
      else df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32").toInt

    val bucketed =
      if (sampledBuckets) {
        // sampled contiguous ranges: RangePartitioner guarantees every key
        // in partition i sorts before every key in partition i+1, which is
        // all the offset pass needs — the bucket id IS the partition id
        df.repartitionByRange(n, col(orderCol))
          .withColumn("__graft_bkt", spark_partition_id())
      } else {
        val src = boundsFrom.getOrElse(df)
        val bounds = src.agg(
          min(col(orderCol)).as("__graft_lo"), max(col(orderCol)).as("__graft_hi"))
        // closed-form contiguous range bucket: floor((k - lo) / width),
        // width = (hi − lo)/n so FRACTIONAL key domains split across all
        // n buckets too (a ceil-to-1 width collapsed any domain narrower
        // than n into bucket 0 — the serial bottleneck this operator
        // exists to remove). The epsilon floor keeps an all-equal-keys
        // domain at bucket 0 instead of dividing by zero; least() guards
        // the k = hi edge. Bucket boundaries stay correctness-neutral.
        val width = greatest(
          (col("__graft_hi") - col("__graft_lo")).cast("double") / lit(n),
          lit(1e-12))
        df.crossJoin(broadcast(bounds))
          .withColumn("__graft_bkt",
            least(floor((col(orderCol) - col("__graft_lo")) / width),
              lit(n - 1)).cast("int"))
          .drop("__graft_lo", "__graft_hi")
      }

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
    // The ≤ n totals collapse into ONE sorted array (struct sort orders by
    // the leading bucket-id field) scanned once by an `aggregate` lambda —
    // O(n), in-plan, no driver round-trip, no global window, and no
    // quadratic theta-join. Interpreted HOF eval is irrelevant here: it
    // touches nBuckets elements, not data-scale rows.
    val sumT = totals.schema("__graft_bsum").dataType.sql
    val offsets = totals
      .agg(sort_array(collect_list(struct(col("__graft_bkt"), col("__graft_bsum"))))
        .as("__graft_arr"))
      .select(explode(expr(
        s"""aggregate(
           |  __graft_arr,
           |  named_struct(
           |    'run', CAST(0 AS $sumT),
           |    'out', CAST(array() AS array<struct<__graft_bkt: int, __graft_off: $sumT>>)),
           |  (acc, x) -> named_struct(
           |    -- coalesce: a bucket whose rows ALL have NULL values sums
           |    -- to NULL, which would poison the running offset for every
           |    -- later bucket (window sums just skip NULLs)
           |    'run', acc.run + coalesce(x.__graft_bsum, CAST(0 AS $sumT)),
           |    'out', array_append(acc.out,
           |      named_struct('__graft_bkt', x.__graft_bkt, '__graft_off', acc.run))),
           |  acc -> acc.out)""".stripMargin)).as("__graft_e"))
      .select(col("__graft_e.__graft_bkt").as("__graft_bkt"),
        col("__graft_e.__graft_off").as("__graft_off"))

    local.join(broadcast(offsets), "__graft_bkt")
      .withColumn(cumCol, col("__graft_local") + col("__graft_off"))
      .drop("__graft_bkt", "__graft_local", "__graft_off")
  }
}
