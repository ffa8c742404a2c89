package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode,
  StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Custom keyed state via flatMapGroupsWithState — the extension point for
  * streaming semantics the built-in windows can't express. The example
  * operator: per-key FIRST-SEEN emission with a running duplicate count
  * (the streaming dedup ledger: emit a row the first time a fingerprint
  * appears, keep counting suppressed repeats in state).
  *
  * State is one (count) long per key; with processing-time timeout the
  * store self-expires — bounded state on an unbounded stream. */
object StatefulOps {

  case class Keyed(key: Long, payload: String)
  case class FirstSeen(key: Long, payload: String, dupes_so_far: Long)

  /** Works on both batch and streaming Datasets (batch runs a single
    * "micro-batch", same semantics). */
  def firstSeenWithDupCount(ds: Dataset[Keyed],
      timeout: GroupStateTimeout = GroupStateTimeout.NoTimeout)
      : Dataset[FirstSeen] = {
    // the operator only arms processing-time timeouts; accepting
    // EventTimeTimeout would silently behave as NoTimeout (no timestamp
    // is ever set) and the state store would grow without bound
    require(timeout != GroupStateTimeout.EventTimeTimeout,
      "firstSeenWithDupCount supports NoTimeout or ProcessingTimeTimeout; " +
        "EventTimeTimeout would never be armed and state would be unbounded")
    import ds.sparkSession.implicits._
    ds.groupByKey(_.key)
      .flatMapGroupsWithState[Long, FirstSeen](
        OutputMode.Append(), timeout) {
        (key: Long, rows: Iterator[Keyed], state: GroupState[Long]) =>
          if (state.hasTimedOut) {
            // expiry callback: drop the ledger entry — the key becomes
            // "first seen" again after the horizon, by design
            state.remove()
            Iterator.empty
          } else {
            val batch = rows.toSeq
            val seenBefore = state.getOption.getOrElse(0L)
            val out =
              if (seenBefore == 0L && batch.nonEmpty)
                Iterator(FirstSeen(key, batch.head.payload,
                  (batch.size - 1).toLong))
              else Iterator.empty
            state.update(seenBefore + batch.size)
            if (timeout == GroupStateTimeout.ProcessingTimeTimeout)
              state.setTimeoutDuration("1 hour") // bounds the store
            out
          }
      }
  }

  case class KeyedValue(key: Long, value: Double)
  case class RunningTotal(key: Long, n_events: Long, total_value: Double)

  /** Per-key running totals via the Spark 4 `transformWithState`
    * arbitrary-state API (SPARK-46815) — the successor to
    * flatMapGroupsWithState: named state variables with independent
    * encoders and TTLs, timers decoupled from output mode, and
    * RocksDB-backed stores (required by the operator). The processor
    * keeps one (count, sum) pair per key and emits the refreshed totals
    * for every key touched by a micro-batch — the streaming ledger shape
    * (per-source token budgets, per-user spend) that a windowless
    * running aggregate needs.
    *
    * State is O(1) per key; the double sum accumulates in ARRIVAL order,
    * so streaming totals are reproducible for a fixed arrival sequence
    * (the batch/stream parity spec fixes arrival by replaying identical
    * micro-batches; cross-run bit-equality of a float stream total is
    * not a well-defined property under reordering — counts are, and are
    * asserted exactly). */
  class RunningTotalProcessor
      extends StatefulProcessor[Long, KeyedValue, RunningTotal] {
    @transient private var totals: ValueState[(Long, Double)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      totals = getHandle.getValueState[(Long, Double)](
        "totals", Encoders.product[(Long, Double)], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[KeyedValue],
        timerValues: TimerValues): Iterator[RunningTotal] = {
      var (n, v) = if (totals.exists()) totals.get() else (0L, 0.0)
      rows.foreach { r => n += 1; v += r.value }
      totals.update((n, v))
      Iterator.single(RunningTotal(key, n, v))
    }
  }

  /** The running-totals stream: requires the RocksDB state store
    * provider (transformWithState's backing store contract). */
  def runningTotals(ds: Dataset[KeyedValue]): Dataset[RunningTotal] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_.key)
      .transformWithState(new RunningTotalProcessor,
        TimeMode.None(), OutputMode.Update())
  }
}
