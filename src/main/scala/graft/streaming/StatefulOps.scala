package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

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
}
