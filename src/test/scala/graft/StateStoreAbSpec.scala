package graft

/** RocksDB state store parity, as a per-round spec: the state-heavy
  * streaming entries must produce IDENTICAL results under
  * `RocksDBStateStoreProvider` and the default HDFS-backed store — the
  * provider a 100 TB deployment actually runs must be invisible in
  * results ([[StateStoreAbDryRun.ab]] asserts the canonicalized row
  * sets match and records the A/B walls; the full four-entry matrix +
  * the state-partition lever live in the dry-run's SCALE.md lines). */
class StateStoreAbSpec extends SparkSpec {

  test("exact-dedup drain is provider-invariant (hdfs vs rocksdb)") {
    val line = StateStoreAbDryRun.ab(spark, sfDir, "q_stream_exact_dedup")
    assert(line.contains("parity=ok"), line)
  }

  test("stream-stream join drain is provider-invariant") {
    val line = StateStoreAbDryRun.ab(spark, sfDir,
      "q_stream_join_error_purchase")
    assert(line.contains("parity=ok"), line)
  }
}
