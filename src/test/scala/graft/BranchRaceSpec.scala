package graft

/** CROSS-JVM branch-head linearization (round 15): two SEPARATE
  * processes append concurrently to ONE branch while this JVM appends
  * to main of the same table. The branch ref's sequenced CAS
  * ([[graft.sources.GraftTableLog.casBranchHead]]) must ensure no
  * branch commit is lost — the loser rebuilds on the moved head — and
  * branch/main lineages never leak into each other.
  * [[BranchRaceDryRun.race]] validates; this is CommitRaceSpec's shape
  * applied to the ref the round-14 verdict flagged as
  * last-writer-wins. */
class BranchRaceSpec extends SparkSpec {

  test("two JVMs racing one branch + a main writer linearize cleanly") {
    val line = BranchRaceDryRun.race(spark, 2)
    assert(line.startsWith("BRANCHRACE ok=true"), line)
  }
}
