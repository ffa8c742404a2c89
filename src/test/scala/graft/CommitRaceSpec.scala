package graft

/** CROSS-JVM commit linearization, as a per-round spec: two SEPARATE
  * processes (real JVMs — `Test / fork` supplies the classpath) append
  * concurrently to one graft table. The in-JVM per-table lock cannot
  * serialize them; the only protection is the optimistic claim
  * (exclusive snapshot create + re-list-and-retry,
  * [[graft.sources.GraftTableLog.writeSnapshot]]). [[CommitRaceDryRun.race]]
  * validates: dense version numbers (no skip, no torn snapshot), every
  * (writer, seq) batch exactly once, every snapshot readable, history
  * monotone. GraftTableLogSpec's 4-thread test covers the in-JVM half;
  * this is the half a multi-writer 100 TB deployment actually runs. */
class CommitRaceSpec extends SparkSpec {

  test("two separate JVMs appending concurrently linearize cleanly") {
    val line = CommitRaceDryRun.race(spark, 3)
    assert(line.startsWith("RACE ok=true"), line)
    assert(line.contains("versions=6"), line)
  }
}
