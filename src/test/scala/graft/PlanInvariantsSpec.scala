package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.joins.CartesianProductExec
import org.apache.spark.sql.execution.window.WindowExec

/** Engine-wide physical-plan hygiene, enforced for EVERY catalog query:
  * the two plan defects that silently kill a 100 TB run — an unbroadcast
  * cartesian product, and a window over an EMPTY partition spec (all
  * rows through one task) — are banned outright, with a per-query
  * whitelist for the documented bounded-input exceptions. A new catalog
  * entry that reintroduces either fails here immediately, not in next
  * round's plan audit.
  *
  * (Scalar aggregates' one-row `Exchange SinglePartition` final step is
  * fine and common — the invariant targets the specific operators whose
  * single-partition form is corpus-sized, not the exchange shape
  * itself.) */
class PlanInvariantsSpec extends SparkSpec {

  /** Queries allowed an unpartitioned window, each because the window
    * input is BOUNDED by construction (documented at the query):
    * q_token_ids ranks the aggregated distinct-token vocabulary. */
  private val unpartitionedWindowWhitelist = Set("q_token_ids")

  test("no catalog query plans a cartesian product or an unlisted unpartitioned window") {
    // AQE's wrapper hides the physical tree from collect(); plan without
    // it so the real operators are walkable (the check is structural —
    // AQE never INTRODUCES a cartesian or a window)
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val offenders = Catalog.all.flatMap { q =>
        val plan: SparkPlan =
          try q.run(spark, sfDir).queryExecution.executedPlan
          catch { case e: Throwable => fail(s"${q.name} failed to plan: $e") }
        val cartesian = plan.collect { case c: CartesianProductExec => c }
          .map(_ => s"${q.name}: CartesianProduct")
        val unpartWindow = plan.collect {
          case w: WindowExec if w.partitionSpec.isEmpty => w
        }.map(_ => s"${q.name}: unpartitioned Window")
          .filterNot(_ => unpartitionedWindowWhitelist.contains(q.name))
        cartesian ++ unpartWindow
      }
      assert(offenders.isEmpty,
        s"plan hygiene violations:\n${offenders.distinct.mkString("\n")}")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("oracle-twin ledger: every twin's scale paths are themselves " +
    "green catalog entries, and the twin set is exactly the guarded quadratics") {
    val names = Catalog.all.map(_.name).toSet
    val twins = Catalog.oracleTwins
    twins.foreach { case (twin, paths) =>
      assert(names.contains(twin))
      assert(paths.nonEmpty, s"$twin claims no scale path")
      paths.foreach(p => assert(names.contains(p),
        s"$twin's claimed scale path $p is not a catalog entry"))
      assert(!paths.contains(twin), s"$twin lists itself as its scale path")
    }
    // the ledger is closed: exactly the known guarded-quadratic /
    // exhaustive-baseline entries (q_ann_topk_bruteforce joined when the
    // PQ and IVF-PQ scale paths made exhaustive scoring a twin role)
    assert(twins.keySet == Set(
      "q_dedup_embedding", "q_dedup_embedding_keep", "q_embed_top_pairs",
      "q_ann_topk_bruteforce"),
      s"unexpected oracle-twin set: ${twins.keySet}")
  }

  test("dd rollup: the ALL level reuses the per-status sketch stage at " +
    "runtime (the corpus is scanned once for both levels)") {
    val df = Catalog.all.find(_.name == "q_dd_quantiles_rollup").get
      .run(spark, sfDir)
    df.collect()
    val executed = df.queryExecution.executedPlan.toString
    assert(executed.contains("ReusedQueryStage") ||
      executed.contains("ReusedExchange"),
      "the ALL branch must consume the per-status exchange via reuse, " +
        s"not a second corpus scan:\n$executed")
  }

  test("moment rollup: the ALL level reuses the per-flag sum stage at " +
    "runtime (the corpus is scanned once for both levels)") {
    val df = Catalog.all.find(_.name == "q_moment_rollup").get
      .run(spark, sfDir)
    df.collect()
    val executed = df.queryExecution.executedPlan.toString
    assert(executed.contains("ReusedQueryStage") ||
      executed.contains("ReusedExchange"),
      "the ALL branch must consume the per-flag exchange via reuse, " +
        s"not a second corpus scan:\n$executed")
  }
}
