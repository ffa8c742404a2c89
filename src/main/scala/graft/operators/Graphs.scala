package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed graph analytics over edge DataFrames — the family the
  * near-dup machinery already dips into (connected components in
  * [[Dedup.duplicateClusters]]), completed here with exact triangle
  * counting (Suri & Vassilvitskii, "Counting triangles and the curse of
  * the last reducer", WWW 2011).
  *
  * Why degree-ordered orientation is the whole story at scale: the naive
  * wedge join groups every edge pair around its center vertex, so one
  * celebrity hub with degree d contributes d² wedges — the "last
  * reducer" that runs for hours while the cluster idles. Orienting every
  * edge from its lower-(degree, id) endpoint to the higher one bounds
  * every out-neighborhood by O(√m), so wedge fanout is Σ outdeg² ≤
  * O(m^1.5) TOTAL with no hot key — the standard MapReduce fix,
  * expressed relationally (two self-joins on 8-byte ids; the tie-break
  * on id makes the orientation a total order, so the count is exact,
  * not probabilistic).
  *
  * The triangle SET is orientation-invariant, which is how the DuckDB
  * oracle checks this with the simple id-canonical 3-way join instead.
  */
object Graphs {

  /** Rows per shuffle partition inside the iterative loops — ~4M 24-byte
    * edge/rank rows ≈ the guide's 100 MB-order reduce partitions. The
    * loop width is derived from the MEASURED edge count (never from the
    * core count), so a model-scale graph iterates at width 1-2 while a
    * 10^10-edge graph keeps full parallelism. */
  private val LoopRowsPerPartition = 4000000L

  /** Run `body` with spark.sql.shuffle.partitions scoped to `n` — the
    * [[graft.StreamingQueries]] withStatePartitions discipline, applied
    * to iterative graph loops (r16 optimization round): every iteration
    * pays per-partition fixed cost (task launch, AQE stage bookkeeping)
    * × exchanges × rounds, and the static core-sized width was pure
    * overhead at model scale — 87 jobs × 32-wide exchanges over
    * kilobyte frames for 10 pagerank iterations at sf0.1. */
  /** Row cap under which the rank/frontier side of an iteration join is
    * BROADCAST (guide §3.1 — pick the strategy deliberately): node-state
    * frames are 16-byte rows, so the default 2M rows ≈ 64 MB built
    * relation, well under the 8 GB/512M-row broadcast cap. Gated on the
    * MEASURED node/frontier count, never an estimate — checkpointed
    * frames carry no size statistics, so the planner would otherwise
    * sort-merge every iteration, re-sorting the (big) edge relation per
    * round for a join whose other side is model-scale. Overridable via
    * -Dgraft.graph.broadcastRows for clusters with tight driver memory. */
  private def broadcastRows: Long =
    sys.props.get("graft.graph.broadcastRows").map(_.toLong)
      .getOrElse(2000000L)

  private def withLoopShufflePartitions[T](
      spark: org.apache.spark.sql.SparkSession, rows: Long)(body: => T): T = {
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    val n = math.max(1L,
      math.min(before.toLong, rows / LoopRowsPerPartition + 1)).toString
    spark.conf.set("spark.sql.shuffle.partitions", n)
    try body
    finally spark.conf.set("spark.sql.shuffle.partitions", before)
  }

  /** Canonical undirected edge set: (u < v), self-loops dropped,
    * duplicates collapsed. */
  private def canonical(edges: DataFrame, src: Column, dst: Column): DataFrame =
    edges.select(least(src, dst).as("u"), greatest(src, dst).as("v"))
      .filter(col("u") =!= col("v") && col("u").isNotNull && col("v").isNotNull)
      .distinct()

  /** Degree-ordered orientation of a canonical edge set: s → t iff
    * (deg, id) of s < of t — the Suri–Vassilvitskii trick that bounds
    * every out-neighborhood by O(√m). */
  private def orient(e: DataFrame): DataFrame = {
    val deg = e.select(col("u").as("n")).union(e.select(col("v").as("n")))
      .groupBy("n").agg(count(lit(1)).as("d"))
    e.join(deg.select(col("n").as("u"), col("d").as("du")), "u")
      .join(deg.select(col("n").as("v"), col("d").as("dv")), "v")
      .select(
        when(col("du") < col("dv") ||
          (col("du") === col("dv") && col("u") < col("v")),
          struct(col("u").as("s"), col("v").as("t")))
          .otherwise(struct(col("v").as("s"), col("u").as("t"))).as("e"))
      .select(col("e.s").as("s"), col("e.t").as("t"))
  }

  /** Structural diagnostic for the scale dry run: (m, wedges) where m =
    * canonical edge count and wedges = Σ C(outdeg, 2) over the
    * degree-ordered orientation — the EXACT row count of the wedge join
    * inside [[triangles]]. The Suri–Vassilvitskii guarantee is wedges =
    * O(m^1.5) with no hot key; checking the measured wedge count against
    * that bound at growing scale is how superlinear fanout would be
    * caught before wall-clock ever shows it. Two scalars (one aggregate
    * job) — a model-scale probe, not a data-path collect. */
  def orientedWedgeStats(edges: DataFrame, srcCol: String,
      dstCol: String): (Long, Long) = {
    val e = canonical(edges, col(srcCol), col(dstCol))
    val row = orient(e).groupBy("s").agg(count(lit(1)).as("od"))
      .agg(sum(lit(1)).as("srcs"),
        // integral arithmetic end-to-end: od*(od-1) is even, so integer
        // `div` is exact — `/` (Divide) would promote to double and
        // silently lose exactness past 2^53, precisely the regime this
        // probe polices
        sum(expr("(od * (od - 1)) div 2")).cast("long").as("wedges"),
        sum("od").cast("long").as("m"))
      .head()
    (row.getAs[Long]("m"), row.getAs[Long]("wedges"))
  }

  /** All triangles (a, b, c) of the undirected graph, each exactly once.
    * Input edges may be directed/duplicated/self-looped — canonicalized
    * first. */
  def triangles(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val e = canonical(edges, col(srcCol), col(dstCol))
    val oriented = orient(e)
    // wedges around each (bounded-outdegree) source, closed against the
    // canonical edge set
    val wedges = oriented.as("e1")
      .join(oriented.as("e2"),
        col("e1.s") === col("e2.s") && col("e1.t") < col("e2.t"))
      .select(col("e1.s").as("w"), col("e1.t").as("x"), col("e2.t").as("y"))
    wedges
      .join(e, col("u") === least(col("x"), col("y")) &&
        col("v") === greatest(col("x"), col("y")), "left_semi")
      .select(least(col("w"), col("x"), col("y")).as("a"),
        array_sort(array(col("w"), col("x"), col("y"))).getItem(1).as("b"),
        greatest(col("w"), col("x"), col("y")).as("c"))
  }

  /** Per-node triangle participation: (node, n_triangles) for every node
    * in at least one triangle. */
  def trianglesPerNode(edges: DataFrame, srcCol: String,
      dstCol: String): DataFrame =
    triangles(edges, srcCol, dstCol)
      .select(explode(array(col("a"), col("b"), col("c"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("n_triangles"))

  /** PageRank (Brin & Page 1998) over a directed edge frame — in an LLM
    * data pipeline this is graph-based QUALITY WEIGHTING: rank pages of
    * a crawl by link structure and weight/filter training documents by
    * it (the curation signal behind "high-PageRank subset" corpora).
    *
    * Fixed `iters` power iterations; dangling mass (nodes with no
    * out-edges) is redistributed uniformly, so each iteration's ranks
    * sum to 1 and the result is the standard damped PageRank.
    *
    * Determinism (the engine-wide float policy): per-iteration
    * contribution sums accumulate in DECIMAL(28,12) — double addition is
    * partition-order-sensitive, decimal addition is exact/associative —
    * so ranks are bit-identical across partitionings, retries, and
    * engines (the DuckDB oracle re-runs the identical iteration
    * arithmetic; 1e-12 quantization per hop is identical on both sides,
    * orders below any ranking use). The per-iteration dangling mass is
    * folded IN-PLAN: a 1-row decimal aggregate cross-joined (broadcast)
    * into the rank update — the engine's scalar-broadcast idiom (the
    * total-distance count scalar uses the same shape) — so an iteration
    * is a single Spark job with no blocking driver round-trip.
    *
    * Scale: per iteration — one join keyed on src (contributions), one
    * grouped sum keyed on dst, one broadcast scalar. Rank state is one
    * double per node; lineage is cut each iteration (localCheckpoint /
    * checkpoint via `reliableCheckpoint`, like the other iterative
    * operators).
    */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int, damping: Double = 0.85,
      reliableCheckpoint: Boolean = false): DataFrame = {
    require(iters >= 1, s"pageRank: iters must be >= 1, got $iters")
    def persist(df: DataFrame) =
      if (reliableCheckpoint) df.checkpoint() else df.localCheckpoint()
    val e0 = edges
      .select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull)
      .distinct()
    // fold the (iteration-invariant) out-degree into the edge frame ONCE:
    // each iteration then joins pr against a single pre-enriched relation
    // instead of paying the e⋈outdeg shuffle every round
    val e = persist(e0.join(
      e0.groupBy("src").agg(count(lit(1)).as("od")), "src"))
    val nodes = persist(
      e.select(col("src").as("node")).union(e.select(col("dst").as("node")))
        .distinct())
    val n = nodes.count()
    // the dangling node SET is iteration-invariant (only its rank mass
    // moves): derive it once, and skip the dangling term entirely on
    // graphs without dangling nodes
    val danglingNodes = persist(nodes
      .join(e.select(col("src").as("node")), Seq("node"), "left_anti"))
    val hasDangling = danglingNodes.limit(1).count() > 0
    var pr = nodes.withColumn("pr", lit(1.0 / n))
    var iter = 0
    // node-state frames (pr / contrib / dangling) broadcast below the
    // row cap: the edge relation then never re-shuffles or re-sorts
    // inside the loop, and each iteration is map-side join + one
    // grouped-sum exchange. Decimal accumulation keeps ranks
    // bit-identical under either strategy.
    val small = n <= broadcastRows
    def maybeB(df: DataFrame): DataFrame = if (small) broadcast(df) else df
    // loop shuffle width from the measured edge count (e is already
    // checkpointed, so the count reads materialized partitions);
    // decimal accumulation keeps ranks bit-identical at ANY width
    withLoopShufflePartitions(edges.sparkSession, e.count()) {
    while (iter < iters) {
      val contrib = e.join(maybeB(pr), col("src") === col("node"))
        .select(col("dst").as("node"),
          (col("pr") / col("od").cast("double")).cast("decimal(28,12)").as("q"))
        .groupBy("node").agg(sum("q").cast("double").as("s"))
      val base = nodes.join(maybeB(contrib), Seq("node"), "left")
      val next =
        if (!hasDangling)
          base.select(col("node"),
            (lit((1.0 - damping) / n) +
              lit(damping) * coalesce(col("s"), lit(0.0))).as("pr"))
        else {
          // dangling mass as a broadcast 1-row aggregate: stays in the
          // iteration's single job instead of a blocking .head() probe.
          // `dm / n` is the same double division the driver-side scalar
          // performed, so ranks stay bit-identical.
          val dm = pr.join(maybeB(danglingNodes), "node")
            .agg(coalesce(sum(col("pr").cast("decimal(28,12)")).cast("double"),
              lit(0.0)).as("dm"))
          base.crossJoin(broadcast(dm))
            .select(col("node"),
              (lit((1.0 - damping) / n) +
                lit(damping) * (coalesce(col("s"), lit(0.0)) +
                  col("dm") / lit(n.toDouble))).as("pr"))
        }
      pr = persist(next)
      iter += 1
    }
    } // withLoopShufflePartitions
    pr
  }

  /** Single-source BFS hop distances over the UNDIRECTED graph —
    * frontier expansion, the loop every distributed SSSP builds on
    * (Pregel's canonical example). Returns (node, dist) for every node
    * within `maxHops` of `source` (the source itself at 0); nodes
    * farther away are absent.
    *
    * Scale shape: the adjacency list is derived and persisted ONCE
    * (both directions of the canonical edge set); each hop is one
    * equi-join of the CURRENT FRONTIER against it plus an anti-join
    * against the settled set — everything crossing a shuffle is 8-byte
    * node ids, per-hop work is frontier-degree-sum, and the loop
    * materializes once per round (the engine's iterative-loop
    * discipline, same as [[pageRank]]). The frontier-emptiness probe is
    * a limit(1) count on a persisted frame — model-scale. Hop distances
    * are unique, so the result is deterministic with no tie rules.
    *
    * No counterpart in the reference (its graph surface is zero);
    * the oracle re-derives distances with a recursive CTE. */
  def bfsDistances(edges: DataFrame, srcCol: String, dstCol: String,
      source: Long, maxHops: Int,
      reliableCheckpoint: Boolean = false): DataFrame = {
    require(maxHops >= 0, s"bfsDistances: maxHops must be >= 0, got $maxHops")
    def persist(df: DataFrame) =
      if (reliableCheckpoint) df.checkpoint() else df.localCheckpoint()
    val canon = canonical(edges,
      col(srcCol).cast("long"), col(dstCol).cast("long"))
    val adj = persist(canon.select(col("u").as("a"), col("v").as("b"))
      .union(canon.select(col("v").as("a"), col("u").as("b"))))
    val spark = edges.sparkSession
    import spark.implicits._
    // `dist` stays a PLAIN union of the per-hop checkpointed frames:
    // each round materializes only the new frontier — re-checkpointing
    // the whole settled set every hop would copy O(hops × settled) rows
    val hops = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    var dist = persist(Seq((source, 0)).toDF("node", "dist"))
    hops += dist
    var frontier = dist
    var hop = 0
    // the emptiness probe reads the persisted frontier either way, so a
    // full count() costs the same job as limit(1) — and the exact size
    // gates the broadcast decision below (guide §3.1): a sub-cap
    // frontier broadcasts into the expansion join, so the adjacency
    // (the big side at scale) is never shuffled or sorted per hop
    var frontierRows = 1L
    // loop shuffle width from the measured (checkpointed) adjacency size
    val out = withLoopShufflePartitions(spark, adj.count()) {
    while (hop < maxHops && frontierRows > 0) {
      hop += 1
      val f = if (frontierRows <= broadcastRows) broadcast(frontier)
        else frontier
      val next = persist(f
        .join(adj, col("node") === col("a"))
        .select(col("b").as("node")).distinct()
        .join(dist.select("node"), Seq("node"), "left_anti")
        .withColumn("dist", lit(hop)))
      hops += next
      frontierRows = next.count()
      dist = dist.unionByName(next)
      frontier = next
    }
    // Consolidate the settled set into ONE checkpointed frame (a single
    // O(nodes) 12-byte-row copy), then release the adjacency and every
    // per-hop block — without this, repeated calls in a long session
    // accumulate block-manager storage for the whole loop history.
    persist(dist)
    }
    (adj +: hops).foreach(_.unpersist(blocking = false))
    out
  }

  /** Weighted single-source shortest paths over the UNDIRECTED graph
    * with NON-NEGATIVE integer weights — the Dijkstra generalization of
    * [[bfsDistances]], realized as frontier label correction
    * (distributed Bellman-Ford): each round relaxes every edge leaving
    * the CURRENT FRONTIER (`min` over candidate distances — an exact
    * integer aggregate, no tie rules needed), keeps the nodes whose
    * tentative distance improved, and terminates when a round improves
    * nothing. Priority-queue Dijkstra is inherently sequential; at
    * cluster scale the round-based relaxation IS the standard shape
    * (Pregel SSSP), and with non-negative weights it converges to the
    * identical fixed point in at most |V|−1 rounds — in practice the
    * weighted diameter in rounds. `maxRounds` is the loud guard:
    * non-convergence throws, never returns a half-relaxed answer.
    *
    * Cost shape vs BFS: every round still shuffles only (node, dist)
    * pairs and joins the frontier against the once-persisted adjacency;
    * unlike BFS the settled set must be RE-MERGED each round (a settled
    * node can improve later via a cheaper path), so each round pays one
    * O(settled) min-merge — the honest extra cost of weighted paths,
    * linear per round, checkpointed to keep lineage flat. Negative
    * weights are refused up front (label correction would diverge).
    *
    * Returns (node, dist) for every node reachable from `source`
    * (source at 0); unreachable nodes are absent. No counterpart in the
    * reference (its graph surface is zero); the oracle re-derives
    * distances with a bounded-(node, d) recursive closure + min. */
  def ssspDistances(edges: DataFrame, srcCol: String, dstCol: String,
      weightCol: String, source: Long, maxRounds: Int = 64,
      reliableCheckpoint: Boolean = false): DataFrame =
    ssspDistancesDetail(edges, srcCol, dstCol, weightCol, source, maxRounds,
      reliableCheckpoint)._1

  /** [[ssspDistances]] plus the relaxation-round count — the scale
    * instrumentation face (rounds are the superlinear risk for
    * iterative graph loops, invisible to single-scale timing). */
  def ssspDistancesDetail(edges: DataFrame, srcCol: String, dstCol: String,
      weightCol: String, source: Long, maxRounds: Int = 64,
      reliableCheckpoint: Boolean = false): (DataFrame, Int) = {
    require(maxRounds >= 1, s"ssspDistances: maxRounds must be >= 1, got $maxRounds")
    def persist(df: DataFrame) =
      if (reliableCheckpoint) df.checkpoint() else df.localCheckpoint()
    val spark = edges.sparkSession
    import spark.implicits._
    val canon = edges.select(col(srcCol).cast("long").as("u"),
      col(dstCol).cast("long").as("v"), col(weightCol).cast("long").as("w"))
    val adj = persist(
      canon.select(col("u").as("a"), col("v").as("b"), col("w"))
        .union(canon.select(col("v").as("a"), col("u").as("b"), col("w"))))
    require(adj.filter(col("w") < 0L).limit(1).count() == 0L,
      "ssspDistances: negative weights — label correction would diverge; " +
        "shift weights or use a different algorithm")
    val scratch = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    var dist = persist(Seq((source, 0L)).toDF("node", "dist"))
    scratch += dist
    var frontier = dist
    var round = 0
    var converged = false
    // exact frontier size per round: same job as the old limit(1)
    // emptiness probe, and it gates the broadcast decision (see
    // bfsDistances)
    var frontierRows = 1L
    // loop shuffle width from the measured (checkpointed) adjacency size
    withLoopShufflePartitions(spark, adj.count()) {
    while (!converged && round < maxRounds) {
      round += 1
      val f = if (frontierRows <= broadcastRows) broadcast(frontier)
        else frontier
      val cand = f.join(adj, col("node") === col("a"))
        .select(col("b").as("node"), (col("dist") + col("w")).as("nd"))
        .groupBy("node").agg(min("nd").as("nd"))
      val improved = persist(cand.join(dist, Seq("node"), "left")
        .filter(col("dist").isNull || col("nd") < col("dist"))
        .select(col("node"), col("nd").as("dist")))
      scratch += improved
      frontierRows = improved.count()
      if (frontierRows == 0L) converged = true
      else {
        // min-merge: a node can appear in both (improved wins by min) —
        // the per-round O(settled) copy weighted paths inherently pay
        val next = persist(dist.unionByName(improved)
          .groupBy("node").agg(min("dist").as("dist")))
        scratch += next
        dist = next
        frontier = improved
      }
    }
    } // withLoopShufflePartitions
    require(converged,
      s"ssspDistances: not converged after $maxRounds rounds — raise " +
        "maxRounds (weighted diameter exceeds the budget) or check the graph")
    val out = persist(dist)
    (adj +: scratch).foreach(_.unpersist(blocking = false))
    (out, round)
  }
}
