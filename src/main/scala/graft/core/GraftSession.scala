package graft.core

import org.apache.spark.sql.SparkSession

/** SparkSession factory for the graft engine.
  *
  * Scale notes (100 TB design): every knob here is the local[32] analog of a
  * cluster setting — shuffle partitions sized to cores (not the 200 default),
  * AQE on so skewed shuffles re-plan at runtime, broadcast threshold left to
  * Spark but joins in the operator layer pass explicit `broadcast()` hints
  * for dimension tables.
  */
object GraftSession {

  /** Threads to use in local mode; the driver exports SPARK_GRAFT_CPUS. */
  def cpus: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")

  def builder(appName: String = "graft"): SparkSession.Builder =
    SparkSession
      .builder()
      .master(s"local[$cpus]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // testdata events.parquet carries TIMESTAMP(NANOS), which Spark
      // only admits as INT64 via this flag — session-construction scope,
      // so no loader mutates session state per call (Tables.eventsMicros)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)

  /** Get-or-create a session with graft defaults + SQL extensions. */
  def getOrCreate(appName: String = "graft"): SparkSession = {
    val spark = builder(appName).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // When an outer harness (Verify/Bench/driver) already created the
    // session, withExtensions/config are no-ops — adopt it instead
    adopt(spark)
    spark
  }

  /** Adopt an EXTERNALLY-built session: register graft's SQL functions
    * and set the runtime confs the engine requires (nanosAsLong for the
    * TIMESTAMP(NANOS) testdata). This is the session-adoption boundary —
    * called once where a foreign session enters the library (SparkEntry,
    * getOrCreate), so no loader or operator ever mutates session state
    * mid-pipeline. Idempotent. */
  def adopt(spark: SparkSession): Unit = {
    GraftExtensions.registerFunctions(spark)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // r16 OPTIMIZATION: let AQE re-plan (and in particular coalesce)
    // CACHED plans too. Off by default, a persisted DataFrame keeps
    // every exchange at the static spark.sql.shuffle.partitions width,
    // so each consumer of a small cached intermediate (the MV delta
    // fold, classifier feature cache, k-means corpus cache) pays a
    // cores-wide task launch per action — measured 36→93-task jobs over
    // 5 rows of MV state at sf0.1. Coalesced hash partitioning still
    // satisfies ClusteredDistribution (SPARK-32056), so keyed caches
    // (QualityClassifier's id-partitioned features) keep their
    // zero-exchange iteration loops; partition counts stay byte-sized
    // via AQE's advisory target, i.e. scale-adaptive, not tuned to
    // local core count.
    spark.conf.set(
      "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
    // r16 OPTIMIZATION note: coalescePartitions.parallelismFirst stays
    // at its default (true). The byte-target alternative (false) was
    // measured in this round and REGRESSED the CPU-dense kernels whose
    // post-shuffle reduce work is compute-bound over byte-small input
    // (minhash banding +2.3 s, edit-distance verify +3.3 s, cluster
    // contraction +3.0 s at sf0.1): coalescing their reduce stages to
    // the 64 MB advisory width serialized the CPU, the exact failure
    // mode the r13 repartition-by-work-count fixes exist to avoid. The
    // metadata-scale shuffles it would have helped are already served
    // by the cached-plan AQE flag above.
  }
}
