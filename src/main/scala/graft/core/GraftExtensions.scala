package graft.core

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import graft.expr._

/** Registers graft's native Catalyst expressions as SQL functions, both via
  * `SparkSessionExtensions` (for sessions built through [[GraftSession]])
  * and imperatively (for externally-created sessions, e.g. the driver's
  * Verify/Bench harness).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => graft.plans.GeodesicRadiusRule)
    import org.apache.spark.sql.catalyst.expressions.Expression
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
    def info(name: String) = new ExpressionInfo("graft", name)
    e.injectFunction((FunctionIdentifier("geodesic_km"), info("geodesic_km"),
      (args: Seq[Expression]) => { GraftExtensions.arity("geodesic_km", 4, args); GeodesicKm(args(0), args(1), args(2), args(3)) }))
    e.injectFunction((FunctionIdentifier("cosine_sim"), info("cosine_sim"),
      (args: Seq[Expression]) => { GraftExtensions.arity("cosine_sim", 2, args); CosineSim(args(0), args(1)) }))
    e.injectFunction((FunctionIdentifier("dot_product"), info("dot_product"),
      (args: Seq[Expression]) => { GraftExtensions.arity("dot_product", 2, args); DotProduct(args(0), args(1)) }))
    e.injectFunction((FunctionIdentifier("l2_distance"), info("l2_distance"),
      (args: Seq[Expression]) => { GraftExtensions.arity("l2_distance", 2, args); L2Distance(args(0), args(1)) }))
    e.injectFunction((FunctionIdentifier("fingerprint64"), info("fingerprint64"),
      (args: Seq[Expression]) => Fingerprint64(GraftExtensions.arity("fingerprint64", 1, args).head)))
    e.injectFunction((FunctionIdentifier("simhash64"), info("simhash64"),
      (args: Seq[Expression]) => SimHash64(GraftExtensions.arity("simhash64", 1, args).head)))
    e.injectFunction((FunctionIdentifier("shingles"), info("shingles"),
      (args: Seq[Expression]) => { GraftExtensions.arity("shingles", 2, args); ShinglesExpr(args(0), GraftExtensions.intLit(args(1))) }))
    e.injectFunction((FunctionIdentifier("minhash"), info("minhash"),
      (args: Seq[Expression]) => { GraftExtensions.arity("minhash", 3, args); MinHashSig(args(0),
        GraftExtensions.intLit(args(1)), GraftExtensions.longLit(args(2))) }))
    e.injectFunction((FunctionIdentifier("lsh_bands"), info("lsh_bands"),
      (args: Seq[Expression]) => { GraftExtensions.arity("lsh_bands", 2, args); LshBands(args(0), GraftExtensions.intLit(args(1))) }))
    e.injectFunction((FunctionIdentifier("text_stats"), info("text_stats"),
      (args: Seq[Expression]) => TextStats(GraftExtensions.arity("text_stats", 1, args).head)))
    e.injectFunction((FunctionIdentifier("rp_sig"), info("rp_sig"),
      (args: Seq[Expression]) => { GraftExtensions.arity("rp_sig", 3, args); RandomProjectionSig(args(0),
        GraftExtensions.intLit(args(1)), GraftExtensions.longLit(args(2))) }))
    e.injectFunction((FunctionIdentifier("winnow_sketch"), info("winnow_sketch"),
      (args: Seq[Expression]) => { GraftExtensions.arity("winnow_sketch", 3, args); WinnowSketch(args(0),
        GraftExtensions.intLit(args(1)), GraftExtensions.intLit(args(2))) }))
  }
}

object GraftExtensions {
  /** Arity guard: a clear analysis-time error instead of an
    * IndexOutOfBoundsException from args(n). */
  def arity(name: String, n: Int,
      args: Seq[org.apache.spark.sql.catalyst.expressions.Expression])
      : Seq[org.apache.spark.sql.catalyst.expressions.Expression] = {
    require(args.length == n,
      s"$name expects $n arguments, got ${args.length}")
    args
  }

  /** Evaluate a foldable int argument (e.g. `shingles(text, 3)`). */
  def intLit(e: org.apache.spark.sql.catalyst.expressions.Expression): Int = {
    require(e.foldable, s"argument must be a literal, got $e")
    e.eval().asInstanceOf[Number].intValue()
  }

  /** Evaluate a foldable long argument (seeds). */
  def longLit(e: org.apache.spark.sql.catalyst.expressions.Expression): Long = {
    require(e.foldable, s"argument must be a literal, got $e")
    e.eval().asInstanceOf[Number].longValue()
  }

  /** Imperative registration for an already-created session. Idempotent:
    * function registry replaces; the optimizer rule dedupes by identity. */
  def registerFunctions(spark: SparkSession): Unit = {
    if (!spark.experimental.extraOptimizations.contains(graft.plans.GeodesicRadiusRule))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ graft.plans.GeodesicRadiusRule
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("geodesic_km",
      args => { arity("geodesic_km", 4, args); GeodesicKm(args(0), args(1), args(2), args(3)) }, "built-in")
    reg.createOrReplaceTempFunction("cosine_sim",
      args => { arity("cosine_sim", 2, args); CosineSim(args(0), args(1)) }, "built-in")
    reg.createOrReplaceTempFunction("dot_product",
      args => { arity("dot_product", 2, args); DotProduct(args(0), args(1)) }, "built-in")
    reg.createOrReplaceTempFunction("l2_distance",
      args => { arity("l2_distance", 2, args); L2Distance(args(0), args(1)) }, "built-in")
    reg.createOrReplaceTempFunction("fingerprint64",
      args => Fingerprint64(arity("fingerprint64", 1, args).head), "built-in")
    reg.createOrReplaceTempFunction("simhash64",
      args => SimHash64(arity("simhash64", 1, args).head), "built-in")
    reg.createOrReplaceTempFunction("shingles",
      args => { arity("shingles", 2, args); ShinglesExpr(args(0), intLit(args(1))) }, "built-in")
    reg.createOrReplaceTempFunction("minhash",
      args => { arity("minhash", 3, args); MinHashSig(args(0), intLit(args(1)), longLit(args(2))) }, "built-in")
    reg.createOrReplaceTempFunction("lsh_bands",
      args => { arity("lsh_bands", 2, args); LshBands(args(0), intLit(args(1))) }, "built-in")
    reg.createOrReplaceTempFunction("text_stats",
      args => TextStats(arity("text_stats", 1, args).head), "built-in")
    reg.createOrReplaceTempFunction("rp_sig",
      args => { arity("rp_sig", 3, args); RandomProjectionSig(args(0), intLit(args(1)), longLit(args(2))) }, "built-in")
    reg.createOrReplaceTempFunction("winnow_sketch",
      args => { arity("winnow_sketch", 3, args); WinnowSketch(args(0), intLit(args(1)), intLit(args(2))) }, "built-in")
  }
}
