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
    e.injectOptimizerRule(_ => graft.plans.CompositeKeyJoinRule)
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
    def info(name: String) = new ExpressionInfo("graft", name)
    GraftExtensions.functions.foreach { case (name, builder) =>
      e.injectFunction((FunctionIdentifier(name), info(name), builder))
    }
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

  /** One literal numeric → double. Spark parses a bare `0.01` as
    * DECIMAL (and Decimal is NOT a java.lang.Number), so both families
    * must convert — otherwise the natural SQL spelling dies in a
    * ClassCastException instead of working. */
  private def toDouble(v: Any, ctx: String): Double = v match {
    case d: org.apache.spark.sql.types.Decimal => d.toDouble
    case n: Number => n.doubleValue()
    case other => throw new IllegalArgumentException(
      s"$ctx: expected a numeric literal, got $other")
  }

  /** Evaluate a foldable double argument (accuracies). */
  def doubleLit(e: org.apache.spark.sql.catalyst.expressions.Expression): Double = {
    require(e.foldable, s"argument must be a literal, got $e")
    toDouble(e.eval(), "doubleLit")
  }

  /** Evaluate a foldable array-of-numeric argument (probe points). */
  def doubleArrayLit(
      e: org.apache.spark.sql.catalyst.expressions.Expression): Seq[Double] = {
    require(e.foldable, s"argument must be a literal array, got $e")
    val et = e.dataType match {
      case org.apache.spark.sql.types.ArrayType(t, _) => t
      case other => throw new IllegalArgumentException(
        s"doubleArrayLit: expected an array literal, got ${other.sql}")
    }
    e.eval().asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      .toObjectArray(et).toSeq.map(toDouble(_, "doubleArrayLit"))
  }

  /** THE function list — single source of truth for BOTH registration
    * paths (extensions injection and imperative adoption). A function
    * added here is automatically available on GraftSession-built AND
    * adopted driver sessions; maintaining two hand-written lists let the
    * SQL surfaces silently diverge. */
  val functions: Seq[(String,
      Seq[org.apache.spark.sql.catalyst.expressions.Expression] =>
        org.apache.spark.sql.catalyst.expressions.Expression)] = Seq(
    "geodesic_km" -> { args =>
      arity("geodesic_km", 4, args); GeodesicKm(args(0), args(1), args(2), args(3)) },
    "cosine_sim" -> { args =>
      arity("cosine_sim", 2, args); CosineSim(args(0), args(1)) },
    "dot_product" -> { args =>
      arity("dot_product", 2, args); DotProduct(args(0), args(1)) },
    "l2_distance" -> { args =>
      arity("l2_distance", 2, args); L2Distance(args(0), args(1)) },
    "fingerprint64" -> { args =>
      Fingerprint64(arity("fingerprint64", 1, args).head) },
    "simhash64" -> { args =>
      SimHash64(arity("simhash64", 1, args).head) },
    "shingles" -> { args =>
      arity("shingles", 2, args); ShinglesExpr(args(0), intLit(args(1))) },
    "minhash" -> { args =>
      arity("minhash", 3, args)
      MinHashSig(args(0), intLit(args(1)), longLit(args(2))) },
    "lsh_bands" -> { args =>
      arity("lsh_bands", 2, args); LshBands(args(0), intLit(args(1))) },
    "text_stats" -> { args =>
      TextStats(arity("text_stats", 1, args).head) },
    "rp_sig" -> { args =>
      arity("rp_sig", 3, args)
      RandomProjectionSig(args(0), intLit(args(1)), longLit(args(2))) },
    "winnow_sketch" -> { args =>
      arity("winnow_sketch", 3, args)
      WinnowSketch(args(0), intLit(args(1)), intLit(args(2))) },
    "kmv_distinct" -> { args =>
      arity("kmv_distinct", 2, args)
      KmvAgg(args(0), intLit(args(1))).toAggregateExpression() },
    "hll_distinct" -> { args =>
      arity("hll_distinct", 2, args)
      HllAgg(args(0), intLit(args(1))).toAggregateExpression() },
    "hll_sketch" -> { args =>
      arity("hll_sketch", 2, args)
      HllSketchAgg(args(0), intLit(args(1))).toAggregateExpression() },
    "hll_merge" -> { args =>
      arity("hll_merge", 2, args)
      HllMergeAgg(args(0), intLit(args(1))).toAggregateExpression() },
    "hll_estimate" -> { args =>
      HllEstimate(arity("hll_estimate", 1, args).head) },
    "kmv_sketch" -> { args =>
      arity("kmv_sketch", 2, args)
      KmvSketchAgg(args(0), intLit(args(1))).toAggregateExpression() },
    "kmv_merge" -> { args =>
      arity("kmv_merge", 2, args)
      KmvMergeAgg(args(0), intLit(args(1))).toAggregateExpression() },
    "kmv_estimate" -> { args =>
      arity("kmv_estimate", 2, args)
      KmvEstimate(args(0), intLit(args(1))) },
    "kmv_union" -> { args =>
      arity("kmv_union", 3, args)
      KmvUnion(args(0), args(1), intLit(args(2))) },
    "kmv_jaccard" -> { args =>
      arity("kmv_jaccard", 3, args)
      KmvJaccard(args(0), args(1), intLit(args(2))) },
    "splitmix64" -> { args =>
      SplitMix64Expr(arity("splitmix64", 1, args).head) },
    "interleave16" -> { args =>
      arity("interleave16", 2, args); InterleaveBits16(args(0), args(1)) },
    "hilbert16" -> { args =>
      arity("hilbert16", 2, args); HilbertIndex16(args(0), args(1)) },
    "bloom_agg" -> { args =>
      arity("bloom_agg", 3, args)
      BloomAgg(args(0), longLit(args(1)), intLit(args(2))).toAggregateExpression() },
    "bloom_might_contain" -> { args =>
      arity("bloom_might_contain", 2, args); BloomMightContain(args(0), args(1)) },
    "argmax_agg" -> { args =>
      arity("argmax_agg", 2, args)
      ArgMaxAgg(args(0), args(1)).toAggregateExpression() },
    "topk_agg" -> { args =>
      arity("topk_agg", 3, args)
      TopKAgg(args(0), args(1), intLit(args(2))).toAggregateExpression() },
    "dd_quantile_agg" -> { args =>
      arity("dd_quantile_agg", 3, args)
      DdQuantileAgg(args(0), doubleLit(args(1)), doubleArrayLit(args(2)))
        .toAggregateExpression() },
    "dd_sketch" -> { args =>
      arity("dd_sketch", 2, args)
      DdSketchAgg(args(0), doubleLit(args(1))).toAggregateExpression() },
    "dd_merge" -> { args =>
      DdMergeAgg(arity("dd_merge", 1, args).head).toAggregateExpression() },
    "dd_quantiles" -> { args =>
      arity("dd_quantiles", 3, args)
      DdSketchQuantiles(args(0), doubleLit(args(1)),
        doubleArrayLit(args(2))) },
    "sample_sketch" -> { args =>
      arity("sample_sketch", 3, args)
      SampleSketchAgg(args(0), args(1), intLit(args(2))).toAggregateExpression() },
    "sample_merge" -> { args =>
      arity("sample_merge", 2, args)
      SampleMergeAgg(args(0), intLit(args(1))).toAggregateExpression() },
    "sample_quantiles_of" -> { args =>
      arity("sample_quantiles_of", 3, args)
      SampleSketchQuantiles(args(0), intLit(args(1)),
        doubleArrayLit(args(2))) })

  /** Imperative registration for an already-created session. Idempotent:
    * function registry replaces; the optimizer rule dedupes by identity. */
  def registerFunctions(spark: SparkSession): Unit = {
    if (!spark.experimental.extraOptimizations.contains(graft.plans.GeodesicRadiusRule))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ graft.plans.GeodesicRadiusRule
    if (!spark.experimental.extraOptimizations
        .contains(graft.plans.CompositeKeyJoinRule))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+
          graft.plans.CompositeKeyJoinRule
    val reg = spark.sessionState.functionRegistry
    functions.foreach { case (name, builder) =>
      reg.createOrReplaceTempFunction(name, builder, "built-in")
    }
  }
}
