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
    import org.apache.spark.sql.catalyst.expressions.Expression
    import org.apache.spark.sql.catalyst.FunctionIdentifier
    import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
    def info(name: String) = new ExpressionInfo("graft", name)
    e.injectFunction((FunctionIdentifier("geodesic_km"), info("geodesic_km"),
      (args: Seq[Expression]) => GeodesicKm(args(0), args(1), args(2), args(3))))
    e.injectFunction((FunctionIdentifier("cosine_sim"), info("cosine_sim"),
      (args: Seq[Expression]) => CosineSim(args(0), args(1))))
    e.injectFunction((FunctionIdentifier("dot_product"), info("dot_product"),
      (args: Seq[Expression]) => DotProduct(args(0), args(1))))
    e.injectFunction((FunctionIdentifier("l2_distance"), info("l2_distance"),
      (args: Seq[Expression]) => L2Distance(args(0), args(1))))
  }
}

object GraftExtensions {
  /** Imperative registration for an already-created session. Idempotent. */
  def registerFunctions(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("geodesic_km",
      args => GeodesicKm(args(0), args(1), args(2), args(3)), "built-in")
    reg.createOrReplaceTempFunction("cosine_sim",
      args => CosineSim(args(0), args(1)), "built-in")
    reg.createOrReplaceTempFunction("dot_product",
      args => DotProduct(args(0), args(1)), "built-in")
    reg.createOrReplaceTempFunction("l2_distance",
      args => L2Distance(args(0), args(1)), "built-in")
  }
}
