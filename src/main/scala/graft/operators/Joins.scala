package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Join utilities for the two big-data failure modes Spark doesn't fully
  * solve by itself: key skew beyond what AQE's skew-join splitting
  * handles, and repeated big-big joins that should be co-partitioned on
  * disk (bucketing — see [[graft.sources.Sinks.parquetBucketed]]).
  */
object Joins {

  /** Salted equi-join for skewed keys: the skewed (large) side gets a
    * uniform random-ish salt in [0, salts) derived DETERMINISTICALLY from
    * a row fingerprint (re-runs and retries salt identically — a
    * `rand()`-based salt breaks task retry idempotence); the small side is
    * replicated `salts` times. The shuffle key becomes (key, salt), so one
    * hot key spreads over `salts` reducers.
    *
    * Use when ONE side is skewed and the other is modest (replication
    * multiplies it). For skew on both sides, prefer AQE skew-join
    * splitting (enabled in [[graft.core.GraftSession]]).
    *
    * @param saltSource column of the skewed side whose fingerprint
    *                   spreads its hot keys (e.g. a unique id)
    */
  def saltedJoin(skewed: DataFrame, modest: DataFrame, keys: Seq[String],
      salts: Int, saltSource: Column, joinType: String = "inner"): DataFrame = {
    val salted = skewed.withColumn("_salt",
      pmod(graft.expr.Fingerprint64(saltSource.cast("string")), lit(salts)).cast("int"))
    val replicated = modest.withColumn("_salt",
      explode(array((0 until salts).map(lit): _*)))
    salted.join(replicated, keys :+ "_salt", joinType).drop("_salt")
  }
}
