package graft.expr

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** User-facing typed aggregators (`Aggregator[IN, BUF, OUT]`) — the
  * Dataset-API face of custom aggregation (SURVEY §2.8's Aggregator
  * slot), complementing the Catalyst-level TypedImperativeAggregates
  * ([[TopKAgg]], [[MinHashAgg]]). Usable via `ds.select(agg.toColumn)`
  * or as a registered UDAF (`functions.udaf`). */
object TypedAggregators {

  /** Weighted mean with exact accumulation order independence: sums of
    * (value × weight) and weight are kept separately and divided once. */
  object WeightedMean extends Aggregator[(Double, Double), (Double, Double), Double] {
    override def zero: (Double, Double) = (0.0, 0.0)
    override def reduce(b: (Double, Double), in: (Double, Double)): (Double, Double) =
      (b._1 + in._1 * in._2, b._2 + in._2)
    override def merge(a: (Double, Double), b: (Double, Double)): (Double, Double) =
      (a._1 + b._1, a._2 + b._2)
    override def finish(b: (Double, Double)): Double =
      if (b._2 == 0.0) Double.NaN else b._1 / b._2
    override def bufferEncoder: Encoder[(Double, Double)] =
      Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble)
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Reservoir-free exact distinct-count for LONG keys via a compact
    * hash set buffer — the typed analog of COUNT(DISTINCT) for when the
    * group's distinct cardinality is modest (bounded by definition of
    * the key domain); use approx_count_distinct beyond that. */
  object DistinctLongCount extends Aggregator[Long, Set[Long], Long] {
    override def zero: Set[Long] = Set.empty
    override def reduce(b: Set[Long], in: Long): Set[Long] = b + in
    override def merge(a: Set[Long], b: Set[Long]): Set[Long] = a ++ b
    override def finish(b: Set[Long]): Long = b.size.toLong
    override def bufferEncoder: Encoder[Set[Long]] =
      org.apache.spark.sql.Encoders.kryo[Set[Long]]
    override def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }
}
