package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

/** `dd_quantile_agg(value double) -> array<double>` — a MERGEABLE
  * quantile sketch with a DETERMINISTIC worst-case guarantee, after
  * DDSketch (Masson, Rim & Lee, "DDSketch: a fast and fully-mergeable
  * quantile sketch with relative-error guarantees", VLDB 2019).
  *
  * Positive values land in logarithmic buckets `b = ⌈ln(v)/ln(γ)⌉` with
  * `γ = (1+α)/(1−α)`; the buffer is the bucket→count map. For ANY input
  * and ANY quantile p, the estimate `2γᵇ/(γ+1)` is within relative error
  * α of a true p-quantile element — a worst-case bound, not a
  * probabilistic one (contrast [[graft.operators.Sketches.sampleQuantiles]]'s
  * ±O(1/√k) random rank error).
  *
  * Why this member of the KLL/GK family: compactor-based sketches
  * (KLL, MRL, GK) hold SUMMARIES whose content depends on arrival and
  * merge order — two equally-valid executions return different (both
  * in-bounds) answers, which would break this engine's catalog-wide
  * bit-determinism-across-partitionings contract. Bucket COUNTS are a
  * pure function of the input multiset: update is a map increment,
  * merge is count addition — fully mergeable (streaming/partial-agg
  * safe), and re-runs at any partitioning return identical bits.
  *
  * Size: bucket count is bounded by the data's dynamic range,
  * `log_γ(max/min)` (α = 0.01 → ~230 buckets per decade ratio); the
  * `maxBuckets` backstop REFUSES pathological ranges loudly (the
  * engine's refuse-don't-degrade posture) rather than collapsing tail
  * buckets and silently weakening the low-quantile guarantee.
  *
  * Determinism/mirror contract: the bucket index uses
  * `ceil(round(ln(v)/ln(γ), 6))` and the estimate
  * `round(2·exp(b·ln(γ))/(γ+1), 6)` — libm results rounded to 6 dp
  * (HALF_UP, both engines' round()) per the engine-wide oracle
  * convention, so DuckDB re-derives identical buckets and estimates.
  *
  * Contract: values must be > 0 (throws otherwise — prices, latencies,
  * token counts; a signed variant is two sketches); NULLs are skipped;
  * an empty group yields NULL. Output: one estimate per entry of
  * `probs`, rank convention `⌊p·(n−1)⌋ + 1` (1-indexed lower order
  * statistic).
  */
case class DdQuantileAgg(
    child: Expression,
    alpha: Double,
    probs: Seq[Double],
    maxBuckets: Int = 65536,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[DdQuantileAgg.Buckets] {

  require(alpha > 0 && alpha < 1,
    s"dd_quantile_agg: alpha must be in (0, 1), got $alpha")
  require(probs.nonEmpty && probs.forall(p => p >= 0 && p <= 1),
    s"dd_quantile_agg: probs must be within [0, 1], got $probs")

  private val gamma: Double = (1.0 + alpha) / (1.0 - alpha)
  private val lnGamma: Double = math.log(gamma)

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case DoubleType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case dt => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"dd_quantile_agg requires a DOUBLE value, got ${dt.sql} — cast explicitly")
    }

  override def createAggregationBuffer(): DdQuantileAgg.Buckets =
    new DdQuantileAgg.Buckets

  override def update(buf: DdQuantileAgg.Buckets, input: InternalRow): DdQuantileAgg.Buckets = {
    val raw = child.eval(input)
    if (raw != null) {
      val v = raw.asInstanceOf[Double]
      // finiteness too: +Infinity passes v > 0 but has no log bucket,
      // and would otherwise die deep in BigDecimal with no context
      require(v > 0 && java.lang.Double.isFinite(v),
        s"dd_quantile_agg: values must be finite and > 0, got $v (log " +
          "buckets — shift or split the sign ranges)")
      buf.add(DdQuantileAgg.bucketOf(v, lnGamma), 1L)
      require(buf.size <= maxBuckets,
        s"dd_quantile_agg: > $maxBuckets buckets — the value range is " +
          "pathologically wide for alpha=" + alpha +
          "; raise alpha or maxBuckets deliberately")
    }
    buf
  }

  override def merge(buf: DdQuantileAgg.Buckets, other: DdQuantileAgg.Buckets): DdQuantileAgg.Buckets = {
    other.foreach((b, c) => buf.add(b, c))
    require(buf.size <= maxBuckets,
      s"dd_quantile_agg: merged sketch exceeds $maxBuckets buckets")
    buf
  }

  override def eval(buf: DdQuantileAgg.Buckets): Any = {
    if (buf.isEmpty) return null
    DdQuantileAgg.quantilesOf(buf.sortedEntries, gamma, lnGamma, probs)
  }

  override def serialize(buf: DdQuantileAgg.Buckets): Array[Byte] =
    DdQuantileAgg.serializeBuckets(buf)

  override def deserialize(bytes: Array[Byte]): DdQuantileAgg.Buckets =
    DdQuantileAgg.deserializeBuckets(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): DdQuantileAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): DdQuantileAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))
  override def prettyName: String = "dd_quantile_agg"
}

object DdQuantileAgg {
  /** Log-bucket index with the 6-dp libm rounding the DuckDB mirror
    * replays: ceil(round(ln(v)/ln(γ), 6)). */
  def bucketOf(v: Double, lnGamma: Double): Long =
    math.ceil(round6(math.log(v) / lnGamma)).toLong

  /** The shared estimate walk: cumulative-rank scan over sorted
    * (bucket, count) entries, representative value 2γᵇ/(γ+1) rounded to
    * 6 dp — used by the one-shot aggregate AND the sketch-partials
    * estimator so the two can never drift. */
  def quantilesOf(entries: Array[(Long, Long)], gamma: Double,
      lnGamma: Double, probs: Seq[Double]): GenericArrayData = {
    val n = entries.iterator.map(_._2).sum
    val ests = probs.map { p =>
      val rank = math.floor(p * (n - 1)).toLong + 1L
      var cum = 0L
      var i = 0
      var b = entries.last._1
      var found = false
      while (i < entries.length && !found) {
        cum += entries(i)._2
        if (cum >= rank) { b = entries(i)._1; found = true }
        i += 1
      }
      round6(2.0 * math.exp(b.toDouble * lnGamma) / (gamma + 1.0))
    }
    new GenericArrayData(ests.toArray[Any])
  }

  /** Canonical wire form of a bucket map: entry count, then (bucket,
    * count) pairs ASCENDING BY BUCKET — sorted, so equal multisets
    * serialize to equal bytes (the property that makes a sketch column
    * hashable and oracle-comparable). */
  def serializeBuckets(buf: Buckets): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    val entries = buf.sortedEntries
    out.writeInt(entries.length)
    entries.foreach { case (b, c) => out.writeLong(b); out.writeLong(c) }
    out.flush()
    bos.toByteArray
  }

  def deserializeBuckets(bytes: Array[Byte]): Buckets = {
    // shape validation up front: the SQL faces (dd_merge/dd_quantiles)
    // hand user-supplied binaries here, and a raw EOFException out of
    // DataInputStream would be an opaque crash where this module's
    // posture is loud, message-bearing refusal
    require(bytes != null && bytes.length >= 4,
      "dd sketch: binary too short to be a sketch wire form")
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    require(n >= 0 && bytes.length == 4 + 16L * n,
      s"dd sketch: malformed wire form (declares $n entries in " +
        s"${bytes.length} bytes) — not a dd_sketch binary")
    val buf = new Buckets
    var i = 0
    while (i < n) { buf.add(in.readLong(), in.readLong()); i += 1 }
    buf
  }

  /** round(x, 6) with SQL semantics (HALF_UP = away from zero) — the
    * same function Spark's round() and DuckDB's round() compute. */
  def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** bucket→count map; iteration canonicalized by bucket order. */
  final class Buckets {
    private val m = collection.mutable.HashMap.empty[Long, Long]
    def add(b: Long, c: Long): Unit = m.update(b, m.getOrElse(b, 0L) + c)
    def size: Int = m.size
    def isEmpty: Boolean = m.isEmpty
    def foreach(f: (Long, Long) => Unit): Unit = m.foreach { case (b, c) => f(b, c) }
    def sortedEntries: Array[(Long, Long)] = m.toArray.sortBy(_._1)
  }

  def apply(value: Column, alpha: Double, probs: Seq[Double]): Column =
    toCol(DdQuantileAgg(toExpr(value), alpha, probs)
      .toAggregateExpression())

  def apply(value: Column, alpha: Double, probs: Seq[Double],
      maxBuckets: Int): Column =
    toCol(DdQuantileAgg(toExpr(value), alpha, probs, maxBuckets)
      .toAggregateExpression())
}

/** `dd_sketch(value double) -> binary` — the DDSketch bucket map ITSELF
  * as a reaggregable partial, the quantile member of the sketch-partials
  * pattern ([[HllSketchAgg]] is the distinct-count member): scan the
  * corpus ONCE into per-cell sketches, then answer any rollup from the
  * sketches alone via [[DdMergeAgg]] + [[DdSketchQuantiles]] — no second
  * pass over the data. Bucket counts are a pure function of the input
  * multiset and the wire form sorts entries by bucket, so equal
  * multisets yield equal BYTES: sketch columns hash-compare and
  * sketch-of-union ≡ merge-of-sketches exactly (count addition), the
  * lossless-merge property the rollup catalog query proves. Same value
  * contract as [[DdQuantileAgg]] (finite, > 0, NULLs skipped; empty
  * group → NULL). */
case class DdSketchAgg(
    child: Expression,
    alpha: Double,
    maxBuckets: Int = 65536,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[DdQuantileAgg.Buckets] {

  require(alpha > 0 && alpha < 1,
    s"dd_sketch: alpha must be in (0, 1), got $alpha")
  private val lnGamma: Double = math.log((1.0 + alpha) / (1.0 - alpha))

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case DoubleType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case dt => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"dd_sketch requires a DOUBLE value, got ${dt.sql} — cast explicitly")
    }

  override def createAggregationBuffer(): DdQuantileAgg.Buckets =
    new DdQuantileAgg.Buckets

  override def update(buf: DdQuantileAgg.Buckets, input: InternalRow): DdQuantileAgg.Buckets = {
    val raw = child.eval(input)
    if (raw != null) {
      val v = raw.asInstanceOf[Double]
      require(v > 0 && java.lang.Double.isFinite(v),
        s"dd_sketch: values must be finite and > 0, got $v")
      buf.add(DdQuantileAgg.bucketOf(v, lnGamma), 1L)
      require(buf.size <= maxBuckets,
        s"dd_sketch: > $maxBuckets buckets — raise alpha or maxBuckets")
    }
    buf
  }

  override def merge(buf: DdQuantileAgg.Buckets, other: DdQuantileAgg.Buckets): DdQuantileAgg.Buckets = {
    other.foreach((b, c) => buf.add(b, c))
    require(buf.size <= maxBuckets,
      s"dd_sketch: merged sketch exceeds $maxBuckets buckets")
    buf
  }

  override def eval(buf: DdQuantileAgg.Buckets): Any =
    if (buf.isEmpty) null else DdQuantileAgg.serializeBuckets(buf)

  override def serialize(buf: DdQuantileAgg.Buckets): Array[Byte] =
    DdQuantileAgg.serializeBuckets(buf)
  override def deserialize(bytes: Array[Byte]): DdQuantileAgg.Buckets =
    DdQuantileAgg.deserializeBuckets(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): DdSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): DdSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))
  override def prettyName: String = "dd_sketch"
}

/** `dd_merge(sketch binary) -> binary` — count-wise addition over a
  * group of [[DdSketchAgg]] partials; NULL inputs (empty-cell sketches)
  * are skipped, an all-NULL group yields NULL. Exact: merging is bucket
  * count addition, so rollup(sketches) ≡ sketch(union) byte-for-byte. */
case class DdMergeAgg(
    child: Expression,
    maxBuckets: Int = 65536,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[DdQuantileAgg.Buckets] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case BinaryType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case dt => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"dd_merge requires a BINARY dd_sketch input, got ${dt.sql}")
    }

  override def createAggregationBuffer(): DdQuantileAgg.Buckets =
    new DdQuantileAgg.Buckets

  override def update(buf: DdQuantileAgg.Buckets, input: InternalRow): DdQuantileAgg.Buckets = {
    val raw = child.eval(input)
    if (raw != null) {
      DdQuantileAgg.deserializeBuckets(raw.asInstanceOf[Array[Byte]])
        .foreach((b, c) => buf.add(b, c))
      require(buf.size <= maxBuckets,
        s"dd_merge: merged sketch exceeds $maxBuckets buckets")
    }
    buf
  }

  override def merge(buf: DdQuantileAgg.Buckets, other: DdQuantileAgg.Buckets): DdQuantileAgg.Buckets = {
    other.foreach((b, c) => buf.add(b, c))
    require(buf.size <= maxBuckets,
      s"dd_merge: merged sketch exceeds $maxBuckets buckets")
    buf
  }

  override def eval(buf: DdQuantileAgg.Buckets): Any =
    if (buf.isEmpty) null else DdQuantileAgg.serializeBuckets(buf)

  override def serialize(buf: DdQuantileAgg.Buckets): Array[Byte] =
    DdQuantileAgg.serializeBuckets(buf)
  override def deserialize(bytes: Array[Byte]): DdQuantileAgg.Buckets =
    DdQuantileAgg.deserializeBuckets(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): DdMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): DdMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))
  override def prettyName: String = "dd_merge"
}

/** `dd_quantiles(sketch binary) -> array<double>` — the pinned estimate
  * from a serialized sketch: the SAME cumulative-rank walk and 6-dp
  * representative-value formula as [[DdQuantileAgg.eval]]
  * ([[DdQuantileAgg.quantilesOf]] — one implementation, two call
  * sites), so estimate(merge(partials)) ≡ one-shot aggregate estimate
  * bit-for-bit. NULL in → NULL out. */
case class DdSketchQuantiles(child: Expression, alpha: Double,
    probs: Seq[Double])
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  require(alpha > 0 && alpha < 1,
    s"dd_quantiles: alpha must be in (0, 1), got $alpha")
  require(probs.nonEmpty && probs.forall(p => p >= 0 && p <= 1),
    s"dd_quantiles: probs must be within [0, 1], got $probs")
  private val gamma: Double = (1.0 + alpha) / (1.0 - alpha)
  private val lnGamma: Double = math.log(gamma)

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case BinaryType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case dt => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"dd_quantiles requires a BINARY dd_sketch input, got ${dt.sql}")
    }

  override protected def nullSafeEval(input: Any): Any = {
    val buf = DdQuantileAgg.deserializeBuckets(input.asInstanceOf[Array[Byte]])
    if (buf.isEmpty) null
    else DdQuantileAgg.quantilesOf(buf.sortedEntries, gamma, lnGamma, probs)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "dd_quantiles"
}

/** Column helpers for the DDSketch partials surface. */
object DdSketch {
  def sketch(value: Column, alpha: Double): Column =
    toCol(DdSketchAgg(toExpr(value), alpha).toAggregateExpression())
  def mergeSketches(sketch: Column): Column =
    toCol(DdMergeAgg(toExpr(sketch)).toAggregateExpression())
  def quantiles(sketch: Column, alpha: Double, probs: Seq[Double]): Column =
    toCol(DdSketchQuantiles(toExpr(sketch), alpha, probs))
}
