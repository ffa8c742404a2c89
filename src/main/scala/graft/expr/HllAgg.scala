package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

/** `hll_distinct(hash bigint, p) -> double` — distinct-count estimate via
  * HyperLogLog (Flajolet, Fusy, Gandouet & Meunier, "HyperLogLog: the
  * analysis of a near-optimal cardinality estimation algorithm", AofA
  * 2007), the register-max sketch that completes graft's cardinality
  * family next to [[KmvAgg]] (order statistics) — CONSTANT m-byte state
  * per group versus KMV's k longs, the structure every production
  * engine's approx_count_distinct builds on.
  *
  * Every input hash passes through the SplitMix64 finalizer (same
  * rationale as KMV: the estimator consumes bit patterns, raw
  * FNV/multiplicative hashes are biased); the top `p` bits of the mixed
  * hash pick one of m = 2^p registers, and the register keeps the MAX
  * over its values of ρ = leading zeros of the remaining 64−p bits + 1.
  * Estimate: αₘ·m²/Σⱼ2^(−Mⱼ), with the linear-counting fallback
  * m·ln(m/V) when the raw estimate ≤ 2.5m and V registers are still
  * zero (the small-range regime where register maxima are mostly 1s and
  * the harmonic estimator biases high). 64-bit hashes make the classic
  * 2³²-range correction unnecessary. Relative error ≈ 1.04/√m.
  *
  * Why not Spark's `approx_count_distinct`: that is HLL++ with
  * engine-private internals — correct, but not re-derivable by an
  * external oracle. This sketch is the published algorithm over graft's
  * own mirrorable hash chain, so the DuckDB oracle rebuilds the exact
  * register array and reproduces the estimate BIT-FOR-BIT — the catalog
  * entry is hash-checked, not "approximately close".
  *
  * Determinism/mirror contract (catalog-wide bit-determinism):
  * registers are a pure multiset function (update = max, merge =
  * elementwise max — fully mergeable, partitioning-independent). The
  * estimate arithmetic is pinned cross-engine: Σ2^(−Mⱼ) is computed as
  * the INTEGER Σ2^(66−Mⱼ) (BigInt here, HUGEINT in the mirror — exact,
  * order-independent) and converted to double once (both engines round
  * half-even on int→double), then divided by the exact constant 2⁶⁶;
  * the only libm call is the linear-counting ln, rounded to 6 dp per
  * the engine-wide oracle convention. An empty group estimates 0.
  *
  * No counterpart in the reference (closest is Count.PerElement,
  * `/root/reference/pipelines/cycle_rides.py:52` — exact counting);
  * part of graft's LLM-pipeline profiling surface.
  */
case class HllAgg(
    hash: Expression,
    p: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[HllAgg.Registers] {

  require(p >= 4 && p <= 18, s"hll_distinct: p must be in [4, 18], got $p")

  override def children: Seq[Expression] = Seq(hash)
  override def nullable: Boolean = false
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = hash.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"hll_distinct requires a BIGINT hash input (e.g. fingerprint64(col)), " +
        s"got ${other.sql} — cast or hash explicitly")
  }

  override def createAggregationBuffer(): HllAgg.Registers =
    new HllAgg.Registers(p)

  override def update(buf: HllAgg.Registers, input: InternalRow): HllAgg.Registers = {
    val h = hash.eval(input)
    if (h != null) buf.offer(h.asInstanceOf[Long])
    buf
  }

  override def merge(buf: HllAgg.Registers, other: HllAgg.Registers): HllAgg.Registers = {
    buf.mergeFrom(other)
    buf
  }

  override def eval(buf: HllAgg.Registers): Any = buf.estimate

  override def serialize(buf: HllAgg.Registers): Array[Byte] = buf.bytes

  override def deserialize(bytes: Array[Byte]): HllAgg.Registers =
    HllAgg.Registers.fromBytes(p, bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): HllAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(hash = newChildren(0))
  override def prettyName: String = "hll_distinct"
}

/** `hll_sketch(hash bigint, p) -> binary` — the REGISTER ARRAY itself,
  * not the estimate: the sketch-partials half of the HLL family. This
  * is the production pre-aggregation pattern at 100 TB — store one
  * m-byte sketch per (partition, day, source, …) cell, and answer any
  * rollup later by merging registers ([[HllMergeAgg]]) and estimating
  * ([[HllEstimate]]) — the raw data is scanned ONCE, every subsequent
  * distinct-count query runs over sketch-cardinality rows. Merging is
  * lossless by construction: register-wise max over sketches of parts
  * equals the sketch of the union, so the rolled-up estimate is
  * BIT-IDENTICAL to sketching the union directly (spec-asserted, and
  * the catalog rollup query's oracle re-derives both levels). */
case class HllSketchAgg(
    hash: Expression,
    p: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[HllAgg.Registers] {

  require(p >= 4 && p <= 18, s"hll_sketch: p must be in [4, 18], got $p")

  override def children: Seq[Expression] = Seq(hash)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult = hash.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"hll_sketch requires a BIGINT hash input (e.g. fingerprint64(col)), " +
        s"got ${other.sql} — cast or hash explicitly")
  }

  override def createAggregationBuffer(): HllAgg.Registers =
    new HllAgg.Registers(p)

  override def update(buf: HllAgg.Registers, input: InternalRow): HllAgg.Registers = {
    val h = hash.eval(input)
    if (h != null) buf.offer(h.asInstanceOf[Long])
    buf
  }

  override def merge(buf: HllAgg.Registers, other: HllAgg.Registers): HllAgg.Registers = {
    buf.mergeFrom(other)
    buf
  }

  override def eval(buf: HllAgg.Registers): Any = buf.bytes.clone()

  override def serialize(buf: HllAgg.Registers): Array[Byte] = buf.bytes

  override def deserialize(bytes: Array[Byte]): HllAgg.Registers =
    HllAgg.Registers.fromBytes(p, bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): HllSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(hash = newChildren(0))
  override def prettyName: String = "hll_sketch"
}

/** `hll_merge(sketch binary, p) -> binary` — register-wise max over a
  * group of [[HllSketchAgg]] sketches: the reaggregation operator.
  * Rejects wrong-width sketches loudly (silent truncation would
  * corrupt every downstream estimate). */
case class HllMergeAgg(
    sketch: Expression,
    p: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[HllAgg.Registers] {

  require(p >= 4 && p <= 18, s"hll_merge: p must be in [4, 18], got $p")

  override def children: Seq[Expression] = Seq(sketch)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult = sketch.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"hll_merge requires a BINARY hll_sketch input, got ${other.sql}")
  }

  override def createAggregationBuffer(): HllAgg.Registers =
    new HllAgg.Registers(p)

  override def update(buf: HllAgg.Registers, input: InternalRow): HllAgg.Registers = {
    val s = sketch.eval(input)
    if (s != null) {
      val bytes = s.asInstanceOf[Array[Byte]]
      require(bytes.length == (1 << p),
        s"hll_merge: sketch width ${bytes.length} != 2^$p — " +
          "mixing sketches of different p corrupts estimates")
      buf.mergeFrom(HllAgg.Registers.fromBytes(p, bytes))
    }
    buf
  }

  override def merge(buf: HllAgg.Registers, other: HllAgg.Registers): HllAgg.Registers = {
    buf.mergeFrom(other)
    buf
  }

  override def eval(buf: HllAgg.Registers): Any = buf.bytes.clone()

  override def serialize(buf: HllAgg.Registers): Array[Byte] = buf.bytes

  override def deserialize(bytes: Array[Byte]): HllAgg.Registers =
    HllAgg.Registers.fromBytes(p, bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): HllMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(sketch = newChildren(0))
  override def prettyName: String = "hll_merge"
}

/** `hll_merge2(a binary, b binary) -> binary` — PAIRWISE register-wise
  * max: the scalar join-fold face of [[HllMergeAgg]], for folding a
  * state row against a delta row (incremental MV refresh) where the two
  * sketches meet as columns of one joined row, not as a group of rows.
  * Null handling is the caller's (wrap in `when(isNull, other)`);
  * mismatched widths refuse loudly like [[HllMergeAgg]]. */
case class HllMerge2(
    left: Expression, right: Expression)
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, BinaryType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"hll_merge2 requires two BINARY hll_sketch inputs, got ${l.sql}, ${r.sql}")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[Array[Byte]]
    val y = b.asInstanceOf[Array[Byte]]
    require(x.length == y.length,
      s"hll_merge2: sketch widths ${x.length} != ${y.length} — " +
        "mixing sketches of different p corrupts estimates")
    val out = new Array[Byte](x.length)
    var j = 0
    while (j < x.length) {
      out(j) = if (x(j) >= y(j)) x(j) else y(j)
      j += 1
    }
    out
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HllMerge2 =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "hll_merge2"
}

/** `hll_estimate(sketch binary) -> double` — the pinned HLL estimate
  * over a stored register array; p is inferred from the sketch width
  * (always a power of two by construction). Interpreted eval is
  * deliberate: estimates run at GROUP cardinality (one row per rollup
  * cell), never in a row-scan hot path, and the BigInt-exact harmonic
  * sum is the bit-determinism contract shared with [[HllAgg]]. */
case class HllEstimate(child: Expression)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"hll_estimate requires a BINARY hll_sketch input, got ${other.sql}")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[Array[Byte]]
    val m = bytes.length
    require(m >= 16 && m <= (1 << 18) && Integer.bitCount(m) == 1,
      s"hll_estimate: sketch width $m is not a valid 2^p register array")
    val p = Integer.numberOfTrailingZeros(m)
    // register values are provably <= 64-p+1; anything else is not an
    // hll_sketch (a negative or oversized byte would silently shift the
    // harmonic term to garbage) — refuse loudly, like hll_merge does
    // for wrong widths
    val rhoMax = 64 - p + 1
    var j = 0
    while (j < m) {
      require(bytes(j) >= 0 && bytes(j) <= rhoMax,
        s"hll_estimate: register $j holds ${bytes(j)}, outside [0, $rhoMax] " +
          "— input is not an hll_sketch register array")
      j += 1
    }
    HllAgg.Registers.fromBytes(p, bytes).estimate
  }

  override protected def withNewChildInternal(newChild: Expression): HllEstimate =
    copy(child = newChild)
  override def prettyName: String = "hll_estimate"
}

object HllAgg {

  /** 2⁶⁶ — exactly representable (power of two). The integer register
    * sum is scaled by 2⁶⁶ so even an untouched register (M=0, term
    * 2⁶⁶) stays integral; 66 > the max possible ρ = 64−p+1 for p ≥ 4. */
  val TwoPow66: Double = java.lang.Math.scalb(1.0, 66)

  /** m registers of max-ρ values; ρ ≤ 64−p+1 ≤ 61, so bytes suffice. */
  final class Registers(p: Int, val regs: Array[Byte]) {
    def this(p: Int) = this(p, new Array[Byte](1 << p))
    private val m = 1 << p

    def offer(h: Long): Unit = {
      val mixed = TextHashKernels.splitmix64(h)
      val j = (mixed >>> (64 - p)).toInt
      val w = mixed & ((1L << (64 - p)) - 1L)
      // bit length of w (0 for w=0); ρ = leading zeros in the
      // (64−p)-bit window + 1 — mirrored as length(ltrim(bin(w),'0'))
      val bitLen = 64 - java.lang.Long.numberOfLeadingZeros(w)
      val rho = (64 - p) + 1 - bitLen
      if (rho > regs(j)) regs(j) = rho.toByte
    }

    def mergeFrom(other: Registers): Unit = {
      var j = 0
      while (j < m) {
        if (other.regs(j) > regs(j)) regs(j) = other.regs(j)
        j += 1
      }
    }

    def bytes: Array[Byte] = regs

    def estimate: Double = {
      val md = m.toDouble
      var zeros = 0
      var sum = BigInt(0)
      var j = 0
      while (j < m) {
        if (regs(j) == 0) zeros += 1
        sum += BigInt(1) << (66 - regs(j))
        j += 1
      }
      // int→double rounds half-even identically in both engines; the
      // 2⁶⁶ division is exact (power of two)
      val ratio = sum.toDouble / TwoPow66
      val alpha =
        if (m == 16) 0.673
        else if (m == 32) 0.697
        else if (m == 64) 0.709
        else 0.7213 / (1.0 + 1.079 / md)
      val e = alpha * md * md / ratio
      if (e <= 2.5 * md && zeros > 0)
        md * round6(math.log(md / zeros)) // libm → 6 dp, per convention
      else e
    }
  }

  object Registers {
    def fromBytes(p: Int, bytes: Array[Byte]): Registers =
      new Registers(p, bytes.clone())
  }

  /** The engine-wide 6-dp libm-rounding convention — one definition
    * ([[DdQuantileAgg.round6]]), shared so the sketches cannot drift. */
  def round6(x: Double): Double = DdQuantileAgg.round6(x)

  def apply(hash: Column, p: Int): Column =
    toCol(HllAgg(toExpr(hash), p).toAggregateExpression())

  /** Column faces of the sketch-partials family. */
  def sketch(hash: Column, p: Int): Column =
    toCol(HllSketchAgg(toExpr(hash), p).toAggregateExpression())
  def mergeSketches(sk: Column, p: Int): Column =
    toCol(HllMergeAgg(toExpr(sk), p).toAggregateExpression())
  def merge2(a: Column, b: Column): Column =
    toCol(HllMerge2(toExpr(a), toExpr(b)))
  def estimate(sk: Column): Column = toCol(HllEstimate(toExpr(sk)))
}
