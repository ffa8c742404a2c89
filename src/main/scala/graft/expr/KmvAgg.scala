package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

/** `kmv_distinct(hash bigint, k) -> double` — distinct-count estimate via
  * the k-minimum-values sketch (Bar-Yossef et al., "Counting distinct
  * elements in a data stream", RANDOM 2002).
  *
  * Each group keeps only the k smallest DISTINCT hash values under
  * UNSIGNED order, after passing every input through the SplitMix64
  * finalizer (see [[KmvAgg.Sketch]] — order statistics need uniform high
  * bits, which raw multiplicative hashes don't deliver). If fewer than k
  * distinct hashes exist the estimate is their exact count; otherwise
  * n̂ = (k−1)·2⁶⁴ / h₍ₖ₎ — finalized hashes of distinct values behave as
  * uniform draws on [0, 2⁶⁴), so the k-th order statistic estimates k/n
  * of the range (relative error ≈ 1/√(k−2)).
  *
  * Why an aggregate sketch and not `count(distinct)`: exact distinct on
  * 100 TB shuffles every distinct value to its group; this shuffles at
  * most k longs per (group × map task) — the partial/final split Spark
  * applies to any TypedImperativeAggregate gives map-side sketch merge
  * for free. Unlike `approx_count_distinct` (HLL++, engine-specific
  * internals), KMV is a published, exactly-reproducible estimator: the
  * DuckDB oracle re-derives the identical estimate from the same
  * SplitMix64-finalized FNV-1a hashes, so the catalog entry is hash-checked, not "approximately
  * close". Determinism: the result depends only on the SET of input
  * hashes — insertion order and partitioning cannot move it.
  *
  * The estimate arithmetic is pinned for cross-engine bit-equality:
  * numerator (k−1)·2⁶⁴ is an exact double (k ≤ 2²⁰); the k-th hash
  * converts signed-long → double exactly the way the SQL mirror spells
  * it (negative branch adds 2⁶⁴ AFTER the signed rounding), so both
  * engines divide identical doubles.
  *
  * No counterpart in the reference (closest is Count.PerElement,
  * `/root/reference/pipelines/cycle_rides.py:52` — exact counting);
  * part of graft's LLM-pipeline profiling surface.
  */
case class KmvAgg(
    hash: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KmvAgg.Sketch] {

  require(k >= 2 && k <= (1 << 20), s"kmv_distinct: k must be in [2, 2^20], got $k")

  override def children: Seq[Expression] = Seq(hash)
  override def nullable: Boolean = false
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = hash.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"kmv_distinct requires a BIGINT hash input (e.g. fingerprint64(col)), " +
        s"got ${other.sql} — cast or hash explicitly")
  }

  override def createAggregationBuffer(): KmvAgg.Sketch = new KmvAgg.Sketch(k)

  override def update(buf: KmvAgg.Sketch, input: InternalRow): KmvAgg.Sketch = {
    val h = hash.eval(input)
    if (h != null) buf.offer(h.asInstanceOf[Long])
    buf
  }

  override def merge(buf: KmvAgg.Sketch, other: KmvAgg.Sketch): KmvAgg.Sketch = {
    buf.mergeFrom(other)
    buf
  }

  override def eval(buf: KmvAgg.Sketch): Any = buf.estimate

  override def serialize(buf: KmvAgg.Sketch): Array[Byte] = KmvAgg.wire(buf)

  override def deserialize(bytes: Array[Byte]): KmvAgg.Sketch =
    KmvAgg.fromWire(k, bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(hash = newChildren(0))
  override def prettyName: String = "kmv_distinct"
}

/** `kmv_sketch(hash bigint, k) -> binary` — the k-minimum-values SET
  * itself, not the estimate: the sketch-partials member of the KMV
  * family, completing the reaggregable surface next to HLL/CMS/DDSketch
  * ([[HllSketchAgg]] is the pattern source). Store one sketch per
  * (source, day, …) cell from ONE corpus scan; answer any later rollup
  * by union-merging sketches ([[KmvMergeAgg]]) and estimating
  * ([[KmvEstimate]]) at sketch cardinality. Merge is lossless by
  * construction — the k smallest of a union equal the k smallest of the
  * parts' k-minima — so a rolled-up estimate is BIT-IDENTICAL to
  * sketching the union directly.
  *
  * CANONICAL WIRE FORM (the hashability contract, like
  * [[DdQuantileAgg]]'s sorted stores): 4-byte big-endian count n, then
  * n stored (SplitMix64-mixed, sign-flipped) hashes as big-endian
  * longs in ASCENDING order. The sketch is a pure function of the SET
  * of input hashes, so equal sets serialize to equal BYTES — sketch
  * columns hash-compare across engines and partitionings. */
case class KmvSketchAgg(
    hash: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KmvAgg.Sketch] {

  require(k >= 2 && k <= (1 << 20), s"kmv_sketch: k must be in [2, 2^20], got $k")

  override def children: Seq[Expression] = Seq(hash)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult = hash.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"kmv_sketch requires a BIGINT hash input (e.g. fingerprint64(col)), " +
        s"got ${other.sql} — cast or hash explicitly")
  }

  override def createAggregationBuffer(): KmvAgg.Sketch = new KmvAgg.Sketch(k)

  override def update(buf: KmvAgg.Sketch, input: InternalRow): KmvAgg.Sketch = {
    val h = hash.eval(input)
    if (h != null) buf.offer(h.asInstanceOf[Long])
    buf
  }

  override def merge(buf: KmvAgg.Sketch, other: KmvAgg.Sketch): KmvAgg.Sketch = {
    buf.mergeFrom(other)
    buf
  }

  override def eval(buf: KmvAgg.Sketch): Any = KmvAgg.wire(buf)

  override def serialize(buf: KmvAgg.Sketch): Array[Byte] = KmvAgg.wire(buf)

  override def deserialize(bytes: Array[Byte]): KmvAgg.Sketch =
    KmvAgg.fromWire(k, bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(hash = newChildren(0))
  override def prettyName: String = "kmv_sketch"
}

/** `kmv_merge(sketch binary, k) -> binary` — union of KMV sketches,
  * keeping the k smallest distinct values: the reaggregation operator.
  * Wire-form violations (bad length, count mismatch, non-ascending,
  * overlong) refuse loudly — a silently mis-merged sketch corrupts
  * every downstream estimate. */
case class KmvMergeAgg(
    sketch: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KmvAgg.Sketch] {

  require(k >= 2 && k <= (1 << 20), s"kmv_merge: k must be in [2, 2^20], got $k")

  override def children: Seq[Expression] = Seq(sketch)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult = sketch.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"kmv_merge requires a BINARY kmv_sketch input, got ${other.sql}")
  }

  override def createAggregationBuffer(): KmvAgg.Sketch = new KmvAgg.Sketch(k)

  override def update(buf: KmvAgg.Sketch, input: InternalRow): KmvAgg.Sketch = {
    val s = sketch.eval(input)
    if (s != null) buf.mergeFrom(KmvAgg.fromWire(k, s.asInstanceOf[Array[Byte]]))
    buf
  }

  override def merge(buf: KmvAgg.Sketch, other: KmvAgg.Sketch): KmvAgg.Sketch = {
    buf.mergeFrom(other)
    buf
  }

  override def eval(buf: KmvAgg.Sketch): Any = KmvAgg.wire(buf)

  override def serialize(buf: KmvAgg.Sketch): Array[Byte] = KmvAgg.wire(buf)

  override def deserialize(bytes: Array[Byte]): KmvAgg.Sketch =
    KmvAgg.fromWire(k, bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(sketch = newChildren(0))
  override def prettyName: String = "kmv_merge"
}

/** `kmv_estimate(sketch binary, k) -> double` — the pinned KMV estimate
  * over a stored sketch. `k` is an explicit parameter (unlike
  * [[HllEstimate]], where width implies p): an UNSATURATED sketch of n
  * values is indistinguishable from a saturated sketch with k = n, and
  * the two estimate differently — exact n versus (k−1)·2⁶⁴/h₍ₖ₎.
  * Interpreted eval is deliberate: estimates run at rollup-cell
  * cardinality, never in a row-scan hot path. */
case class KmvEstimate(child: Expression, k: Int)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  require(k >= 2 && k <= (1 << 20), s"kmv_estimate: k must be in [2, 2^20], got $k")

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"kmv_estimate requires a BINARY kmv_sketch input, got ${other.sql}")
  }

  override protected def nullSafeEval(input: Any): Any =
    KmvAgg.fromWire(k, input.asInstanceOf[Array[Byte]]).estimate

  override protected def withNewChildInternal(newChild: Expression): KmvEstimate =
    copy(child = newChild)
  override def prettyName: String = "kmv_estimate"
}

/** `kmv_union(a binary, b binary, k) -> binary` — the SCALAR pairwise
  * union (the aggregate reaggregation is [[KmvMergeAgg]]): the k
  * smallest of two sketches' union, canonical wire form. Lossless like
  * the aggregate merge: bottom-k(bottom-k(A) ∪ bottom-k(B)) =
  * bottom-k(A ∪ B). */
case class KmvUnion(left: Expression, right: Expression, k: Int)
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  require(k >= 2 && k <= (1 << 20), s"kmv_union: k must be in [2, 2^20], got $k")

  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, BinaryType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"kmv_union requires (BINARY, BINARY) kmv_sketch inputs, got " +
          s"(${l.sql}, ${r.sql})")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val u = KmvAgg.fromWire(k, a.asInstanceOf[Array[Byte]])
    u.mergeFrom(KmvAgg.fromWire(k, b.asInstanceOf[Array[Byte]]))
    KmvAgg.wire(u)
  }

  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): Expression = copy(left = l, right = r)
  override def prettyName: String = "kmv_union"
}

/** `kmv_jaccard(a binary, b binary, k) -> double` — the bottom-k set
  * similarity estimator (the theta-sketch set-operation trick over KMV
  * state): build the union's bottom-k U, count how many of its members
  * lie in BOTH input sketches, divide by |U|. Each member of U is a
  * uniform draw from A ∪ B, and it lands in both sketches iff the
  * underlying value is in A ∩ B — so the ratio estimates
  * J = |A∩B| / |A∪B| with the sampling error of a k-sample
  * (±O(1/√k)). The arithmetic is one exact small-integer division, so
  * the estimate is bit-deterministic and the oracle re-derives it from
  * the same hash chain. Intersection cardinality follows as
  * J × the union estimate — how corpus overlap / contamination is
  * measured from per-corpus sketches WITHOUT touching either corpus
  * again. */
case class KmvJaccard(left: Expression, right: Expression, k: Int)
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  require(k >= 2 && k <= (1 << 20), s"kmv_jaccard: k must be in [2, 2^20], got $k")

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, BinaryType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"kmv_jaccard requires (BINARY, BINARY) kmv_sketch inputs, got " +
          s"(${l.sql}, ${r.sql})")
    }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val sa = KmvAgg.fromWire(k, a.asInstanceOf[Array[Byte]])
    val sb = KmvAgg.fromWire(k, b.asInstanceOf[Array[Byte]])
    val u = new KmvAgg.Sketch(k)
    u.mergeFrom(sa)
    u.mergeFrom(sb)
    val inA = sa.hashes.toSet
    val inB = sb.hashes.toSet
    val us = u.hashes
    if (us.isEmpty) 0.0
    else {
      var both = 0
      var i = 0
      while (i < us.length) {
        if (inA.contains(us(i)) && inB.contains(us(i))) both += 1
        i += 1
      }
      both.toDouble / us.length
    }
  }

  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): Expression = copy(left = l, right = r)
  override def prettyName: String = "kmv_jaccard"
}

object KmvAgg {

  /** The k smallest distinct MIXED hashes under unsigned 64-bit order.
    * Every input hash passes through the SplitMix64 finalizer first: the
    * estimator needs uniform HIGH bits, and plain multiplicative hashes
    * (FNV-1a included) are measurably biased in their order statistics
    * over short structured keys — raw FNV overestimated a 20k-distinct
    * set by 80%+; finalized it lands within 1σ. SplitMix64 is a
    * bijection, so distinctness is exactly preserved. Values are stored
    * sign-FLIPPED (h ^ Long.MinValue) so the tree's natural signed order
    * is the unsigned order of the mixed hashes. */
  final class Sketch(k: Int) {
    private val set = new java.util.TreeSet[java.lang.Long]()

    def offer(h: Long): Unit =
      insertStored(TextHashKernels.splitmix64(h) ^ Long.MinValue)

    /** Insert an already-mixed, already-flipped value (merge/deser path —
      * offering would double-mix). */
    def insertStored(flipped: Long): Unit = {
      if (set.size < k) { set.add(flipped); () }
      else if (flipped < set.last()) {
        if (set.add(flipped)) { set.pollLast(); () }
      }
    }

    def mergeFrom(other: Sketch): Unit = {
      val it = other.set.iterator()
      while (it.hasNext) insertStored(it.next())
    }

    /** Stored (mixed, flipped) values, ascending. */
    def hashes: Array[Long] = {
      val out = new Array[Long](set.size)
      val it = set.iterator()
      var i = 0
      while (it.hasNext) { out(i) = it.next(); i += 1 }
      out
    }

    def estimate: Double =
      if (set.size < k) set.size.toDouble
      else {
        val kth = set.last() ^ Long.MinValue // k-th smallest, unsigned
        // signed→double first, then the +2⁶⁴ wrap — matches the SQL
        // mirror's CASE so both engines round identically
        val kthD =
          if (kth >= 0) kth.toDouble else kth.toDouble + KmvAgg.TwoPow64
        (k - 1).toDouble * KmvAgg.TwoPow64 / kthD
      }
  }

  /** 2⁶⁴ — exactly representable (power of two). */
  val TwoPow64: Double = 1.8446744073709552E19

  /** Canonical wire form (scaladoc on [[KmvSketchAgg]]): count + stored
    * values ascending. A pure function of the sketch's SET, so equal
    * sets → equal bytes. */
  def wire(s: Sketch): Array[Byte] = {
    val hs = s.hashes // TreeSet iteration: ascending — canonical order
    val out = java.nio.ByteBuffer.allocate(4 + 8 * hs.length)
    out.putInt(hs.length)
    hs.foreach(out.putLong)
    out.array()
  }

  /** Parse + validate a canonical sketch. Refuses loudly on structural
    * violations — a malformed blob must not silently skew estimates. */
  def fromWire(k: Int, bytes: Array[Byte]): Sketch = {
    require(bytes.length >= 4 && (bytes.length - 4) % 8 == 0,
      s"kmv sketch: ${bytes.length} bytes is not a count + longs wire form")
    val in = java.nio.ByteBuffer.wrap(bytes)
    val n = in.getInt
    require(n == (bytes.length - 4) / 8,
      s"kmv sketch: count $n does not match ${(bytes.length - 4) / 8} stored values")
    require(n <= k,
      s"kmv sketch: $n stored values exceed k=$k — mixing sketches of " +
        "different k corrupts estimates")
    val s = new Sketch(k)
    var prev = Long.MinValue
    var first = true
    var i = 0
    while (i < n) {
      val v = in.getLong
      require(first || v > prev,
        "kmv sketch: stored values must be strictly ascending (canonical form)")
      first = false; prev = v
      s.insertStored(v)
      i += 1
    }
    s
  }

  def apply(hash: Column, k: Int): Column =
    toCol(KmvAgg(toExpr(hash), k).toAggregateExpression())

  /** Column faces of the sketch-partials family. */
  def sketch(hash: Column, k: Int): Column =
    toCol(KmvSketchAgg(toExpr(hash), k).toAggregateExpression())
  def mergeSketches(sk: Column, k: Int): Column =
    toCol(KmvMergeAgg(toExpr(sk), k).toAggregateExpression())
  def estimate(sk: Column, k: Int): Column =
    toCol(KmvEstimate(toExpr(sk), k))
  def union(a: Column, b: Column, k: Int): Column =
    toCol(KmvUnion(toExpr(a), toExpr(b), k))
  def jaccard(a: Column, b: Column, k: Int): Column =
    toCol(KmvJaccard(toExpr(a), toExpr(b), k))
}
