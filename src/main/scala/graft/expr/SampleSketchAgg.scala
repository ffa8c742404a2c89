package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** `sample_sketch(hash bigint, value double, k) -> binary` — the
  * SKETCH-PARTIALS member of the uniform-sample family, completing the
  * reaggregable surface next to HLL / CMS / DDSketch / KMV
  * ([[KmvSketchAgg]] is the pattern source; the one-shot sibling is
  * [[graft.operators.Sketches.sampleQuantiles]]).
  *
  * The sketch is the k-row A-ES uniform race at weight 1
  * ([[graft.operators.Sampling.aesKey]]): keep the k rows with the
  * LARGEST race keys, carrying each row's double value. At weight 1 the
  * race key `ln((h + 0.5) / 2⁶⁴)` is strictly increasing in the
  * SplitMix64-mixed hash under unsigned order, so the sketch never
  * touches libm — selection is pure 64-bit integer comparison, and the
  * sample (hence every downstream estimate) is bit-deterministic.
  *
  * Merge is LOSSLESS by construction: the k largest keys of a union
  * equal the k largest of the parts' k-largest, so estimating a
  * union-merged sketch ([[SampleMergeAgg]] + [[SampleSketchQuantiles]])
  * is bit-identical to sketching the union directly. Store one sketch
  * per (source, day, …) cell from ONE corpus scan; answer any later
  * rollup's quantiles at sketch cardinality with no second data pass.
  *
  * CANONICAL WIRE FORM (the hashability contract, like [[KmvAgg]]'s
  * sorted longs): 4-byte big-endian count n, then n records of
  * (stored hash: mixed, sign-flipped, big-endian long; value: IEEE-754
  * bits, big-endian long), in strictly ASCENDING stored-hash order. A
  * pure function of the input (hash → value) map, so equal sets
  * serialize to equal BYTES across partitionings and engines.
  *
  * Hash collisions (two row ids mixing to one 64-bit key) REFUSE loudly
  * when the values differ — a silent keep-one would make the sample
  * merge-order-dependent. Equal (hash, value) pairs re-merge
  * idempotently, so overlapping partials of the same rows are safe.
  *
  * No counterpart in the reference (its aggregations are exact,
  * `/root/reference/pipelines/cycle_rides.py:52`); part of graft's
  * LLM-pipeline profiling surface.
  */
case class SampleSketchAgg(
    hash: Expression,
    value: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[SampleSketchAgg.Sketch] {

  require(k >= 2 && k <= (1 << 20),
    s"sample_sketch: k must be in [2, 2^20], got $k")

  override def children: Seq[Expression] = Seq(hash, value)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult =
    (hash.dataType, value.dataType) match {
      case (LongType, DoubleType) => TypeCheckResult.TypeCheckSuccess
      case (h, v) => TypeCheckResult.TypeCheckFailure(
        s"sample_sketch requires (BIGINT hash, DOUBLE value) inputs " +
          s"(e.g. fingerprint64(id), CAST(v AS DOUBLE)), got (${h.sql}, ${v.sql})")
    }

  override def createAggregationBuffer(): SampleSketchAgg.Sketch =
    new SampleSketchAgg.Sketch(k)

  override def update(buf: SampleSketchAgg.Sketch,
      input: InternalRow): SampleSketchAgg.Sketch = {
    val h = hash.eval(input)
    val v = value.eval(input)
    if (h != null && v != null)
      buf.offer(h.asInstanceOf[Long], v.asInstanceOf[Double])
    buf
  }

  override def merge(buf: SampleSketchAgg.Sketch,
      other: SampleSketchAgg.Sketch): SampleSketchAgg.Sketch = {
    buf.mergeFrom(other)
    buf
  }

  override def eval(buf: SampleSketchAgg.Sketch): Any = SampleSketchAgg.wire(buf)

  override def serialize(buf: SampleSketchAgg.Sketch): Array[Byte] =
    SampleSketchAgg.wire(buf)

  override def deserialize(bytes: Array[Byte]): SampleSketchAgg.Sketch =
    SampleSketchAgg.fromWire(k, bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): SampleSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SampleSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(hash = newChildren(0), value = newChildren(1))
  override def prettyName: String = "sample_sketch"
}

/** `sample_merge(sketch binary, k) -> binary` — union of sample
  * sketches, keeping the k rows with the largest race keys: the
  * reaggregation operator. Wire-form violations (bad length, count
  * mismatch, non-ascending, overlong, colliding keys with different
  * values) refuse loudly — a silently mis-merged sample skews every
  * downstream quantile. */
case class SampleMergeAgg(
    sketch: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[SampleSketchAgg.Sketch] {

  require(k >= 2 && k <= (1 << 20),
    s"sample_merge: k must be in [2, 2^20], got $k")

  override def children: Seq[Expression] = Seq(sketch)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult = sketch.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"sample_merge requires a BINARY sample_sketch input, got ${other.sql}")
  }

  override def createAggregationBuffer(): SampleSketchAgg.Sketch =
    new SampleSketchAgg.Sketch(k)

  override def update(buf: SampleSketchAgg.Sketch,
      input: InternalRow): SampleSketchAgg.Sketch = {
    val s = sketch.eval(input)
    if (s != null)
      buf.mergeFrom(SampleSketchAgg.fromWire(k, s.asInstanceOf[Array[Byte]]))
    buf
  }

  override def merge(buf: SampleSketchAgg.Sketch,
      other: SampleSketchAgg.Sketch): SampleSketchAgg.Sketch = {
    buf.mergeFrom(other)
    buf
  }

  override def eval(buf: SampleSketchAgg.Sketch): Any = SampleSketchAgg.wire(buf)

  override def serialize(buf: SampleSketchAgg.Sketch): Array[Byte] =
    SampleSketchAgg.wire(buf)

  override def deserialize(bytes: Array[Byte]): SampleSketchAgg.Sketch =
    SampleSketchAgg.fromWire(k, bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): SampleMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SampleMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(sketch = newChildren(0))
  override def prettyName: String = "sample_merge"
}

/** `sample_quantiles_of(sketch binary, k, probs) -> array<double>` —
  * quantile estimates from a stored sample sketch: sort the sampled
  * values ascending, then for each p interpolate linearly between the
  * order statistics bracketing pos = (n−1)·p — the SAME closed-form
  * arithmetic (operation for operation) as the one-shot
  * [[graft.operators.Sketches.sampleQuantiles]], so a rolled-up
  * estimate is bit-identical to the direct one and the DuckDB oracle
  * reproduces it exactly. Plain IEEE arithmetic, NO libm. Rank error is
  * the k-uniform sampling error, ±O(1/√k) in quantile space. Empty
  * sketch → NULL. Interpreted eval is deliberate: estimates run at
  * rollup-cell cardinality, never in a row-scan hot path. */
case class SampleSketchQuantiles(child: Expression, k: Int,
    probs: Seq[Double])
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  require(k >= 2 && k <= (1 << 20),
    s"sample_quantiles_of: k must be in [2, 2^20], got $k")
  require(probs.nonEmpty && probs.forall(p => p >= 0 && p <= 1),
    s"sample_quantiles_of: probs must be within [0, 1], got $probs")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"sample_quantiles_of requires a BINARY sample_sketch input, got ${other.sql}")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val s = SampleSketchAgg.fromWire(k, input.asInstanceOf[Array[Byte]])
    val vs = s.values
    if (vs.isEmpty) null
    else {
      java.util.Arrays.sort(vs)
      val n = vs.length
      val out = new Array[Double](probs.length)
      var i = 0
      while (i < probs.length) {
        // identical op order to the one-shot path: pos = (n−1)·p,
        // vLo + (vHi − vLo) · (pos − floor(pos))
        val pos = (n - 1).toDouble * probs(i)
        val lo = vs(math.floor(pos).toInt)
        val hi = vs(math.ceil(pos).toInt)
        out(i) = lo + (hi - lo) * (pos - math.floor(pos))
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "sample_quantiles_of"
}

object SampleSketchAgg {

  /** The k entries with the LARGEST mixed hashes under unsigned 64-bit
    * order, each carrying its double value. Hashes pass through the
    * SplitMix64 finalizer (uniform high bits — same reasoning as
    * [[KmvAgg.Sketch]]) and are stored sign-FLIPPED so the map's signed
    * order is the unsigned order of the mixed hashes; keep-largest
    * evicts the FIRST (smallest) entry. */
  final class Sketch(k: Int) {
    private val map = new java.util.TreeMap[java.lang.Long, java.lang.Double]()

    def offer(h: Long, v: Double): Unit =
      insertStored(TextHashKernels.splitmix64(h) ^ Long.MinValue, v)

    /** Insert an already-mixed, already-flipped key (merge/deser path —
      * offering would double-mix). */
    def insertStored(flipped: Long, v: Double): Unit = {
      val prev = map.get(flipped)
      if (prev != null) {
        // same key from two rows: idempotent re-merge of the same row is
        // fine; a genuine 64-bit collision with a DIFFERENT value would
        // make the sample depend on merge order — refuse loudly
        require(prev.doubleValue() == v || (prev.isNaN && v.isNaN),
          s"sample_sketch: hash collision at stored key $flipped with " +
            s"conflicting values ($prev vs $v) — sample would be " +
            "merge-order-dependent")
      } else if (map.size < k) {
        map.put(flipped, v); ()
      } else if (flipped > map.firstKey()) {
        map.put(flipped, v)
        map.pollFirstEntry(); ()
      }
    }

    def mergeFrom(other: Sketch): Unit = {
      val it = other.map.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        insertStored(e.getKey, e.getValue)
      }
    }

    /** Stored (mixed, flipped) keys, ascending. */
    def keys: Array[Long] = {
      val out = new Array[Long](map.size)
      val it = map.keySet().iterator()
      var i = 0
      while (it.hasNext) { out(i) = it.next(); i += 1 }
      out
    }

    /** Sampled values in ascending-key order (the canonical order). */
    def values: Array[Double] = {
      val out = new Array[Double](map.size)
      val it = map.values().iterator()
      var i = 0
      while (it.hasNext) { out(i) = it.next(); i += 1 }
      out
    }

    def size: Int = map.size
  }

  /** Canonical wire form (scaladoc on [[SampleSketchAgg]]): count, then
    * (stored key, value bits) records ascending by key. A pure function
    * of the sketch's (hash → value) map, so equal maps → equal bytes. */
  def wire(s: Sketch): Array[Byte] = {
    val ks = s.keys
    val vs = s.values
    val out = java.nio.ByteBuffer.allocate(4 + 16 * ks.length)
    out.putInt(ks.length)
    var i = 0
    while (i < ks.length) {
      out.putLong(ks(i))
      out.putLong(java.lang.Double.doubleToLongBits(vs(i)))
      i += 1
    }
    out.array()
  }

  /** Parse + validate a canonical sketch. Refuses loudly on structural
    * violations — a malformed blob must not silently skew quantiles. */
  def fromWire(k: Int, bytes: Array[Byte]): Sketch = {
    require(bytes.length >= 4 && (bytes.length - 4) % 16 == 0,
      s"sample sketch: ${bytes.length} bytes is not a count + " +
        "(key, value) records wire form")
    val in = java.nio.ByteBuffer.wrap(bytes)
    val n = in.getInt
    require(n == (bytes.length - 4) / 16,
      s"sample sketch: count $n does not match ${(bytes.length - 4) / 16} records")
    require(n <= k,
      s"sample sketch: $n records exceed k=$k — mixing sketches of " +
        "different k corrupts the sample")
    val s = new Sketch(k)
    var prev = Long.MinValue
    var first = true
    var i = 0
    while (i < n) {
      val key = in.getLong
      val v = java.lang.Double.longBitsToDouble(in.getLong)
      require(first || key > prev,
        "sample sketch: stored keys must be strictly ascending (canonical form)")
      first = false; prev = key
      s.insertStored(key, v)
      i += 1
    }
    s
  }

  /** Column faces of the sample sketch-partials family. */
  def sketch(hash: Column, value: Column, k: Int): Column =
    toCol(SampleSketchAgg(toExpr(hash), toExpr(value), k).toAggregateExpression())
  def mergeSketches(sk: Column, k: Int): Column =
    toCol(SampleMergeAgg(toExpr(sk), k).toAggregateExpression())
  def quantiles(sk: Column, k: Int, probs: Seq[Double]): Column =
    toCol(SampleSketchQuantiles(toExpr(sk), k, probs))
}
