package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._
import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

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

  override def serialize(buf: KmvAgg.Sketch): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    val hs = buf.hashes
    out.writeInt(hs.length)
    hs.foreach(out.writeLong)
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): KmvAgg.Sketch = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val s = new KmvAgg.Sketch(k)
    var i = 0
    while (i < n) { s.insertStored(in.readLong()); i += 1 }
    s
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(hash = newChildren(0))
  override def prettyName: String = "kmv_distinct"
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

  def apply(hash: Column, k: Int): Column =
    toCol(KmvAgg(toExpr(hash), k).toAggregateExpression())
}
