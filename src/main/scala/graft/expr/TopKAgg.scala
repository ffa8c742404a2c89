package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

/** `topk_agg(sortKey double, payload long, k) -> array<struct<sort_key,
  * payload>>` — bounded per-group top-k as a TRUE aggregate.
  *
  * Why this exists: the window form (`row_number() OVER (PARTITION BY g
  * ORDER BY v DESC) <= k`) must shuffle and SORT every row of every group.
  * As an aggregate, Spark's partial/final split applies: each map task
  * keeps a k-bounded heap per group, the shuffle moves at most k rows per
  * (group × partition), and no global sort happens. At 100 TB with
  * millions of rows per group and k=3, the shuffle shrinks by orders of
  * magnitude. (Same bounded-heap idea as Catalyst's
  * `TakeOrderedAndProjectExec`, lifted from "global top-N" to "top-N per
  * group" — and the same combiner-lifting Beam applies to its Top.Of,
  * cf. `/root/reference/pipelines/cycle_rides.py:53`.)
  *
  * Ordering: sort_key descending by IEEE total order (NaN ranks
  * GREATEST — the same ordering Spark and DuckDB use for double sorts),
  * ties broken by payload ASCENDING — exactly `row_number() OVER
  * (ORDER BY key DESC, payload)` semantics, so the aggregate is drop-in
  * for the window form. One documented divergence: rows with a NULL sort
  * key are excluded here, while the window form ranks them after every
  * non-null row — outputs differ only when a group has fewer than k
  * non-null rows. Output array is in rank order.
  */
case class TopKAgg(
    sortKey: Expression,
    payload: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKAgg.Heap] {

  override def children: Seq[Expression] = Seq(sortKey, payload)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(TopKAgg.entryType, containsNull = false)

  // without this, a long sort key or int payload passes analysis and
  // dies mid-job with a ClassCastException in update() — surface the
  // contract at analysis time instead
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (sortKey.dataType, payload.dataType) match {
      case (DoubleType, LongType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (sk, pl) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"topk_agg requires (DOUBLE sortKey, BIGINT payload), got " +
            s"(${sk.sql}, ${pl.sql}) — cast explicitly")
    }

  override def createAggregationBuffer(): TopKAgg.Heap = new TopKAgg.Heap(k)

  override def update(buf: TopKAgg.Heap, input: InternalRow): TopKAgg.Heap = {
    val sk = sortKey.eval(input)
    val pl = payload.eval(input)
    if (sk != null && pl != null)
      buf.offer(sk.asInstanceOf[Double], pl.asInstanceOf[Long])
    buf
  }

  override def merge(buf: TopKAgg.Heap, other: TopKAgg.Heap): TopKAgg.Heap = {
    buf.mergeFrom(other)
    buf
  }

  override def eval(buf: TopKAgg.Heap): Any = {
    val sorted = buf.sortedDesc
    new GenericArrayData(sorted.map { case (s, p) =>
      new GenericInternalRow(Array[Any](s, p)): Any
    })
  }

  override def serialize(buf: TopKAgg.Heap): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    val entries = buf.sortedDesc
    out.writeInt(entries.length)
    entries.foreach { case (s, p) => out.writeDouble(s); out.writeLong(p) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKAgg.Heap = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val h = new TopKAgg.Heap(k)
    var i = 0
    while (i < n) { h.offer(in.readDouble(), in.readLong()); i += 1 }
    h
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(sortKey = newChildren(0), payload = newChildren(1))
  override def prettyName: String = "topk_agg"
}

object TopKAgg {
  val entryType: StructType = StructType(Seq(
    StructField("sort_key", DoubleType, nullable = false),
    StructField("payload", LongType, nullable = false)))

  /** k-bounded heap ordered by rank (key DESC, payload ASC): the root is
    * the WORST retained entry — smallest key, largest payload among
    * equals — evicted when a better one arrives. */
  final class Heap(k: Int) {
    private val keys = new Array[Double](k)
    private val pays = new Array[Long](k)
    private var n = 0

    /** "(k1,p1) ranks strictly worse than (k2,p2)" — worse = smaller
      * key under IEEE TOTAL order (java.lang.Double.compare: NaN sorts
      * greatest, matching Spark/DuckDB double sort order — a bare `<`
      * would let a NaN poison the heap root), or equal key with LARGER
      * payload (payload breaks ties ascending, like the window form's
      * ORDER BY key DESC, payload). */
    private def lt(k1: Double, p1: Long, k2: Double, p2: Long): Boolean = {
      val c = java.lang.Double.compare(k1, k2)
      c < 0 || (c == 0 && p1 > p2)
    }

    def offer(key: Double, pay: Long): Unit = {
      if (n < k) {
        keys(n) = key; pays(n) = pay; n += 1
        siftUp(n - 1)
      } else if (k > 0 && lt(keys(0), pays(0), key, pay)) {
        keys(0) = key; pays(0) = pay
        siftDown(0)
      }
    }

    def mergeFrom(other: Heap): Unit = {
      var i = 0
      while (i < other.n) { offer(other.keys(i), other.pays(i)); i += 1 }
    }

    private def siftUp(i0: Int): Unit = {
      var i = i0
      while (i > 0) {
        val parent = (i - 1) / 2
        if (lt(keys(i), pays(i), keys(parent), pays(parent))) {
          swap(i, parent); i = parent
        } else return
      }
    }

    private def siftDown(i0: Int): Unit = {
      var i = i0
      while (true) {
        val l = 2 * i + 1; val r = l + 1
        var m = i
        if (l < n && lt(keys(l), pays(l), keys(m), pays(m))) m = l
        if (r < n && lt(keys(r), pays(r), keys(m), pays(m))) m = r
        if (m == i) return
        swap(i, m); i = m
      }
    }

    private def swap(i: Int, j: Int): Unit = {
      val tk = keys(i); keys(i) = keys(j); keys(j) = tk
      val tp = pays(i); pays(i) = pays(j); pays(j) = tp
    }

    /** Entries in rank order: sort_key descending (IEEE total order),
      * payload ascending. */
    def sortedDesc: Array[(Double, Long)] =
      (0 until n).map(i => (keys(i), pays(i))).toArray
        .sortWith { case ((s1, p1), (s2, p2)) =>
          val c = java.lang.Double.compare(s1, s2)
          c > 0 || (c == 0 && p1 < p2)
        }
  }

  def apply(sortKey: Column, payload: Column, k: Int): Column =
    toCol(TopKAgg(toExpr(sortKey), toExpr(payload), k)
      .toAggregateExpression())
}
