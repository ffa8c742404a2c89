package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, RowOrdering, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.types._

/** `argmax_agg(ord, value) -> value-at-maximum-ord` — the argmax/latest
  * primitive as a TYPED imperative aggregate.
  *
  * Why not `max_by` / `max(struct(...))`: both keep a struct-typed
  * aggregation BUFFER, which Spark's hash aggregate cannot hold in its
  * mutable row — the plan silently degrades to SortAggregate, inserting
  * a per-task sort by the grouping key under every partial aggregate.
  * A TypedImperativeAggregate always plans ObjectHashAggregate: pure
  * hashing, no sort anywhere (plan-asserted in specs). At 100 TB of
  * changelog compaction that per-task sort is the difference between a
  * scan-speed pass and an n·log(n) one.
  *
  * Semantics match `max_by` exactly: rows with a NULL ordering key are
  * ignored; among equal maximal ordering keys the winner is
  * engine-chosen — callers wanting determinism must make `ord` unique
  * per group (e.g. include a unique id as the struct's last field, the
  * way [[graft.operators.Upsert.latestByKey]] does). Ordering for
  * struct `ord` is field-order lexicographic (Spark's standard
  * interpreted ordering), identical to `max_by`'s.
  */
case class ArgMaxAgg(
    ord: Expression,
    value: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ArgMaxAgg.Buf] {

  override def children: Seq[Expression] = Seq(ord, value)
  override def nullable: Boolean = true
  override def dataType: DataType = value.dataType

  override def checkInputDataTypes(): TypeCheckResult =
    if (RowOrdering.isOrderable(ord.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"argmax_agg ordering type ${ord.dataType.sql} is not orderable")

  @transient private lazy val ordering: Ordering[Any] =
    TypeUtils.getInterpretedOrdering(ord.dataType)

  @transient private lazy val serProj: UnsafeProjection =
    UnsafeProjection.create(Array(ord.dataType, value.dataType))

  override def createAggregationBuffer(): ArgMaxAgg.Buf = new ArgMaxAgg.Buf

  override def update(buf: ArgMaxAgg.Buf, input: InternalRow): ArgMaxAgg.Buf = {
    val o = ord.eval(input)
    if (o != null && (buf.empty || ordering.gt(o, buf.ord))) {
      // copy: eval results may alias reused backing buffers
      buf.ord = InternalRow.copyValue(o)
      buf.value = InternalRow.copyValue(value.eval(input))
      buf.empty = false
    }
    buf
  }

  override def merge(buf: ArgMaxAgg.Buf, other: ArgMaxAgg.Buf): ArgMaxAgg.Buf = {
    if (!other.empty && (buf.empty || ordering.gt(other.ord, buf.ord))) {
      buf.ord = other.ord
      buf.value = other.value
      buf.empty = false
    }
    buf
  }

  override def eval(buf: ArgMaxAgg.Buf): Any =
    if (buf.empty) null else buf.value

  override def serialize(buf: ArgMaxAgg.Buf): Array[Byte] =
    if (buf.empty) Array.emptyByteArray
    else serProj.apply(InternalRow(buf.ord, buf.value)).getBytes

  override def deserialize(bytes: Array[Byte]): ArgMaxAgg.Buf = {
    val buf = new ArgMaxAgg.Buf
    if (bytes.nonEmpty) {
      val row = new UnsafeRow(2)
      row.pointTo(bytes, bytes.length)
      // copy out: the UnsafeRow views `bytes`; keep the buffer detached
      buf.ord = InternalRow.copyValue(row.get(0, ord.dataType))
      buf.value = InternalRow.copyValue(row.get(1, value.dataType))
      buf.empty = false
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ArgMaxAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ArgMaxAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(ord = newChildren(0), value = newChildren(1))
  override def prettyName: String = "argmax_agg"
}

object ArgMaxAgg {
  final class Buf {
    var empty: Boolean = true
    var ord: Any = _
    var value: Any = _
  }

  def apply(ord: Column, value: Column): Column =
    toCol(ArgMaxAgg(toExpr(ord), toExpr(value)).toAggregateExpression())
}
