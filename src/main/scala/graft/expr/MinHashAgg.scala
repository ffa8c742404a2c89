package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

/** `minhash_agg(sig array<long>) -> array<long>` — MinHash signature of
  * the UNION of the input sets.
  *
  * The MinHash of a union is the elementwise MINIMUM of the signatures —
  * an associative, commutative merge, so partial aggregation applies:
  * map tasks fold their rows into one k-long signature and the shuffle
  * moves k longs per (group × partition), independent of group size.
  * This turns "similarity between whole corpora/groups" (e.g. which
  * sources duplicate which) into a cheap aggregate + tiny cross join of
  * group signatures — no document pair ever materializes.
  *
  * Estimate between two aggregated signatures: fraction of agreeing
  * positions ≈ Jaccard(unionA, unionB) (±1/√k).
  */
case class MinHashAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  // toLongArray over an array<int> UnsafeArrayData would misread 4-byte
  // slots as longs — deterministic garbage with no exception. Demand the
  // exact input type at analysis time.
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case dt =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minhash_agg requires ARRAY<BIGINT> (a minhash signature), got ${dt.sql}")
    }

  override def createAggregationBuffer(): Array[Long] = Array.emptyLongArray

  private def mergeArrays(a: Array[Long], b: Array[Long]): Array[Long] = {
    if (a.isEmpty) return b
    if (b.isEmpty) return a
    require(a.length == b.length,
      s"minhash_agg: mixed signature lengths (${a.length} vs ${b.length}) — " +
        "signatures from different k are not mergeable")
    val n = a.length
    val out = new Array[Long](n)
    var i = 0
    while (i < n) { out(i) = math.min(a(i), b(i)); i += 1 }
    out
  }

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v == null) buf
    else mergeArrays(buf, v.asInstanceOf[ArrayData].toLongArray())
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] =
    mergeArrays(buf, other)

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.length)
    buf.foreach(out.writeLong)
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    Array.fill(n)(in.readLong())
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))
  override def prettyName: String = "minhash_agg"
}

object MinHashAgg {
  def apply(sig: Column): Column =
    toCol(MinHashAgg(toExpr(sig)).toAggregateExpression())

  /** Estimated Jaccard between two signatures: agreeing fraction. */
  def estimateJaccard(a: Column, b: Column): Column = {
    import org.apache.spark.sql.functions._
    // mismatched k (or an empty signature) is a caller bug — zip_with
    // would silently null-pad the shorter side and divide by size(a),
    // returning a wrong-but-plausible estimate (or 0/0 = NaN). Mirror
    // the aggregate's own loud mixed-k refusal with an in-plan assert.
    val guard = assert_true(size(a) === size(b) && size(a) > 0,
      concat(lit("estimateJaccard: signatures must be same-length and " +
        "non-empty, got sizes "), size(a), lit(" and "), size(b)))
    when(guard.isNull,
      size(filter(zip_with(a, b, (x, y) => (x === y).cast("int")), v => v === 1))
        .cast("double") / size(a).cast("double"))
  }
}
