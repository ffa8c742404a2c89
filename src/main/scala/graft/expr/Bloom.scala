package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

/** Bloom filter (Bloom, "Space/time trade-offs in hash coding with
  * allowable errors", CACM 1970) as an aggregate + membership expression,
  * for semi-join pruning: build the filter over a join's SMALL side's
  * keys, broadcast the one-row blob, and drop non-matching big-side rows
  * BEFORE they reach the join's shuffle.
  *
  * Why this matters at 100 TB: a shuffled join moves every fact row to
  * its key's reducer even when only a few percent survive the join. The
  * filter costs one bounded aggregation over the small side (the partial/
  * final split Spark applies to any TypedImperativeAggregate means each
  * map task exchanges exactly `numBits/8` bytes, independent of row
  * count) and prunes the fact scan output map-side — the exact mechanism
  * of Spark's own runtime bloom-filter rewrite
  * (`spark.sql.optimizer.runtime.bloomFilter.enabled`), surfaced as an
  * explicit, deterministic operator the caller controls.
  *
  * Determinism: bit-setting is idempotent and OR-merge is associative/
  * commutative, so the blob is a pure function of the key SET —
  * partitioning and order cannot move a bit. False positives are
  * possible (rate ≈ (1 − e^{−kn/m})^k), false negatives are not; callers
  * doing exact semantics must follow with the real join (see
  * [[graft.operators.Joins.bloomPrefilter]]) — then the final result is
  * bit-identical to the unpruned plan, which is how the catalog entry is
  * oracle-checked against a plain SQL join.
  *
  * Hash family: Kirsch–Mitzenmacher double hashing ("Less hashing, same
  * performance", ESA 2006) — g_i = h1 + i·h2 over h1 = splitmix64(key),
  * h2 = splitmix64(h1) | 1 — published technique, no engine internals.
  *
  * No counterpart in the reference (its only join is a constant-key
  * CoGroupByKey, `/root/reference/pipelines/total_distance.py:110-123`);
  * part of graft's scale surface.
  */
object BloomKernels {

  /** Blob layout: int numHashes, then the bit words as big-endian longs
    * (java.io.DataOutputStream convention). */
  final val HeaderBytes = 4

  def readInt(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
      ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)

  def readLong(b: Array[Byte], off: Int): Long = {
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (b(off + i) & 0xffL); i += 1 }
    v
  }

  /** Set the bits for `key` in `words` (numBits = words.length * 64). */
  def add(words: Array[Long], numHashes: Int, key: Long): Unit = {
    val numBits = words.length.toLong * 64L
    val h1 = TextHashKernels.splitmix64(key)
    val h2 = TextHashKernels.splitmix64(h1) | 1L
    var i = 0
    var g = h1
    while (i < numHashes) {
      val bit = java.lang.Long.remainderUnsigned(g, numBits)
      words((bit >>> 6).toInt) |= (1L << (bit & 63L))
      i += 1
      g += h2
    }
  }

  /** Membership probe against a serialized blob — false positives
    * possible, false negatives never. */
  def mightContain(blob: Array[Byte], key: Long): Boolean = {
    val numHashes = readInt(blob, 0)
    val numBits = (blob.length - HeaderBytes).toLong * 8L
    val h1 = TextHashKernels.splitmix64(key)
    val h2 = TextHashKernels.splitmix64(h1) | 1L
    var i = 0
    var g = h1
    while (i < numHashes) {
      val bit = java.lang.Long.remainderUnsigned(g, numBits)
      val word = readLong(blob, HeaderBytes + 8 * (bit >>> 6).toInt)
      if ((word & (1L << (bit & 63L))) == 0L) return false
      i += 1
      g += h2
    }
    true
  }

  def serialize(words: Array[Long], numHashes: Int): Array[Byte] = {
    val out = new Array[Byte](HeaderBytes + 8 * words.length)
    out(0) = (numHashes >>> 24).toByte
    out(1) = (numHashes >>> 16).toByte
    out(2) = (numHashes >>> 8).toByte
    out(3) = numHashes.toByte
    var w = 0
    while (w < words.length) {
      val v = words(w)
      var i = 0
      while (i < 8) {
        out(HeaderBytes + 8 * w + i) = (v >>> (56 - 8 * i)).toByte
        i += 1
      }
      w += 1
    }
    out
  }

  def deserializeWords(blob: Array[Byte]): Array[Long] = {
    val words = new Array[Long]((blob.length - HeaderBytes) / 8)
    var w = 0
    while (w < words.length) {
      words(w) = readLong(blob, HeaderBytes + 8 * w)
      w += 1
    }
    words
  }
}

/** `bloom_agg(key bigint, numBits, numHashes) -> binary` — the serialized
  * filter over the group's key set. numBits is rounded up to a multiple
  * of 64. See [[BloomKernels]] for semantics and the scale argument. */
case class BloomAgg(
    key: Expression,
    numBits: Long,
    numHashes: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  require(numBits >= 64 && numBits <= (1L << 33),
    s"bloom_agg: numBits must be in [64, 2^33], got $numBits")
  require(numHashes >= 1 && numHashes <= 16,
    s"bloom_agg: numHashes must be in [1, 16], got $numHashes")

  private val numWords: Int = (((numBits + 63) / 64)).toInt

  override def children: Seq[Expression] = Seq(key)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): TypeCheckResult = key.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bloom_agg requires a BIGINT key (hash strings with fingerprint64 " +
        s"first), got ${other.sql}")
  }

  override def createAggregationBuffer(): Array[Long] = new Array[Long](numWords)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val k = key.eval(input)
    if (k != null) BloomKernels.add(buf, numHashes, k.asInstanceOf[Long])
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) |= other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any =
    BloomKernels.serialize(buf, numHashes)

  override def serialize(buf: Array[Long]): Array[Byte] =
    BloomKernels.serialize(buf, numHashes)

  override def deserialize(bytes: Array[Byte]): Array[Long] =
    BloomKernels.deserializeWords(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(key = newChildren(0))
  override def prettyName: String = "bloom_agg"
}

object BloomAgg {
  def apply(key: Column, numBits: Long, numHashes: Int): Column =
    toCol(BloomAgg(toExpr(key), numBits, numHashes).toAggregateExpression())
}

/** `bloom_might_contain(blob binary, key bigint) -> boolean` — codegen
  * membership probe; stays inside whole-stage codegen so the prune sits
  * in the scan's generated loop. */
case class BloomMightContain(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = BooleanType
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"bloom_might_contain requires (BINARY, BIGINT), got (${l.sql}, ${r.sql})")
    }

  override protected def nullSafeEval(blob: Any, key: Any): Any =
    BloomKernels.mightContain(blob.asInstanceOf[Array[Byte]], key.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (blob, key) =>
      s"${ev.value} = graft.expr.BloomKernels.mightContain($blob, $key);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "bloom_might_contain"
}

object BloomMightContain {
  def apply(blob: Column, key: Column): Column =
    toCol(BloomMightContain(toExpr(blob), toExpr(key)))
}
