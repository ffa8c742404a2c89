package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

object WinnowKernels {
  /** Polynomial rolling-hash base/modulus. P < 2^30 keeps every
    * intermediate product under 2^51 — exact in BIGINT on both engines
    * (the DuckDB oracle mirrors the identical fold), no wraparound
    * semantics needed. Standard competitive-programming constants. */
  val Base = 257L
  val Mod = 1000000007L

  /** Winnowing document sketch (Schleimer, Wilkerson, Aiken: "Winnowing:
    * Local Algorithms for Document Fingerprinting", SIGMOD 2003): hash
    * every k-CHARACTER gram with a rolling polynomial hash, slide a
    * w-hash window, keep each window's MINIMUM, return the distinct
    * minima sorted ascending.
    *
    * Guarantees (from the paper): any shared substring of length
    * ≥ k + w − 1 between two documents contributes at least one common
    * fingerprint — the sketch supports CONTAINMENT detection (partial
    * copies), which whole-document fingerprints and bag-of-shingles
    * Jaccard both miss. Expected density 2/(w+1).
    *
    * One pass, O(n): rolling hash update + monotone deque window minima.
    * Characters are Unicode CODE POINTS (matches the oracle's per-
    * character `ascii()`). Documents shorter than k code points yield an
    * empty sketch. */
  def sketch(text: UTF8String, k: Int, w: Int): GenericArrayData = {
    val cps = text.toString.codePoints().toArray
    val n = cps.length
    val m = n - k + 1 // k-gram count
    if (m <= 0) return new GenericArrayData(new Array[Any](0))
    // rolling k-gram hashes
    val hs = new Array[Long](m)
    var h = 0L
    var bk = 1L // Base^(k-1) mod Mod
    var i = 0
    while (i < k) {
      h = (h * Base + cps(i)) % Mod
      if (i < k - 1) bk = (bk * Base) % Mod
      i += 1
    }
    hs(0) = h
    i = 1
    while (i < m) {
      h = ((h - cps(i - 1) * bk % Mod + Mod) % Mod * Base + cps(i + k - 1)) % Mod
      hs(i) = h
      i += 1
    }
    // window minima via monotone deque (indices, increasing hash value)
    val wins = math.max(1, m - w + 1)
    val out = new java.util.TreeSet[java.lang.Long]()
    val deque = new Array[Int](m)
    var head = 0; var tail = 0 // [head, tail)
    i = 0
    while (i < m) {
      while (tail > head && hs(deque(tail - 1)) >= hs(i)) tail -= 1
      deque(tail) = i; tail += 1
      if (deque(head) <= i - w) head += 1
      if (i >= math.min(w, m) - 1 && i - math.min(w, m) + 1 < wins)
        out.add(hs(deque(head)))
      i += 1
    }
    val arr = new Array[Any](out.size)
    val it = out.iterator()
    var j = 0
    while (it.hasNext) { arr(j) = it.next().longValue(); j += 1 }
    new GenericArrayData(arr)
  }
}

/** `winnow_sketch(string, k, w) -> array<bigint>` — sorted distinct
  * winnowing fingerprints (see [[WinnowKernels.sketch]]). */
case class WinnowSketch(child: Expression, k: Int, w: Int) extends UnaryExpression {
  require(k > 0 && w > 0, "winnow_sketch: k and w must be positive")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"winnow_sketch requires STRING, got ${dt.sql}")
  }
  override protected def nullSafeEval(input: Any): Any =
    WinnowKernels.sketch(input.asInstanceOf[UTF8String], k, w)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.WinnowKernels.sketch($c, $k, $w)")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
  override def prettyName: String = "winnow_sketch"
}

object WinnowSketch {
  def apply(c: Column, k: Int, w: Int): Column = toCol(WinnowSketch(toExpr(c), k, w))
}
