package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Static hash kernels for text fingerprinting / near-dup detection, shared
  * by the interpreted and codegen expression paths (and by plain Scala
  * tests). All hashes are deterministic pure functions of their inputs —
  * no JVM `hashCode`, no randomness — so signatures are reproducible
  * across executors, JVMs, and engine versions (a hard requirement when a
  * 100 TB dedup job is resumed or re-run incrementally).
  *
  * Reference context: the reference engine has no text surface at all (its
  * only UDFs are geodesic distance and csv formatting —
  * `/root/reference/pipelines/stations.py:18-22`,
  * `/root/reference/pipelines/total_distance.py:50-52`); this module is
  * part of graft's LLM-training-data extension surface.
  */
object TextHashKernels {
  final val FnvOffset = 0xcbf29ce484222325L
  final val FnvPrime = 0x100000001b3L

  /** FNV-1a 64-bit over UTF-8 bytes. */
  def fnv1a64(bytes: Array[Byte]): Long = {
    var h = FnvOffset
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= FnvPrime
      i += 1
    }
    h
  }

  def fnv1a64(s: UTF8String): Long = fnv1a64(s.getBytes)
  def fnv1a64(s: String): Long = fnv1a64(s.getBytes("UTF-8"))

  /** SplitMix64 — the standard 64-bit finalizer/stream generator
    * (Steele, Lea & Flood 2014). Used to derive per-hash-function seeds
    * and pseudo-random projection planes deterministically. */
  def splitmix64(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }

  /** MinHash signature of a shingle set: sig(i) = min over shingles of
    * splitmix64(fnv(shingle) ^ seed_i). Empty input → all Long.MaxValue
    * (matches nothing). O(n·k) — n shingles, k hash functions. */
  def minhash(shingles: ArrayData, k: Int, seed: Long): ArrayData = {
    val sig = Array.fill[Long](k)(Long.MaxValue)
    // hoist the per-function seed hashes: splitmix64(seed + j) is loop-
    // invariant in the shingle dimension — recomputing it n·k times was
    // ~half the kernel's work (same output bits either way)
    val seeds = new Array[Long](k)
    var j = 0
    while (j < k) { seeds(j) = splitmix64(seed + j); j += 1 }
    val n = shingles.numElements()
    var i = 0
    while (i < n) {
      if (!shingles.isNullAt(i)) {
        val base = fnv1a64(shingles.getUTF8String(i))
        j = 0
        while (j < k) {
          val h = splitmix64(base ^ seeds(j))
          if (h < sig(j)) sig(j) = h
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  /** LSH band hashes: split a minhash signature into `bands` equal bands
    * and FNV-combine each band's values into one 64-bit bucket key.
    * Pairs sharing ANY (band_index, band_hash) are candidate duplicates. */
  def lshBands(sig: ArrayData, bands: Int): ArrayData = {
    val n = sig.numElements()
    require(n > 0, "lsh_bands: empty signature (r=0 would bucket everything together)")
    require(n % bands == 0,
      s"lsh_bands: bands ($bands) must divide the signature length ($n) — " +
        "a remainder would silently drop hashes and r=0 would bucket " +
        "everything together")
    val r = n / bands
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var h = FnvOffset
      var j = b * r
      while (j < (b + 1) * r) {
        val v = sig.getLong(j)
        var byteIx = 0
        while (byteIx < 8) {
          h ^= ((v >>> (byteIx * 8)) & 0xffL)
          h *= FnvPrime
          byteIx += 1
        }
        j += 1
      }
      out(b) = h
      b += 1
    }
    new GenericArrayData(out)
  }

  /** 64-bit SimHash over a token multiset: per-bit vote of each token's
    * FNV hash, weighted by occurrence. Near-identical documents differ in
    * few bits (compare via hamming distance = bit_count(a ^ b)). */
  def simhash64(tokens: ArrayData): Long = {
    val acc = new Array[Int](64)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val h = fnv1a64(tokens.getUTF8String(i))
        var j = 0
        while (j < 64) {
          if (((h >>> j) & 1L) == 1L) acc(j) += 1 else acc(j) -= 1
          j += 1
        }
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < 64) {
      if (acc(j) > 0) out |= (1L << j)
      j += 1
    }
    out
  }

  /** Pseudo-random plane component in [-1, 1): plane(bit, dim) derived
    * from SplitMix64 — never materialized, identical on every executor. */
  def planeComponent(seed: Long, bit: Int, dim: Int): Double = {
    val h = splitmix64(splitmix64(seed + bit) ^ (dim * 0x9e3779b97f4a7c15L))
    // top 53 bits → [0,1), scaled to [-1,1)
    ((h >>> 11) * (1.0 / (1L << 53))) * 2.0 - 1.0
  }

  /** Random-hyperplane LSH signature of a float vector: bit i = sign of
    * dot(v, plane_i). Cosine-similar vectors agree on most bits
    * (P[bit match] = 1 - angle/pi, Charikar 2002). nBits ≤ 64. */
  def randomProjectionSig(vec: ArrayData, nBits: Int, seed: Long): Long = {
    // a Long holds ≤ 64 sign bits; nBits > 64 would alias shifts mod 64
    // and silently corrupt signatures, nBits ≤ 0 would bucket everything
    require(nBits >= 1 && nBits <= 64,
      s"rp_sig: nBits must be in [1, 64], got $nBits")
    val d = vec.numElements()
    var out = 0L
    var bit = 0
    while (bit < nBits) {
      var dot = 0.0
      var j = 0
      while (j < d) {
        dot += vec.getFloat(j).toDouble * planeComponent(seed, bit, j)
        j += 1
      }
      if (dot > 0.0) out |= (1L << bit)
      bit += 1
    }
    out
  }
}

/** `fingerprint64(string) -> long` — FNV-1a 64-bit content fingerprint.
  * The exact-dedup key: group by fingerprint instead of the full document
  * body so the dedup shuffle moves 8 bytes per row, not the document. */
case class Fingerprint64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"fingerprint64 requires STRING, got ${dt.sql}")
  }
  override protected def nullSafeEval(input: Any): Any =
    TextHashKernels.fnv1a64(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.TextHashKernels.fnv1a64($c)")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
  override def prettyName: String = "fingerprint64"
}

/** `splitmix64(long) -> long` — the SplitMix64 finalizer as a column
  * expression. Raw multiplicative hashes (FNV-1a included) have biased
  * high bits; anything that treats a hash as a uniform draw on [0, 2⁶⁴)
  * (order statistics, sampling keys) must finalize first — see
  * [[KmvAgg]] for the measured bias. Bijective, so distinctness is
  * preserved. */
case class SplitMix64Expr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"splitmix64 requires BIGINT, got ${dt.sql}")
  }
  override protected def nullSafeEval(input: Any): Any =
    TextHashKernels.splitmix64(input.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.TextHashKernels.splitmix64($c)")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
  override def prettyName: String = "splitmix64"
}

/** `minhash(array<string>, k, seed) -> array<long>` — k-function MinHash
  * signature of a shingle set. k and seed must be foldable. */
case class MinHashSig(child: Expression, k: Int, seed: Long)
    extends UnaryExpression {
  // k = 0 would yield empty signatures that pass lsh_bands' divisibility
  // check with r = 0 — every doc in one bucket, the silent worst case
  require(k > 0, s"minhash: k must be positive, got $k")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"minhash requires ARRAY<STRING>, got ${dt.sql}")
  }
  override protected def nullSafeEval(input: Any): Any =
    TextHashKernels.minhash(input.asInstanceOf[ArrayData], k, seed)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expr.TextHashKernels.minhash($c, $k, ${seed}L)")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
  override def prettyName: String = "minhash"
}

/** `lsh_bands(array<long>, bands) -> array<long>` — band-bucket keys from
  * a minhash signature. */
case class LshBands(child: Expression, bands: Int) extends UnaryExpression {
  require(bands > 0, s"lsh_bands: bands must be positive, got $bands")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"lsh_bands requires ARRAY<BIGINT>, got ${dt.sql}")
  }
  override protected def nullSafeEval(input: Any): Any =
    TextHashKernels.lshBands(input.asInstanceOf[ArrayData], bands)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.TextHashKernels.lshBands($c, $bands)")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
  override def prettyName: String = "lsh_bands"
}

/** `simhash64(array<string>) -> long` — 64-bit SimHash of a token list. */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"simhash64 requires ARRAY<STRING>, got ${dt.sql}")
  }
  override protected def nullSafeEval(input: Any): Any =
    TextHashKernels.simhash64(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expr.TextHashKernels.simhash64($c)")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
  override def prettyName: String = "simhash64"
}

/** `rp_sig(array<float>, nBits, seed) -> long` — random-hyperplane LSH
  * signature for cosine similarity (Charikar 2002). Planes are derived
  * from SplitMix64 on the fly: nothing to broadcast, identical everywhere. */
case class RandomProjectionSig(child: Expression, nBits: Int, seed: Long)
    extends UnaryExpression {
  require(nBits >= 1 && nBits <= 64,
    s"rp_sig: nBits must be in [1, 64], got $nBits")
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"rp_sig requires ARRAY<FLOAT>, got ${dt.sql}")
  }
  override protected def nullSafeEval(input: Any): Any =
    TextHashKernels.randomProjectionSig(input.asInstanceOf[ArrayData], nBits, seed)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.expr.TextHashKernels.randomProjectionSig($c, $nBits, ${seed}L)")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
  override def prettyName: String = "rp_sig"
}

object Fingerprint64 {
  def apply(c: Column): Column = toCol(Fingerprint64(toExpr(c)))
}
object SplitMix64Expr {
  def apply(c: Column): Column = toCol(SplitMix64Expr(toExpr(c)))
}
object MinHashSig {
  def apply(c: Column, k: Int, seed: Long): Column = toCol(MinHashSig(toExpr(c), k, seed))
}
object LshBands {
  def apply(c: Column, bands: Int): Column = toCol(LshBands(toExpr(c), bands))
}
object SimHash64 {
  def apply(c: Column): Column = toCol(SimHash64(toExpr(c)))
}
object RandomProjectionSig {
  def apply(c: Column, nBits: Int, seed: Long): Column =
    toCol(RandomProjectionSig(toExpr(c), nBits, seed))
}
