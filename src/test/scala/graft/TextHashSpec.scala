package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String
import graft.expr.TextHashKernels._

/** Kernel-level pinning + property tests for the text-hash primitives.
  * Published test vectors pin the algorithms (they must never drift — a
  * re-run of a 100 TB dedup must reproduce identical signatures). */
class TextHashSpec extends AnyFunSuite {

  /** Naive winnowing reimplementation: recomputes every k-gram hash from
    * scratch and every window min with a scan — the obviously-correct
    * form the one-pass rolling/deque kernel must match. */
  private def naiveWinnow(s: String, k: Int, w: Int): Seq[Long] = {
    val cps = s.codePoints().toArray
    val m = cps.length - k + 1
    if (m <= 0) return Seq.empty
    val hs = (0 until m).map { i =>
      (i until i + k).foldLeft(0L)((h, j) =>
        (h * graft.expr.WinnowKernels.Base + cps(j)) % graft.expr.WinnowKernels.Mod)
    }
    val wins = math.max(1, m - w + 1)
    (0 until wins).map(j => hs.slice(j, j + w).min).distinct.sorted
  }

  private def kernelWinnow(s: String, k: Int, w: Int): Seq[Long] =
    graft.expr.WinnowKernels.sketch(UTF8String.fromString(s), k, w)
      .toLongArray().toSeq

  test("winnow sketch: one-pass kernel equals the naive form (incl. edges)") {
    val fixed = Seq("", "a", "abcdefg", "abcdefgh", "abcdefghi",
      "the quick brown fox jumps over the lazy dog",
      "aaaaaaaaaaaaaaaaa", // degenerate: all k-grams identical
      "héllo wörld 日本語 🎉 mixed-width text")
    val rnd = new scala.util.Random(42)
    val random = (1 to 30).map(_ =>
      (1 to rnd.nextInt(60)).map(_ => ('a' + rnd.nextInt(4)).toChar).mkString)
    for (s <- fixed ++ random; (k, w) <- Seq((8, 8), (3, 4), (5, 2)))
      assert(kernelWinnow(s, k, w) == naiveWinnow(s, k, w),
        s"mismatch for ${s.take(30)} k=$k w=$w")
  }

  test("winnow sketch: shared substring of length >= k+w-1 shares a fingerprint") {
    val core = "this exact passage was copied verbatim between documents"
    val a = "prefix junk text 111 " + core + " suffix aaa"
    val b = "totally different preamble " + core + " and another ending"
    val (k, w) = (8, 8)
    val shared = kernelWinnow(a, k, w).toSet & kernelWinnow(b, k, w).toSet
    assert(shared.nonEmpty, "winnowing guarantee violated")
    // and unrelated documents share nothing
    val c = kernelWinnow("no overlap here at all, nothing in common with those", k, w)
    assert((kernelWinnow(a, k, w).toSet & c.toSet).isEmpty)
  }


  private def arr(ss: String*): GenericArrayData =
    new GenericArrayData(ss.map(s => UTF8String.fromString(s)).toArray[Any])

  test("fnv1a64 matches published FNV-1a test vectors") {
    assert(fnv1a64("") == 0xcbf29ce484222325L) // offset basis
    assert(fnv1a64("a") == 0xaf63dc4c8601ec8cL)
    assert(fnv1a64("foobar") == 0x85944171f73967e8L)
  }

  test("splitmix64 matches the reference sequence for seed 0") {
    // First outputs of SplitMix64 with state 0 (Steele/Lea/Flood;
    // same sequence as java.util.SplittableRandom's mixer).
    assert(splitmix64(0L) == 0xe220a8397b1dcdafL)
  }

  test("minhash: deterministic, and equal sets share the full signature") {
    val a = minhash(arr("x y z", "y z w"), 32, 42L)
    val b = minhash(arr("y z w", "x y z"), 32, 42L) // order-independent
    assert(a.toLongArray().toSeq == b.toLongArray().toSeq)
    assert(a.numElements() == 32)
  }

  test("minhash similarity estimate tracks Jaccard") {
    // Two sets with true jaccard 8/12 ≈ 0.667 (10 common of 15 total? —
    // construct: |A|=10, |B|=10, 8 shared → union 12, jaccard 8/12).
    val shared = (1 to 8).map(i => s"s$i")
    val a = minhash(arr(shared ++ Seq("a1", "a2"): _*), 256, 7L)
    val b = minhash(arr(shared ++ Seq("b1", "b2"): _*), 256, 7L)
    val agree = a.toLongArray().zip(b.toLongArray()).count { case (x, y) => x == y }
    val est = agree.toDouble / 256.0
    assert(math.abs(est - 8.0 / 12.0) < 0.12) // ±2σ for 256 hashes
  }

  test("lshBands: identical signatures → identical band keys; band count") {
    val sig = minhash(arr("p", "q", "r"), 128, 42L)
    val bands = lshBands(sig, 32)
    assert(bands.numElements() == 32)
    assert(bands.toLongArray().toSeq == lshBands(sig, 32).toLongArray().toSeq)
  }

  test("simhash64: identical token lists agree; disjoint ones differ") {
    val a = simhash64(arr("alpha", "beta", "gamma", "delta"))
    assert(a == simhash64(arr("alpha", "beta", "gamma", "delta")))
    val b = simhash64(arr("epsilon", "zeta", "eta", "theta"))
    assert(java.lang.Long.bitCount(a ^ b) > 10) // unrelated → far apart
    // one-token change moves few bits
    val c = simhash64(arr("alpha", "beta", "gamma", "CHANGED"))
    assert(java.lang.Long.bitCount(a ^ c) < 32)
  }

  test("randomProjectionSig: deterministic; equal vectors collide; " +
    "opposite vectors anti-collide") {
    val v = new GenericArrayData(Array.tabulate(16)(i => (i + 1).toFloat))
    val neg = new GenericArrayData(Array.tabulate(16)(i => -(i + 1).toFloat))
    val s1 = randomProjectionSig(v, 16, 7L)
    assert(s1 == randomProjectionSig(v, 16, 7L))
    // sign flip inverts every projection bit
    assert((s1 ^ randomProjectionSig(neg, 16, 7L)) == 0xffffL)
  }
}
