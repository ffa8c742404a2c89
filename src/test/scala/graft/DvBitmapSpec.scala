package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.GraftDvBitmap

/** [[graft.sources.GraftDvBitmap]] — the compressed in-memory DV form:
  * exactness against a reference set across sparse (short-array) and
  * dense (bitmap) containers, the 4096-entry crossover, duplicate and
  * unsorted input, equality for the change feed, and the compression
  * claim itself (dense deletes must retain far less than 8 bytes/row). */
class DvBitmapSpec extends AnyFunSuite {

  private def check(positions: Array[Long]): Unit = {
    val bm = GraftDvBitmap.fromUnsorted(positions)
    val ref = positions.toSet
    assert(bm.cardinality == ref.size.toLong)
    // membership: every member in, every gap out (probe around members)
    ref.foreach(p => assert(bm.contains(p), s"missing $p"))
    ref.foreach { p =>
      if (!ref.contains(p + 1)) assert(!bm.contains(p + 1), s"phantom ${p + 1}")
      if (p > 0 && !ref.contains(p - 1)) assert(!bm.contains(p - 1))
    }
    assert(!bm.contains(-1L))
    // iteration: ascending, exact
    val it = bm.iterator.toSeq
    assert(it == ref.toSeq.sorted, "iteration must be ascending and exact")
  }

  test("sparse containers: scattered positions across many containers") {
    val rnd = new scala.util.Random(7)
    check(Array.fill(5000)(rnd.nextLong(1L << 40).abs))
  }

  test("dense containers: a solid run crosses the 4096 crossover") {
    check((100000L until 150000L).toArray) // ~0.76 container dense runs
  }

  test("mixed, duplicated, unsorted input") {
    val rnd = new scala.util.Random(13)
    val sparse = Array.fill(2000)(rnd.nextLong(1L << 30).abs)
    val dense = (65536L * 3 until 65536L * 3 + 9000).toArray
    val dups = sparse.take(500)
    check(rnd.shuffle((sparse ++ dense ++ dups).toSeq).toArray)
  }

  test("container boundary offsets 0 and 65535 round-trip") {
    check(Array(0L, 65535L, 65536L, 131071L, 131072L))
  }

  test("exactly at the sparse/dense threshold both forms agree") {
    val base = 1L << 20
    check((0 until 4096).map(i => base + i * 2L).toArray)  // sparse max
    check((0 until 4097).map(i => base + i * 2L).toArray)  // first dense
  }

  test("equality: same set equal across construction orders; differs on any change") {
    val a = Array(5L, 70000L, 70001L, 1L << 33)
    val x = GraftDvBitmap.fromUnsorted(a)
    val y = GraftDvBitmap.fromUnsorted(a.reverse ++ Array(5L)) // dup + order
    assert(x == y && x.hashCode == y.hashCode)
    assert(x != GraftDvBitmap.fromUnsorted(a :+ 6L))
    assert(GraftDvBitmap.empty == GraftDvBitmap.fromUnsorted(Array.empty[Long]))
  }

  test("dense deletes retain ~1 bit/row, not 8 bytes/delete") {
    val n = 1 << 20 // a million contiguous deletes
    val bm = GraftDvBitmap.fromUnsorted((0L until n.toLong).toArray)
    assert(bm.cardinality == n.toLong)
    // bitmap form: 8 KB per 65536-row container = n/8 bytes + keys
    assert(bm.sizeBytes < n / 4L,
      s"dense form must compress: ${bm.sizeBytes} bytes for $n deletes")
  }

  test("java serialization round-trips (task closures)") {
    val bm = GraftDvBitmap.fromUnsorted(
      Array(1L, 2L, 100000L) ++ (200000L until 210000L))
    val bos = new java.io.ByteArrayOutputStream()
    val oos = new java.io.ObjectOutputStream(bos)
    oos.writeObject(bm); oos.close()
    val back = new java.io.ObjectInputStream(
      new java.io.ByteArrayInputStream(bos.toByteArray))
      .readObject().asInstanceOf[GraftDvBitmap]
    assert(back == bm && back.cardinality == bm.cardinality)
    assert(back.contains(205000L) && !back.contains(150000L))
  }
}
