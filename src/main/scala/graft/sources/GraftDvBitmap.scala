package graft.sources

/** Compressed deletion-vector position set — the roaring-bitmap shape
  * (Delta's DV encoding, RoaringBitmap's container design) re-expressed
  * minimally: positions partition by their high bits into 65536-row
  * CONTAINERS, each stored as either a sorted `Array[Short]` of 16-bit
  * offsets (sparse: ≤ 4096 entries → ≤ 8 KB) or a 1024-long bitmap
  * (dense: 8 KB flat, one bit per possible row). Memory is therefore
  * bounded at ~1 bit per ROW SPANNED regardless of delete count, where
  * the previous `Array[Long]` representation paid 8 BYTES PER DELETE —
  * the difference between ~12 MB and ~80 MB of driver planning state
  * for 10 M deleted rows, and it serializes into task closures at the
  * same ratio.
  *
  * The on-disk DV format is unchanged (plain `(file, pos)` parquet
  * sidecars — ecosystem-readable, DuckDB-oracle-checkable); this is the
  * IN-MEMORY form [[GraftDeletes.readPositions]] builds once per scan
  * planning and each input split carries for its file.
  *
  * Operations are exactly what the scan and maintenance paths need:
  * O(1)-amortized membership for the reader's per-ordinal check,
  * ascending iteration for the DataFrame anti-join path, cardinality
  * for metadata counts, and structural equality for the change feed's
  * did-the-DVs-change test. Immutable after construction — safe to
  * share across splits and threads. */
final class GraftDvBitmap private (
    private val keys: Array[Long],        // sorted container indices
    private val containers: Array[AnyRef] // Array[Short] | Array[Long]
) extends Serializable {

  def isEmpty: Boolean = keys.length == 0

  /** Number of positions in the set. */
  val cardinality: Long = {
    var n = 0L
    var i = 0
    while (i < containers.length) {
      containers(i) match {
        case a: Array[Short] => n += a.length
        case b: Array[Long] =>
          var w = 0
          while (w < b.length) { n += java.lang.Long.bitCount(b(w)); w += 1 }
      }
      i += 1
    }
    n
  }

  def contains(pos: Long): Boolean = {
    if (pos < 0) return false
    val ci = java.util.Arrays.binarySearch(keys, pos >>> 16)
    if (ci < 0) return false
    val off = (pos & 0xFFFFL).toInt
    containers(ci) match {
      case a: Array[Short] =>
        binarySearchUnsigned(a, off) >= 0
      case b: Array[Long] =>
        (b(off >>> 6) & (1L << (off & 63))) != 0L
    }
  }

  /** Ascending iteration over every position. */
  def foreach(f: Long => Unit): Unit = {
    var i = 0
    while (i < keys.length) {
      val base = keys(i) << 16
      containers(i) match {
        case a: Array[Short] =>
          var j = 0
          while (j < a.length) { f(base | (a(j) & 0xFFFF)); j += 1 }
        case b: Array[Long] =>
          var w = 0
          while (w < b.length) {
            var word = b(w)
            while (word != 0L) {
              val bit = java.lang.Long.numberOfTrailingZeros(word)
              f(base | (w.toLong << 6) | bit)
              word &= word - 1
            }
            w += 1
          }
      }
      i += 1
    }
  }

  def iterator: Iterator[Long] = {
    val buf = new scala.collection.mutable.ArrayBuffer[Long](
      math.min(cardinality, 1 << 20).toInt)
    foreach(buf += _)
    buf.iterator
  }

  override def equals(o: Any): Boolean = o match {
    case that: GraftDvBitmap =>
      java.util.Arrays.equals(keys, that.keys) && {
        var i = 0
        while (i < containers.length) {
          val same = (containers(i), that.containers(i)) match {
            case (a: Array[Short], b: Array[Short]) =>
              java.util.Arrays.equals(a, b)
            case (a: Array[Long], b: Array[Long]) =>
              java.util.Arrays.equals(a, b)
            case _ => false // forms differ only if contents differ
          }
          if (!same) return false
          i += 1
        }
        true
      }
    case _ => false
  }

  override def hashCode(): Int = {
    var h = java.util.Arrays.hashCode(keys)
    var i = 0
    while (i < containers.length) {
      h = h * 31 + (containers(i) match {
        case a: Array[Short] => java.util.Arrays.hashCode(a)
        case b: Array[Long] => java.util.Arrays.hashCode(b)
      })
      i += 1
    }
    h
  }

  override def toString: String =
    s"GraftDvBitmap(cardinality=$cardinality, containers=${keys.length})"

  /** Retained bytes — the telemetry number `t.deletes` reports so an
    * operator can see DV volume approaching rewrite-worthy. */
  def sizeBytes: Long = {
    var n = 8L * keys.length
    var i = 0
    while (i < containers.length) {
      n += (containers(i) match {
        case a: Array[Short] => 2L * a.length
        case b: Array[Long] => 8L * b.length
      })
      i += 1
    }
    n
  }

  private def binarySearchUnsigned(a: Array[Short], v: Int): Int = {
    var lo = 0
    var hi = a.length - 1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      val mv = a(mid) & 0xFFFF
      if (mv < v) lo = mid + 1
      else if (mv > v) hi = mid - 1
      else return mid
    }
    -(lo + 1)
  }
}

object GraftDvBitmap {

  val empty: GraftDvBitmap =
    new GraftDvBitmap(Array.emptyLongArray, Array.empty[AnyRef])

  /** Sparse/dense container crossover: above 4096 entries the bitmap
    * form (8 KB flat) is smaller than the short-array form. */
  private val DenseThreshold = 4096

  /** Build from UNSORTED, possibly-duplicated positions (the shape DV
    * sidecar rows arrive in). Transient build memory is one sorted
    * long array of the input — the same the old representation
    * retained forever; the RESULT retains the compressed form only. */
  def fromUnsorted(positions: Array[Long]): GraftDvBitmap = {
    if (positions.isEmpty) return empty
    val sorted = positions.clone()
    java.util.Arrays.sort(sorted)
    require(sorted(0) >= 0,
      s"graft dv bitmap: negative row ordinal ${sorted(0)}")
    val keys = scala.collection.mutable.ArrayBuffer.empty[Long]
    val conts = scala.collection.mutable.ArrayBuffer.empty[AnyRef]
    var i = 0
    while (i < sorted.length) {
      val key = sorted(i) >>> 16
      // the container's [start, end) slice, duplicates included
      var end = i
      while (end < sorted.length && (sorted(end) >>> 16) == key) end += 1
      // dedupe within the slice while counting distinct offsets
      var distinct = 1
      var j = i + 1
      while (j < end) {
        if (sorted(j) != sorted(j - 1)) distinct += 1
        j += 1
      }
      if (distinct <= DenseThreshold) {
        val a = new Array[Short](distinct)
        var k = 0
        j = i
        var prev = -1L
        while (j < end) {
          if (sorted(j) != prev) {
            a(k) = (sorted(j) & 0xFFFFL).toShort
            k += 1
            prev = sorted(j)
          }
          j += 1
        }
        conts += a
      } else {
        val b = new Array[Long](1024)
        j = i
        while (j < end) {
          val off = (sorted(j) & 0xFFFFL).toInt
          b(off >>> 6) |= 1L << (off & 63)
          j += 1
        }
        conts += b
      }
      keys += key
      i = end
    }
    new GraftDvBitmap(keys.toArray, conts.toArray)
  }
}
