import graft.sources.GraftDvBitmap

/** Prices the compressed deletion-vector representation
  * ([[graft.sources.GraftDvBitmap]]) at the volumes the round-11
  * verdict flagged (tens of millions of deleted ordinals = ~GB of
  * driver Array[Long] state): retained bytes vs the 8-bytes-per-delete
  * baseline, build wall, and membership-probe throughput, across the
  * three delete shapes a real table produces — DENSE runs (a range
  * DELETE), RANDOM scatter (point MERGEs), and CLUSTERED bursts
  * (per-key deletes landing near each other). Pure JVM, no Spark: the
  * structure under test is driver planning state.
  *
  * Run: `sbt "runMain DvBitmapDryRun"` — one `| shape | n | …` table
  * row per case on stdout. */
object DvBitmapDryRun {

  private def time[A](work: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = work
    (a, (System.nanoTime() - t0) / 1e9)
  }

  private def shape(name: String, n: Int, rnd: scala.util.Random)
      : Array[Long] = name match {
    case "dense" => Array.tabulate(n)(i => 1000000L + i)
    case "random" =>
      // span ~20n rows, the point-merge scatter shape
      Array.fill(n)(rnd.nextLong(n * 20L).abs)
    case "clustered" =>
      // 1% burst centers, 100 deletes near each — per-key MOR deletes
      val centers = Array.fill(math.max(1, n / 100))(
        rnd.nextLong(n * 50L).abs)
      Array.tabulate(n)(i =>
        centers(i % centers.length) + (i / centers.length))
  }

  def main(args: Array[String]): Unit = {
    val rnd = new scala.util.Random(42)
    println("| shape | n | build s | retained | vs 8B/delete | " +
      "probes/s | card |")
    println("|---|---|---|---|---|---|---|")
    for {
      s <- Seq("dense", "random", "clustered")
      n <- Seq(1000000, 10000000)
    } {
      val positions = shape(s, n, rnd)
      val (bm, buildS) = time(GraftDvBitmap.fromUnsorted(positions))
      val baseline = 8L * bm.cardinality
      // probe throughput: half hits, half misses, over the span
      val span = positions.max + 2
      val probes = 2000000
      var hits = 0L
      val (_, probeS) = time {
        var i = 0
        while (i < probes) {
          if (bm.contains(rnd.nextLong(span).abs)) hits += 1
          i += 1
        }
      }
      println(f"| $s | $n%,d | $buildS%.2f | ${bm.sizeBytes}%,d B | " +
        f"${bm.sizeBytes.toDouble / baseline}%.3fx | " +
        f"${(probes / probeS).toLong}%,d | ${bm.cardinality}%,d |")
      require(hits > 0) // keep the loop un-eliminable
    }
  }
}
