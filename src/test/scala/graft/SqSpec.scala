package graft

import org.apache.spark.sql.functions._
import graft.operators.{Similarity, Sq}

/** SQ8 scalar quantization ([[graft.operators.Sq]]): exact-float grid
  * fit, in-plan 8-bit encode, and asymmetric-dot search. Unlike PQ the
  * catalog entry `q_ann_sq8_topk` is itself hash-checked against a
  * DuckDB replay of the whole approximate search; these specs cover
  * the operator-level contracts the oracle can't state (recall vs the
  * exact twin, code-range structure, guards). */
class SqSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"
  private def emb = spark.read.parquet(s"$dir/embeddings.parquet")

  test("grid fit is the exact per-dim min/max; codes lie in [0,255] and " +
      "reconstruct within half a grid step") {
    val g = Sq.fitGrid(emb, "embedding")
    assert(g.mn.length == 64 && g.mx.length == 64)
    assert(g.mn.zip(g.mx).forall { case (a, b) => a <= b })
    val rows = emb.select(col("embedding"),
      Sq.encodeCol(col("embedding"), g).as("codes")).collect()
    rows.foreach { r =>
      val v = r.getSeq[Float](0)
      val codes = r.getSeq[Long](1)
      assert(codes.length == 64)
      assert(codes.forall(c => c >= 0L && c <= 255L),
        s"code out of byte range: $codes")
      // dequantized error ≤ half a step per dimension
      var i = 0
      while (i < 64) {
        val step = (g.mx(i).toDouble - g.mn(i).toDouble) / 255.0
        val deq = g.mn(i).toDouble + codes(i).toDouble * step
        assert(math.abs(deq - v(i).toDouble) <= step / 2 + 1e-12,
          s"dim $i reconstruction error beyond half-step")
        i += 1
      }
    }
  }

  test("sq8TopK: cosines are EXACT, recall@10 vs brute force is " +
      "near-perfect at a 3k shortlist, and re-search is deterministic") {
    val queries = emb.filter(col("vec_id") < 10)
    val g = Sq.fitGrid(emb, "embedding")
    val sq = Sq.sq8TopK(emb, queries, "vec_id", "embedding", g,
      k = 10, shortlist = 30)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getDouble(3)))
    val exactAll = Similarity.bruteForceTopK(
      emb, queries, "vec_id", "embedding", 499)
      .collect().map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3))
      .toMap
    sq.foreach { case (q, n, c) =>
      assert(exactAll((q, n)) == c, s"inexact cosine for ($q, $n)")
    }
    val exact = Similarity.bruteForceTopK(
      emb, queries, "vec_id", "embedding", 10)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    val want = exact.groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    val got = sq.groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    val per = want.map { case (q, w) =>
      got.getOrElse(q, Set.empty).intersect(w).size.toDouble / w.size }
    val recall = per.sum / per.size
    // SQ8's per-dim error is a half grid step — ranking is near-exact,
    // which is its operating appeal over PQ's 32× compression; 0.9 is
    // the regression floor (PQ's floor is 0.7 at an 8k shortlist)
    assert(recall >= 0.9, s"recall@10 = $recall below SQ8 floor")
    val sq2 = Sq.sq8TopK(emb, queries, "vec_id", "embedding", g,
      k = 10, shortlist = 30)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getDouble(3)))
    assert(sq2.toSeq.sorted == sq.toSeq.sorted, "re-search drift")
  }

  test("guards: undersized shortlist and dim mismatch refuse loudly") {
    val g = Sq.fitGrid(emb, "embedding")
    val e1 = intercept[IllegalArgumentException] {
      Sq.sq8TopK(emb, emb.limit(1), "vec_id", "embedding", g,
        k = 10, shortlist = 5)
    }
    assert(e1.getMessage.contains("shortlist"))
    val short = emb.select(col("vec_id"),
      slice(col("embedding"), 1, 32).as("embedding"))
    val e2 = intercept[Exception] {
      short.select(Sq.encodeCol(col("embedding"), g)).collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e2).exists(_.contains("sq8_encode")), s"got: $e2")
  }
}
