package graft

import org.apache.spark.sql.functions._
import graft.operators.{Pq, Similarity}

/** Product quantization ([[graft.operators.Pq]]): deterministic
  * training, in-plan encode, and ADC-shortlist search whose recall is
  * measured against the exact brute-force twin — the spec-side
  * contract for the rows-only `q_ann_pq_topk` catalog entry. */
class PqSpec extends SparkSpec {

  // sf0.01: 500 vectors of dim 64 — big enough that the 8·k shortlist
  // (80) genuinely prunes the corpus before the exact rescore
  private val dir = "/root/testdata/sf0.01"
  private def emb = spark.read.parquet(s"$dir/embeddings.parquet")

  test("training is deterministic: two fits produce bit-identical " +
      "codebooks; shapes and code ranges hold") {
    val a = Pq.train(emb, "vec_id", "embedding", m = 8, ksub = 32)
    val b = Pq.train(emb, "vec_id", "embedding", m = 8, ksub = 32)
    assert(a.m == 8 && a.dsub == 8 && a.ksub == 32)
    for (blk <- 0 until 8) {
      assert(a.books(blk).length == 32)
      for (c <- 0 until 32)
        assert(a.books(blk)(c).toSeq == b.books(blk)(c).toSeq,
          s"retrain drift at block $blk centroid $c")
    }
    // encode: m codes per vector, all in [0, ksub)
    val codes = emb.select(Pq.encodeCol(col("embedding"), a).as("codes"))
      .collect().map(_.getSeq[Long](0))
    assert(codes.forall(_.length == 8))
    assert(codes.forall(_.forall(c => c >= 0 && c < 32)))
    // the encoding actually discriminates (not all rows one cell)
    assert(codes.map(_.mkString(",")).distinct.length > 100,
      "codes collapse — codebooks degenerate")
  }

  test("pqTopK: every emitted cosine is EXACT, and recall@10 vs the " +
      "brute-force twin clears the operating bound") {
    val queries = emb.filter(col("vec_id") < 10)
    val cb = Pq.train(emb, "vec_id", "embedding", m = 8, ksub = 32)
    val pq = Pq.pqTopK(emb, queries, "vec_id", "embedding", cb,
      k = 10, shortlist = 80)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getDouble(3)))
    val exact = Similarity.bruteForceTopK(
      emb, queries, "vec_id", "embedding", 10)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getDouble(3)))
    // exact-rescore contract: any (query, neighbor) PQ emits carries
    // the same cosine the exact path computes for that pair
    val exactAll = Similarity.bruteForceTopK(
      emb, queries, "vec_id", "embedding", 499)
      .collect().map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3))
      .toMap
    pq.foreach { case (q, n, c) =>
      assert(exactAll((q, n)) == c, s"inexact cosine for ($q, $n)")
    }
    // recall@10: |pq ∩ exact| / |exact| per query, averaged
    val byQ = exact.groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    val pqByQ = pq.groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    val recalls = byQ.map { case (q, want) =>
      pqByQ.getOrElse(q, Set.empty).intersect(want).size.toDouble / want.size
    }.toSeq
    val recall = recalls.sum / recalls.size
    // operating point measured at 0.9+ on this corpus; 0.7 is the
    // regression floor (a broken ADC or codebook collapse lands ~k/n)
    assert(recall >= 0.7, s"recall@10 = $recall below floor")
    // determinism of the whole search
    val pq2 = Pq.pqTopK(emb, queries, "vec_id", "embedding", cb,
      k = 10, shortlist = 80)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getDouble(3)))
    assert(pq2.toSeq.sorted == pq.toSeq.sorted, "re-search drift")
  }

  test("guards: bad dims and undersized shortlist refuse loudly") {
    val e1 = intercept[IllegalArgumentException] {
      Pq.train(emb, "vec_id", "embedding", m = 7, ksub = 16)
    }
    assert(e1.getMessage.contains("not divisible"))
    val cb = Pq.train(emb, "vec_id", "embedding", m = 8, ksub = 32)
    val e2 = intercept[IllegalArgumentException] {
      Pq.pqTopK(emb, emb.limit(1), "vec_id", "embedding", cb,
        k = 10, shortlist = 5)
    }
    assert(e2.getMessage.contains("shortlist"))
  }
}
