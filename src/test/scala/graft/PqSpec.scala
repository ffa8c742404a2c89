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

  test("ivfPqTopK: residual training is deterministic; cosines are " +
      "EXACT; full-probe recall clears the floor; probe pruning trades " +
      "recall monotonically") {
    import graft.operators.KMeans
    val (cents, assigned) = KMeans.fit(emb, "vec_id", "embedding",
      k = 8, maxIter = 3)
    val cbA = Pq.trainResidual(emb, "vec_id", "embedding", cents,
      m = 8, ksub = 32)
    val cbB = Pq.trainResidual(emb, "vec_id", "embedding", cents,
      m = 8, ksub = 32)
    for (blk <- 0 until 8; c <- 0 until cbA.ksub)
      assert(cbA.books(blk)(c).toSeq == cbB.books(blk)(c).toSeq,
        s"residual retrain drift at block $blk centroid $c")
    val queries = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    // full probe (nprobe = k_cells): IVF prunes nothing, so recall is
    // the PQ shortlist's alone — the comparable configuration
    val full = Pq.ivfPqTopK(assigned, cents, queries, cbA,
      k = 10, nprobe = 8, shortlist = 80)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getDouble(3)))
    // exact-rescore contract: every emitted cosine is the exact one
    val exactAll = Similarity.bruteForceTopK(
      emb, emb.filter(col("vec_id") < 10), "vec_id", "embedding", 499)
      .collect().map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3))
      .toMap
    full.foreach { case (q, n, c) =>
      assert(exactAll((q, n)) == c, s"inexact cosine for ($q, $n)")
    }
    // recall@10 vs brute force
    val exact = Similarity.bruteForceTopK(
      emb, emb.filter(col("vec_id") < 10), "vec_id", "embedding", 10)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    val want = exact.groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    def recallOf(rs: Array[(Long, Long, Double)]): Double = {
      val got = rs.groupBy(_._1).view.mapValues(_.map(_._2).toSet)
      val per = want.map { case (q, w) =>
        got.getOrElse(q, Set.empty).intersect(w).size.toDouble / w.size }
      per.sum / per.size
    }
    val rFull = recallOf(full)
    assert(rFull >= 0.7, s"full-probe recall@10 = $rFull below floor")
    // pruned probe: still exact cosines, recall can only be <= full's
    // (probing fewer cells never ADDS candidates)
    val pruned = Pq.ivfPqTopK(assigned, cents, queries, cbA,
      k = 10, nprobe = 2, shortlist = 80)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getDouble(3)))
    pruned.foreach { case (q, n, c) =>
      assert(exactAll((q, n)) == c, s"inexact pruned cosine for ($q, $n)")
    }
    assert(recallOf(pruned) <= rFull + 1e-9,
      "pruning probes must not increase recall")
    // whole-search determinism
    val full2 = Pq.ivfPqTopK(assigned, cents, queries, cbA,
      k = 10, nprobe = 8, shortlist = 80)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getDouble(3)))
    assert(full2.toSeq.sorted == full.toSeq.sorted, "re-search drift")
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
