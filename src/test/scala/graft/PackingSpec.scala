package graft

import org.apache.spark.sql.functions._

/** Sequence-packing invariants over the real corpus. */
class PackingSpec extends SparkSpec {

  test("every packed sequence starts under budget and docs are contiguous") {
    val out = PipelineQueries.qPackSequences.run(spark, sfDir).collect()
    assert(out.nonEmpty)
    val budget = PipelineQueries.PackBudget
    // total tokens conservation: sum of seq_tokens == corpus token total
    val total = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(sum(graft.text.TextAnalysis.tokenCount(col("text")).cast("long")))
      .collect().head.getLong(0)
    assert(out.map(_.getLong(2)).sum == total)
    // every sequence's tokens fit budget + one overflowing doc (the doc
    // that crosses the boundary belongs to the sequence it started in)
    val maxDoc = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(max(graft.text.TextAnalysis.tokenCount(col("text")).cast("long")))
      .collect().head.getLong(0)
    out.foreach { r =>
      assert(r.getLong(2) <= budget + maxDoc,
        s"seq ${r.getLong(0)} has ${r.getLong(2)} tokens")
    }
    // seq ids are a contiguous 0..n-1 range
    assert(out.map(_.getLong(0)).sorted.toSeq == (0L until out.length).toSeq)
  }
}
