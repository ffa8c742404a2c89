package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming INCREMENTAL near-duplicate detection — the at-ingest
  * deployment of the batch MinHash-LSH pipeline
  * ([[graft.operators.Dedup.minhashLshPairs]]): as documents arrive,
  * each is checked against everything previously seen that shares an
  * LSH band bucket, so a near-dup is flagged the moment its copy lands
  * instead of at the next batch sweep.
  *
  * State design (the 100 TB-ingest story): keyed state lives per
  * (band, bucket-hash); each bucket holds at most `maxBucket` (doc id,
  * signature) entries — the SMALLEST doc ids, a deterministic bound
  * matching the batch path's k-bounded buckets — so the store is
  * O(buckets × maxBucket × nHashes) regardless of stream length, and a
  * processing-time timeout can expire cold buckets for an unbounded
  * crawl. Only signatures are held, never document text.
  *
  * Output contract: CANDIDATE pairs with their signature-estimated
  * Jaccard (the same agreement fraction as
  * [[graft.expr.MinHashAgg.estimateJaccard]]). A pair sharing several
  * bands is emitted once per band — downstream either deduplicates or
  * verifies exactly against the corpus (stream-static join), exactly
  * like the batch pipeline's verify stage. Emission is deterministic
  * for a fixed micro-batch arrival sequence (within-batch processing is
  * ordered by doc id; estimates are integer agreement fractions).
  */
object StreamingNearDup {

  /** One candidate near-dup: a < b, flagged via `band`. */
  case class Candidate(doc_a: Long, doc_b: Long, band: Int, est_jaccard: Double)

  private type Entry = (Long, Seq[Long])

  /** Works on both streaming and batch Datasets (batch = one
    * micro-batch over empty state, same semantics — the parity spec
    * compares it against the relational band self-join). */
  def candidatePairs(docs: DataFrame, idCol: String, textCol: String,
      shingleN: Int, minEstJaccard: Double,
      nHashes: Int = 128, bands: Int = 32, seed: Long = 1L,
      maxBucket: Int = 256,
      timeout: GroupStateTimeout = GroupStateTimeout.NoTimeout)
      : Dataset[Candidate] = {
    require(minEstJaccard > 0 && minEstJaccard <= 1,
      s"candidatePairs: minEstJaccard must be in (0, 1], got $minEstJaccard")
    require(maxBucket >= 2,
      s"candidatePairs: maxBucket must be >= 2, got $maxBucket")
    require(timeout != GroupStateTimeout.EventTimeTimeout,
      "candidatePairs supports NoTimeout or ProcessingTimeTimeout (no " +
        "event-time timestamp is ever set)")
    val spark = docs.sparkSession
    import spark.implicits._
    val banded = docs
      .filter(col(textCol).isNotNull)
      .select(col(idCol).cast("long").as("doc_id"),
        graft.expr.MinHashSig(
          graft.text.TextAnalysis.shingles(col(textCol), shingleN),
          nHashes, seed).as("sig"))
      .select(col("doc_id"), col("sig"),
        posexplode(graft.expr.LshBands(col("sig"), bands)).as(Seq("band", "bh")))
      .as[(Long, Seq[Long], Int, Long)]
    banded
      .groupByKey(r => (r._3, r._4))
      .flatMapGroupsWithState[List[Entry], Candidate](
        OutputMode.Append(), timeout) {
        case ((band, _), rows, state: GroupState[List[Entry]]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val prior = state.getOption.getOrElse(Nil)
            // doc-id order makes within-batch pair emission deterministic
            val fresh = rows.map(r => (r._1, r._2)).toList.sortBy(_._1)
            val out = List.newBuilder[Candidate]
            var known = prior
            for ((id, sig) <- fresh) {
              for ((oid, osig) <- known if oid != id) {
                var eq = 0
                var i = 0
                while (i < sig.length) {
                  if (sig(i) == osig(i)) eq += 1
                  i += 1
                }
                val est = eq.toDouble / sig.length
                if (est >= minEstJaccard)
                  out += Candidate(math.min(id, oid), math.max(id, oid), band, est)
              }
              known = (id, sig) :: known
            }
            // deterministic bound: keep the smallest maxBucket ids (the
            // batch path's k-bounded-bucket rule) — a hot bucket stops
            // growing instead of melting the state store
            state.update(known.distinctBy(_._1).sortBy(_._1).take(maxBucket))
            if (timeout == GroupStateTimeout.ProcessingTimeTimeout)
              state.setTimeoutDuration("1 hour")
            out.result().iterator
          }
      }
  }
}
