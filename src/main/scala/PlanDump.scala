import org.apache.spark.sql.SparkSession

/** Regenerates PLANS.md: formatted physical plans for headline queries. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions","8")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.core.GraftExtensions.registerFunctions(spark)
    val dir = "/root/testdata/sf0.01"
    val picks = Seq(
      "q_hard_top_routes" -> "reference Q-hard: one exchange, map-side partial agg, TakeOrderedAndProject (no second shuffle for top-N)",
      "q_total_distance" -> "reference Q-total: broadcast cross join for pair distances, shuffle-hash full-outer (no sorts), agg exchange reused by the join",
      "q_dedup_minhash_lsh" -> "MinHash LSH: signatures once, (band,key) grouped buckets, candidate verify joins at candidate cardinality",
      "q_ann_topk_bruteforce" -> "ANN baseline: query side broadcast, corpus streams through codegen'd cosine, ranking via the k-bounded topk_agg partial aggregate — NO Window/WindowGroupLimit stage; <=k rows per query reach the shuffle",
      "q_ann_ivf_topk" -> "IVF ANN: centroid assignment, equi-join on the inverted-list label, topk_agg ranking (no Window)",
      "q_pack_sequences" -> "distributed prefix sum: range-bucketed partitioned window + one tiny bucket-offset aggregate — every Window node carries a partition spec (zero un-partitioned windows)",
      "q_training_data_prep" -> "end-to-end prep: quality filter -> exact dedup -> LSH pairs -> cluster keepers -> distributed packing; no single-partition stage anywhere in the composite",
      "q_dedup_containment" -> "winnow-sketch containment: codegen'd sketch kernel in the scan project, stop-fingerprint df cap via left-semi join, inverted-index self-join on the 8-byte fingerprint",
      "q_ann_ivf_kmeans" -> "trained IVF (final search plan; Lloyd fit runs ahead via localCheckpoint): probes from the bounded-heap TopKAgg, bucket equi-join against checkpointed assignments, aggregate ranking — no Window",
      "q_dist_within_radius" -> "GeodesicRadiusRule fired: cheap |dlat|*109<=r bound evaluated before the Vincenty kernel in the join condition",
      "q_top_customers_revenue" -> "3-way join: dimensions broadcast, single agg exchange, TakeOrderedAndProject",
      "q3_shipping_priority" -> "TPC-H Q3 shape: both date filters pushed to their scans, customer side broadcast, TakeOrderedAndProject for the top-10 (no global sort)",
      "q_events_moving_avg" -> "RANGE-frame rolling window: one Exchange on user_id, single partitioned sort+window pass",
      "q_dsv2_pushdown" -> "DataSource V2 connector: filter AND projection land in the scan node (PushedFilters/ReadSchema on GraftParquetScan), agg above sees survivors only; RowGroupStatsPruning (round 6) marks that the per-file reader zone-map-skips footer-refuted row groups before decoding",
      "q_dedup_embedding" -> "embedding near-dup clusters: pair generation broadcast-nested-loop on the vector side (exact oracle twin; LSH path is the scale configuration), closure over 8-byte id edges only",
      "q_token_cms" -> "count-min sketch: counter matrix via partial-aggregated groupBy(j,bucket), estimates via broadcast join of the bounded d*w matrix",
      "q_bloom_join_prune" -> "bloom semi-join pruning: one-row filter blob broadcast, bloom_might_contain inside the fact scan's codegen BEFORE the join exchange — shuffle carries only probable matches",
      "q_weighted_sample" -> "A-ES weighted sample: two hash kernels + ln in the scan project, TakeOrderedAndProject bounded top-k (no global sort, no window)",
      "q5_local_supplier_volume" -> "TPC-H Q5 shape: region/nation/supplier broadcast, the orders-lineitem spine is the only shuffled join, one agg exchange",
      "q_revenue_quartiles" -> "ntile/percent_rank/cume_dist: window PARTITIONED by nation (hash exchange, per-nation sort) — no single-partition global sort",
      "q_decontaminate" -> "cross-corpus decontamination: band buckets from BOTH corpora joined on (band,key) — no corpus cross join; verify joins at candidate cardinality",
      "q_upsert_latest" -> "latest-wins compaction as max(struct) aggregate: one partial-aggregated exchange, no window, no sort",
      "q_token_ids" -> "vocab encode: corpus side map-only (split+posexplode in scan codegen) + broadcast vocabulary join; the one window ranks the AGGREGATED distinct-token table",
      "q_weighted_sample_by_source" -> "stratified PPS sample: per-group bounded heaps via topk_agg partial aggregate — k rows per (source x task) through the exchange, window-free",
      "q_events_resample_ffill" -> "resample+ffill: bounds agg -> sequence/explode grid (map-side fan-out) -> as-of join partitioned by user",
      "q_decontaminate_containment" -> "passage decontamination: winnow kernels in both scans, 8-byte fingerprint equi-join, evidence-threshold agg — no corpus cross join",
      "q_dedup_embedding_lsh" -> "LSH embedding dedup (the scale path, round 5): rp_sig signatures in scan codegen, candidate equi-self-join on (table,sig) longs — ids only through the bucket and distinct shuffles, vectors re-joined at candidate cardinality for the exact-cosine verify; NO broadcast of the corpus",
      "q_dsv2_agg_pushdown" -> "DSv2 aggregate pushdown (round 5): BOTH GraftParquetScan nodes carry PushedAggregation — the scan emits per-file partial COUNT/MIN/MAX rows (the unfiltered scan answers from footer stats alone) and Spark's final agg merges them; no row-level data crosses the connector boundary",
      "q_boilerplate_lines" -> "line-level boilerplate removal (round 5): line split + fingerprint64 in scan codegen, corpus df pass groups 8-byte fps, exact recount joins at candidate cardinality, per-doc reassembly is one aggregate over position-tagged lines",
      "q_unigram_logprob_cross" -> "cross-corpus LM scoring (round 5): train-side freq agg + 1-row stats both broadcast; candidate side is tokenize -> broadcast join -> per-doc aggregate — no corpus-keyed shuffle except the final per-doc group",
      "q_web_curation" -> "C4-style curation composite (round 5): line split + fingerprint64 in scan codegen, fp-keyed df sweep, candidate-bounded exact recount, per-doc reassembly aggregate, then the badwords HOF and structure gate run as plain codegen filters over the rebuilt text",
      "q_sample_quantiles" -> "sample-quantile sketch (round 5): A-ES hash kernels in scan codegen, topk_agg bounded per-group heaps (<=k rows per group x task through the exchange, no window), value join-back at sample cardinality, closed-form interpolation on the sorted sample array",
      "q_dsv2_sum_pushdown" -> "DSv2 integral-SUM pushdown (round 5): GraftParquetScan carries PushedAggregation with SumCol — per-file partial sums merge in Spark's final agg; only aggregate rows cross the connector boundary",
      "q_dsv2_group_pushdown" -> "DSv2 GROUP BY pushdown (round 6): GraftParquetScan carries PushedAggregation AND PushedGroupBy — each file emits one partial row per group (group keys lead the scan schema), Spark's final agg re-groups and merges; only group×file rows cross the connector boundary",
      "q_semantic_dedup" -> "SemDeDup (round 6): k-means assignment is a map-side codegen kernel over the broadcast centroid matrix (fit ran ahead on the persisted projection); the within-cell pair join shuffles vectors ONCE keyed by cid; evidence pairs carry 8-byte ids into the star-contraction closure; keepers anti-join at id cardinality",
      "q_dd_quantiles" -> "DDSketch quantiles (round 6): one partial-aggregated exchange of dd_quantile_agg sketch buffers (O(buckets) state per group x task, not O(rows)); no window, no sort — the quantile walk happens in eval over the merged bucket counts",
      "q_boilerplate_incremental" -> "incremental boilerplate (round 6): corpus stats = fp-keyed df sweep + candidate-bounded exact recount (same shape as the full sweep); the batch side is ONE join against the candidate-bounded stats table + the per-doc reassembly aggregate — no corpus-df re-derivation in the batch plan",
      "q_dedup_spans" -> "duplicated-span removal (round 6): positional grams via codegen kernel (the composed HOF form measured 13-36x slower), pass-1 df shuffle carries (8-byte fp, id) only — column pruning drops the gram strings; raw grams re-enter at CANDIDATE cardinality for the collision-immune recount; covered-offset fanout is bounded by duplication volume",
      "q_bm25_search" -> "BM25 ranking (round 6): token explode in scan codegen, query-term postings FILTERED before any shuffle, per-term df broadcast, corpus scalars via broadcast 1-row frame (no driver round-trip), per-doc DECIMAL-exact sum, TakeOrderedAndProject for the top-100 (no global sort)",
      "q_dsv2_runtime_filter" -> "DSv2 runtime filtering (round 6): the fact GraftParquetScan probes a broadcast of the filtered supplier dim; at execution Spark's dynamic pruning hands the surviving keys to the connector (In(l_suppkey, ...) — see the dynamicpruningexpression under the scan), which applies them with the same zone-map + row evaluation as static pushdown",
      "q_distinct_hll_rollup" -> "HLL sketch partials (round 6): per-source hll_sketch register arrays (one partial-aggregated exchange), the ALL level re-aggregates the 20 sketch BINARIES via hll_merge — the raw corpus is scanned once; the rollup's input is sketch-cardinality rows",
      "q_dd_quantiles_rollup" -> "DDSketch partials (round 7): per-status dd_sketch bucket maps (one partial-aggregated exchange of O(buckets) state), the ALL level re-aggregates the sketch BINARIES via dd_merge — the orders scan + per-status exchange must appear ONCE (ReusedExchange on the second consumer), the rollup's input is sketch-cardinality rows",
      "q_token_cms_rollup" -> "CMS partials (round 7): per-source (j,bucket) counter matrices from one corpus scan (partial-aggregated), the ALL matrix derives from the partials by counter addition — the tokenize+hash subtree must appear ONCE (ReusedExchange under the union), probes/estimates join at d×w-matrix cardinality via broadcast",
      "q_dsv2_write_roundtrip" -> "DSv2 write path (round 7; plan shows the READ-BACK of the connector-written table): GraftParquetScan over sink-seeded + connector-appended files with the o_totalprice filter pushed (PushedFilters + RowGroupStatsPruning) — both write generations prune identically because append rewrote the manifest",
      "q_dsv2_topn_pushdown" -> "DSv2 TopN pushdown (round 7): GraftParquetScan carries PushedTopN (ORDER BY n_chars DESC, doc_id LIMIT 50) alongside PushedFilters — per-file bounded heaps emit ≤50 rows each, the retained global TakeOrderedAndProject merges; file-rows never reach the exchange",
      "q_ann_sq8_topk" -> "SQ8 ANN (round 8): grid fit is one posexplode aggregate (<=dim rows/task), sq8_encode + sq8_dot are codegen kernels in the scan/scoring projects, shortlist via bounded topk_agg, exact rescore joins vectors at candidate cardinality — the one approximate search whose WHOLE plan the DuckDB oracle replays",
      "q_ann_ivfpq_topk" -> "IVF-PQ ANN (round 8): coarse cells prune the corpus to nprobe buckets (cid equi-join, probe side broadcast with ONE lut per query via the inner-product decomposition), residual PQ codes score survivors at m bytes/vector, exact rescore at shortlist cardinality — probe fraction x code compression multiply",
      "q_sample_quantiles_rollup" -> "sample-sketch partials (round 8): per-status sample_sketch k-row states (one partial-aggregated exchange of <=k (hash,value) pairs per group x task), the ALL level re-aggregates sketch BINARIES via sample_merge — lossless by the bottom-k union property, rollup input is sketch-cardinality rows",
      "q_heavy_hitters" -> "CMS screen -> exact verify (round 8): the d*w counter matrix broadcasts onto the distinct vocabulary, candidates clearing the estimate threshold broadcast BACK into the token scan (left-semi shape), exact counting groups candidate tokens only — the sketch-then-verify composition in one plan",
      "q_hilbert_cells" -> "Hilbert index (round 8): scan -> project with the hilbert16 codegen kernel (16 quadrant steps per row, no shuffle before the presentation sort) — the layout writer adds exactly one range exchange on the index",
      "q_corpus_overlap_kmv" -> "KMV set ops (round 8): per-source bottom-k sketches (one partial-aggregated exchange), 190 source pairs scored by scalar kmv_union/kmv_jaccard over broadcast sketch ROWS — no second corpus pass, no pairwise shingle join",
      "q_dsv2_time_travel" -> "table-format time travel (round 9): the scan node carries VersionAsOf — the file set comes from snapshot v2's log file (resolved live-first-then-archive), so the overwrite generation the LIVE table holds is invisible to the pinned read; zone maps travel WITH the snapshot",
      "q_change_feed_ingest" -> "change-feed incremental ingest (round 9): the delta scan (ChangesSince in its node) plans ONLY the post-v1 files — a file-set difference of two snapshots, no data touched to find it; dedupAgainst then anti-joins 8-byte fingerprints against the baseline (VersionAsOf) scan, full rows shuffling once — work scales with the DELTA, not the corpus",
      "q_dsv2_merge" -> "selective merge read-back (round 9): the plan is the packed head's fingerprint scan — the interesting work happened at commit, where only files whose key range intersected the source's [min,max] were rewritten (candidates picked by the scan's own zone-map refutation; the spec pins the untouched-file carry)",
      "q_moment_rollup" -> "reaggregable moment partials (round 9): ONE corpus scan feeds the per-flag decimal power sums; the ALL level re-aggregates the SUM ROWS (ReusedExchange under the union — spec-asserted) by exact decimal addition; every statistic is computed on group-cardinality frame rows",
      "q_chunk_passages" -> "sliding-window passage chunking (round 9): split + sequence + explode entirely in scan codegen — zero shuffle (spec-asserted); output cardinality ~ tokens/stride, the expected overlap blow-up, materialized only at the presentation sort")
    val md = new StringBuilder
    md ++= "# PLANS — physical plans of headline queries (sf0.01, regenerate via `runMain PlanDump`)\n\n"
    md ++= "What to look for: `ReadSchema` pruned to used columns; `WholeStageCodegen` spans; one `Exchange` per agg/join key; broadcast on dimension sides; `TakeOrderedAndProject` for top-N.\n"
    for ((name, note) <- picks) {
      val df = graft.SparkEntry.queries(name)(spark, dir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      md ++= s"\n## $name\n\n$note\n\n```\n$plan```\n"
    }
    java.nio.file.Files.writeString(java.nio.file.Paths.get("PLANS.md"), md.toString)
    println("wrote PLANS.md")
    spark.stop()
  }
}
