package graft

/** Shared vocabulary of the two-spec global plan audit:
  *
  *  - [[PlanSpec]]'s "global audit" test covers every LAZY query at build
  *    time (cheap — no execution);
  *  - [[PlanAuditSpec]] covers the [[eager]] remainder by EXECUTING each
  *    one under a SQL-execution listener and auditing every physical plan
  *    the run emits — including the inner jobs (training collects,
  *    iterative-loop rounds, foreachBatch bodies) a build-time read can
  *    never see.
  *
  * Together the two specs assert, for ALL harness queries: no
  * `CartesianProduct` anywhere, and `BroadcastNestedLoopJoin` only where
  * a bounded side is broadcast on purpose ([[bnljAllowed]]). */
object PlanAudit {

  /** BNLJ is legitimate ONLY where a bounded side is broadcast on purpose:
    * the exact-topk broadcast crossJoins, the bounded exact near-dup
    * oracle, the unigram LM's ONE-ROW corpus-total crossed into the
    * vocab table (the shuffle-free alternative to a global window), the
    * centroid verify's dimension-sized (64-row) positions frame crossed
    * into the embeddings as its non-posexplode recompute path, and the
    * ONE-ROW percentile-threshold frames of the outlier gate and the
    * length-bucket boundary assignment. */
  val bnljAllowed: Set[String] = Set("q_sim_topk", "q_dedup_embedding_exact",
    // MMR's candidate generation is cosineTopK's deliberate broadcast
    // cross of the bounded query set into the corpus
    "q_sim_mmr",
    "q_mine_hard_negatives", "q_text_unigram_lp", "q_vec_centroid_verify",
    "q_vec_outliers", "q_length_batches",
    // the dense branch is cosineTopK of a ONE-ROW query-vector frame
    // crossed into the embeddings — the same deliberate broadcast cross
    // as q_sim_topk (was masked in r7: the audit threw on the ts-family
    // analysis error before reaching this query)
    "q_retrieval_rrf",
    // median + MAD / the PSI bin totals are ONE-ROW frames crossed
    // back into the data
    "q_outliers_mad", "q_drift_psi",
    // the |labels|-row prior frame crossed into the scored docs (every
    // doc scores every label) and the |labels|-row totals frame crossed
    // into the vocab for the smoothing grid — both sides wrapped in
    // broadcast(...) at the call site — plus the |ps|-row
    // quantile-threshold frame crossed into the values for the rank count
    "q_classify_nb", "q_quantile_approx_verify",
    // the persistence twin scores under the same |labels|-row prior cross
    "q_classify_nb_reload",
    // the ONE-ROW n/sub summary-stats frame crossed into the exact
    // counts for the missing-heavy-item and global checks
    "q_heavy_hitters_verify",
    // round-14 headliner folds: each headliner now runs its guarantee
    // ledger in-query, inheriting its sibling's sanctioned ONE-ROW
    // scalar crosses (MG summary stats, GK rank counts, the violation/
    // corpus-count combination)
    "q_heavy_hitters", "q_stream_hotkeys", "q_quantile_approx",
    "q_dedup_embedding", "q_dedup_simhash",
    // merged-total (1 row) crossed with the direct global sketch (1 row)
    // for the bit-exact merge-consistency check
    "q_hll_native_verify",
    // ONE-ROW CMS sketch frame crossed into the bounded probe set
    // (estimation per probe item, never per input row)
    "q_cms_native", "q_cms_native_verify",
    // DOULION: the ONE-ROW sampled-triangle count crossed with the
    // ONE-ROW sampled-edge count — scalar combination, never a
    // per-row nested loop
    "q_triangles_approx",
    // the 6σ gate's crossJoins are the same ONE-ROW scalar combinations
    // (T, edge-support totals, the coin-filtered sample count)
    "q_triangles_approx_verify",
    // KMV pair overlap: the `<` self-join runs on the SEGMENT-count
    // sketch/size frames (3 rows → 3 pairs), a deliberate bounded
    // broadcast nested loop; the row-scale work is the one sketch
    // aggregation (and, in the exact sibling, the v-equi-join)
    "q_kmv_overlap", "q_kmv_overlap_exact", "q_kmv_overlap_verify",
    // the same |sources|-row sketch-frame self-join on the winnowed
    // fingerprint sets (5 sources → 10 pairs)
    "q_source_overlap_est", "q_source_overlap_est_verify",
    // expectations audit: the FK rule's ONE-ROW orphan count crossed
    // with the ONE-ROW table total — scalar combination
    "q_expectations",
    // join-size estimate: two ONE-ROW sketch frames crossed (and, in
    // the gate, the ONE-ROW exact count) — scalar combination
    "q_join_size_est", "q_join_size_est_verify",
    // PMI / class keywords: the ONE-ROW corpus-total crossed into the
    // vocab-sized scored table — the same shuffle-free scalar broadcast
    // as q_text_unigram_lp
    "q_text_pmi", "q_text_keywords",
    // interpolated trigram LM: the unigram component's ONE-ROW N frame
    // crossed into the vocab table (identical to q_text_unigram_lp);
    // the ppl-bucket variant adds the ONE-ROW tercile-threshold frame
    // crossed back (the q_vec_outliers pattern); the persistence twin
    // scores under the same reloaded ONE-ROW-cross tables
    "q_text_trigram_lp", "q_text_ppl_buckets", "q_text_trigram_reload",
    // DSIR's only crossJoins are the ONE-ROW corpus totals (n_T, n_R)
    // into the B-row log-ratio table — the q_text_unigram_lp shape
    "q_dsir_weights", "q_dsir_select",
    // the streaming DSIR twin finalizes through the same weights plan
    "q_stream_dsir",
    // the streaming-anomaly gate combines ONE-ROW per-segment
    // mean/stddev threshold frames — scalar combination
    "q_stream_anomalies",
    // ---- inner-job crosses only PlanAuditSpec's executed capture sees
    // (each probed: bounded LocalTableScan / broadcast-exchange sides):
    // PQ ADC search: the BOUNDED query frame broadcasts and crosses the
    // code scan (probe-confirmed BuildRight BroadcastExchange of the
    // 16-row query side) — the q_sim_topk exact-search pattern; the
    // verify twins add the brute-force recall-gate cross of the same
    // bounded query frame
    "q_sim_topk_pq", "q_sim_topk_pq_verify", "q_sim_topk_ivfpq_verify",
    // bounded exact all-pairs cosine (oracle path), now explicitly
    // broadcast at the call site — the q_dedup_embedding_exact pattern
    "q_dedup_semantic_exact",
    // streaming twins of already-allowlisted batch scalar crosses: the
    // |labels|-row NB prior (q_classify_nb), the ONE-ROW CMS sketch
    // frame (q_cms_native), the ONE-ROW MG summary-stats frame
    // (q_heavy_hitters_verify), the ONE-ROW corpus totals of PMI /
    // keywords (q_text_pmi / q_text_keywords), and the segment-count
    // KMV sketch self-join (q_kmv_overlap family) — identical operator
    // code paths, executed per micro-batch / at finalization
    "q_stream_classify", "q_stream_cms", "q_stream_cms_verify",
    "q_stream_hotkeys_verify", "q_stream_pmi", "q_stream_keywords",
    "q_stream_kmv", "q_stream_kmv_verify",
    // the capstone pipelines run the (broadcast) exact semantic cross +
    // the ONE-ROW budget-threshold frames inside their ladders; the
    // multimodal sibling shares the v2 ladder verbatim
    "q_train_pipeline", "q_corpus_pipeline_v2", "q_curate_multimodal",
    // nDCG ranks via cosineTopK of the BOUNDED %25-split query frame
    // (20 rows at sf0.01) crossed into the corpus — the q_sim_topk
    // exact-search pattern feeding the metric; the rank-metric sibling
    // shares that cross and adds the 10-row label-histogram theta join
    // for the corpus-side relevant totals
    "q_eval_ndcg", "q_eval_rankmetrics", "q_eval_map",
    // bitext margin mining: the SAMPLED perturbed src side (30 rows at
    // sf0.01) broadcasts and crosses the tgt corpus — the labeled-
    // oracle path of the q_sim_topk exact-search pattern; the IVF
    // serving gate reruns the same exact miner as its reference
    "q_bitext_mine", "q_bitext_ivf_verify", "q_stream_bitext_mine",
    // the RAG capstone inherits BOTH sanctioned cross shapes: the
    // bounded query-chunk frame broadcast into the chunk corpus (exact
    // baseline + the IVF-PQ probe stage, the q_sim_topk / q_sim_topk_pq
    // patterns) and the ONE-ROW mean-recall gate crossed into the
    // per-query nDCG frame
    "q_rag_pipeline")

  /** Queries whose CONSTRUCTION executes jobs (training collects,
    * iterative loops, scratch writes, streaming micro-batches) — a
    * build-time plan read would either run real work or see only a
    * post-checkpoint stub, so [[PlanAuditSpec]] executes these under the
    * SQL-execution listener and audits every emitted plan instead. */
  val eager: Set[String] = Set(
    // streaming lambdas run a full micro-batch query eagerly and return
    // the already-materialized sink table
    "q_stream_hourly", "q_stream_dedup", "q_stream_dedup_wm",
    "q_stream_sessions", "q_stream_join", "q_stream_upsert",
    "q_stream_classify", "q_stream_hotkeys", "q_stream_hotkeys_verify",
    "q_stream_hll", "q_stream_hll_verify",
    "q_stream_cms", "q_stream_cms_verify", "q_stream_anomalies",
    "q_stream_kmv", "q_stream_kmv_verify", "q_stream_auc",
    "q_stream_bloom", "q_stream_bloom_verify", "q_stream_pmi",
    "q_stream_keywords", "q_stream_curate", "q_stream_dsir",
    "q_stream_quantile", "q_stream_quantile_verify",
    "q_stream_curate_fuzzy", "q_stream_curate_fuzzy_verify",
    "q_stream_ann", "q_stream_ann_verify", "q_stream_multimodal",
    "q_stream_er", "q_stream_pareto",
    // the persistence twins train AND write their model parquet at
    // build time (the q_source_formats writes-scratch category)
    "q_classify_nb_reload", "q_text_trigram_reload",
    "q_bpe_reload_verify", "q_vec_pca_reload_verify",
    // frontier BFS / weighted Bellman-Ford materialize each round +
    // probe the changed-set emptiness at build time (same loop
    // discipline as kCore)
    "q_khop", "q_weighted_paths",
    // the 6σ gate eagerly checkpoints ONE exact triangle frame that
    // T, the per-edge supports, and the coin-filtered DOULION sample
    // all read
    "q_triangles_approx_verify",
    "q_kcore", "q_kcore_verify",
    "q_dedup_cc", "q_er_entities", "q_corpus_pipeline", "q_corpus_pipeline_v2",
    "q_train_pipeline",
    // the multimodal curation capstone checkpoints the v2 survivors at
    // build; the polite crawl loop executes its trap-gate and
    // leak-proof counts (the in-query require()s) at construction
    "q_curate_multimodal", "q_crawl_loop_polite",
    "q_dedup_semantic", "q_dedup_semantic_exact", "q_dedup_semantic_verify",
    "q_sim_topk_ivf", "q_sim_topk_ivf_full", "q_sim_topk_ivf_verify",
    "q_sim_topk_pq", "q_sim_topk_pq_verify",
    "q_sim_topk_ivfpq", "q_sim_topk_ivfpq_verify",
    "q_dedup_embedding_verify", "q_reg_verify", "q_vec_pca_verify",
    "q_source_formats", "q_partition_pruning", "q_join_bucketed",
    "q_zonemap_skip", "q_bloom_index",
    "q_dsir_weights", "q_dsir_select",
    // round-14 folds that localCheckpoint their estimate/fingerprint
    // frame at construction (a build-time plan read would see only the
    // post-checkpoint stub)
    "q_quantile_native", "q_source_overlap_est",
    // round-17: the preference-pair and best-of-n streaming twins run
    // micro-batches at build; the RAG capstone trains/persists/reloads
    // IVF-PQ models and localCheckpoints its chunk-embedding and
    // retrieval frames
    "q_stream_pref_pairs", "q_stream_bon", "q_stream_sft_tokens",
    "q_stream_ffd", "q_rag_pipeline",
    // round-17 audit-coverage fix: these r15/r16 bounded-runner twins
    // also execute their micro-batches at CONSTRUCTION (and some write
    // scratch), so the lazy global audit only ever saw their
    // post-checkpoint stub unions — the exact gap this list exists to
    // close; they were misclassified from the start
    "q_stream_text_extract", "q_stream_links", "q_stream_images",
    "q_stream_interleaved", "q_stream_sft", "q_stream_markdown",
    "q_stream_tables", "q_stream_traps", "q_stream_anchor_texts",
    "q_stream_robots_gate", "q_stream_seeds", "q_stream_jsonl_source",
    // round-18: the video/audio near-dup matchers localCheckpoint their
    // signature frame before the banded self-join (a build-time read
    // would miss the decode stage), the CC rungs run the pointer-jumping
    // loop at construction, and the three new streaming twins execute
    // their micro-batches at build
    "q_video_neardup", "q_audio_neardup", "q_video_cc", "q_audio_cc",
    "q_stream_video_neardup", "q_stream_audio_neardup",
    "q_stream_interleaved_pack",
    // trains IVF + checkpoints both miner paths at construction; the
    // streaming miner twin runs its micro-batches at build
    "q_bitext_ivf_verify", "q_stream_bitext_mine")
}
