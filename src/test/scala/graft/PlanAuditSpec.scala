package graft

import org.apache.spark.sql.execution.SparkPlan
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}

/** Automated plan-quality audit: every declared query's physical plan
  * must be the plan you'd WANT at scale — no accidental cartesian
  * blowups, whole-stage codegen present. Queries whose semantics
  * genuinely need an all-pairs or scalar-broadcast shape are
  * whitelisted explicitly, so a regression that silently degrades a
  * join to nested-loop fails the build.
  */
class PlanAuditSpec extends SparkSpec {

  private val allPairsByDesign = Set(
    "q224_ordinal_band_report", // 1-row ordinal-thresholds broadcast
                                // crossed into the rule-band projection
    "q226_retention_cohorts", // 1-row corpus-first-date broadcast
                              // crossed into the cohort projection
    "q227_events_zorder_served", // the same 1-row date-anchor broadcast
                                 // at construct
    "q228_collocations", // 1-row corpus-token-total broadcast crossed
                         // into the PMI projection
    "q229_event_anomalies", // 1-row date-anchor (min/max) broadcast
                            // crossed into the day-index projection
    "q232_nb_langid_confusion", // the K-row (5 lang classes) NB model
                                // table broadcast crossed into the
                                // doc × class score spine
    "q233_nb_langid_bits", // the same K-row class-model broadcast cross
    // q234/q235 left this list in r19: the compiled-Viterbi rewrite
    // moved the 1-row piece-mass broadcast cross into construct-time
    // jobs (the collected cost table); the RETURNED plans are
    // kernel + agg + local-relation joins with no cross join
    "q50_nn_brute", // brute-force baseline: the cross join IS the query
    "q19_above_avg_parts", // scalar subquery = 1-row broadcast cross join
    "q49_mixture_sample", // 1-row max-sqrt scalar broadcast to the counts
    "q90_training_manifest", // same 1-row max-sqrt scalar broadcast as q49
    "q133_bpe_training_manifest", // q90's manifest tail (shared code) =
                                  // the same 1-row max-sqrt broadcast
    "q53_ann_ivf", // nCells-row centroid broadcast + 50-query × corpus
                   // brute cross join: the recall-contract baseline
    "q166_ann_recall_report", // the recall report's ground truth IS
                              // q53's 50-query × corpus brute cross
                              // join (sample-bounded, never corpus²),
                              // plus the 1-row truth-count broadcast
    "q59_bm25_search", // 1-row corpus-stats broadcast to every doc
    "q175_hybrid_rrf_search", // q59's 1-row stats broadcast (shared
                              // bm25Scored code) feeding the lexical
                              // ranker of the RRF fusion
    "q177_token_budget_apportionment", // two 1-row scalar broadcasts
                                       // (weight total, leftover) to the
                                       // #sources-row apportionment table
    "q178_source_drift", // the sources × ~dozen-buckets comparison GRID
                         // is a deliberate broadcast cross (+ the 1-row
                         // corpus-total broadcast)
    "q179_drift_catalog_serving", // q178's grid cross, twice (one per
                                  // served version; shared driftReport)
    "q180_vocab_growth", // 1-row min/max-doc-id broadcast deriving the
                         // ingest deciles map-side (q19's scalar shape)
    "q184_retrieval_eval", // q175's 1-row BM25-stats broadcast (shared
                           // rankers) + the 1-row relevance-count
                           // broadcast per variant
    "q169_bm25_catalog_served", // q59's 1-row stats broadcast, read
                                // from the persisted index version
                                // (plus the 1-row df pivot broadcast)
    "q185_hybrid_catalog_served", // q169's served 1-row stats/df
                                  // broadcasts feeding the hybrid
                                  // fusion's lexical ranker
    "q86_pq_adc_topk", // flat-PQ ADC scan: the 50-query LUT broadcast
                       // against every 32-bit code IS the query shape
    "q108_hll_estimate_merge", // 1-row distinct-count broadcast joined
                               // to the 1-row sketch stats (q49's shape)
    "q113_hist_quantile_merge", // 1-row exact-order-stats broadcast joined
                               // to the 1-row served-quantile stats (q108's
                               // shape — both sides aggregate to one row)
    "q121_lm_surprise_score", // 1-row vocabulary-size broadcast to the
                             // scored bigrams (q59's corpus-stats shape)
    "q122_lm_catalog_serving", // the same 1-row vocabulary broadcast,
                              // once per served LM version
    "q157_lm_trigram_score", // q121's 1-row vocabulary broadcast under
                             // the trigram model
    "q161_lm_backoff_score", // the same 1-row vocabulary broadcast in
                             // the backoff score
    "q190_lm_fourgram_score", // q157's 1-row vocabulary broadcast one
                              // order up
    "q191_lm_backoff_chain", // q161's 1-row vocabulary broadcast in
                             // the chained three-order score
    "q188_bm25_batch", // q59's 1-row corpus-stats broadcast feeding
                       // the batch contribution scoring
    "q196_bm25_batch_catalog_served", // the same 1-row stats broadcast,
                                      // read from the persisted index
                                      // version (q169's served shape)
    "q189_hybrid_batch_rrf", // q188's 1-row stats broadcast; the
                             // semantic seat is the ANN bucket join
                             // since round 17 — the 25-row query
                             // frame still broadcasts into the
                             // candidate re-rank (q201's shape)
    "q193_batch_retrieval_eval", // q189's broadcasts + the 1-row
                                 // relevance-count broadcast per
                                 // variant (q184's shape)
    "q201_hybrid_batch_ann_rrf", // q188's 1-row stats broadcast; the
                                 // semantic side is the ANN bucket
                                 // join (keyed) — the 25-row query
                                 // frame still broadcasts into the
                                 // candidate re-rank
    "q195_lm_prune_effect", // q121's 1-row vocabulary broadcast (both
                            // scoring passes) + the 1-row mass-threshold
                            // and model-row-count broadcasts
    "q202_lm_fivegram_score", // the same 1-row vocabulary broadcast at
                              // order 5 (q190's shape)
    "q203_lm_interpolated_score", // the 1-row vocabulary broadcast into
                                  // the six-table interpolated scoring
                                  // join (q191's shape, KN counts)
    "q204_lm_prune_effect_5gram", // q195's exact broadcast set at
                                  // order 5 (vocab + mass threshold +
                                  // model-row counts)
    "q158_lm3_catalog_serving", // q122's per-version 1-row vocabulary
                                // broadcast under the trigram model
    "q153_classifier_cross_corpus", // q121's 1-row vocabulary broadcast in
                              // the serving plan's reference-LM scoring
    "q125_source_overlap_matrix", // the matrix FRAME is a #sources ×
                                 // #sources cross of the per-source
                                 // size aggregate (≤ tens of rows per
                                 // side); the overlap itself equi-joins
                                 // on the shingle hash
    "q126_source_quality_report", // embeds q121's 1-row vocabulary
                                 // broadcast (the LM branch)
    "q127_dsir_sampling", // q121's 1-row vocabulary broadcast, once per
                          // LM (source and target)
    "q138_subword_lm_score", // q121's 1-row vocabulary broadcast over the
                             // subword stream
    "q139_quality_pacing", // q121's vocabulary broadcast + the 1-row
                           // scored-count and quartile-threshold
                           // broadcasts (the q49 scalar-stats shape)
    "q140_tokenizer_version_audit", // 1-row shared-type-count broadcast
                                   // joined to the 2-row version stats
    "q163_classifier_calibration", // 1-row score-bounds broadcast
                                   // crossed with the scored corpus
                                   // (the q139 scalar-stats shape)
    "q150_classifier_threshold_sweep", // the 5-row literal threshold GRID
                                   // broadcast-crossed with the scored
                                   // corpus (every doc × every threshold
                                   // is the sweep's definition; the grid
                                   // side is 5 rows by construction)
    "q209_hashed_threshold_sweep", // the same 5-row grid cross, with the
                                   // grid derived IN-PLAN from a 1-row
                                   // score-bounds broadcast (no driver
                                   // weight array exists for this model)
    "q210_hashed_calibration", // 1-row score-bounds broadcast crossed
                               // with the served scores (q163's shape)
    "q215_lm_kn_mixture_score", // q203's 1-row vocabulary broadcast in
                                // the mixture's six-table score
    "q216_lm_kn_prune_effect" // q204's broadcast set under the mixture:
                              // vocab + mass threshold + model-row
                              // counts, once per scoring pass
    // q81/q87/q91/q97/q98 carried a probe-stage centroid crossJoin
    // until round 8; the compiled top_cells kernel removed it — the
    // serving paths are now all equi-joins and must STAY that way
  )

  private def collectAll(p: SparkPlan): Seq[SparkPlan] =
    graft.tools.PlanWalk.collectAll(p)

  /** Exchange-count budget for EVERY declared query — a shuffle at
    * 100 TB is a full-corpus network pass, so the count is part of each
    * operator's design contract: a refactor that reintroduces a
    * crossJoin+window probe or drops a partial aggregation fails here
    * long before it shows as a bench regression. Budgets are the
    * measured AQE-final counts at sf0.001, maxed across the local[4]
    * and local[8] environments — AQE finalizes a handful of plans
    * differently by parallelism (`scripts/run_main.sh
    * graft.tools.ShuffleCounts` regenerates; update WITH a
    * justification after an INTENTIONAL plan change). Grouped by
    * count; every ≥3 query carries its design justification. */
  private val budgets: Map[String, Int] = {
    // 0 exchanges: limit-only / broadcast-only plans — global top-k via
    // TakeOrderedAndProject, broadcast set-ops, scalar-subquery broadcast
    val b0 = Seq("q16_topk_orders", "q17_segment_setops", "q19_above_avg_parts")
    // 1 exchange: map-side pipeline + a single agg/sort/window pass
    val b1 = Seq("q02_project_scalar", "q05_top_urgent_revenue",
      "q06_forecast_revenue", "q07_customers_no_urgent_orders",
      "q30_text_stats", "q32_quality_score", "q38_redact",
      "q55_doc_chunking", "q57_repetition_scores", "q59_bm25_search",
      "q60_pipeline_example", "q65_interval_join", "q72_frame_samples",
      "q73_media_resize", "q76_random_projection", "q82_minhash_signatures",
      "q85_pq_codes", "q96_ivf_build_exact", "q99_media_ppm_decode",
      "q100_edit_distance_unicode", "q106_media_channel_stats",
      "q107_hll_sketch", "q109_frame_channel_stats", "q112_hist_sketch",
      "q114_wav_channel_stats",
      "q130_bpe_encode", // map-side tokenize→bpe→fingerprint kernels + output sort
      "q154_image_dhash", // map-side ppm decode + dhash kernel + output sort
      "q159_audio_fingerprint", // map-side wav decode + env-hash kernel + output sort
      "q162_pii_mask", // map-side token classify/mask HOFs + output sort
      "q145_bpe_byte_level", // q130's shape over hex-byte symbols — same map-side kernels + sort
      "q172_bpe_roundtrip", // q145's map-side kernel + unhex/compare per row + sort — the decode gate adds zero exchanges
      "q136_bpe_context_chunks", // row-local greedy chunk kernel + posexplode + sort
      "q135_bpe_catalog_serving", // served plan = per-version map-side
                                  // encode over probe docs + union +
                                  // sort; the count folds and the two
                                  // trainings ran eagerly before it
      "q141_quality_classifier_train", // returned plan = the 10-row epoch
                                       // weight table + sort; the R
                                       // training aggregates ran eagerly
                                       // at construct (Lloyd/BPE shape)
      "q142_quality_classifier_apply", // score = literal-weight dot over
                                       // the cached feature frame + sort;
                                       // training ran eagerly at construct
      "q147_classifier_catalog_warm_start", // returned plan = the 10-row
                                       // version×epoch weight table + sort;
                                       // both phases' training and the 4
                                       // catalog ops ran eagerly at construct
      "q151_bpe_byte_level_train", // q131's shape with the hex-byte seed —
                        // same 12-row local-relation return
      "q156_bpe_batched_train", // q131's 12-row local-relation return;
                        // the batched sweeps ran eagerly at construct
      "q208_bpe_greedy_batched_train", // the same local-relation return
                        // (sweep × rank accepted-merge rows); the 3
                        // greedy sweeps ran eagerly at construct
      "q234_unigram_segment", // r19 compiled-Viterbi plan: ONE
                        // word-count agg whose exchange also feeds the
                        // kernel projection + TakeOrdered output — the
                        // DP itself is a map-side kernel over the
                        // cached word table, zero per-round shuffles
                        // (was 2: relational rounds + final join/sort)
      "q131_bpe_train") // the RETURNED merges table is a 12-row local
                        // relation + sort; the R training rounds run
                        // eagerly before this plan (each its own
                        // vocab-sized job, the distributed-Lloyd shape)
    // 2 exchanges: the partial-agg + ordered-output pattern, or an
    // equi-join/rank + ordered-output pair — the workhorse shape
    val b2 = Seq("q01_pricing_summary", "q03_region_revenue",
      "q04_order_priority_semi", "q08_orders_per_customer",
      "q09_distinct_segments", "q11_rollup_sales", "q12_cube_status",
      "q13_top3_orders_per_priority", "q14_running_supplier_qty",
      "q15_event_value_lag", "q18_shipdate_range_join",
      "q20_daily_event_pivot", "q21_event_props_json",
      "q22_union_all_branches", "q23_user_sessions", "q24_asof_last_order",
      "q26_percentiles", "q27_salted_skew_join", "q28_approx_percentile",
      "q29_bucketed_join", "q31_lang_id", "q33_token_counts",
      "q35_vocab_topk", "q36_topk_docs_per_source", "q37_stratified_sample",
      "q39_exact_stats", "q40_dedup_exact", "q46_dedup_clusters",
      "q47_sequence_packing", "q132_bpe_sequence_packing",
      "q137_bpe_fertility",
      "q48_train_val_test", "q50_nn_brute",
      "q148_classifier_source_report", // cached-feature score + docs join
                                       // reduced to a #sources-row agg + sort
      "q150_classifier_threshold_sweep", // cached-feature score × 5-row
                                       // literal grid → 5-row agg + sort
      "q152_curation_pipeline_v2", // the RETURNED plan is stage 4 alone:
                                       // kept-score filter over the cached
                                       // features joined to the cached gate
                                       // + the per-source pack window/agg —
                                       // stages 1-3 (line removal, gates,
                                       // training) materialized into caches
                                       // at construct
      "q129_dedup_survivor_quality",
      "q230_suffix_repeat_coverage", // served span table: the per-doc
                                     // interval-union window + the
                                     // coverage agg share the doc
                                     // partitioning; + ordered output
                                     // (the suffix-rank build runs once
                                     // in the span store)
      "q155_dhash_near_dup", // 7x9 band self-join buckets + candidate
                             // distinct; the hash side is map-side
                             // (q154) and the verify joins broadcast
                             // the 8-byte hash table at fixture scale
      "q160_audio_fp_near_dup", // q155's banded near-dup tail verbatim
                             // over the audio fingerprint
      "q164_dhash_incremental", // new-side-only band probe vs the
                             // corpus bands + candidate distinct; both
                             // hash sides map-side, verify joins
                             // broadcast at fixture scale (q80's
                             // incremental shape on the image family)
      "q168_audio_fp_incremental", // q164's new-side-only band probe
                             // verbatim over the audio fingerprint
      "q171_active_learning_batch", // scored pass reads the CACHED
                             // feature table (training ran at
                             // construct); source join broadcasts +
                             // per-source bounded-heap top_k agg
                             // (round 15: replaced the row_number
                             // window — map-side partial top-5) +
                             // ordered output — 2 exchanges
      "q170_dedup_catalog_serving", // served probe: new-side signature
                             // derivation is map-side; band join vs
                             // the persisted band version + candidate
                             // distinct; verify joins read the
                             // persisted shingle store (broadcast at
                             // fixture scale) — index builds ran at
                             // construct
      "q169_bm25_catalog_served", // served plan: term-filtered postings
                             // pivot agg + top-k TakeOrdered; the
                             // doc-length join and both 1-row stats
                             // crosses broadcast — index builds ran
                             // at construct into the catalog
      "q165_paragraph_lang", // per-paragraph LID is map-side (window
                             // derivation + stopword intersect); one
                             // per-doc partial agg + docs join
                             // (broadcast at fixture scale) + ordered
                             // output — the workhorse 2-exchange shape
      "q51_ann_lsh", "q54_embedding_quantize", "q61_catalog_timetravel",
      "q62_tumbling_windows", "q63_session_windows", "q64_sliding_windows",
      "q66_catalog_merge", "q69_column_profile", "q70_media_inventory",
      "q74_window_ranks", "q77_reservoir_sample", "q78_value_trend",
      "q79_value_histogram", "q81_ann_ivf_served", "q86_pq_adc_topk",
      "q87_ivf_pq_topk", "q91_ivf_pq_rerank", "q97_ann_ivf_two_level",
      "q98_ann_ivf_partial_probe", "q101_ivf_pq_rerank_two_level",
      "q118_hist_catalog_serving", "q119_hll_catalog_serving",
      "q120_cms_catalog_serving")
    // ≥3 exchanges: each count is a named design decision
    val multi = Seq(
      "q10_distinct_parts_per_flag" -> 3, // count-distinct expand + final agg + ordered output
      "q25_approx_distinct" -> 3, // HLL agg + exact-distinct comparison agg + ordered output
      "q34_fingerprint" -> 3, // rolling-hash fingerprint agg + duplicate-group agg + sort
      "q41_dedup_minhash_lsh" -> 4, // band buckets, capped pair expansion, verify join, summary
      "q42_dedup_simhash" -> 3, // simhash bands, hamming verify, ordered summary
      "q43_dedup_ngram_jaccard" -> 4, // shingle df cap, bucket pairs, jaccard verify join, summary
      "q44_dedup_embedding_cosine" -> 4, // LSH bands, capped buckets, exact-cosine verify, summary
      "q45_curation_pipeline" -> 7, // multi-stage filter→dedup→stats pipeline, one agg per stage
      "q49_mixture_sample" -> 5, // per-source counts, max-sqrt broadcast, sample joins, summary
      "q52_intra_label_cosine" -> 4, // label sizes, thinning, pair verify join, per-label agg
      "q53_ann_ivf" -> 10, // sampled KMeans build + serve join + in-query brute recall contract; the MLlib build contributes a session-state-dependent stage count (observed 5-9 across runs) — pinned loose to catch only gross regressions
      "q56_decontamination" -> 5, // train/eval n-gram sides, overlap join, per-doc agg, sort
      "q58_bloom_decontamination" -> 6, // bloom build agg + membership + per-side summaries
      "q67_funnel" -> 6, // per-stage event sequencing: one window/join per funnel step
      "q68_data_quality_report" -> 5, // per-column profile aggregates unioned into one report
      "q71_media_fingerprints" -> 3, // per-media hash, duplicate groups, ordered output
      "q75_pagerank" -> 5, // one equi-join (deg pre-attached to edges) + partial-agg sum per round, checkpoint cadence 4
      "q146_pagerank_catalog_served" -> 5, // q75's per-round shape reading the PERSISTED degree-attached edge/node versions — base build/write ran at construct; the files are the checkpoint
      "q149_line_stats_catalog_serving" -> 5, // per-version probe clean: line-hash left join vs the persisted stats version + per-doc reassembly + union + ordered output; the stats fold ran at construct. +1 in r19: the probe is a slice of the CACHED one-pass line table (was four derivation passes), whose materializing exchange now sits inside the served plan
      "q153_classifier_cross_corpus" -> 4, // the SERVING plan: full-corpus bigrams left-joined against the cached reference LM (bigram + prefix keys) + per-doc agg + ordered score output — reference training ran at construct
      "q80_dedup_incremental" -> 6, // new-side bands, bucket join vs corpus, verify, summaries
      "q83_bloom_decontam_sharded" -> 8, // per-shard bloom build + sharded membership + union summary
      "q84_semantic_dedup" -> 4, // cells, caps, pair verify, summary
      "q88_dedup_edit_distance" -> 7, // exact-copy mass + FastSS deletion-variant neighborhoods + DP verify + summary
      "q89_semantic_dedup_incremental" -> 5, // cells, new∩cell restriction, pool join, verify, summary
      "q90_training_manifest" -> 5, // mixture weights broadcast + per-source sampling + manifest stats
      "q133_bpe_training_manifest" -> 5, // q90's shared manifest tail with the BPE-count gate — the count kernel is map-side, so the shape is identical
      "q92_semantic_dedup_two_level" -> 4, // kernel assignment (no probe shuffle), caps, verify, summary
      "q93_semantic_dedup_inc_two_level" -> 5, // incremental twin of q92 over new∩cell pools
      "q94_semantic_dedup_partial_probe" -> 4, // q92's shape under wProbe < nCoarse
      "q95_semantic_dedup_inc_partial" -> 5, // q93's shape under wProbe < nCoarse
      "q110_semantic_dedup_dist_fit" -> 4, // q92's shape (cells, caps, verify, summary) with the fit done distributedly BEFORE the query plan
      "q111_pixel_semantic_dedup" -> 4, // q84's dedup shape over pixel-derived embeddings — featurization (crop/stats/JL kernels) is entirely map-side and adds ZERO exchanges
      "q116_audio_semantic_dedup" -> 4, // q111's shape with sample-space featurization (wav crop/stats kernels) — same all-map-side featurization argument
      "q134_conv_semantic_dedup" -> 4, // q111's dedup shape over conv-featurized embeddings — resize/conv/pool/project are all map-side kernels, ZERO extra exchanges vs q111
      "q117_catalog_version_diff" -> 4, // CDC diff: full-outer join on the key (2 exchanges) + change-class agg + ordered output — the q66 merge shuffle shape read-side
      "q105_ann_serving_dist_fit" -> 3, // q98's 2 + one extra window pass: the salted rank's stage-1 (qid, salt) sort — the partition bound IS the third exchange
      "q102_cms_sketch" -> 3, // token counts, cell agg, ordered output
      "q103_cms_heavy_hitters" -> 3, // token counts, cell agg, serve probe
      "q163_classifier_calibration" -> 3, // cached-feature score pass: 1-row bounds agg + bin agg + ordered 8-row output; training ran at construct (the q150 shape with bounds instead of the grid)
      "q104_cms_merge" -> 7, // ONE cached tokenization + three sketch aggs over it + 2 full-outer D×W merges; +1 slack — AQE finalizes the cached-relation joins differently depending on suite order
      "q108_hll_estimate_merge" -> 5, // ONE cached distinct-item pass + conditional-MAX register agg + 1-row stats/distinct broadcast; +1 AQE slack like q104
      "q113_hist_quantile_merge" -> 5, // ONE cached scaled-value pass + parity bin agg + 256-row cum/serve windows + exact-order-stat window; +1 AQE slack on the cached-relation joins like q104/q108
      "q115_index_append_occupancy" -> 4, // map-side kernel assignment (zero exchange) + two cell-count aggs + their join + ordered output; measured 3 at local[4], +1 AQE slack on the agg-agg join
      "q121_lm_surprise_score" -> 7, // LM fit (bigram agg + prefix agg + vocab distinct) + bigram-keyed and prefix-keyed doc-side joins + per-doc agg + ordered output — the LM joins broadcast at fixture scale and degrade to shuffle joins declaratively
      "q138_subword_lm_score" -> 7, // q121's pinned LM shape verbatim over the cached BPE subword stream — the encode kernel is map-side, zero extra exchanges
      "q139_quality_pacing" -> 5, // LM score passes read the CACHED scored frame (q121's fit collapses onto it) + value-domain histogram agg + tiny threshold window + per-tier agg + ordered output
      "q140_tokenizer_version_audit" -> 7, // vocabulary-sized only: word-count agg + per-version totals agg + type distinct + per-version type counts + overlap group-by + 1-row shared broadcast + ordered output — no per-document pass anywhere
      "q122_lm_catalog_serving" -> 7, // q121's scoring shape reading persisted LM versions: per version the bigram + prefix joins and per-doc agg; the fit/fold happened before the served plan
      "q157_lm_trigram_score" -> 6, // q121's pinned LM shape one order up: trigram agg + (w1,w2)-prefix agg + vocab distinct + doc-side joins + per-doc agg + ordered output; measured 6 (one fewer than q121 — AQE folds the self-join side)
      "q161_lm_backoff_score" -> 9, // TWO-ORDER model: trigram + bigram count aggs + both prefix-mass aggs + vocab distinct + four doc-side joins + per-doc agg + ordered output — stupid backoff is definitionally a two-model score (the q127 two-LM argument, one statement)
      "q158_lm3_catalog_serving" -> 7, // q122's served shape with trigram counts: per version the trigram + prefix-mass joins and per-doc agg; fit/fold ran at construct
      "q123_repeated_span_coverage" -> 3, // positional-shingle-hash count + repeated-key join + per-doc window/agg — linear in corpus tokens, no pair materialization (ExactSubstr signal)
      "q124_repeated_span_removal" -> 4, // q123's discovery + covered-position distinct + anti-join + ordered per-doc reassembly — the span explosion multiplies only the repeated side
      "q206_repeated_span_coverage_multi" -> 5, // q123's discovery ×3 lengths (AQE folds the shared-scan count aggs) + the unioned variable-length window sweep + per-doc agg
      "q207_repeated_span_removal_multi" -> 6, // q206's three-length discovery + covered-position distinct across Ls + anti-join + ordered per-doc reassembly
      "q125_source_overlap_matrix" -> 6, // distinct (shingle-hash, source) + per-source sizes + hash self-join + pair agg + matrix frame + ordered output — work ∝ Σ per-shingle source-count², never doc pairs
      "q126_source_quality_report" -> 16, // COMPOSITION query: four independent corpus passes (LM surprise 7, span coverage 3, exact-dup 3, lang entropy 2) reduced per-source + the #sources-row report joins — the count is the sum of its proven parts, each budget-pinned standalone
      "q127_dsir_sampling" -> 13, // TWO full LM fit+score passes (source and target, ~6 each: q121's pinned shape) + the per-doc bits join — DSIR is definitionally a two-model query
      "q128_span_decontam" -> 3, // train span-key distinct + eval-side semi-join + per-doc window/agg — q123's linear shape with the repeated set replaced by the train key set
      "q173_split_leakage_audit" -> 4, // q128's 3-exchange span shape with the train/eval sides carved by the hash split + one per-split agg over the ~50-row contamination frame
      "q174_dedup_impact_report" -> 4, // q41's banded pair machinery (bands, caps, verify) feeding min-label clusters (label propagation runs at construct via localCheckpoint) + one per-source partial agg + ordered output
      "q175_hybrid_rrf_search" -> 1, // BOTH rankers are map-side scoring + top-K TakeOrdered (BM25 stats broadcast, hashed-BoW is one fold per doc); rank windows run over the K-row survivors, fusion join is K×K broadcast — the one exchange is the 1-row stats agg
      "q176_lsh_band_precision" -> 3, // q41's banded bucket machinery (band group + pair distinct) + the verdict join-back; verify joins ride the cached signature broadcast
      "q177_token_budget_apportionment" -> 5, // ONE corpus partial agg (per-source weights) + two 1-row broadcasts + the #sources-row rank window + ordered output — the apportionment itself is driver-scale
      "q178_source_drift" -> 6, // ONE corpus (source, bucket) partial agg + three grid-side reductions (source totals / bucket totals / 1-row N) + the grid window + ordered output
      "q179_drift_catalog_serving" -> 7, // TWO q178 served-report tails over the count versions (grid-side only — the corpus-sized count builds run at construct into the catalog) + union + ordered output
      "q180_vocab_growth" -> 5, // the one vocab-proportional exchange (type-hash min-doc agg) + per-decile doc agg + 1-row min/max broadcast + the 10-row grid window + ordered output
      "q181_dedup_lineage" -> 2, // exact-group hash agg + the lineage union sort; the near pass's banded pair machinery and min-label propagation run at construct via localCheckpoint (q174's shape)
      "q182_packing_efficiency_sweep" -> 4, // three q47 pack passes (per-source sort window + partial agg each) over ONE checkpointed counted frame + the 3-row union sort — sweep passes share the tokenize
      "q183_incremental_lineage" -> 13, // the exact-group hash agg + survivor semi-join feeding q80's incremental machinery IN-PLAN (bucket-size agg, new-side and all-side bucket joins, two verify joins — q80's 6-exchange class) + the min-partner agg + lineage union sort; every exchange ∝ batch∩bucket, not corpus
      "q184_retrieval_eval" -> 3, // q175's 1-exchange ranker shape evaluated three ways: per-variant metric aggs over ≤2K-row candidate lists + the 3-row union sort; relevance count is a 1-row broadcast. −1 in r19: the lex/sem rank lists are CACHED (each pipeline ran twice — standalone + inside the RRF fusion — now once; the fusion joins the cached ≤RankK-row lists)
      "q185_hybrid_catalog_served" -> 2, // the SERVED hybrid plan: postings pivot agg + ordered output — index builds (postings shuffle, vector fold) run at construct into the catalog; rankers ride broadcasts
      "q186_pii_exposure_report" -> 2, // map-side plant+classify (q162's shared pass) + ONE per-source partial agg + ordered output
      "q143_line_boilerplate_signals" -> 4, // line-hash distinct-doc count (∝ distinct lines) + hash-keyed join back + per-doc agg + ordered output — map-side line derivation
      "q144_line_boilerplate_removal" -> 5, // q143's dup shape + the per-doc reassembly exchange (the corpus's one unavoidable regroup, q124's) + universe left join
      "q166_ann_recall_report" -> 9, // FOUR candidate sets in one statement since round 15: brute truth window (sample-bounded cross), LSH sig join + window, IVF serve join + window, the mlsh bucket join + candidate distinct + top_k (q187's path), union, truth left join, per-variant agg + ordered output — each path's standalone budget proven by q50/q51/q81/q187
      "q167_dedup_containment" -> 4, // q43's exact shape (df-capped shingle buckets, pair-count agg, two size joins, ordered output) over the doc+excerpt union — the union and planting are map-side, zero extra exchanges vs q43
      "q187_ann_lsh_multitable" -> 3, // multi-table LSH serving: the (tbl, sig) bucket join (signature pack is ONE map-side compiled pass) + candidate distinct + bounded-heap top_k; re-rank vector joins broadcast at fixture scale
      "q194_ann_lsh_multiprobe" -> 3, // q187's bucket-join shape with the 9-key probe explode on the QUERY side only (map-side array explode, zero extra exchanges) — same distinct + top_k tail
      "q196_bm25_batch_catalog_served" -> 3, // q188's served twin: contribution SUM + per-query top_k + the query-table rank window over the TakeOrdered top-31 — index builds ran at construct; docstats/stats ride catalog-read broadcasts, and the query-term ranking reads the committed bm25_terms df version (r19), so the served plan no longer re-aggregates the postings read (was 4)
      "q197_ann_index_versions" -> 5, // q192's 3-exchange probe shape TWICE (once per served version, candidates distinct + top_k each; the v1/v2 appends ran at construct) + the 2-version union sort — AQE folds one exchange across the shared scan
      "q198_hashed_classifier_train" -> 1, // catalog-served train log: one parquet read + the 6-row sort (both trainings ran at construct)
      "q199_hashed_classifier_apply" -> 2, // served feature-table scan joined to the <=2^16-row weight table (broadcast) + per-doc score agg + output sort
      "q200_hashed_classifier_heldout" -> 3, // q199's served score shape on the odd half + the 2-row per-class agreement agg
      "q195_lm_prune_effect" -> 10, // TWO q121-class scoring passes (full + pruned model: each bigram agg reuse + prefix agg + doc-side joins + per-doc agg) over one checkpointed tokenization + the 1-row mass-threshold and model-count broadcasts + the final 1-row report agg
      "q192_ann_lsh_catalog_served" -> 3, // q187's served twin reading the persisted bucket index + vector store: same bucket join + distinct + top_k shape; index builds ran at construct into the catalog
      "q188_bm25_batch" -> 5, // batch BM25: postings agg (the ONE index shuffle) + df agg + 1-row stats agg + per-(query, doc) exact-int contribution SUM + per-query top_k; the 75-row query table and stats broadcast
      "q189_hybrid_batch_rrf" -> 8, // re-pointed to the ANN-served leg (round-16 item #4): identical construction to q201 — lexical chain + sign-LSH bucket join/distinct/re-rank + fusion; the brute broadcast cross now lives only in q193's eval
      "q190_lm_fourgram_score" -> 6, // q157's pinned LM shape one order up: 4-gram agg + (w1,w2,w3)-prefix agg + vocab distinct + doc-side joins + per-doc agg + ordered output
      "q191_lm_backoff_chain" -> 11, // THREE-ORDER model (q161's two-model argument, one level deeper): 4-gram/trigram/bigram count aggs + three prefix-mass aggs + vocab distinct + six doc-side joins + per-doc agg + ordered output — chained stupid backoff is definitionally a three-model score
      "q202_lm_fivegram_score" -> 6, // q190's pinned LM shape one more order up: 5-gram agg + 4-token-prefix agg + vocab distinct + doc-side joins + per-doc agg + ordered output
      "q203_lm_interpolated_score" -> 12, // KN interpolation: 5-gram + 4-gram count aggs, prefix-mass + two continuation-type + two normalizer aggs, vocab distinct, seven doc-side joins + per-doc agg + ordered output — every level priced for every gram is definitionally a six-table score
      "q204_lm_prune_effect_5gram" -> 10, // q195's exact two-pass report shape at order 5: full + pruned scoring passes over one checkpointed tokenization + mass-threshold and model-count broadcasts + the 1-row report agg
      "q205_cdc_view_maintenance" -> 1, // catalog-served maintained view: the diffs + delta folds ran at construct (each a co-partitioned full-outer ∝ the delta); the returned plan unions three ≤#groups-row parquet reads + sort
      "q193_batch_retrieval_eval" -> 19, // q189's full rank construction (lex 5 + sem chain) evaluated FOUR ways since round 16 (annsem row added): per-variant per-query metric aggs + 1-row relevance broadcast + the qrel broadcast-predicate join + 4-row union sort + the ANN bucket-join/distinct/re-rank chain — each list's standalone budget proven by q188/q189/q201
      "q201_hybrid_batch_ann_rrf" -> 8, // q189's lexical chain (bm25 batch scores + top_k) + the ANN semantic leg: bucket join (map-side signatures), candidate distinct, re-rank top_k, full-outer fusion + top-5 + sort — one FEWER exchange than q189's brute broadcast cross
      "q209_hashed_threshold_sweep" -> 4, // served score join-agg (occ scan + broadcast weight table) × the in-plan 5-row grid (1-row base agg broadcast) + 5-row sweep agg + sort — training ran at construct into the store
      "q210_hashed_calibration" -> 4, // the q209 served-score shape with the 1-row bounds broadcast instead of the grid + 8-row bin agg + sort (q163's shape on the hashed model)
      "q211_hashed_active_learning" -> 3, // served score join-agg + docs source join + per-source bounded-heap top_k + ordered output (q171's shape on the hashed model; the weight table broadcasts)
      "q212_curation_pipeline_v3" -> 3, // the SERVED plan (r18 store): kept-score join-agg over the committed occ × weight parquet + gate join + the per-source pack window/agg — stages 1-3 live in the build-once gated-universe store
      "q230_suffix_repeat_coverage" -> 2, // served spans: per-doc interval-union window + the left-join coverage agg ride one doc partitioning; + ordered output (the suffix-rank build runs once in the span store)
      "q231_suffix_repeat_removal" -> 3, // served spans explode to covered positions (distinct) + anti-join + the per-doc reassembly agg + ordered output
      "q232_nb_langid_confusion" -> 6, // r19 SERVED plan (model reads from the nbw/nbcls store; was 16 with the in-plan model build): held-out occ scan → per-doc mass agg + broadcast-w delta agg + the (doc, cls) spine join + argmin window + confusion agg + sort
      "q233_nb_langid_bits" -> 5, // q232's served chain minus the argmin window
      "q235_unigram_prune_train" -> 2, // r19 compiled-Viterbi plan (was 8 relational): the re-segmentation usage agg + ordered output; the pruned vocabulary and its costs join as LOCAL relations (collected at construct — the tokenizer artifact)
      "q213_hashed_char_train" -> 1, // catalog-served char-model train log: one parquet read + the 6-row sort (q198's served shape; the subword build ran at construct)
      "q214_hashed_char_heldout" -> 3, // q200's served score shape over the char-model feature table + the 2-row per-class agreement agg
      "q215_lm_kn_mixture_score" -> 13, // q203's six-table interpolated score + the discount-mass type counts riding the SAME aggs (t5c in the prefix agg, t4c in the normalizer agg) + one extra distinct for t4c — the mixture prices every level for every gram by definition
      "q216_lm_kn_prune_effect" -> 18, // TWO q215 mixture passes (full + pruned model tables, each rebuilding its L5/L4 aggregate set over the checkpointed fit/score tokenizations; L3 + vocab shared) + mass-threshold and model-row-count broadcasts + the 1-row report agg
      "q217_dedup_clusters_incremental" -> 4, // contraction merge: the delta-edge LSH and the merged label table are CACHED (each read twice in the returned plan — uncached the LSH replayed 4×, measured 31 exchanges); the prior-state CC rounds live behind localCheckpoints; what remains = per-cluster agg + the united-count distinct/agg + sort
      "q218_dedup_cluster_catalog" -> 3, // catalog-served cluster summaries: two committed parquet version reads, each one per-cluster agg, + the union output sort — the LSH/CC/merge construction committed versions eagerly at construct (the q205 accounting)
      "q219_phrase_search" -> 2, // row-local shingle tf (zero corpus shuffle) + the per-phrase bounded-heap top_k agg + ordered output
      "q220_phrase_catalog_served" -> 5, // served positional index: per-phrase adjacency joins broadcast the smaller posting list, leaving one per-doc count agg per phrase (3) + the top_k agg + ordered output; the index write's range exchange happens at construct
      "q221_proximity_search" -> 2, // the smaller posting list broadcasts into the pair join, + per-doc min/count agg + ordered output
      "q222_postings_delta" -> 2, // gap window and term agg share the `term` hash partitioning (one exchange serves both) + ordered output
      "q223_ordinal_band_train" -> 1, // store-served cut logs: two committed parquet reads unioned + the 12-row sort (q198's served shape; both cut trainings ran at construct)
      "q224_ordinal_band_report" -> 4, // two full-universe score join-aggs over the served feature table (weight tables broadcast) + the rule-band join + the 3x3 confusion agg/sort
      "q225_weighted_order_sample" -> 2, // map-side priorities + the per-source bounded-heap top_k agg + ordered output
      "q226_retention_cohorts" -> 6, // first-date agg by user + 1-row min broadcast + cohort-size agg + the user-week distinct + the cell agg + ordered output (cohort sizes broadcast into the cell join)
      "q227_events_zorder_served" -> 2, // served probe over the Z-ordered committed version: per-user agg + ordered output (the Z-order write's range exchange happens at construct; the 1-row date anchor broadcasts)
      "q228_collocations" -> 2, // bigram agg + the PERSISTED unigram agg (computed once, broadcast into both join sides and the 1-row total) + the ordered top-20 rides the agg exchange
      "q229_event_anomalies" -> 5) // daily count agg + the dense-spine distinct + the spine left join + the per-type window + ordered output (the 1-row date-anchor broadcast at the scan)
    (b0.map(_ -> 0) ++ b1.map(_ -> 1) ++ b2.map(_ -> 2) ++ multi).toMap
  }

  /** Queries whose AQE-final exchange count is SESSION-STATE-DEPENDENT
    * (cached-relation join finalization differs with suite order and
    * warm state, observed ±1 across regeneration runs on identical
    * code — the r9 q44/q45/q92/q94 finding, confirmed for this set by
    * diffing successive PLAN_BUDGETS.json regenerations). For these
    * the budget may sit 0 OR 1 above the matrix (the matrix catches
    * whichever state the regeneration run hit); everywhere else the
    * budget must EQUAL the measured max, so a real extra exchange on a
    * deterministic plan can never hide behind slack. */
  private val aqeWobble = Set(
    "q41_dedup_minhash_lsh", "q44_dedup_embedding_cosine",
    "q80_dedup_incremental", // observed 5/6 → 6/6 → 5/5 across r10/r11 regenerations
    "q45_curation_pipeline", "q92_semantic_dedup_two_level",
    "q84_semantic_dedup", // observed 4/3 (r11) → 4/4 → 3/4 across three
                          // r11-r12 regenerations on unchanged operator
                          // code — the same cached-relation finalization
                          // wobble as its q92/q94 siblings
    "q166_ann_recall_report", // observed local8 8 → 7 across two r14
                              // regenerations on unchanged code — the
                              // three-path union's joins finalize
                              // differently with session state
    "q183_incremental_lineage", // observed 13/12 ↔ 12/13 across two r14
                                // regenerations on unchanged code — the
                                // incremental machinery's cached-relation
                                // finalization wobble (q80's family)
    "q103_cms_heavy_hitters", // observed local8 3 → 1 across r14
                              // regenerations on unchanged code — the
                              // serve probe's broadcast finalizes away
                              // two exchanges with session state
    "q193_batch_retrieval_eval", // observed local4 15 / local8 16 on the
                                 // first (r15) regeneration — the shared
                                 // rank-construction joins finalize
                                 // differently by parallelism
    "q94_semantic_dedup_partial_probe", "q104_cms_merge",
    "q108_hll_estimate_merge", "q110_semantic_dedup_dist_fit",
    "q111_pixel_semantic_dedup", "q113_hist_quantile_merge",
    "q115_index_append_occupancy", "q116_audio_semantic_dedup",
    "q134_conv_semantic_dedup") // 4/3 across envs on first regeneration —
                                // the same cached-relation finalization
                                // wobble as its q111/q116 siblings

  test("budgets equal the committed measured matrix plus at most one justified slack") {
    // PLAN_BUDGETS.json is regenerated by graft.tools.ShuffleCounts and
    // committed: this check pins every hand-maintained budget to the
    // measured environment matrix, so a "+1 slack" comment can never
    // hide a REAL extra exchange — absorbing one would require
    // regenerating the artifact, which shows as a reviewable git diff.
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.readTree(
      java.nio.file.Paths.get("PLAN_BUDGETS.json").toFile)
    val measured = root.properties().iterator().asScala.map { e =>
      val byEnv = e.getValue.properties().iterator().asScala
        .map(c => c.getKey -> c.getValue.asInt()).toMap
      e.getKey -> byEnv
    }.toMap
    assert(measured.keySet == SparkEntry.queries.keySet,
      "PLAN_BUDGETS.json is stale — regenerate with graft.tools.ShuffleCounts: " +
        s"missing ${SparkEntry.queries.keySet -- measured.keySet}, " +
        s"extra ${measured.keySet -- SparkEntry.queries.keySet}")
    measured.foreach { case (name, byEnv) =>
      assert(byEnv.keySet == Set("local4", "local8"),
        s"$name: incomplete environment matrix ${byEnv.keySet}")
      val mx = byEnv.values.max
      val slack = budgets(name) - mx
      if (name == "q53_ann_ivf")
        // the MLlib KMeans build contributes a session-state-dependent
        // stage count (observed 5-9 across runs); the budget is pinned
        // loose at 10 to catch only gross regressions
        assert(slack >= 0 && budgets(name) == 10,
          s"q53: measured $byEnv vs budget ${budgets(name)}")
      else if (aqeWobble(name))
        assert(slack == 0 || slack == 1,
          s"$name: budget ${budgets(name)} vs measured max $mx — outside the " +
            "documented ±1 AQE wobble; a real plan change needs a budget update " +
            "WITH a regenerated artifact")
      else
        assert(slack == 0,
          s"$name: budget ${budgets(name)} != measured max $mx — either a plan " +
            "regression (fix the operator) or an intentional change " +
            "(regenerate PLAN_BUDGETS.json and justify)")
    }
  }

  test("plan audit over every query: no accidental cartesians, shuffle budgets hold") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    // completeness first: a new query without a budget entry fails here,
    // so the gate can never silently lag the suite
    val missing = SparkEntry.queries.keySet -- budgets.keySet
    assert(missing.isEmpty, s"queries without a shuffle budget: $missing")
    val stale = budgets.keySet -- SparkEntry.queries.keySet
    assert(stale.isEmpty, s"budget entries for retired queries: $stale")
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, "/root/testdata/sf0.001")
      df.collect() // finalize AQE — budgets are AQE-final counts
      val nodes = collectAll(df.queryExecution.executedPlan)
      if (!allPairsByDesign(name)) {
        val bad = nodes.filter {
          case _: CartesianProductExec => true
          case _: BroadcastNestedLoopJoinExec => true
          case _ => false
        }
        assert(bad.isEmpty,
          s"$name contains ${bad.map(_.nodeName).mkString(", ")} — " +
            "an equi-key or bucket structure is missing")
      }
      val n = nodes.count(_.isInstanceOf[ShuffleExchangeExec])
      assert(n <= budgets(name),
        s"$name now plans $n shuffle exchanges (budget ${budgets(name)}) — " +
          "a shuffle crept into the operator")
      spark.catalog.clearCache()
    }
  }

  test("filter pushdown and column pruning reach the parquet scan (q01)") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val df = SparkEntry.queries("q01_pricing_summary")(spark, "/root/testdata/sf0.001")
    val scans = collectAll(df.queryExecution.executedPlan)
      .collect { case f: FileSourceScanExec => f }
    assert(scans.nonEmpty, "no FileSourceScan in q01's plan")
    val scan = scans.head
    // the shipdate predicate must reach the parquet reader, not run post-scan
    assert(scan.metadata("PushedFilters").contains("LessThanOrEqual(l_shipdate"),
      s"filter not pushed: ${scan.metadata("PushedFilters")}")
    // only the 7 referenced columns may be read — a scan of all 16
    // lineitem columns for this query would be a pruning regression
    assert(scan.requiredSchema.fieldNames.toSet == Set(
      "l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
      "l_discount", "l_tax", "l_shipdate"),
      s"column pruning lost: ${scan.requiredSchema.fieldNames.mkString(",")}")
  }

  test("aggregates are partial (map-side combine) before the exchange (q01)") {
    import org.apache.spark.sql.execution.aggregate.HashAggregateExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val df = SparkEntry.queries("q01_pricing_summary")(spark, "/root/testdata/sf0.001")
    val plan = df.queryExecution.executedPlan
    // a partial HashAggregate must sit below the shuffle: the exchange
    // then carries one row per (group × map task), not per input row
    def hasPartialBelowShuffle(p: org.apache.spark.sql.execution.SparkPlan): Boolean =
      collectAll(p).exists {
        case e: ShuffleExchangeExec =>
          collectAll(e.child).exists {
            case h: HashAggregateExec =>
              h.aggregateExpressions.forall(_.mode.toString == "Partial")
            case _ => false
          }
        case _ => false
      }
    assert(hasPartialBelowShuffle(plan),
      s"no map-side partial aggregation:\n${plan.treeString.take(1500)}")
  }

  test("dimension joins broadcast (q03): no shuffle on the small side") {
    import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
    val df = SparkEntry.queries("q03_region_revenue")(spark, "/root/testdata/sf0.001")
    df.collect() // finalize AQE
    val broadcasts = collectAll(df.queryExecution.executedPlan)
      .collect { case b: BroadcastHashJoinExec => b }
    assert(broadcasts.nonEmpty,
      "q03's region/nation dims should join as BroadcastHashJoin")
  }

  test("whole-stage codegen is present in the relational plans") {
    Seq("q01_pricing_summary", "q03_region_revenue", "q05_top_urgent_revenue",
      "q13_top3_orders_per_priority", "q24_asof_last_order",
      "q36_topk_docs_per_source", "q39_exact_stats", "q47_sequence_packing")
      .foreach { name =>
        val df = SparkEntry.queries(name)(spark, "/root/testdata/sf0.001")
        df.collect() // finalize AQE on THIS plan (count() builds another)
        val tree = df.queryExecution.executedPlan.treeString
        // "*(n) " prefixes mark WholeStageCodegen spans (AQE nests the
        // actual nodes inside QueryStageExec wrappers with no children)
        assert(tree.contains("*("),
          s"$name lost whole-stage codegen:\n${tree.take(2000)}")
      }
  }
}
