package graft

/** Frozen per-query wall-clock budgets (seconds) at sf0.1 / local[32],
  * cold cache, median of 3, bit_xor(xxhash64(*)) sink — the
  * BASELINE.md contract. Each figure is the larger of the round-3
  * HEAD cold median, the round-2 driver capture, and a 0.30 s floor
  * (absorbing the documented 2-3x host-load spread, which dominates
  * sub-second queries in relative terms), so a budget violation means a
  * PLAN regression, not scheduler noise. [[Bench]] flags any query
  * whose median exceeds 2x its budget; re-freeze deliberately when an
  * operator's plan legitimately changes shape.
  */
object BenchBudgets {
  val budgets: Map[String, Double] = Map(
    "ads_gmv" -> 0.64,
    "ads_gmv_anomaly" -> 1.1,
    "ads_gmv_ewma" -> 0.95,  // frozen r5 (median 0.71)
    // round-6 data-quality/audit family (control q1 1.11)
    "ads_cohort_ltv" -> 1.1,  // frozen r6 (median 0.84)
    "q_custdist" -> 0.85,  // frozen r6 (median 0.66)
    "dq_profile" -> 3.2,  // frozen r6 (median 2.60 — exact 6-way
                          // multi-distinct Expand incl. props strings)
    "dq_rules" -> 0.95,  // frozen r6 (median 0.74)
    "q_snapshot_diff" -> 0.75,  // frozen r6 (median 0.57)
    "text_lm_bigram" -> 1.7,  // frozen r6 (median 1.34, control q1 1.03)
    "text_winnow" -> 1.2,  // re-frozen r10: native Shingles (was 2.0)
    "emb_quantize_int8" -> 0.65,  // frozen r6 (median 0.48)
    "emb_rp_project" -> 0.45,  // frozen r6 (median 0.28)
    "graph_kcore" -> 3.5,  // re-frozen r10: src-partitioned edge cache
                           // (median 3.06; supersedes the r6 early-exit
                           // freeze at 4.0, whose median was 2.94)
    "graph_adamic_adar" -> 4.5,  // kept r9: the r8 1.8x sweep drift was
                                 // settled by a quiet-host BenchOne
                                 // (control 0.8x) at 4.20 after the
                                 // int64-weight + fused-distinct replan
    "dq_volume_anomaly" -> 0.7,  // frozen r6 (median 0.51, control q1 1.10)
    "ads_new_vs_returning" -> 1.7,  // frozen r6 (median 1.31)
    "ads_reach_curve" -> 0.6,  // frozen r6 (median 0.44)
    "mm_scene_cut" -> 1.9,  // frozen r6 (median 1.48, control q1 1.10)
    "q5_local_volume" -> 1.1,  // frozen r6 (median 0.86, control q1 1.04)
    "q16_supplier_diversity" -> 1.4,  // frozen r6 (median 1.08)
    "q22_sales_opportunity" -> 0.7,  // frozen r6 (median 0.51)
    "q4_order_priority" -> 1.0,  // frozen r6 (median 0.77, control q1 1.03)
    "q10_returned_items" -> 0.9,  // frozen r6 (median 0.70)
    // round-7 TPC-H decorrelation wave
    "q2_min_cost_supplier" -> 3.0,  // frozen r7 (median 2.31)
    "q15_top_supplier" -> 1.0,      // frozen r7 (median 0.75)
    "q17_small_quantity" -> 0.75,   // frozen r7 (median 0.55)
    "q18_large_orders" -> 1.25,     // frozen r7 (median 0.93)
    "q21_wait_suppliers" -> 1.45,   // frozen r7 (median 1.10)
    "dq_profile_approx" -> 3.8,     // re-frozen r8: the witness card
                                    // joins the exact Expand profile
                                    // (load-adj median 2.92 — vs the
                                    // exact Expand card at 2.66)
    "mm_video_container" -> 0.85,   // frozen r7 (median 0.64)
    // round-7 second TPC-H wave
    "q7_nation_volume" -> 2.4,      // frozen r7 (median 1.85)
    "q9_product_profit" -> 3.0,     // frozen r7 (median 2.33 — the
                                    // (part,supp) cost agg + rejoin)
    "q11_important_parts" -> 1.45,  // frozen r7 (median 1.10)
    "q14_promo_revenue" -> 0.7,     // frozen r7 (median 0.50)
    "q19_discounted_or" -> 0.85,    // frozen r7 (median 0.63)
    "q20_excess_supply" -> 1.1,     // frozen r7 (median 0.81)
    // round-7 third TPC-H wave (completes all 22 shapes)
    "q6_forecast_revenue" -> 0.65,  // frozen r7 (median 0.46)
    "q8_market_share" -> 2.2,       // frozen r7 (median 1.58 — the
                                    // eight-table star)
    "q12_ship_priority" -> 0.75,    // frozen r7 (median 0.53)
    // round-7 time-series + serving/eval wave (control q1 0.65)
    "ts_acf" -> 1.3,                // frozen r7 (median 0.97)
    "ts_cusum" -> 0.7,              // frozen r7 (median 0.51)
    "ts_seasonality" -> 1.3,        // frozen r8 (load-adj median 0.80)
    "ea_sequence_count" -> 1.1,     // frozen r8 (load-adj median 0.66)
    "ts_holt" -> 2.0,               // frozen r7 (median 1.50 — the
                                    // in-row integer-cent fold)
    "graph_jaccard" -> 3.9,         // frozen r7 (median 2.97 — shares
                                    // adamic_adar's wedge fan-out)
    "ads_ab_test" -> 0.45,          // frozen r7 (median 0.30)
    "ads_revenue_conc" -> 0.85,     // frozen r7 (median 0.63)
    "emb_ann_recall" -> 0.85,       // re-frozen r12: native
                                    // graft_hyperplane_sig (median
                                    // 0.60 — runs BOTH ANN pipelines)
    "dq_freshness" -> 0.7,  // frozen r6 (median 0.52, control q1 1.17)
    "ads_churn" -> 1.55,  // frozen r5 (median 1.20, control q1 1.22)
    "ads_basket_affinity" -> 2.0,  // frozen r5 (median 1.57 with the
                                   // in-row pair fan-out; the okey
                                   // self-join form measured 3.33)
    "ads_trademark_topn" -> 0.85,
    "ads_active_users" -> 1.6,
    "ads_rfm" -> 2.6,
    // ann family re-frozen r4: the native graft_dot expression
    // replaced the interpreted aggregate(zip_with) fold
    "ann_bruteforce" -> 0.45,
    "ann_ivf" -> 0.7,
    "ann_ivf_pq" -> 1.65,  // re-frozen r9: the r8 Lloyd-replay witness
                           // reshape made 1.2 a zero-cushion number
                           // (quiet-host median 1.27)
    "ann_lsh" -> 0.6,  // kept r12: native graft_hyperplane_sig is
                       // plan-neutral at sf0.1's 1k vectors (median
                       // 0.54) — the win is per-row cost at scale
    "dedup_clusters" -> 3.9,  // re-frozen r10: native Shingles (was 6.92)
    "dedup_containment" -> 2.75,  // re-frozen r10: native Shingles (was 6.5)
                                 // left_semi cut (median 4.97; first
                                 // freeze 9.0 from the uncut 7.38 plan)
    "dedup_semantic" -> 1.95,  // re-frozen r12: derived k (floors at
                               // 16 here — the corpus count pass adds
                               // ~0.3 s; median 1.40, and 10× growth
                               // reads 11.5× = linear in candidates)
    "dedup_embedding" -> 1.65,  // re-frozen r12 twice: native
                           // graft_hyperplane_sig (median 0.67) then
                           // the derived band geometry (median 1.19 —
                           // the 1-row count/broadcast stages add
                           // fixed latency and buy linear candidates
                           // at 10×: 28× → 2.0×)
    "dedup_exact" -> 0.3,
    "dedup_minhash_lsh" -> 3.65,
    "dedup_minhash_lsh_native" -> 1.3,  // re-frozen r10: native Shingles (was 2.11)
    "dedup_ngram_jaccard" -> 2.35,  // re-frozen r10: native Shingles (was 4.8)
    "dedup_simhash" -> 1.45,  // re-frozen r10: native Shingles (was 2.72)
    "dedup_simhash_wide" -> 1.6,  // re-frozen r10: native Shingles (was 2.1)
                                  // control q1 1.62 vs 1.09 quiet)
    "dedup_survivors" -> 4.0,  // re-frozen r10: native Shingles (was 6.47)
    "dim_scd2" -> 0.47,
    "dim_scd2_incr" -> 2.1,  // frozen r5 (median 1.63)
    "dim_upsert" -> 0.44,
    "dwd_cdc_ops" -> 0.71,
    "dwd_cdc_route" -> 0.3,
    "dwd_clean" -> 0.3,
    "dwd_dirty" -> 0.3,
    "dwd_new_user_flag" -> 0.32,
    "dwd_props_explode" -> 0.48,
    "dwd_split" -> 0.3,
    "dwm_order_wide" -> 1.6,
    "dwm_payment_wide" -> 0.53,
    "dwm_unique_visit" -> 0.41,
    "dwm_user_jump" -> 0.33,
    "dwm_user_jump_chunked" -> 0.58,
    "dwm_user_jump_strict" -> 0.33,
    "dwm_user_jump_strict_chunked" -> 0.64,
    "dws_keyword_stats" -> 0.3,
    "dws_keyword_stats_dict" -> 0.3,
    "dws_keyword_stats_w" -> 0.4,
    "dws_product_stats" -> 6.37,
    "dws_product_stats_full" -> 2.24,
    "dws_product_stats_incr" -> 2.69,
    "dws_product_stats_w" -> 1.8,
    "dws_province_stats" -> 0.96,
    "dws_visitor_stats" -> 1.15,  // re-frozen r4: 4-dim key + is_new
                                  // first-day agg join (reference
                                  // Tuple4 parity) legitimately adds a
                                  // second events scan + key join
    "dws_visitor_stats_chunked" -> 1.15,
    "dws_visitor_stats_hop" -> 1.05,
    "ea_funnel_windowed" -> 0.44,
    "ea_funnel" -> 0.47,
    "ea_path_analysis" -> 1.50,
    "emb_centroids" -> 0.55,
    "emb_knn_graph" -> 5.7,       // exact all-pairs baseline by design
    "emb_knn_graph_lsh" -> 0.95,  // re-frozen r12: native
                              // graft_hyperplane_sig (median 0.68; the
                              // r8 derived-nbits lever note stands —
                              // nbits=6 at sf0.1, O(n log n) past it)
    "graph_triangles" -> 6.2,     // adjacency-intersection closure
    "graph_label_prop" -> 5.2,    // re-frozen r10: dst-partitioned edge cache
                                  // (median 4.2-4.9; was 6.5, r5 median 5.35;
                                  // 5 sync rounds, priced like the
                                  // pagerank iteration family)
    "pipeline_corpus_report" -> 0.65,
    "emb_outliers" -> 1.45,
    "text_hash_split" -> 0.55,
    "ea_attribution" -> 1.3,
    "ea_attribution_chunked" -> 1.9,  // frozen r5 (quiet-host median 1.50)
    "q_asof_join_tol" -> 0.6,  // frozen r5 (quiet-host median 0.29,
                               // control q1 at 0.39 of budget)
    "q_asof_join_tol_chunked" -> 2.0,  // frozen r5 (median 1.59)
    "q_asof_nearest" -> 1.05,
    "q_asof_nearest_chunked" -> 1.3,  // frozen r5 (quiet-host median
                                      // 1.03; control q1 0.98/2.04)
    "ea_pivot_counts" -> 0.3,
    "ea_retention" -> 0.36,
    "ea_sessionize" -> 0.41,
    "ea_sessionize_chunked" -> 2.11,
    "ea_sessionize_native" -> 0.51,
    "ea_streaks" -> 1.25,  // frozen r5 (quiet-host median 0.97)
    "ea_out_of_order" -> 0.9,  // frozen r5 (median 0.69)
    "ea_out_of_order_chunked" -> 1.1,  // frozen r5 (median 0.84)
    "dedup_gram_frac" -> 1.55,  // re-frozen r10: native Shingles (was 5.2)
    "dedup_span_extract" -> 1.6,  // re-frozen r10: native Shingles (was 5.1)
    "dedup_span_removal" -> 2.65,  // re-frozen r10: native Shingles (was 3.8)
    "dedup_incremental" -> 2.10,  // re-frozen r14: skew-adaptive rare/hot
                                  // candidates (the ngramJaccardDocs
                                  // machinery — dfreq pass + capped index
                                  // + prefix windows) replaced the naive
                                  // gram join, which one boilerplate hot
                                  // gram blows up quadratically (measured
                                  // OOM at 100×-fixed-vocab; 200e9 rows
                                  // on the boiler corpus). Quiet-host
                                  // median-of-5 1.69 (was 1.45, naive)
    "dedup_bloom_gate" -> 1.9,  // frozen r5 (quiet-host median 1.47)
    "emb_whiten" -> 1.65,       // re-frozen r7: exploded (vec_id, pos,
                                // val) oracle-hashable output — 64×
                                // the row count of the old array form
                                // (median 1.28, was 0.93)
    "ea_transitions" -> 1.39,
    "ea_transitions_chunked" -> 1.07,
    "emb_pca" -> 2.0,
    "graph_bfs" -> 8.0,
    "graph_pagerank" -> 10.5,
    "mm_audio_resample" -> 0.60,
    "mm_chunk_binary" -> 0.3,
    "mm_decode_pipeline" -> 0.3,
    "mm_frame_sample" -> 0.3,
    "mm_image_decode" -> 0.3,
    "mm_image_resize" -> 0.55,
    "mm_reassemble" -> 0.39,
    "pipeline_decontam" -> 0.5,
    "pipeline_decontam_ngram" -> 1.1,  // re-frozen r10: native Shingles (was 1.90)
    "q1_pricing_summary" -> 2.04,
    "q3_shipping_priority" -> 0.83,
    "q_approx_distinct" -> 1.22,
    "q_asof_join" -> 0.56,
    "q_asof_join_chunked" -> 1.24,
    "q_bitmap_distinct" -> 1.45,  // frozen r5 (quiet-host median 1.14,
                                  // control q1 at 1.11/2.04)
    "q_bitmap_intersect" -> 0.85,  // frozen r5 (median 0.65)
    "q_histogram" -> 0.75,  // frozen r5 (median 0.55)
    "q_theta_intersect" -> 1.15,  // frozen r5 (median 0.89)
    "emb_dim_stats" -> 0.6,  // frozen r5 (median 0.43)
    "q_median_mad" -> 2.70,  // frozen r5 (median 2.18, control q1 0.94)
    "q_correlated_avg" -> 0.46,
    "q_countmin" -> 1.1,  // re-frozen r7: +count in the sketch agg and
                          // the cms_ok witness (median 0.81, was 0.47-budget)
    "q_cube" -> 0.48,
    "q_full_outer" -> 0.31,
    "q_fact_dt_scan" -> 1.3,  // frozen r13 (steady median 0.97 on a
                              // host at control 1.27; the one-time
                              // layout materialization (~15 s at
                              // sf0.1) lands only in a cold first
                              // iteration and the median absorbs it)
    "q_gapfill" -> 0.35,
    "q_grouping_sets" -> 0.58,
    "q_heavy_hitters" -> 1.05,  // re-frozen r7: sketch-prune + exact-verify
                                // second pass (median 0.79, was 0.30-budget)
    "q_hll_presketch" -> 0.85,  // re-frozen r8: + exact witness pass
    "q_open_orders" -> 1.7,
    "q_org_walk" -> 3.80,
    "q_quantile" -> 1.88,
    "q_quantile_approx" -> 1.75,  // re-frozen r8: + exact CDF probe pass
                              // (load-adj median 1.28)
    "q_range_join" -> 0.43,
    // re-frozen r5: 0.30-floor budgets that sat at the gate's noise
    // level (driver r4 flagged 0.614 s vs the 0.60 cut on a loaded
    // host); raised to clear merely-average-host jitter
    "q_rolling_window" -> 0.45,
    "q_listagg" -> 0.85,  // frozen r5 (quiet-host median 0.66)
    "q_mode" -> 0.85,     // frozen r5 (quiet-host median 0.62)
    "q_scd2_pit" -> 1.0,
    "q_rollup" -> 0.7,
    "q_semi_anti" -> 0.42,
    "q_set_ops" -> 0.61,
    "q_unpivot" -> 0.3,
    "q_window_rank" -> 0.58,
    "q_window_suite" -> 0.3,
    "text_chunk" -> 0.58,
    "text_fingerprint" -> 0.32,
    "text_lang_id" -> 0.64,
    "text_lm_score" -> 1.85,  // re-frozen r12: vocab-capped broadcast
                              // model + OOV floor (median 1.34 — the
                              // +0.6 s over the old shuffle-join plan
                              // is three broadcast-build stages of
                              // fixed latency; the cap removes the
                              // corpus-growing model shuffle that read
                              // 12.6x at 10x in the r11 sweep)
    "text_length_hist" -> 0.50,
    "text_ngram_freq" -> 1.76,
    "text_pack" -> 0.89,
    "text_pmi" -> 2.0,
    "text_entropy" -> 2.1,  // frozen r5 (median 1.62, control q1 1.34)
    "pipeline_mix_plan" -> 1.05,  // frozen r5 (median 0.79)
    "graph_degree_stats" -> 2.1,  // frozen r5 (median 1.60)
    "text_pii_scrub" -> 0.3,
    "text_quality" -> 0.37,
    "text_quality_gate" -> 1.35,  // re-frozen r5 from a quiet-host
                                  // median (driver r4's 2.33 s capture
                                  // sat within ~10% of the old 2.28 cut)
    "text_repetition" -> 1.19,
    "text_rolling_fp" -> 0.3,
    "text_sample_stratified" -> 0.3,
    "text_sample_weighted" -> 0.3,
    "text_tfidf" -> 1.2,  // re-frozen r13: the only 4-round monotonic
                          // drift (0.70 → 0.75 → 0.83 → 0.99 sweep)
                          // re-measured on a QUIET host (q1 control
                          // 0.93) at 0.90 median — no plan change, no
                          // single-round step; re-frozen from the
                          // quiet median with the standard headroom

    "text_token_count" -> 0.3,
    "text_classifier_score" -> 0.9,
    "q_skyline" -> 0.7)
}
