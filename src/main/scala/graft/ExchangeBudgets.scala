package graft

import org.apache.spark.sql.DataFrame

/** Frozen per-query SHUFFLE-EXCHANGE counts (pre-AQE physical plan at
  * sf0.001) — the plan-shape analog of [[BenchBudgets]]' wall-clock
  * freeze: a lost broadcast, a new shuffle, or a decorrelation
  * regression changes this count even when sf0.1 timing noise hides
  * it, so PlanAuditSpec diffs the live plans against this table and
  * demands EXACT equality. Re-freeze deliberately (run
  * `graft.tools.ExchangeAudit`, paste, state the reason in the
  * commit) when a plan legitimately changes shape — in either
  * direction: a silent improvement is also a shape change worth a
  * stated reason.
  *
  * Counts are taken from `queryExecution.sparkPlan` (before adaptive
  * re-planning) so they are deterministic for a fixed query and data
  * layout; AQE may later coalesce or convert some of these at
  * runtime, which is fine — the pin is about the DECLARED shape.
  */
object ExchangeBudgets {
  /** Shuffle exchanges in the declared physical plan. `sparkPlan`
    * precedes EnsureRequirements (no exchanges yet), and AQE hides the
    * input plan behind AdaptiveSparkPlanExec, so the robust probe is
    * the executedPlan's rendering: shuffle exchanges print as
    * `Exchange <partitioning>`, broadcast exchanges as
    * `BroadcastExchange` — the word boundary separates them. */
  def countExchanges(df: DataFrame): Int =
    "(^|\\n)[-+:* ]*Exchange ".r
      .findAllIn(df.queryExecution.executedPlan.toString).length

  val budgets: Map[String, Int] = Map(
    "ads_ab_test" -> 2,
    "ads_active_users" -> 6,
    "ads_basket_affinity" -> 8,
    "ads_churn" -> 4,
    "ads_cohort_ltv" -> 4,
    "ads_gmv" -> 2,
    "ads_gmv_anomaly" -> 2,
    "ads_gmv_ewma" -> 2,
    "ads_new_vs_returning" -> 4,
    "ads_reach_curve" -> 3,
    "ads_revenue_conc" -> 6,
    "ads_rfm" -> 15,
    "ads_trademark_topn" -> 1,
    "ann_bruteforce" -> 2,
    "ann_ivf" -> 2,
    "ann_ivf_pq" -> 2,
    "ann_lsh" -> 2,
    "dedup_bloom_gate" -> 2,
    "dedup_clusters" -> 2,
    // r11 PPJoin-style positional bound: per-doc (sz, hc) stats agg +
    // two stat joins moved above the verify join + the explicit (i, j)
    // reuse exchange — static count up 13 → 21, runtime work DOWN
    // (5×-data growth 9.2× → 3.2×, BENCH_NOTES r11)
    "dedup_containment" -> 21,
    "dedup_embedding" -> 4,  // r12 derived band geometry: +2 bounded
                             // exchanges (the 1-row count→(w,ntab)
                             // scalar) buy LINEAR candidates at any n
                             // — the fixed 8×8 layout was n²/256
    "dedup_exact" -> 2,
    "dedup_gram_frac" -> 3,
    "dedup_incremental" -> 8,
    // r10 minhash replan: set-based verify adds one doc_id exchange to
    // the column variant; the native variant's shuffle_hash-hinted
    // band join + twice-referenced sets plan count 8 statically, but
    // ReuseExchange collapses the band index and sets duplicates at
    // runtime (2 ReusedExchange in the final AQE plan) — the point of
    // the hint: a broadcast build has no exchange to reuse and
    // recomputed the whole scan→shingle→signature subplan.
    "dedup_minhash_lsh" -> 6,
    "dedup_minhash_lsh_native" -> 8,
    "dedup_ngram_jaccard" -> 22,
    "dedup_semantic" -> 3,
    "dedup_simhash_wide" -> 3,
    "dedup_simhash" -> 3,
    "dedup_span_extract" -> 4,
    "dedup_span_removal" -> 5,
    "dedup_survivors" -> 3,
    "dim_scd2" -> 2,
    "dim_scd2_incr" -> 7,
    "dim_upsert" -> 2,
    "dq_freshness" -> 3,
    "dq_profile" -> 2,
    "dq_profile_approx" -> 3,
    "dq_rules" -> 6,
    "dq_volume_anomaly" -> 2,
    "dwd_cdc_ops" -> 1,
    "dwd_cdc_route" -> 1,
    "dwd_clean" -> 1,
    "dwd_dirty" -> 1,
    "dwd_new_user_flag" -> 2,
    "dwd_props_explode" -> 1,
    "dwd_split" -> 1,
    "dwm_order_wide" -> 3,
    "dwm_payment_wide" -> 1,
    "dwm_unique_visit" -> 2,
    "dwm_user_jump" -> 2,
    "dwm_user_jump_chunked" -> 4,
    "dwm_user_jump_strict" -> 2,
    "dwm_user_jump_strict_chunked" -> 4,
    "dws_keyword_stats" -> 2,
    "dws_keyword_stats_dict" -> 2,
    "dws_keyword_stats_w" -> 2,
    "dws_product_stats" -> 3,
    "dws_product_stats_full" -> 3,
    "dws_product_stats_incr" -> 4,
    "dws_product_stats_w" -> 3,
    "dws_province_stats" -> 3,
    "dws_visitor_stats" -> 4,
    "dws_visitor_stats_chunked" -> 6,
    "dws_visitor_stats_hop" -> 3,
    "ea_attribution" -> 7,
    "ea_attribution_chunked" -> 11,
    "ea_funnel" -> 7,
    "ea_funnel_windowed" -> 7,
    "ea_out_of_order" -> 2,
    "ea_out_of_order_chunked" -> 5,
    "ea_path_analysis" -> 2,
    "ea_pivot_counts" -> 3,
    "ea_retention" -> 4,
    "ea_sessionize" -> 2,
    "ea_sessionize_chunked" -> 5,
    "ea_sessionize_native" -> 2,
    "ea_sequence_count" -> 3,
    "ea_streaks" -> 3,
    "ea_transitions" -> 3,
    "ea_transitions_chunked" -> 5,
    "emb_ann_recall" -> 6,
    "emb_centroids" -> 2,
    "emb_dim_stats" -> 2,
    "emb_knn_graph" -> 3,  // r11: +1 for the in-plan corpus-bound guard's 1-row count
    "emb_knn_graph_lsh" -> 4,
    "emb_outliers" -> 6,
    "emb_pca" -> 1,
    "emb_quantize_int8" -> 3,
    "emb_rp_project" -> 1,
    "emb_whiten" -> 1,
    "graph_adamic_adar" -> 2,  // r9: distinct() fused into collect_set — one z shuffle
    "graph_bfs" -> 1,
    "graph_degree_stats" -> 4,
    "graph_jaccard" -> 6,  // r9: same fusion; the kept-reuse legs each drop the distinct exchange
    "graph_kcore" -> 1,
    "graph_label_prop" -> 1,
    "graph_pagerank" -> 0,
    "graph_triangles" -> 0,
    "mm_audio_resample" -> 1,
    "mm_chunk_binary" -> 1,
    "mm_decode_pipeline" -> 1,
    "mm_frame_sample" -> 1,
    "mm_image_decode" -> 1,
    "mm_image_resize" -> 1,
    "mm_reassemble" -> 2,
    "mm_scene_cut" -> 1,
    "mm_video_container" -> 1,
    "pipeline_corpus_report" -> 5,
    "pipeline_decontam" -> 2,
    "pipeline_decontam_ngram" -> 3,
    "pipeline_mix_plan" -> 2,
    "q10_returned_items" -> 1,
    "q15_top_supplier" -> 4,
    "q11_important_parts" -> 4,
    "q14_promo_revenue" -> 1,
    "q16_supplier_diversity" -> 2,
    "q17_small_quantity" -> 2,
    "q18_large_orders" -> 1,
    "q19_discounted_or" -> 1,
    "q1_pricing_summary" -> 2,
    "q12_ship_priority" -> 2,
    "q20_excess_supply" -> 3,
    "q6_forecast_revenue" -> 1,
    "q8_market_share" -> 4,
    "q21_wait_suppliers" -> 3,
    "q22_sales_opportunity" -> 3,
    "q2_min_cost_supplier" -> 5,
    "q3_shipping_priority" -> 1,
    "q4_order_priority" -> 2,
    "q5_local_volume" -> 2,
    "q7_nation_volume" -> 6,
    "q9_product_profit" -> 3,
    "q_approx_distinct" -> 3,
    "q_asof_join" -> 2,
    "q_asof_join_chunked" -> 4,
    "q_asof_join_tol" -> 2,
    "q_asof_join_tol_chunked" -> 4,
    "q_asof_nearest" -> 2,
    "q_asof_nearest_chunked" -> 4,
    "q_bitmap_distinct" -> 3,
    "q_bitmap_intersect" -> 3,
    "q_correlated_avg" -> 2,
    "q_countmin" -> 1,
    "q_cube" -> 2,
    "q_custdist" -> 3,
    "q_full_outer" -> 3,
    // r13: dim-side distinct+sort only — the fact side reaches the agg
    // through DPP-pruned scans with no fact-table shuffle before the
    // final group-by-month (3 months of rows post-pruning)
    "q_fact_dt_scan" -> 2,
    "q_gapfill" -> 2,
    "q_grouping_sets" -> 2,
    "q_heavy_hitters" -> 4,
    "q_histogram" -> 3,
    "q_hll_presketch" -> 5,
    "q_listagg" -> 2,
    "q_median_mad" -> 8,
    "q_mode" -> 3,
    "q_open_orders" -> 4,
    "q_org_walk" -> 2,
    "q_quantile" -> 3,
    "q_quantile_approx" -> 2,
    "q_range_join" -> 2,
    "q_rolling_window" -> 2,
    "q_rollup" -> 2,
    "q_scd2_pit" -> 2,
    "q_semi_anti" -> 1,
    "q_set_ops" -> 2,
    "q_skyline" -> 4,
    "q_snapshot_diff" -> 3,
    "q_theta_intersect" -> 5,
    "q_unpivot" -> 1,
    "q_window_rank" -> 2,
    "q_window_suite" -> 2,
    "text_chunk" -> 1,
    "text_classifier_score" -> 2,
    "text_entropy" -> 4,
    "text_fingerprint" -> 1,
    "text_hash_split" -> 1,
    "text_lang_id" -> 1,
    "text_length_hist" -> 2,
    "text_lm_bigram" -> 9,
    "text_lm_score" -> 6,  // r12 vocab-cap replan: +1 bounded exchange
                           // (top-V model selection) but the
                           // corpus-sized term stream now takes a
                           // BROADCAST join instead of a shuffle —
                           // every remaining exchange is vocab- or
                           // doc-keyed, none is the token stream
    "text_ngram_freq" -> 2,
    "text_pack" -> 3,
    "text_pii_scrub" -> 1,
    "text_pmi" -> 7,
    "text_quality" -> 1,
    "text_quality_gate" -> 1,
    "text_repetition" -> 1,
    "text_rolling_fp" -> 1,
    "text_sample_stratified" -> 1,
    "text_sample_weighted" -> 2,
    "text_tfidf" -> 6,
    "text_token_count" -> 1,
    "text_winnow" -> 2,
    "ts_acf" -> 4,
    "ts_seasonality" -> 6,
    "ts_cusum" -> 4,
    "ts_holt" -> 4,
  )
}
