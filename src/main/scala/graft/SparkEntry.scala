package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory.
  * Each `queries` entry is one operator from the inventory; each
  * `oracleSql` entry is the DuckDB-equivalent ANSI SQL the driver runs
  * on the same parquet tables for the hash compare.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q1PricingSummary(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Core relational surface
    "q1_pricing_summary"   -> (Relational.q1PricingSummary _),
    "q3_shipping_priority" -> (Relational.q3ShippingPriority _),
    "q_semi_anti"          -> (Relational.semiAnti _),
    "q_window_rank"        -> (Relational.windowRank _),
    "q_rollup"             -> (Relational.rollupAgg _),
    "q_cube"               -> (Relational.cubeAgg _),
    "q_correlated_avg"     -> (Relational.correlatedAvg _),
    "q_set_ops"            -> (Relational.setOps _),
    "q_quantile"           -> (Relational.quantiles _),
    "q_quantile_approx"    -> ((sp, dir) => Relational.quantilesApprox(sp, dir)),
    "q_approx_distinct"    -> (Relational.approxDistinct _),
    "q_hll_presketch"      -> (Sketches.hllPreAgg _),
    "q_grouping_sets"      -> (Relational.groupingSets _),
    "q_rolling_window"     -> (Relational.rollingGmv _),
    "q_unpivot"            -> (Relational.unpivotCharges _),
    "q_window_suite"       -> (Relational.windowSuite _),
    "q_full_outer"         -> (Relational.fullOuterDaily _),
    "q_gapfill"            -> (Relational.dailyGapfill _),
    "q_open_orders"        -> (Relational.openOrders _),
    "q_org_walk"           -> (Relational.orgWalk _),
    "q_countmin"           -> ((s, d) => Sketches.countMin(s, d)),
    "graph_pagerank"       -> (Graph.pageRank _),
    "graph_bfs"            -> (Graph.bfs _),
    "q_asof_join"          -> (AsOfJoin.purchaseAsOfView _),
    "q_asof_join_chunked"  -> (AsOfJoin.purchaseAsOfViewChunked _),
    "q_range_join"         -> (AsOfJoin.rangeJoin _),
    // DWD
    "dwd_clean"            -> (Dwd.clean _),
    "dwd_dirty"            -> (Dwd.dirty _),
    "dwd_split"            -> (Dwd.split _),
    "dwd_new_user_flag"    -> (Dwd.newUserFlag _),
    "dwd_cdc_route"        -> (Dwd.cdcRoute _),
    "dwd_cdc_ops"          -> (Dwd.cdcOps _),
    "dwd_props_explode"    -> (Dwd.propsExplode _),
    "dim_upsert"           -> (DimMaintenance.dimUpsert _),
    "dim_scd2"             -> (DimMaintenance.dimScd2 _),
    "q_scd2_pit"           -> (DimMaintenance.scd2PointInTime _),
    // DWM
    "dwm_unique_visit"     -> (Dwm.uniqueVisit _),
    "dwm_user_jump"        -> (Dwm.userJump _),
    "dwm_user_jump_chunked" -> (Dwm.userJumpChunked _),
    "dwm_user_jump_strict" -> (Dwm.userJumpStrict _),
    "dwm_user_jump_strict_chunked" -> (Dwm.userJumpStrictChunked _),
    "dwm_order_wide"       -> (Dwm.orderWide _),
    "dwm_payment_wide"     -> (Dwm.paymentWide _),
    // DWS
    "dws_visitor_stats"    -> (Dws.visitorStats _),
    "dws_product_stats"    -> (Dws.productStats _),
    "dws_product_stats_full" -> (Dws.productStatsFull _),
    "dws_product_stats_incr" -> (Dws.productStatsIncr _),
    "dws_product_stats_w"  -> (Dws.productStatsWindowed _),
    "dws_province_stats"   -> (Dws.provinceStats _),
    "dws_visitor_stats_hop" -> (Dws.visitorStatsHop _),
    "dws_keyword_stats"    -> (Dws.keywordStats _),
    "dws_keyword_stats_dict" -> (Dws.keywordStatsDict _),
    // ADS
    "ads_gmv"              -> (Ads.gmv _),
    "ads_trademark_topn"   -> (Ads.trademarkTopN _),
    "ads_active_users"     -> (Ads.activeUsers _),
    "ads_rfm"              -> (Ads.rfm _),
    // Text analysis
    "text_token_count"     -> (TextOps.tokenCount _),
    "text_quality"         -> (TextOps.quality _),
    "text_lang_id"         -> (TextOps.langId _),
    "text_fingerprint"     -> (TextOps.fingerprintOp _),
    "text_tfidf"           -> ((sp, dir) => TextOps.tfidf(sp, dir)),
    "text_repetition"      -> (TextOps.repetition _),
    "text_quality_gate"    -> (TextOps.qualityGate _),
    "text_lm_score"        -> (TextOps.lmScore _),
    "q_heavy_hitters"      -> ((s, d) => TextOps.heavyHitters(s, d)),
    "text_length_hist"     -> (TextOps.lengthHist _),
    // Dedup
    "dedup_exact"          -> (Dedup.exact _),
    "dedup_ngram_jaccard"  -> (Dedup.ngramJaccard _),
    "dedup_minhash_lsh"    -> (Dedup.minhashLsh _),
    "dedup_minhash_lsh_native" -> (Dedup.minhashLshNative _),
    "dedup_simhash"        -> (Dedup.simhash _),
    "dedup_embedding"      -> ((s, d) => Dedup.embeddingNearDup(s, d)),
    "dedup_clusters"       -> (Clusters.dedupClusters _),
    "dedup_survivors"      -> (Clusters.dedupSurvivors _),
    "dedup_gram_frac"      -> (Dedup.gramFrac _),
    // Similarity search
    "ann_bruteforce"       -> ((s, d) => Similarity.annBruteforce(s, d)),
    "ann_lsh"              -> ((s, d) => Similarity.annLsh(s, d)),
    "ann_ivf"              -> ((s, d) => Similarity.annIvf(s, d)),
    "ann_ivf_pq"           -> ((s, d) => Similarity.annIvfPq(s, d)),
    "emb_centroids"        -> (Similarity.embCentroids _),
    "emb_pca"              -> (Similarity.embPca _),
    // Multimodal plumbing
    "mm_decode_pipeline"   -> (Multimodal.decodePipeline _),
    "mm_image_decode"      -> (Multimodal.imageDecodePipeline _),
    "mm_image_resize"      -> (Multimodal.imageResizePipeline _),
    "mm_audio_resample"    -> (Multimodal.audioResamplePipeline _),
    "mm_chunk_binary"      -> (Multimodal.chunkBinary _),
    "mm_reassemble"        -> (Multimodal.reassemble _),
    "mm_frame_sample"      -> (Multimodal.frameSample _),
    // Event analytics (ADS-adjacent serving shapes)
    "ea_sessionize"        -> (EventAnalytics.sessionize _),
    "ea_sessionize_chunked" -> (EventAnalytics.sessionizeChunked _),
    "ea_sessionize_native" -> (EventAnalytics.sessionizeNative _),
    "ea_path_analysis"     -> (EventAnalytics.pathAnalysis _),
    "ea_funnel"            -> (EventAnalytics.funnel _),
    "ea_funnel_windowed"   -> (EventAnalytics.funnelWindowed _),
    "ea_retention"         -> (EventAnalytics.retention _),
    "ea_pivot_counts"      -> (EventAnalytics.pivotCounts _),
    "ea_transitions"       -> (EventAnalytics.transitions _),
    "ea_transitions_chunked" -> (EventAnalytics.transitionsChunked _),
    // Native Catalyst expression surface
    "text_rolling_fp"      -> (TextOps.rollingFingerprint _),
    "text_chunk"           -> (Chunking.chunk _),
    "text_pii_scrub"       -> (Chunking.piiScrub _),
    "text_ngram_freq"      -> (Chunking.ngramFreq _),
    "pipeline_decontam"    -> (Chunking.decontaminate _),
    "pipeline_decontam_ngram" -> (Chunking.decontaminateNgram _),
    "text_pack"            -> (Sampling.pack _),
    "text_sample_stratified" -> (Sampling.sampleStratified _),
    "text_sample_weighted" -> ((s, d) => Sampling.sampleWeighted(s, d)),
  )

  def oracleSql: Map[String, String] = Map(
    "q1_pricing_summary"   -> Relational.q1Sql,
    "q3_shipping_priority" -> Relational.q3Sql,
    "q_semi_anti"          -> Relational.semiAntiSql,
    "q_window_rank"        -> Relational.windowRankSql,
    "q_rollup"             -> Relational.rollupAggSql,
    "q_cube"               -> Relational.cubeAggSql,
    "q_correlated_avg"     -> Relational.correlatedAvgSql,
    "q_set_ops"            -> Relational.setOpsSql,
    "q_quantile"           -> Relational.quantilesSql,
    "q_grouping_sets"      -> Relational.groupingSetsSql,
    "q_rolling_window"     -> Relational.rollingGmvSql,
    "q_unpivot"            -> Relational.unpivotChargesSql,
    "q_window_suite"       -> Relational.windowSuiteSql,
    "q_full_outer"         -> Relational.fullOuterDailySql,
    "q_gapfill"            -> Relational.dailyGapfillSql,
    "q_open_orders"        -> Relational.openOrdersSql,
    "q_org_walk"           -> Relational.orgWalkSql,
    // q_countmin: the CMS grid is engine/seed-specific → rows-only +
    // spec (exact <= est <= exact + eps*N across partitionings)
    "graph_pagerank"       -> Graph.pageRankSql,
    "graph_bfs"            -> Graph.bfsSql,
    "ea_transitions"       -> EventAnalytics.transitionsSql,
    // chunked variant must produce IDENTICAL output — same oracle
    "ea_transitions_chunked" -> EventAnalytics.transitionsSql,
    "text_ngram_freq"      -> Chunking.ngramFreqSql,
    "pipeline_decontam"    -> Chunking.decontaminateSql,
    "pipeline_decontam_ngram" -> Chunking.decontaminateNgramSql,
    "ann_bruteforce"       -> Similarity.annBruteforceSql,
    "emb_centroids"        -> Similarity.embCentroidsSql,
    // emb_pca: eigenvector extraction is not SQL-expressible → rows-only;
    // SimilaritySpec pins the loadings against planted known directions
    "q_asof_join"          -> AsOfJoin.purchaseAsOfViewSql,
    // chunked variant must produce IDENTICAL output — same oracle
    "q_asof_join_chunked"  -> AsOfJoin.purchaseAsOfViewSql,
    "q_range_join"         -> AsOfJoin.rangeJoinSql,
    "text_chunk"           -> Chunking.chunkSql,
    "text_pii_scrub"       -> Chunking.piiScrubSql,
    // q_approx_distinct / q_hll_presketch: HLL sketches are
    // engine-specific → rows-only + spec (error bound, merge ≡ direct)
    "dwd_clean"            -> Dwd.cleanSql,
    "dwd_dirty"            -> Dwd.dirtySql,
    "dwd_split"            -> Dwd.splitSql,
    "dwd_new_user_flag"    -> Dwd.newUserFlagSql,
    "dwd_cdc_route"        -> Dwd.cdcRouteSql,
    "dwd_cdc_ops"          -> Dwd.cdcOpsSql,
    "dwd_props_explode"    -> Dwd.propsExplodeSql,
    "dim_upsert"           -> DimMaintenance.dimUpsertSql,
    "dim_scd2"             -> DimMaintenance.dimScd2Sql,
    "q_scd2_pit"           -> DimMaintenance.scd2PointInTimeSql,
    "dwm_unique_visit"     -> Dwm.uniqueVisitSql,
    "dwm_user_jump"        -> Dwm.userJumpSql,
    // chunked variant must produce IDENTICAL output — same oracle
    "dwm_user_jump_chunked" -> Dwm.userJumpSql,
    "dwm_user_jump_strict" -> Dwm.userJumpStrictSql,
    "dwm_user_jump_strict_chunked" -> Dwm.userJumpStrictSql,
    "dwm_order_wide"       -> Dwm.orderWideSql,
    "dwm_payment_wide"     -> Dwm.paymentWideSql,
    "dws_visitor_stats"    -> Dws.visitorStatsSql,
    "dws_product_stats"    -> Dws.productStatsSql,
    "dws_product_stats_full" -> Dws.productStatsFullSql,
    // incremental refresh must equal the full recompute — same oracle
    "dws_product_stats_incr" -> Dws.productStatsSql,
    "dws_product_stats_w"  -> Dws.productStatsWindowedSql,
    "dws_province_stats"   -> Dws.provinceStatsSql,
    "dws_visitor_stats_hop" -> Dws.visitorStatsHopSql,
    "dws_keyword_stats"    -> Dws.keywordStatsSql,
    "dws_keyword_stats_dict" -> Dws.keywordStatsDictSql,
    "ads_gmv"              -> Ads.gmvSql,
    "ads_trademark_topn"   -> Ads.trademarkTopNSql,
    "ads_active_users"     -> Ads.activeUsersSql,
    "ads_rfm"              -> Ads.rfmSql,
    "text_token_count"     -> TextOps.tokenCountSql,
    "text_quality"         -> TextOps.qualitySql,
    "text_lang_id"         -> TextOps.langIdSql,
    "text_fingerprint"     -> TextOps.fingerprintSql,
    "text_tfidf"           -> TextOps.tfidfSql,
    "text_repetition"      -> TextOps.repetitionSql,
    "text_quality_gate"    -> TextOps.qualityGateSql,
    "text_lm_score"        -> TextOps.lmScoreSql,
    "text_length_hist"     -> TextOps.lengthHistSql,
    "dedup_exact"          -> Dedup.exactSql,
    "dedup_ngram_jaccard"  -> Dedup.ngramJaccardSql,
    "dedup_clusters"       -> Clusters.dedupClustersSql,
    "dedup_survivors"      -> Clusters.dedupSurvivorsSql,
    "dedup_gram_frac"      -> Dedup.gramFracSql,
    // dedup_minhash_lsh / dedup_simhash / dedup_embedding / ann_* are
    // hash-sketch based (not SQL-expressible) → driver rows-only check;
    // ScalaTest specs assert their semantics against ground truth.
    "mm_decode_pipeline"   -> Multimodal.decodePipelineSql,
    "mm_image_decode"      -> Multimodal.imageDecodePipelineSql,
    "mm_image_resize"      -> Multimodal.imageResizePipelineSql,
    "mm_audio_resample"    -> Multimodal.audioResamplePipelineSql,
    "mm_chunk_binary"      -> Multimodal.chunkBinarySql,
    "mm_reassemble"        -> Multimodal.reassembleSql,
    "mm_frame_sample"      -> Multimodal.frameSampleSql,
    "ea_sessionize"        -> EventAnalytics.sessionizeSql,
    // the chunked variant must produce IDENTICAL output — same oracle
    "ea_sessionize_chunked" -> EventAnalytics.sessionizeSql,
    // native session_window formulation — same sessions, same oracle
    "ea_sessionize_native" -> EventAnalytics.sessionizeSql,
    "ea_path_analysis"     -> EventAnalytics.pathAnalysisSql,
    "ea_funnel"            -> EventAnalytics.funnelSql,
    "ea_funnel_windowed"   -> EventAnalytics.funnelWindowedSql,
    "ea_retention"         -> EventAnalytics.retentionSql,
    "ea_pivot_counts"      -> EventAnalytics.pivotCountsSql,
    "text_pack"            -> Sampling.packSql,
    "text_sample_stratified" -> Sampling.sampleStratifiedSql,
    "text_sample_weighted" -> Sampling.sampleWeightedSql,
    // text_rolling_fp: native hash, not SQL-expressible → rows-only + spec
  )
}
