package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import graft.operators._

/** Dumps formatted physical plans for the headline queries →
  * PLANS.md — the audit trail that pushdown / pruning / broadcast /
  * partial-agg hold for the plans we ship. */
object PlanAudit {
  def main(a: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.01"
    val notes = Seq(
      ("q1_pricing_summary", "filter pushed to scan (PushedFilters), 5-column pruned read, partial HashAggregate before the single exchange",
        Relational.q1PricingSummary(spark, d)),
      ("q3_shipping_priority", "all three scans carry pushed filters; both dims broadcast; top-N is TakeOrderedAndProject (no global sort)",
        Relational.q3ShippingPriority(spark, d)),
      ("dwm_order_wide", "fact-fact SMJ on the order key; six dim legs (customer/nation/region/part/supplier/supplier-nation): bounded dims broadcast, growing dims left to AQE; derived fields computed in the final project",
        Dwm.orderWide(spark, d)),
      ("dws_product_stats_w", "window() assignment fused into one HashAggregate pair; COUNT DISTINCT expands to the two-phase plan",
        Dws.productStatsWindowed(spark, d)),
      ("dedup_minhash_lsh", "one signature pass (no distinct), posexplode band fan-out, bucket equi-join with ReuseExchange on the self-join",
        Dedup.minhashLsh(spark, d)),
      ("dedup_ngram_jaccard", "in-row array_distinct (no distinct shuffle); self-join output IS the intersection stream (groupBy count, no candidate re-join); hot branch zero rows on df-uniform corpora",
        Dedup.ngramJaccard(spark, d)),
      ("dws_product_stats_full", "two pruned scans union into a (sku, order) partial agg then a per-sku rollup — explicit two-level distinct, no Expand doubling; event rows collapse into one NULL-key partial per sku",
        Dws.productStatsFull(spark, d)),
      ("q_quantile", "exact percentiles with bounded state: (group, value) counts pre-agg with map-side combine, cumulative-distribution window, conditional-agg neighbor pick — no per-group value buffers",
        Relational.quantiles(spark, d)),
      ("q_asof_join_chunked", "hot-key-safe as-of: (key, chunk) local windows, per-chunk carry row, chunk-granular incoming-carry window — serial work O(chunks) per key",
        AsOfJoin.purchaseAsOfViewChunked(spark, d)),
      ("dwd_cdc_ops", "op filter + payload pruning BEFORE the broadcast-config join; scan stays pruned to the payload columns",
        Dwd.cdcOps(spark, d)),
      ("dim_upsert", "snapshot ∪ updates shuffles ONCE on the dim key into a single window pass (latest-wins MERGE)",
        DimMaintenance.dimUpsert(spark, d)),
      ("dwm_user_jump_strict", "one window pass (lead ts + lead type share the partition sort), filter is codegen'd",
        Dwm.userJumpStrict(spark, d)),
      ("dwm_user_jump_strict_chunked", "hot-key-safe strict jump: (user, chunk) local windows + one chunk-granular lead for the next-chunk-first stitch — serial work O(chunks) per key",
        Dwm.userJumpStrictChunked(spark, d)),
      ("dws_product_stats_incr", "incremental refresh: history and delta partials merge and only partials roll up — the scan split is visible as two filtered reads of lineitem, never a rescan of aggregated history",
        Dws.productStatsIncr(spark, d)),
      ("dim_scd2", "one window pass per key builds every validity range; tombstones close the prior row inside the same sort",
        DimMaintenance.dimScd2(spark, d)),
      ("text_repetition", "no shuffle beyond the presentation sort (which the forced-eval sink eliminates): both shingle arrays materialize once in a narrow Project and every metric is in-row array arithmetic",
        TextOps.repetition(spark, d)),
      ("q_cube", "one Expand (4 grouping sets) into a single partial/final HashAggregate pair — subtotals never rescan",
        Relational.cubeAgg(spark, d)),
      ("dws_visitor_stats_hop", "sliding window() fan-out happens inside Expand/codegen (no self-union of shifted tumbles); two-level exact distinct: (window, type, user) partials then partial-count rollup",
        Dws.visitorStatsHop(spark, d)),
      ("dedup_survivors", "the audited plan is the serving tail: corpus scan anti-joined (BroadcastHashJoin LeftAnti) against the loser ids; the cluster contraction rounds ran before this plan and are frozen into the checkpointed edge scan",
        Clusters.dedupSurvivors(spark, d)),
      ("dedup_minhash_lsh_native", "signature stage is ONE narrow Project (graft_minhash_sig codegen loops) — compare the classic plan's explode + 128-column HashAggregate + shuffle; bands fan out of the in-row array, bucket join unchanged",
        Dedup.minhashLshNative(spark, d)),
      ("q_window_suite", "six window functions (rank/ntile/percent_rank/cume_dist/lag/running sum) collapse into ONE Window node over one partition sort — no repeated exchanges",
        Relational.windowSuite(spark, d)),
      ("q_gapfill", "day spine is explode(sequence()) over the 1-row bounds aggregate of the ALREADY-aggregated daily table (no second orders scan); left join fills gaps",
        Relational.dailyGapfill(spark, d)),
      ("q_org_walk", "Spark 4 recursive CTE: UnionLoop drives the variable-depth chain walk; each level is a distributed filter+project, the tail is one hash aggregate over the loop output",
        Relational.orgWalk(spark, d)),
      ("graph_pagerank", "final round of the damped power iteration: cached edge+degree table (InMemoryTableScan) joins the rank vector, partial-sum before the dst exchange; teleport term is a literal — no count subtree in the loop",
        Graph.pageRank(spark, d)),
      ("pipeline_decontam_ngram", "in-row array_distinct gram fan-out (no global distinct of raw grams), contaminated ids from ONE semi-join keyed on the gram string, LeftAnti back to the corpus",
        Chunking.decontaminateNgram(spark, d)),
      ("ea_path_analysis", "session assignment reuses the lag+running-sum window; the row_number<=8 filter runs BEFORE the path collect, so the aggregate's collect_list is bounded at 8 structs per session",
        EventAnalytics.pathAnalysis(spark, d)),
      ("emb_centroids", "vector column explodes in-place (Generate, no join) and the per-(label,dim) mean is a standard two-phase hash aggregate — partial-aggregable at any vector count",
        Similarity.embCentroids(spark, d)),
      ("q_scd2_pit", "temporal join with NO inequality join: dim change stream ∪ facts shuffle once on the dim key into one ordered window pass (the as-of MERGE); tombstones ride as null-field payload structs",
        DimMaintenance.scd2PointInTime(spark, d)),
      ("dedup_gram_frac", "in-row distinct gram fan-out; the gram-df aggregate joins back to the gram stream (AQE broadcasts the aggregated df table at this SF; at scale both sides hash-partition on the gram key); per-doc rollup is a standard two-phase aggregate — linear in corpus grams",
        Dedup.gramFrac(spark, d)),
      ("ads_rfm", "no global sort anywhere: per-user aggregates once, quartile cuts reduce to 1-row aggregates over tiny distinct-value tables (the only Window sorts those), scores band via a broadcast cross join",
        Ads.rfm(spark, d)),
      ("q_open_orders", "sweep-line: intervals collapse to a partial-aggregable per-day delta table BEFORE the calendar join; the only Window walks the bounded day spine — the O(days x intervals) containment join exists solely in the oracle",
        Relational.openOrders(spark, d)),
      ("dedup_span_extract", "one posexplode keeps gram positions; the shared-gram set is the same distinct+groupBy rollup as gram_frac; the interval-merge fold is one per-doc window over duplicated positions only",
        Dedup.spanExtract(spark, d)),
      ("dedup_span_removal", "token stream anti-joins the span set on the doc_id equi key (range predicate rides inside the join); the rebuild is one per-doc aggregate with an IN-ROW array_sort — no per-token window, shuffle volume is tokens+spans on doc_id",
        Dedup.spanRemoval(spark, d)),
      ("q_skyline", "local dominance sweep per hash bucket (windows partitioned by bkt), THEN the single-partition global window sees only local-skyline survivors — the unpartitioned sort never touches the full point set",
        Relational.skyline(spark, d)),
      ("text_classifier_score", "hash + weight lookup are one narrow codegen'd Project (the weight table is a plan literal); the only exchange is the per-doc (sum, count) rollup with map-side combine",
        TextOps.classifierScore(spark, d)),
      ("emb_knn_graph_lsh", "the scale-path kNN graph: sketch is a narrow Project, 9x probe fan-out via ONE explode, candidates from a bucket EQUI-join (no broadcast nested loop, no all-pairs), per-query window ranks",
        Similarity.knnGraphLsh(spark, d)),
      ("graph_triangles", "degree-ordered adjacency intersection: in-row basket pair fan-out (no lineitem self-join), cached oriented edges + out-lists, triangles close inside array_intersect — no wedge rows anywhere in the plan; credit projections union into one partial-aggregated count",
        Graph.triangles(spark, d)),
      ("pipeline_corpus_report", "ONE documents scan derives token count + fingerprint in-row; dup mass and source totals are two partial-aggregable rollups joined on the bounded source key",
        TextOps.corpusReport(spark, d)),
      ("dedup_incremental", "asymmetric inverted-index admission: the gram join probes with DELTA grams only (corpus x corpus pairs never enumerate); the join output is the intersection stream, verdicts are one per-new-doc window",
        Dedup.incremental(spark, d)),
      ("ea_attribution", "MERGE-form attribution: ONE user-keyed descending window carries the next conversion to every touch (no inequality join); per-conversion row_numbers pick first/last; the rollup is partial-aggregated",
        EventAnalytics.attribution(spark, d)))
    val md = new StringBuilder("# PLANS — formatted physical plans of headline queries\n\n")
    md.append("Regenerate with `sbt \"runMain graft.tools.PlanAudit\"`.\n")
    notes.foreach { case (name, note, df) =>
      md.append(s"\n## $name\n\n$note\n\n```\n")
      md.append(df.queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode))
      md.append("```\n")
    }
    Files.writeString(Paths.get("PLANS.md"), md.toString)
    println("wrote PLANS.md")
    spark.stop()
  }
}
