package graft

/** Global scale-anti-pattern audit: the physical plan of EVERY
  * registered query is checked for the three shapes that silently stop
  * scaling — cartesian products, nested-loop fallback joins, and
  * windows with no partition spec (all rows through one task). Each
  * exception is WHITELISTED by name with the design reason, so a
  * future formulation change that regresses a query into one of these
  * shapes turns the suite red instead of waiting for a 100× corpus.
  *
  * Plans are inspected at sf0.001 via `sparkPlan` (pre-AQE): join
  * strategy and window partitioning are planning-time choices; AQE
  * re-plans exchanges, never introduces these shapes.
  */
class PlanAuditSpec extends SparkSpec {

  /** Broadcast nested-loop joins: legitimate ONLY where the join
    * predicate is genuinely non-equi AND one side is bounded by
    * design (a literal band table, a capped query set, a declared
    * all-pairs exactness baseline). */
  private val bnlAllowed: Map[String, String] = Map(
    "q_range_join" -> "10-row literal band table broadcast against the fact side",
    "ann_bruteforce" -> "capped query set (8 rows) broadcast; exact baseline by design",
    "ann_lsh" -> "capped query set broadcast; Hamming<=3 bucket predicate is non-equi",
    "ann_ivf" -> "capped query set broadcast; probe-list membership is non-equi",
    "ann_ivf_pq" -> "capped query set broadcast; probe-list membership is non-equi",
    "emb_knn_graph" -> "declared all-pairs exactness baseline; the scale twin emb_knn_graph_lsh is a bucket equi-join",
    // explicit crossJoin(broadcast(<1-row aggregate>)): a corpus-total
    // scalar attached to every row — one row ships, nothing loops
    "ads_rfm" -> "single-row quartile-cut / max-day scalars broadcast to the customer rollup",
    "text_lm_score" -> "single-row corpus-total scalars broadcast to per-doc scores",
    "text_pmi" -> "single-row unigram/bigram total scalars broadcast to pair scores",
    "text_tfidf" -> "single-row doc-count scalar broadcast to per-(doc, term) tf-df rows",
    "q_histogram" -> "single-row min/max/width bounds broadcast to the cents scan",
    "q_theta_intersect" -> "two single-row aggregate scalars (estimate, exact witness) cross-joined",
    "dim_scd2_incr" -> "single-row version-midpoint split scalar broadcast to the CDC stream",
    "ads_basket_affinity" -> "single-row order-total scalar broadcast to the surviving pairs",
    "text_lm_bigram" -> "single-row corpus-total scalar broadcast to the OOV floor (the lm_score pattern)",
    "q22_sales_opportunity" -> "single-row exact-average scalar broadcast to the customer scan",
    "dq_freshness" -> "single-row corpus-max-timestamp scalar broadcast to the per-type rollup",
    "graph_kcore" -> "single-row derived-k scalar broadcast into every peel round's HAVING",
    "q15_top_supplier" -> "single-row max-revenue scalar broadcast to the per-supplier revenue view",
    "q_heavy_hitters" -> "single-row corpus-total scalar broadcast to the k-bounded candidate counts (the n/k threshold)",
    "q11_important_parts" -> "single-row (total value, part count) scalar broadcast to the per-part value view",
    "ads_revenue_conc" -> "single-row total-revenue scalar broadcast to the ranked customer rollup",
    "emb_ann_recall" -> "single-row truth-set-size scalar broadcast to the per-query hit counts",
    "ts_acf" -> "single-row (mean, variance) scalars broadcast to the lag products",
    "ts_cusum" -> "single-row (mean, sd, n) scalars broadcast to the running sums",
    "emb_knn_graph_lsh" -> "single-row derived-nbits scalar broadcast to the sketch mask (the graph_kcore derived-k recipe)",
    "dedup_embedding" -> "single-row derived band-geometry (w, ntab) scalar broadcast to the sig slicer (the knnGraphLsh recipe)",
    "ts_seasonality" -> "single-row (N, S, Q, SS_within) scalars broadcast to the 7-row weekday rollup")

  /** Windows with an empty partition spec: legitimate ONLY where the
    * windowed row set is already reduced to a bounded size (daily
    * grain, local-sweep survivors, distinct value spines). */
  private val globalWindowAllowed: Map[String, String] = Map(
    "q_rolling_window" -> "daily-grain input: one row per day before the 7-day frame",
    "ads_gmv_anomaly" -> "daily-grain input: one row per day before the 7-day stats frame",
    "q_skyline" -> "global sweep sees only per-bucket local-skyline survivors (O(skyline x buckets))",
    "q_gapfill" -> "day spine construction: one row per distinct day",
    "q_open_orders" -> "sweep-line running sum over the day spine: one row per day after the delta rollup",
    "ads_rfm" -> "quartile cuts over per-customer rollups via the bounded CDF walk",
    "q_quantile" -> "global CDF walk over distinct values of a bounded metric domain",
    "ads_active_users" -> "daily-grain activity spine",
    "q_full_outer" -> "daily-grain spine on both sides",
    "dedup_gram_frac" -> "corpus-level gram-df rollup reduced before the window",
    "emb_pca" -> "no window at all in the distributed part; flagged only if one appears",
    "pipeline_mix_plan" -> "source-grain allocation: one row per source after the rollup",
    "ads_gmv_ewma" -> "daily-grain input: one row per day before the 28-term lag chain",
    "graph_kcore" -> "derived-k CDF walk over DISTINCT degree values (value-cardinality-bounded, the q_quantile precedent)",
    "dq_volume_anomaly" -> "daily-grain input: one row per day before the 7-day stats frame (the gmv_anomaly shape)",
    "ads_reach_curve" -> "day-grain running sum over per-day new-user counts (calendar-bounded)",
    "ts_acf" -> "daily-grain input: one sort of the day series produces all lag leads",
    "ts_cusum" -> "daily-grain input: two running windows over the day series",
    "ads_revenue_conc" -> "global rank over the per-customer rollup (the ads_rfm precedent)")

  // plan audits must see the COLD plan: an InMemoryRelation left by an
  // earlier suite running a query that .cache()s an intermediate (the
  // lmScore tf / lmBigram docs discipline; suites share one session)
  // hides every exchange beneath the cache point and silently drifts
  // the pinned counts — clear before every audit
  override protected def withFixture(test: NoArgTest): org.scalatest.Outcome = {
    spark.catalog.clearCache()
    super.withFixture(test)
  }

  test("no registered query plans a cartesian product") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val plan = fn(spark, sf0001).queryExecution.sparkPlan.toString
      if (plan.contains("CartesianProduct")) Some(name) else None
    }
    assert(offenders.isEmpty,
      s"cartesian product in: ${offenders.mkString(", ")}")
  }

  test("nested-loop joins appear only in whitelisted non-equi designs") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val plan = fn(spark, sf0001).queryExecution.sparkPlan.toString
      if (plan.contains("BroadcastNestedLoopJoin") && !bnlAllowed.contains(name))
        Some(name)
      else None
    }
    assert(offenders.isEmpty,
      s"unwhitelisted nested-loop join in: ${offenders.mkString(", ")} — " +
        "either fix the join to an equi form or whitelist it with the design reason")
  }

  test("filters reach the parquet scans and projections prune columns") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import graft.operators.Relational
    def scans(df: org.apache.spark.sql.DataFrame): Seq[FileSourceScanExec] =
      df.queryExecution.sparkPlan.collect { case f: FileSourceScanExec => f }
    // q3 filters three tables (segment equality, two date bounds):
    // every scan must arrive with a non-empty PushedFilters list — a
    // filter evaluated after a full-table read is wrong at 100 TB
    val q3Scans = scans(Relational.q3ShippingPriority(spark, sf0001))
    assert(q3Scans.nonEmpty)
    q3Scans.foreach { sc =>
      val pushed = sc.metadata.getOrElse("PushedFilters", "[]")
      assert(pushed != "[]",
        s"scan of ${sc.metadata.get("Location")} pushed no filters")
    }
    // q1 projects ~7 of lineitem's 16 columns: the scan schema must be
    // pruned (no l_comment, bounded width), not the full table
    val q1Scan = scans(Relational.q1PricingSummary(spark, sf0001)).head
    val read = q1Scan.metadata.getOrElse("ReadSchema", "")
    assert(!read.contains("l_comment") && !read.contains("l_shipinstruct"),
      s"q1 reads unprojected columns: $read")
    assert(q1Scan.schema.fields.length <= 8,
      s"q1 scan width ${q1Scan.schema.fields.length} — pruning failed")
  }

  test("unpartitioned windows appear only where the row set is bounded by design") {
    // detect via the physical WindowExec node: an empty partitionSpec
    // means every row flows through ONE task
    import org.apache.spark.sql.execution.window.WindowExecBase
    def hasGlobalWindow(plan: org.apache.spark.sql.execution.SparkPlan): Boolean =
      plan.collect { case w: WindowExecBase if w.partitionSpec.isEmpty => w }.nonEmpty
    val detected = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      if (hasGlobalWindow(fn(spark, sf0001).queryExecution.sparkPlan)) Some(name)
      else None
    }
    // the detector must actually detect: these two are KNOWN deliberate
    // global windows (daily grain / local-sweep survivors)
    assert(detected.contains("ads_gmv_anomaly") && detected.contains("q_skyline"),
      s"detector failed its own sentinels; detected only: $detected")
    val offenders = detected.filterNot(globalWindowAllowed.contains)
    assert(offenders.isEmpty,
      s"unwhitelisted global window in: ${offenders.mkString(", ")} — " +
        "either partition the window or whitelist it with the boundedness argument")
  }

  /** Aggregate-function classes that are CodegenFallback because Spark
    * has NO codegen path for imperative aggregates at all (they run
    * inside ObjectHashAggregate / SortAggregate, updating a typed
    * buffer once per input row, or produce one scalar per finished
    * group). They are the cost of the operator itself, not an
    * interpreted lambda chain in a per-row projection, so they are
    * allowed globally. */
  private val fallbackAggClasses: Set[String] = Set(
    "HyperLogLogPlusPlus", // approx_count_distinct — Spark built-in imperative agg
    "HllSketchAgg", "HllUnionAgg", "HllSketchEstimate", // DataSketches HLL agg + once-per-group estimate scalar
    "ThetaSketchAgg", "ThetaIntersectCard", // theta sketches: agg + once-per-group intersection scalar
    "BitmapAgg", "BitmapUnionCard", "BitmapAndCard", // graft roaring-style bitmap agg + group-scalar cards
    "TopKFreqAgg", // graft SpaceSaving heavy-hitters agg
    "CollectList", "CollectSet", // bounded-group collection by documented contract at each site
    "PivotFirst") // pivot's per-column first-agg; bounded by the pivoted key domain

  /** Lambda / higher-order-function CodegenFallback sites, pinned
    * EXACTLY per query (the ExchangeBudgets recipe applied to
    * expressions). Every entry carries the boundedness or frequency
    * argument for why interpreted eval is acceptable THERE; a new
    * fallback class appearing anywhere — including in a whitelisted
    * query — turns this suite red. The round-10 lesson this pin
    * protects: an interpreted lambda pipeline on a corpus path
    * multiplied ~7x per row until replaced by the codegen'd
    * `graft_shingles` (functions/Shingles.scala); the native
    * expressions must not silently rot back into lambdas. */
  private val hofLambda = Set("LambdaFunction", "NamedLambdaVariable")
  private val fallbackAllowed: Map[String, (Set[String], String)] = Map(
    "ads_basket_affinity" -> (hofLambda ++ Set("ArraySort"),
      "per-order item sets: bounded by basket size (~few items), sorted once per order"),
    "ann_ivf" -> (hofLambda ++ Set("ArraySort"),
      "probe-list sort over k=8 centroid distances on the capped (8-row) query side only"),
    "ann_ivf_pq" -> (hofLambda ++ Set("ArraySort"),
      "probe-list sort over k=8 centroid distances on the capped query side only"),
    // ann_lsh / dedup_embedding / emb_knn_graph_lsh / emb_ann_recall:
    // REMOVED in r12 — the hyperplane signature fold is now the native
    // codegen'd graft_hyperplane_sig (functions/HyperplaneSig.scala),
    // so the declared 100 TB embedding paths carry no interpreted
    // lambda sites at all
    "dedup_semantic" -> (hofLambda ++ Set("ArraySort"),
      "per-cluster candidate ordering; cluster size bounded by the IVF centroid fan-in"),
    "dedup_span_removal" -> (hofLambda ++ Set("ArraySort", "ArrayTransform"),
      "per-doc matched-span arrays: bounded by spans actually found in the doc"),
    "dwd_cdc_ops" -> (hofLambda ++ Set("ArrayFilter", "ArrayTransform"),
      "CDC envelope op arrays: bounded by ops per envelope, once per CDC record"),
    "dwd_props_explode" -> (Set("JsonToStructs"),
      "from_json is CodegenFallback in Spark itself; no codegen'd JSON parser exists — inherent operator cost"),
    "ea_path_analysis" -> (hofLambda ++ Set("ArrayTransform"),
      "per-session path arrays: bounded by session length after sessionize"),
    "emb_outliers" -> (hofLambda ++ Set("ArrayAggregate", "ArraySort", "ArrayTransform", "ZipWith"),
      "distance fold per row against k=8 broadcast centroids; centroid assembly is a k-bounded collect"),
    "emb_rp_project" -> (hofLambda ++ Set("ArrayTransform"),
      "16 projection coefficients per row, each a native graft_dot; the transform only assembles the output array"),
    "emb_whiten" -> (hofLambda ++ Set("ZipWith"),
      "one centering subtraction per row (dim-bounded); projections are native graft_dot"),
    "mm_chunk_binary" -> (hofLambda ++ Set("ArrayTransform"),
      "chunk-offset assembly per binary row; rows are few and large by design"),
    "mm_reassemble" -> (hofLambda ++ Set("ArrayAggregate", "ArrayTransform"),
      "per-file chunk list: bounded by chunk count per reassembled binary"),
    "mm_scene_cut" -> (hofLambda ++ Set("ArrayAggregate", "ArrayFilter", "ArrayTransform"),
      "per-video frame-delta arrays: bounded by sampled frame count per row"),
    "mm_video_container" -> (hofLambda ++ Set("ArrayAggregate", "ArrayTransform"),
      "per-container frame index arrays: bounded by frames per video row"),
    "q_listagg" -> (hofLambda ++ Set("ArraySort"),
      "per-group value lists: bounded group domain by documented contract"),
    "text_chunk" -> (hofLambda ++ Set("ArrayTransform"),
      "chunk boundary assembly per doc over native-tokenized offsets; bounded by doc token count / chunk size"),
    "text_classifier_score" -> (hofLambda ++ Set("ArrayAggregate", "ArrayTransform"),
      "per-doc score fold over the plan-literal model row; one pass per doc over native tokens"),
    "text_hash_split" -> (hofLambda ++ Set("ArrayAggregate", "ArrayTransform"),
      "split-bucket assembly per doc; one bounded fold per row"),
    "text_lm_bigram" -> (hofLambda ++ Set("ZipWith"),
      "token/lag zip per doc over native tokens; the LM lookup itself is an equi-join"),
    "text_pack" -> (hofLambda ++ Set("ArrayTransform"),
      "per-pack doc-list assembly: bounded by docs per pack (greedy fill)"),
    "text_quality_gate" -> (hofLambda ++ Set("ArrayAggregate", "ArraySort"),
      "per-doc quality folds over native tokens; one pass per doc"),
    "text_repetition" -> (hofLambda ++ Set("ArrayAggregate", "ArraySort"),
      "Gopher repetition folds over native shingles; one pass per doc"),
    "text_winnow" -> (hofLambda ++ Set("ArrayTransform"),
      "window-min selection over native rolling hashes; bounded by doc gram count"),
    "ts_holt" -> (hofLambda ++ Set("ArrayAggregate"),
      "day-grain series fold: one array of ~90 days total, evaluated once"),
    "ts_seasonality" -> (hofLambda ++ Set("ArrayAggregate", "ArraySort", "ArrayTransform"),
      "day-grain series folds: calendar-bounded arrays, evaluated once per series"))

  test("CodegenFallback expressions appear only in the pinned whitelist") {
    val live = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      name -> (CodegenAuditSupport.fallbackClasses(fn(spark, sf0001)) -- fallbackAggClasses)
    }.filter(_._2.nonEmpty).toMap
    // the detector must actually detect: emb_outliers' centroid
    // distance fold is a KNOWN lambda site — if the walker breaks,
    // this catches it (was ann_lsh until its fold went native in r12)
    assert(live.get("emb_outliers").exists(_.contains("ZipWith")),
      s"detector failed its sentinel; emb_outliers classes: ${live.get("emb_outliers")}")
    val offenders = live.toSeq.sortBy(_._1).flatMap { case (name, classes) =>
      fallbackAllowed.get(name) match {
        case None => Some(s"$name: ${classes.toSeq.sorted.mkString(",")} (not whitelisted)")
        case Some((allowed, _)) if classes != allowed =>
          Some(s"$name: live ${classes.toSeq.sorted.mkString(",")} != pinned ${allowed.toSeq.sorted.mkString(",")}")
        case _ => None
      }
    }
    assert(offenders.isEmpty,
      s"CodegenFallback drift — replace with a codegen'd expression (the " +
        s"graft_shingles recipe) or re-pin with a boundedness reason:\n  ${offenders.mkString("\n  ")}")
    val stale = fallbackAllowed.keySet -- live.keySet
    assert(stale.isEmpty,
      s"whitelist entries whose queries no longer have fallback expressions (remove them): $stale")
  }

  test("shuffle-exchange counts match the frozen ExchangeBudgets table exactly") {
    // the plan-shape analog of the BenchBudgets wall-clock freeze: a
    // lost broadcast or a new shuffle changes this count even when
    // sf0.1 timing noise would hide it. EXACT equality both ways — a
    // silent improvement is also a shape change that needs a stated
    // re-freeze (run graft.tools.ExchangeAudit, paste, give the reason
    // in the commit).
    val live = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      name -> ExchangeBudgets.countExchanges(fn(spark, sf0001))
    }.toMap
    val missing = live.keySet -- ExchangeBudgets.budgets.keySet
    assert(missing.isEmpty, s"queries without a frozen exchange count: $missing")
    val stale = ExchangeBudgets.budgets.keySet -- live.keySet
    assert(stale.isEmpty, s"frozen exchange counts without a query: $stale")
    val drifted = live.toSeq.sortBy(_._1).flatMap { case (name, n) =>
      val frozen = ExchangeBudgets.budgets(name)
      if (n != frozen) Some(s"$name: $n (frozen $frozen)") else None
    }
    assert(drifted.isEmpty,
      s"plan-shape drift in: ${drifted.mkString(", ")} — fix the plan " +
        "or re-freeze via graft.tools.ExchangeAudit with a stated reason")
  }
}
