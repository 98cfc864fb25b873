package graft

/** SQL-surface COMPLETENESS audit (r12 verdict-6): SqlSurfaceSpec
  * proves pure-SQL parity for a curated sample; this suite ENUMERATES
  * the whole surface. Every registered query is mechanically
  * classified by walking its analyzed plan
  * ([[SqlSurfaceAuditSupport.sqlBlockers]]): typed/object operators
  * and RDD-backed roots have no `spark.sql` text form. The
  * DataFrame-only set must equal a declared map (each entry carries
  * its design reason), a second declared map lists queries whose
  * FINAL plan is declarative but whose plan literals are produced by
  * documented driver steps (k-means seeds, PCA basis, bloom bytes,
  * quantile cuts — invisible to the plan walk, enumerated from the
  * judge-audited collect-site list), and the SURVEY §3 table is
  * GENERATED from these maps — the ContractSpec/BASELINE.md recipe,
  * so prose and audit cannot drift. */
class SqlSurfaceAuditSpec extends SparkSpec {

  /** Queries whose plan contains nodes with no SQL surface. */
  private val declaredDfOnly: Map[String, String] = Map(
    "dedup_clusters" -> "driver-iterative star contraction; per-round localCheckpoint leaves a LogicalRDD root",
    "dedup_survivors" -> "derives from dedup_clusters' iterative frame",
    "graph_bfs" -> "driver-iterative frontier expansion (localCheckpoint rounds)",
    "graph_kcore" -> "driver-iterative peel loop (localCheckpoint rounds)",
    "graph_label_prop" -> "driver-iterative label rounds (localCheckpoint rounds)",
    "graph_pagerank" -> "driver-iterative rank rounds (localCheckpoint rounds)",
    "graph_triangles" -> "localCheckpoint-pinned oriented edge frame reused across both closure legs",
    "dws_keyword_stats_dict" -> "per-partition dictionary-segmenter lifecycle (mapPartitions by design — build-rule path (d))",
    "mm_audio_resample" -> "per-partition binary decoder lifecycle (mapPartitions by design)",
    "mm_decode_pipeline" -> "per-partition binary decoder lifecycle (mapPartitions by design)",
    "mm_image_decode" -> "per-partition binary decoder lifecycle (mapPartitions by design)",
    "mm_image_resize" -> "per-partition binary decoder lifecycle (mapPartitions by design)",
    "mm_video_container" -> "per-partition container parser lifecycle (mapPartitions by design)")

  /** Queries whose final plan IS declarative SQL but whose plan
    * literals come from documented bounded driver steps — a pure-SQL
    * user gets the same result only by re-running those steps. */
  private val declaredDriverSteps: Map[String, String] = Map(
    "ann_ivf" -> "k-means centroid literals from the driver Lloyd loop (k-bounded collect)",
    "ann_ivf_pq" -> "k-means + PQ codebook literals from the driver Lloyd loop",
    "dedup_semantic" -> "cluster centroid literals from the driver Lloyd loop",
    "emb_pca" -> "basis literals from the driver power iteration over one collected moment row",
    "emb_whiten" -> "shares emb_pca's driver-derived basis literals",
    "dedup_bloom_gate" -> "bloom filter bytes collected (1 row) into the probe literal",
    "q_quantile_approx" -> "approx-quantile cuts collected into literals for the witness card",
    "q_countmin" -> "<=20-row sketch probe collected into the witness card")

  test("every registered operator is pure-SQL-expressible or declared DataFrame-only, exactly") {
    val live = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      name -> SqlSurfaceAuditSupport.sqlBlockers(fn(spark, sf0001))
    }.filter(_._2.nonEmpty).toMap
    // sentinel: the walker must actually detect a KNOWN typed op
    assert(live.get("mm_image_decode").exists(_.contains("MapPartitions")),
      s"detector failed its sentinel; mm_image_decode: ${live.get("mm_image_decode")}")
    val undeclared = live.keySet -- declaredDfOnly.keySet
    assert(undeclared.isEmpty,
      s"queries with SQL-surface blockers not declared (close or declare with the reason): " +
        undeclared.toSeq.sorted.map(n => s"$n=${live(n).toSeq.sorted.mkString("+")}").mkString(", "))
    val stale = declaredDfOnly.keySet -- live.keySet
    assert(stale.isEmpty,
      s"declared DataFrame-only entries whose queries now classify as SQL-expressible (remove them): $stale")
    // the two declared sets must not overlap and must be real queries
    assert((declaredDriverSteps.keySet & declaredDfOnly.keySet).isEmpty)
    val ghost = declaredDriverSteps.keySet -- SparkEntry.queries.keySet
    assert(ghost.isEmpty, s"driver-step entries that are not registered queries: $ghost")
  }

  /** The generated SURVEY §3 block, markers included. */
  private[graft] def expectedSurveyBlock: String = {
    val total = SparkEntry.queries.size
    val dfOnly = declaredDfOnly.size
    val driver = declaredDriverSteps.size
    val sql = total - dfOnly
    val rows = declaredDfOnly.toSeq.sorted.map { case (n, r) =>
      s"| `$n` | DataFrame-only | $r |"
    } ++ declaredDriverSteps.toSeq.sorted.map { case (n, r) =>
      s"| `$n` | SQL + driver steps | $r |"
    }
    (Seq(
      "<!-- sql-surface-audit:begin (generated by SqlSurfaceAuditSpec — edit the spec, not this block) -->",
      s"$sql of $total registered queries are single-statement SQL over",
      "`Graft.registerViews` + the `graft_*` extension functions",
      s"(mechanical plan-walk: no typed/object operators, no RDD-backed roots).",
      s"$dfOnly are DataFrame-only by design and $driver more are SQL-shaped but",
      "carry documented bounded driver steps whose results ride the plan as",
      "literals:",
      "",
      "| query | class | reason |",
      "|---|---|---|") ++ rows ++ Seq(
      "<!-- sql-surface-audit:end -->")).mkString("\n")
  }

  test("SURVEY §3 SQL-surface table matches the audit maps exactly") {
    val content = scala.io.Source.fromFile("SURVEY.md", "UTF-8").mkString
    val begin = content.indexOf("<!-- sql-surface-audit:begin")
    val end = content.indexOf("<!-- sql-surface-audit:end -->")
    assert(begin >= 0 && end > begin, "SURVEY.md is missing the sql-surface-audit block markers")
    val actual = content.substring(begin, end + "<!-- sql-surface-audit:end -->".length)
    assert(actual == expectedSurveyBlock,
      "SURVEY §3 sql-surface block drifted from the spec's declared maps — " +
        "regenerate it from SqlSurfaceAuditSpec.expectedSurveyBlock")
  }
}
