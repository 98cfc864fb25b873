package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Connected components over the near-duplicate pair graph — the step
  * that turns pairwise dedup output (`Dedup.ngramJaccard` et al.) into
  * duplicate CLUSTERS, so a pipeline can keep exactly one survivor per
  * component (the reference dedups per key in
  * gmall-realtime/src/main/java/com/atguigu/app/dwm/UniqueVisitApp.java;
  * clustering is its corpus-level generalization).
  *
  * Algorithm: alternating large-star / small-star contraction
  * (Kiveris et al., "Connected Components in MapReduce and Beyond",
  * SoCC'14) — converges to per-component stars centered at the
  * component minimum in O(log² n) rounds. Every round is min-aggregates
  * plus equi-joins on the edge list: NO adjacency-list
  * materialization (`collect_list`), so a web-scale hot node — one
  * boilerplate page with millions of near-dup edges — never builds an
  * unbounded in-memory neighbor array; its neighborhood minimum is a
  * map-side-combined `min()`. Each round's output is
  * `localCheckpoint`ed: the loop would otherwise stack a plan per
  * round and re-execute the whole chain every iteration.
  *
  * Convergence is detected from two scalars per round (edge count +
  * order-independent xxhash64 checksum — the only driver-side data in
  * the loop). A SQL-recursive twin was considered and rejected: Spark
  * 4.1 restricts recursive CTEs to UNION ALL
  * (UNION_NOT_SUPPORTED_IN_RECURSIVE_CTE), under which transitive
  * closure on a cyclic dup-graph never terminates — the DuckDB oracle
  * (which does support UNION-dedup recursion) checks this operator by
  * exactly that closure.
  */
object Clusters {

  /** One large-star round: every node connects its strictly-larger
    * neighbors to m = min(Γ(u) ∪ {u}). Input/output edges are
    * canonical (u > v); output stays canonical because v > u ≥ m. */
  private def largeStar(e: DataFrame): DataFrame = {
    val sym = e.select(col("u"), col("v"))
      .unionAll(e.select(col("v").as("u"), col("u").as("v")))
    val mins = sym.groupBy(col("u")).agg(min(col("v")).as("mv"))
    sym.join(mins, "u")
      .filter(col("v") > col("u"))
      .select(col("v").as("u"), least(col("mv"), col("u")).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
  }

  /** One small-star round: every node connects its smaller-side
    * neighborhood Γ⁻(u) ∪ {u} (minus the minimum m itself) to m.
    * Canonical edges already orient high→low, so Γ⁻(u) is exactly the
    * edge rows keyed by u. */
  private def smallStar(e: DataFrame): DataFrame = {
    val mins = e.groupBy(col("u")).agg(min(col("v")).as("mv"))
    e.join(mins, "u")
      .filter(col("v") =!= col("mv"))
      .select(col("v").as("u"), col("mv").as("v"))
      .unionAll(mins.select(col("u"), col("mv").as("v")))
      .distinct()
  }

  /** (count, order-independent content hash) — set-equality witness
    * for the convergence test; bit_xor can't overflow under ANSI mode
    * and the edge set is distinct, so no pair cancels itself. Two
    * scalars to the driver per round. */
  private def checksum(e: DataFrame): (Long, Long) = {
    val r = e.agg(count(lit(1)), bit_xor(xxhash64(col("u"), col("v")))).head()
    (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
  }

  /** Connected components of an undirected edge list (`u`, `v` — any
    * orientation, self-loops ignored). Returns one row per node that
    * appears in an edge: (node, root) where root is the component's
    * minimum node id. */
  def connectedComponents(edges: DataFrame, maxIter: Int = 25): DataFrame = {
    var e = edges
      .select(greatest(col("u"), col("v")).as("u"), least(col("u"), col("v")).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
      .localCheckpoint()
    var sig = checksum(e)
    var converged = sig._1 == 0L
    var iter = 0
    while (!converged && iter < maxIter) {
      val next = smallStar(largeStar(e)).localCheckpoint()
      val nsig = checksum(next)
      converged = nsig == sig
      sig = nsig
      // the superseded round's edge-list blocks are the largest
      // checkpoint litter in the engine — release them NOW, not at
      // driver GC ([[Ckpt]]; next is already materialized)
      Ckpt.release(e)
      e = next
      iter += 1
    }
    require(converged, s"connectedComponents did not converge in $maxIter rounds")
    // fixpoint = per-component stars centered at the minimum: each
    // member row is (member, root); the roots map to themselves
    e.select(col("u").as("node"), col("v").as("root"))
      .unionAll(e.select(col("v"), col("v")).distinct()
        .toDF("node", "root"))
  }

  /** Duplicate clusters over the exact near-dup pairs: every doc that
    * has at least one ≥0.5-Jaccard partner, labeled with its
    * component's minimum doc_id (the canonical survivor). */
  def dedupClusters(s: SparkSession, d: String): DataFrame =
    connectedComponents(
      Dedup.ngramJaccard(s, d).select(col("i").as("u"), col("j").as("v")))
      .select(col("node").as("doc_id"), col("root").as("cluster_id"))
      .orderBy(col("cluster_id"), col("doc_id"))

  /** The end-to-end dedup pipeline: documents → near-dup pairs →
    * clusters → KEEP set. A doc survives iff it is not a non-canonical
    * member of some cluster (singletons survive trivially; each
    * cluster keeps its minimum doc_id). One anti-join against the
    * (tiny relative to corpus) loser set — the corpus itself is
    * scanned once beyond the pair computation. */
  def dedupSurvivors(s: SparkSession, d: String): DataFrame = {
    val losers = dedupClusters(s, d)
      .filter(col("doc_id") =!= col("cluster_id"))
      .select(col("doc_id"))
    graft.Tables.documents(s, d)
      .join(losers, Seq("doc_id"), "left_anti")
      .select(col("doc_id"))
      .orderBy(col("doc_id"))
  }

  val dedupSurvivorsSql: String =
    s"""SELECT doc_id FROM documents
       |WHERE doc_id NOT IN (
       |  WITH RECURSIVE pairs AS (SELECT i, j FROM (${Dedup.ngramJaccardSql}) jp),
       |  edges AS (SELECT i AS a, j AS b FROM pairs UNION SELECT j, i FROM pairs),
       |  reach(a, b) AS (
       |    SELECT a, b FROM edges
       |    UNION
       |    SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a WHERE e.b <> r.a
       |  )
       |  SELECT a FROM reach GROUP BY a HAVING min(b) < a)
       |ORDER BY doc_id""".stripMargin

  /** DuckDB oracle: UNION-dedup recursive transitive closure over the
    * same pair graph, then min over each node's reachable set. */
  val dedupClustersSql: String =
    s"""WITH RECURSIVE pairs AS (SELECT i, j FROM (${Dedup.ngramJaccardSql}) jp),
       |edges AS (SELECT i AS a, j AS b FROM pairs UNION SELECT j, i FROM pairs),
       |reach(a, b) AS (
       |  SELECT a, b FROM edges
       |  UNION
       |  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a WHERE e.b <> r.a
       |)
       |SELECT a AS doc_id, least(a, min(b)) AS cluster_id
       |FROM reach GROUP BY a
       |ORDER BY cluster_id, doc_id""".stripMargin
}
