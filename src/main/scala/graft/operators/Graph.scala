package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Iterative graph analytics over relational edge sets — the serving
  * shape behind "influential supplier / connected account" dashboards
  * the reference's ADS layer approximates with per-entity counters.
  *
  * PageRank here is the classic damped power iteration expressed as a
  * FIXED number of DataFrame join+aggregate rounds: each round shuffles
  * only (dst, contribution) pairs — never adjacency lists — so a round
  * is one hash-partitioned aggregation at any scale, and the whole
  * computation is Catalyst-visible (AQE re-plans each round; the
  * edge+degree subtree repeats per round and is deduplicated by
  * ReuseExchange). A fixed iteration count (not convergence-test loops
  * with driver round-trips) keeps the plan static and the oracle
  * expressible as unrolled SQL.
  *
  * 100 TB notes: the edge list is the distributed big side, shuffled
  * by src once per round on the same key — co-partitioned with the
  * rank vector after round 1, so AQE observes stable partitioning; at
  * extreme iteration counts, `localCheckpoint` every ~10 rounds would
  * truncate lineage (not needed at 8).
  */
object Graph {

  /** Core power iteration over an UNDIRECTED pair set. `pairs` carries
    * one row per (a, b) edge; both directions are materialized so no
    * node is dangling (every node has in- and out-edges). Returns
    * (node, pr) with Σpr = 1. Doubles drift only in the last bits
    * across partitionings; callers round before comparing. */
  def pageRankEdges(pairs: DataFrame, iters: Int, damping: Double,
      broadcastState: Boolean = false): DataFrame =
    prCore(pairs, iters, damping, broadcastState)._1

  /** Returns (ranks, n).
    *
    * Shape choices, each measured at sf0.1 (see BENCH_NOTES.md):
    *  - the deduped PAIR set is the one cache pin — every downstream
    *    table (edges, degrees, the per-round probe side) derives from
    *    it narrowly, so nothing re-runs the base scan+distinct;
    *  - both edge directions come from ONE narrow explode (a unionAll
    *    of two projections duplicates the whole distinct subtree —
    *    the optimizer pushes the union below it);
    *  - `n` is pulled to the driver as ONE bounded scalar (the
    *    HLL/centroid contract) so the teleport term is a literal and
    *    each round stays a flat join+aggregate plan;
    *  - the DEFAULT state layout is fully partitioned: rank and
    *    edge+degree tables meet in shuffle joins keyed on the node id,
    *    so no structure ever has to fit on one machine — the form that
    *    survives a web-scale node set. `broadcastState = true` instead
    *    rides the per-node tables through broadcast joins (right when
    *    the node set is a bounded entity dim); measured at sf0.1 the
    *    two are within noise of each other (~9.2 s both, medians of
    *    3), so the scale-safe layout is the default and the spec
    *    proves both paths produce identical ranks. */
  private def prCore(pairs: DataFrame, iters: Int, damping: Double,
      broadcastState: Boolean = false): (DataFrame, Long) = {
    val bc: DataFrame => DataFrame = if (broadcastState) broadcast else identity
    val pinned = pairs.cache()
    val edges = pinned
      .select(explode(array(
        struct(col("a").as("src"), col("b").as("dst")),
        struct(col("b").as("src"), col("a").as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("deg")).cache()
    val withDeg = edges.join(bc(deg), "src").cache()
    val n = deg.count()
    var ranks = deg.select(col("src").as("node"), lit(1.0 / n).as("pr"))
    for (_ <- 1 to iters) {
      val contrib = withDeg.join(bc(ranks), col("src") === col("node"))
        .select(col("dst"), (col("pr") / col("deg")).as("w"))
      ranks = contrib.groupBy(col("dst")).agg(sum(col("w")).as("m"))
        .select(col("dst").as("node"),
          (lit((1.0 - damping) / n) + lit(damping) * col("m")).as("pr"))
    }
    // materialize the final rank vector (small: one row per node) so
    // the three upstream cache pins can be released immediately —
    // otherwise every prCore call leaks its caches for the session
    // lifetime (the returned plan references withDeg in all rounds)
    val finalRanks = ranks.localCheckpoint(true)
    Seq(withDeg, deg, pinned).foreach(_.unpersist())
    (finalRanks, n)
  }

  /** Top-20 suppliers by PageRank on the undirected customer⋈supplier
    * trade graph (distinct pairs via lineitem→orders). Scores are
    * normalized to mean 1 (×N) and rounded to 6dp — far above the
    * ~1e-13 FP-order drift eight double-sum rounds accumulate, so the
    * DuckDB oracle (the same eight rounds unrolled as CTEs) matches
    * bit-for-bit after rounding. */
  def pageRank(s: SparkSession, d: String): DataFrame = {
    // node ids are disjoint LONGS (customer 2k, supplier 2k+1), not
    // decorated strings: every shuffle, join and aggregate in the
    // iteration keys on an 8-byte integer instead of a variable-width
    // string (measured ~2x on the whole op at sf0.1)
    val pairs = Tables.lineitem(s, d)
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .select((col("o_custkey") * 2).as("a"), (col("l_suppkey") * 2 + 1).as("b"))
      .distinct()
    val (ranks, n) = prCore(pairs, iters = Iters, damping = Damping)
    ranks
      .filter(col("node") % 2 === 1)
      .select(((col("node") - 1) / 2).cast("long").as("s_suppkey"),
        round(col("pr") * lit(n.toDouble), 6).as("score"))
      .orderBy(col("score").desc, col("s_suppkey"))
      .limit(20)
  }

  private val Iters = 8
  private val Damping = 0.85

  /** Multi-source BFS over an undirected pair set: min hop distance
    * from any source node, bounded at `rounds` hops. Frontier
    * iteration — round r expands ONLY nodes first reached at r−1 (the
    * min-aggregate excludes earlier-settled nodes from later
    * frontiers), so each round shuffles one (dst, r) pair per frontier
    * edge, never adjacency lists, and total work is O(edges × 1) like
    * sequential BFS — not O(edges × rounds) like naive relaxation.
    * Unreached nodes (farther than `rounds`, or disconnected) emit no
    * row. `localCheckpoint` per round truncates the iterative lineage
    * (the [[Clusters]] loop discipline). */
  def bfsEdges(pairs: DataFrame, sources: DataFrame, rounds: Int): DataFrame = {
    val pinned = pairs.cache()
    // NOT pre-partitioned (unlike labelPropEdges/kcoreEdgesKv): the
    // frontier side is tiny and settles in a few early-exit rounds, so
    // the upfront repartition shuffle never amortizes — measured ~12%
    // slower with it at sf0.1
    val edges = pinned
      .select(explode(array(
        struct(col("a").as("src"), col("b").as("dst")),
        struct(col("b").as("src"), col("a").as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
      .cache()
    var dist = sources.select(col("node"), lit(0).as("dist")).localCheckpoint()
    // early exit on an empty frontier (graph settled before the hop
    // cap): one bounded scalar per round off the just-checkpointed
    // table — BFS is done when no node was first labeled this round
    var r = 1
    var live = true
    while (r <= rounds && live) {
      val frontier = dist.filter(col("dist") === r - 1)
      val next = frontier.join(edges, col("node") === col("src"))
        .select(col("dst").as("node"), lit(r).as("dist"))
      val prevDist = dist
      dist = dist.unionAll(next)
        .groupBy(col("node")).agg(min(col("dist")).as("dist"))
        .localCheckpoint()
      Ckpt.release(prevDist) // superseded round blocks (Ckpt discipline)
      live = !dist.filter(col("dist") === r).isEmpty
      r += 1
    }
    Seq(edges, pinned).foreach(_.unpersist())
    dist
  }

  private val BfsRounds = 6
  private val BfsSources = 5

  /** Oracled instance: hop distance from the five hub suppliers
    * (s_suppkey 0–4) across the trade graph — the "how far is every
    * account from a flagged set" serving query. Same long node
    * encoding as [[pageRank]]. */
  def bfs(s: SparkSession, d: String): DataFrame = {
    val pairs = Tables.lineitem(s, d)
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .select((col("o_custkey") * 2).as("a"), (col("l_suppkey") * 2 + 1).as("b"))
      .distinct()
    val sources = pairs.select(col("b").as("node"))
      .filter((col("node") - 1) / 2 < BfsSources).distinct()
    bfsEdges(pairs, sources, BfsRounds)
      .select(
        when(col("node") % 2 === 0, "customer").otherwise("supplier").as("kind"),
        (when(col("node") % 2 === 0, col("node") / 2)
          .otherwise((col("node") - 1) / 2)).cast("long").as("key"),
        col("dist").cast("long").as("dist"))
      .orderBy(col("kind"), col("key"))
  }

  /** DuckDB oracle: UNION-dedup recursive reach with the same hop
    * bound, min per node. */
  val bfsSql: String =
    s"""WITH RECURSIVE pairs AS (
       |  SELECT DISTINCT o_custkey * 2 AS a, l_suppkey * 2 + 1 AS b
       |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
       |edges AS (
       |  SELECT a AS src, b AS dst FROM pairs
       |  UNION ALL
       |  SELECT b AS src, a AS dst FROM pairs),
       |sources AS (
       |  SELECT DISTINCT b AS node FROM pairs WHERE (b - 1) // 2 < $BfsSources),
       |reach(node, dist) AS (
       |  SELECT node, 0 FROM sources
       |  UNION
       |  SELECT e.dst, r.dist + 1 FROM reach r JOIN edges e ON e.src = r.node
       |  WHERE r.dist < $BfsRounds),
       |d AS (SELECT node, min(dist) AS dist FROM reach GROUP BY node)
       |SELECT CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END AS kind,
       |  CASE WHEN node % 2 = 0 THEN node // 2 ELSE (node - 1) // 2 END AS key,
       |  CAST(dist AS BIGINT) AS dist
       |FROM d ORDER BY kind, key""".stripMargin

  /** The same eight damped rounds unrolled as chained CTEs — every
    * arithmetic step CAST to DOUBLE so DuckDB's decimal literals don't
    * change the dtype Spark computes in. */
  val pageRankSql: String = {
    val rounds = (1 to Iters).map { i =>
      s"""r$i AS (SELECT e.dst AS node,
         |  CAST(${1 - Damping} AS DOUBLE) / (SELECT n FROM n)
         |    + CAST($Damping AS DOUBLE) * sum(r.pr / d.deg) AS pr
         |  FROM edges e JOIN r${i - 1} r ON e.src = r.node
         |  JOIN deg d ON e.src = d.src
         |  GROUP BY e.dst)""".stripMargin
    }.mkString(",\n")
    s"""WITH pairs AS (
       |  SELECT DISTINCT o_custkey * 2 AS a, l_suppkey * 2 + 1 AS b
       |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
       |edges AS (
       |  SELECT a AS src, b AS dst FROM pairs
       |  UNION ALL
       |  SELECT b AS src, a AS dst FROM pairs),
       |deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src),
       |n AS (SELECT count(*) AS n FROM deg),
       |r0 AS (SELECT src AS node, CAST(1 AS DOUBLE) / (SELECT n FROM n) AS pr FROM deg),
       |$rounds
       |SELECT (node - 1) // 2 AS s_suppkey, round(pr * (SELECT n FROM n), 6) AS score
       |FROM r$Iters WHERE node % 2 = 1
       |ORDER BY score DESC, s_suppkey LIMIT 20""".stripMargin
  }

  /** Community detection by synchronous LABEL PROPAGATION (Raghavan
    * et al. 2007; the GraphX/GraphFrames `labelPropagation` shape)
    * over the undirected customer⋈supplier trade graph — the third
    * member of the iterative-graph family ([[pageRank]], [[bfs]]).
    * Every node starts labeled with its own id; each synchronous round
    * every node adopts its neighbors' MOST FREQUENT label, ties to the
    * smallest — a fully deterministic update, so the DuckDB oracle
    * (the same rounds unrolled as CTEs) matches hash-exactly.
    *
    * Scale shape — the pageRank discipline: per round exactly one
    * (dst-label join) + one (node, label) count + one per-node arg-min
    * pick, all partial-aggregable equi-shuffles keyed on 8-byte longs;
    * labels are one row per node (never adjacency lists);
    * `localCheckpoint` per round truncates the iterative lineage; the
    * edge pin is released before returning. Top-20 communities by
    * size. */
  def labelProp(s: SparkSession, d: String, rounds: Int = 5): DataFrame = {
    val pairs = Tables.lineitem(s, d)
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .select((col("o_custkey") * 2).as("a"), (col("l_suppkey") * 2 + 1).as("b"))
      .distinct()
    // the core already checkpointed the final label table and released
    // its pins; the rollup below is plain partial-aggregable work
    labelPropEdges(pairs, rounds)
      .groupBy(col("lbl").as("community"))
      .agg(count(lit(1)).as("sz"))
      .orderBy(col("sz").desc, col("community"))
      .limit(20)
  }

  /** Core synchronous rounds over an undirected (a, b) pair set;
    * returns the final (node, lbl) assignment. */
  def labelPropEdges(pairs: DataFrame, rounds: Int): DataFrame = {
    val pinned = pairs.cache()
    // cached PRE-PARTITIONED on dst: the explode inherits the distinct's
    // hash(a, b) partitioning, under which every round's labels join on
    // dst would re-shuffle all E edge rows — one explicit repartition
    // makes the cache layout match the per-round join key, and the
    // labels side (grouped by src = node) is already compatible, so a
    // round's only E-sized shuffle is the count aggregation itself
    // (the prCore withDeg discipline, where the deg join provides the
    // same layout for free)
    val edges = pinned
      .select(explode(array(
        struct(col("a").as("src"), col("b").as("dst")),
        struct(col("b").as("src"), col("a").as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
      .repartition(col("dst"))
      .cache()
    var labels = edges.select(col("src").as("node")).distinct()
      .withColumn("lbl", col("node"))
      .localCheckpoint()
    for (_ <- 1 to rounds) {
      val counts = edges.join(labels, col("dst") === col("node"))
        .groupBy(col("src"), col("lbl")).agg(count(lit(1)).as("c"))
      val prevLabels = labels
      labels = counts.groupBy(col("src"))
        .agg(min_by(col("lbl"), struct((-col("c")).as("nc"), col("lbl"))).as("lbl"))
        .select(col("src").as("node"), col("lbl"))
        .localCheckpoint()
      Ckpt.release(prevLabels) // superseded round blocks (Ckpt discipline)
    }
    Seq(edges, pinned).foreach(_.unpersist())
    labels
  }

  /** Oracle: the identical synchronous rounds unrolled as CTEs with
    * the identical (count DESC, label ASC) pick. */
  def labelPropSql(rounds: Int = 5): String = {
    val base =
      """WITH p AS (
        |  SELECT DISTINCT o_custkey * 2 AS a, l_suppkey * 2 + 1 AS b
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |e AS (SELECT a AS src, b AS dst FROM p UNION ALL SELECT b, a FROM p),
        |l0 AS (SELECT DISTINCT src AS node, src AS lbl FROM e)""".stripMargin
    val steps = (1 to rounds).map { r =>
      s"""l$r AS (
         |  SELECT src AS node, lbl FROM (
         |    SELECT src, lbl, row_number() OVER (
         |      PARTITION BY src ORDER BY c DESC, lbl) AS rn
         |    FROM (
         |      SELECT e.src, l.lbl, count(*) AS c
         |      FROM e JOIN l${r - 1} l ON e.dst = l.node
         |      GROUP BY e.src, l.lbl) t) q
         |  WHERE rn = 1)""".stripMargin
    }
    (Seq(base) ++ steps).mkString(",\n") +
      s"""
         |SELECT lbl AS community, CAST(count(*) AS BIGINT) AS sz
         |FROM l$rounds GROUP BY lbl
         |ORDER BY sz DESC, community LIMIT 20""".stripMargin
  }

  /** Triangle participation over the part CO-PURCHASE graph (parts
    * sharing an order — the "bought together" network; triangle
    * density is the classic community-strength signal and the standard
    * engine benchmark beyond equi-joins). Top-20 parts by the number
    * of triangles they sit in.
    *
    * Scale shape — degree-ordered orientation + adjacency
    * intersection (Cohen, CiSE'09; the GraphX/GraphFrames form):
    * every edge orients from its lower-(degree, id) endpoint to the
    * higher, which bounds every out-list at O(√|E|) even for a
    * celebrity hub; each edge (x, y) then closes its triangles IN-ROW
    * as `array_intersect(out(x), out(y))` — z ∈ both out-lists
    * implies rank x < y < z, so each triangle is found exactly once
    * and the 30×-|E| wedge stream of the join formulation (41M rows
    * at sf0.1 — measured 10-18 s) never materializes anywhere
    * (~6 s). Edge construction is also in-row: parts collect per
    * order (bounded by basket size), pairs fan out of ONE
    * posexplode+slice — no lineitem self-join shuffle. The oracle
    * counts the same triangles naively — orientation changes the join
    * shape, never the triangle set. */
  def triangles(s: SparkSession, d: String): DataFrame = {
    val parts = Tables.lineitem(s, d)
      .groupBy(col("l_orderkey"))
      .agg(array_sort(collect_set(col("l_partkey"))).as("ps"))
    val pairs = parts
      .select(posexplode(col("ps")).as(Seq("i", "u")), col("ps"))
      .select(col("u"), explode(slice(col("ps"), col("i") + 2,
        greatest(size(col("ps")) - col("i") - 1, lit(0)))).as("v"))
      .distinct()
    // rank = (degree, id) compared as a struct — lexicographic struct
    // ordering gives degree-then-id directly, with no packing constant
    // to overflow once node ids pass 1e10 (TPC-H partkey does around
    // sf~50000, squarely inside this op's 100 TB design envelope)
    val deg = pairs.select(explode(array(col("u"), col("v"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))
    val rk = struct(col("deg"), col("node")).as("rk")
    val ranked = pairs
      .join(deg.select(col("node").as("u"), rk.as("rku")), "u")
      .join(deg.select(col("node").as("v"), rk.as("rkv")), "v")
    // cache pins (the pagerank discipline): `oriented` feeds the
    // adjacency build and the edge probe; `adj` joins twice
    val oriented = ranked.select(
      when(col("rku") < col("rkv"), col("u")).otherwise(col("v")).as("src"),
      when(col("rku") < col("rkv"), col("v")).otherwise(col("u")).as("dst"))
      .cache()
    val adj = oriented.groupBy(col("src"))
      .agg(collect_list(col("dst")).as("outs")).cache()
    // the empty-intersection filter sits ABOVE the cache: below it,
    // predicate pushdown rewrites it through the projection and the
    // adjacency intersect — the op's dominant per-pair cost — runs
    // twice per surviving edge (once in the Filter, once in the
    // Project). Cached unfiltered, the intersect evaluates exactly
    // once per pair and the filter is a size() read on the
    // materialized array. (The filter itself stays REQUIRED: zero-
    // triangle nodes would otherwise enter the rollup with tri_ct = 0
    // and pad the top-20 on sparse graphs.)
    val common = oriented.select(col("src").as("x"), col("dst").as("y"))
      .join(adj.select(col("src").as("x"), col("outs").as("xo")), "x")
      .join(adj.select(col("src").as("y"), col("outs").as("yo")), "y")
      .select(col("x"), col("y"),
        array_intersect(col("xo"), col("yo")).as("zs"))
      .cache() // read by all three credit projections below
    val withCommon = common.filter(size(col("zs")) > 0)
    // each triangle (x, y, z) credits all three nodes: x and y get
    // the per-edge closure count, every z one — three narrow
    // projections, partial-aggregated before the one count shuffle
    val n = size(col("zs")).cast("long")
    val top = withCommon.select(col("x").as("part_key"), n.as("ct"))
      .unionAll(withCommon.select(col("y").as("part_key"), n.as("ct")))
      .unionAll(withCommon.select(explode(col("zs")).as("part_key"), lit(1L).as("ct")))
      .groupBy(col("part_key")).agg(sum(col("ct")).as("tri_ct"))
      .orderBy(col("tri_ct").desc, col("part_key"))
      .limit(20)
    // materialize the 20-row result so the three cache pins release
    // immediately (the pageRank discipline) instead of accumulating
    // for the lifetime of the shared session
    val result = top.localCheckpoint(true)
    Seq(oriented, adj, common).foreach(_.unpersist())
    result
  }

  /** Oracle: the naive value-ordered closure — DISTINCT u<v edges,
    * wedge join u<v<w, closing-edge join — then the same unnest +
    * top-20 rollup. */
  val trianglesSql: String =
    """WITH e AS (
      |  SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
      |  FROM lineitem a JOIN lineitem b
      |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
      |tri AS (
      |  SELECT e1.u AS a, e1.v AS b, e2.v AS c
      |  FROM e e1
      |  JOIN e e2 ON e1.u = e2.u AND e1.v < e2.v
      |  JOIN e e3 ON e3.u = e1.v AND e3.v = e2.v),
      |nodes AS (SELECT unnest([a, b, c]) AS part_key FROM tri)
      |SELECT part_key, CAST(count(*) AS BIGINT) AS tri_ct
      |FROM nodes GROUP BY part_key
      |ORDER BY tri_ct DESC, part_key LIMIT 20""".stripMargin

  /** Graph PROFILING card: log2-bucketed degree distribution of the
    * customer–supplier trade graph, split by side — the first thing an
    * engine reports before choosing an iteration strategy (hub-heavy
    * power-law tails drive the degree-ordered orientation in
    * [[triangles]] and the skew handling everywhere else). One distinct
    * pair set, one per-node count, one bucket rollup — every stage
    * partial-aggregable; bucket = floor(log2(degree)) via integer bit
    * length, so bucketing is engine-exact integer arithmetic. */
  def degreeStats(s: SparkSession, d: String): DataFrame = {
    val pairs = Tables.lineitem(s, d)
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .select((col("o_custkey") * 2).as("a"), (col("l_suppkey") * 2 + 1).as("b"))
      .distinct()
    val deg = pairs
      .select(explode(array(col("a"), col("b"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))
    deg
      .select(
        when(col("node") % 2 === 0, "customer").otherwise("supplier").as("side"),
        // floor(log2(d)) as exact integer arithmetic: bit_length(d) - 1
        (length(bin(col("deg"))) - 1).cast("long").as("bucket"),
        col("deg"))
      .groupBy(col("side"), col("bucket"))
      .agg(count(lit(1)).as("n_nodes"),
        min(col("deg")).as("min_deg"), max(col("deg")).as("max_deg"),
        sum(col("deg")).as("edge_ends"))
      .orderBy(col("side"), col("bucket"))
  }

  /** Oracle: `length(bin(deg)) - 1` is the same exact-integer
    * floor(log2) in both engines (never a libm log). */
  val degreeStatsSql: String =
    """WITH pairs AS (
      |  SELECT DISTINCT o_custkey * 2 AS a, l_suppkey * 2 + 1 AS b
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
      |nodes AS (
      |  SELECT a AS node FROM pairs UNION ALL SELECT b AS node FROM pairs),
      |deg AS (
      |  SELECT node, CAST(count(*) AS BIGINT) AS deg
      |  FROM nodes GROUP BY node)
      |SELECT CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END AS side,
      |  CAST(length(bin(deg)) - 1 AS BIGINT) AS bucket,
      |  CAST(count(*) AS BIGINT) AS n_nodes,
      |  CAST(min(deg) AS BIGINT) AS min_deg,
      |  CAST(max(deg) AS BIGINT) AS max_deg,
      |  CAST(sum(deg) AS BIGINT) AS edge_ends
      |FROM deg
      |GROUP BY side, bucket
      |ORDER BY side, bucket""".stripMargin

  /** k-CORE decomposition by fixed-round peeling (Seidman '83; the
    * Batagelj–Zaveršnik peel distributed): each round drops every
    * node whose degree WITHIN the surviving subgraph is < k, until
    * the fixed round budget (like [[pageRank]]'s 8 iterations, the
    * round count is part of the operator definition — KCoreSpec
    * proves the fixpoint is reached). Per round: two equi-joins of
    * the edge list against the one-column alive set + one count —
    * shuffles carry (src, dst) pairs only, never adjacency lists;
    * `localCheckpoint` per round truncates the iterative lineage
    * (the [[Clusters]] discipline). Cascades are why this needs
    * rounds at all: peeling one node can push its neighbors below k. */
  /** Core peel loop; `kv` is a ONE-ROW frame carrying the threshold
    * `k` (cross-joined broadcast into every round's HAVING — the
    * data-derived scalar never round-trips through the driver). */
  def kcoreEdgesKv(pairs: DataFrame, kv: DataFrame, rounds: Int): DataFrame = {
    val pinned = pairs.cache()
    // cached pre-partitioned on src: each round joins the alive set on
    // src AND dst — only one can match the cache layout; src also feeds
    // the round's degree groupBy, so hash(src) removes two of the three
    // per-round E-sized shuffles (the labelPropEdges lesson — the
    // checkpointed alive set has unknown stats, so neither join
    // broadcasts)
    val edges = pinned
      .select(explode(array(
        struct(col("a").as("src"), col("b").as("dst")),
        struct(col("b").as("src"), col("a").as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
      .repartition(col("src"))
      .cache()
    val kvp = kv.localCheckpoint(true) // 1 row; pin so rounds don't recompute
    var alive = edges.select(col("src").as("node")).distinct().localCheckpoint()
    // early exit on a settled peel (the bfs discipline): peeling only
    // REMOVES nodes, so an unchanged count means an unchanged SET and
    // every further round is a no-op — one bounded scalar per round
    // buys back the tail of the fixed-round budget (8 rounds cost
    // ~5 s at sf0.1; the real graph settles in 1-2)
    var prev = alive.count()
    var r = 1
    var live = true
    while (r <= rounds && live) {
      val prevAlive = alive
      alive = edges
        .join(alive, col("src") === col("node")).drop("node")
        .join(alive.withColumnRenamed("node", "node2"),
          col("dst") === col("node2")).drop("node2")
        .groupBy(col("src")).agg(count(lit(1)).as("deg"))
        .crossJoin(broadcast(kvp))
        .filter(col("deg") >= col("k"))
        .select(col("src").as("node"))
        .localCheckpoint()
      Ckpt.release(prevAlive) // superseded round blocks (Ckpt discipline)
      val c = alive.count()
      live = c != prev
      prev = c
      r += 1
    }
    val core = edges
      .join(alive, col("src") === col("node")).drop("node")
      .join(alive.withColumnRenamed("node", "node2"),
        col("dst") === col("node2")).drop("node2")
      .groupBy(col("src")).agg(count(lit(1)).as("core_deg"))
      .select(col("src").as("node"), col("core_deg"))
      .localCheckpoint(true)
    Ckpt.release(alive) // superseded once core is materialized
    Seq(edges, pinned).foreach(_.unpersist())
    core
  }

  /** Fixed-k form (the spec surface for planted graphs). */
  def kcoreEdges(pairs: DataFrame, k: Int, rounds: Int): DataFrame =
    kcoreEdgesKv(pairs,
      pairs.sparkSession.range(1).select(lit(k.toLong).as("k")), rounds)

  /** Dense-backbone k-core of the trade graph, with k DERIVED from the
    * graph itself: k = the degree value at ascending rank ⌈0.6·n⌉ (the
    * 60th-percentile degree), so the peel always bites regardless of
    * scale (a fixed k is meaningless across densities: this synthetic
    * graph's minimum degree already exceeds any fixed small k, while
    * p60+1 collapses the sparsest scale to an empty core — the planted
    * spec covers multi-round cascades). The rank threshold is exact integer
    * arithmetic ((3n+4) div 5); the CDF walk runs over DISTINCT degree
    * VALUES (value-cardinality-bounded — the q_quantile precedent),
    * and k rides as a broadcast one-row scalar. */
  def kcore(s: SparkSession, d: String, rounds: Int = 8): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val pairs = Tables.lineitem(s, d)
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .select((col("o_custkey") * 2).as("a"), (col("l_suppkey") * 2 + 1).as("b"))
      .distinct()
    val deg = pairs
      .select(explode(array(col("a"), col("b"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("c"))
    val byVal = deg.groupBy(col("c")).agg(count(lit(1)).as("ct"))
    val kv = byVal
      .withColumn("cum", sum(col("ct")).over(Window.orderBy(col("c"))))
      .crossJoin(broadcast(byVal.agg(sum(col("ct")).as("n"))))
      .filter(col("cum") >= expr("(n * 3 + 4) div 5"))
      .agg(min(col("c")).as("k"))
    kcoreEdgesKv(pairs, kv, rounds)
      .select(
        when(col("node") % 2 === 0, "customer").otherwise("supplier").as("side"),
        col("node"), col("core_deg"))
      .orderBy(col("node"))
  }

  /** Oracle: the identical derived threshold + peel rounds unrolled.
    * Every CTE is MATERIALIZED: each round references the previous
    * alive set TWICE, and DuckDB's default CTE inlining would make the
    * chain exponential (measured: 9 plain rounds never finish; 9
    * materialized rounds run in 60 ms). */
  def kcoreSql(rounds: Int = 8): String = {
    val base =
      """WITH p AS MATERIALIZED (
        |  SELECT DISTINCT o_custkey * 2 AS a, l_suppkey * 2 + 1 AS b
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |e AS MATERIALIZED (
        |  SELECT a AS src, b AS dst FROM p UNION ALL SELECT b, a FROM p),
        |d AS MATERIALIZED (
        |  SELECT src, CAST(count(*) AS BIGINT) AS c FROM e GROUP BY src),
        |bv AS MATERIALIZED (
        |  SELECT c, CAST(count(*) AS BIGINT) AS ct FROM d GROUP BY c),
        |nn AS MATERIALIZED (SELECT CAST(sum(ct) AS BIGINT) AS n FROM bv),
        |kv AS MATERIALIZED (
        |  SELECT min(c) AS k FROM (
        |    SELECT c, CAST(sum(ct) OVER (ORDER BY c) AS BIGINT) AS cum
        |    FROM bv) t, nn
        |  WHERE cum >= (n * 3 + 4) // 5),
        |a0 AS MATERIALIZED (SELECT DISTINCT src AS node FROM e)""".stripMargin
    val steps = (1 to rounds).map { r =>
      s"""a$r AS MATERIALIZED (
         |  SELECT e.src AS node FROM e
         |  JOIN a${r - 1} x ON e.src = x.node
         |  JOIN a${r - 1} y ON e.dst = y.node, kv
         |  GROUP BY e.src, kv.k HAVING count(*) >= kv.k)""".stripMargin
    }
    (Seq(base) ++ steps).mkString(",\n") +
      s"""
         |SELECT CASE WHEN e.src % 2 = 0 THEN 'customer' ELSE 'supplier' END AS side,
         |  e.src AS node, CAST(count(*) AS BIGINT) AS core_deg
         |FROM e
         |JOIN a$rounds x ON e.src = x.node
         |JOIN a$rounds y ON e.dst = y.node
         |GROUP BY e.src ORDER BY node""".stripMargin
  }

  /** Adamic–Adar link prediction (Adamic & Adar, Social Networks'03)
    * over the bipartite trade graph: which SUPPLIER pairs serve the
    * same customers — score = Σ_z 1/ln(deg(z)) over shared customers
    * z, down-weighting promiscuous buyers. Top-20 pairs.
    *
    * Scale shape: wedge enumeration through an intermediary costs
    * deg(z)² while a hub's contribution tends to 0 (1/ln), so
    * intermediaries with deg > 256 are EXCLUDED — the standard AA hub
    * cut, stated in the operator contract and mirrored by the oracle
    * (this bounds every in-row pair fan-out at 256²; it is also why
    * the wedge runs through CUSTOMERS — supplier fan-in here is
    * 500+, customer fan-out ~40). Pairs fan out IN-ROW from each
    * customer's sorted supplier list (the [[triangles]] /
    * basket-affinity idiom — no supplier⋈supplier self-join shuffle);
    * each 1/ln(deg) weight is 6-dp-rounded then DECIMAL-summed (the
    * lmScore recipe) so the score is reduction-order-free and the
    * oracle's independent self-join formulation matches bit-for-bit. */
  /** The AA hub cut shared by [[adamicAdar]] and [[adamicAdarSql]] —
    * one constant so a re-tune cannot silently diverge from the
    * registered oracle (the FrameUnits/SceneCutThreshold discipline). */
  val AdamicAdarDegCap: Int = 256

  def adamicAdar(s: SparkSession, d: String, degCap: Int = AdamicAdarDegCap): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val pairs = Tables.lineitem(s, d)
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .select(col("l_suppkey").as("c"), col("o_custkey").as("z"))
    // dedup FUSED into the neighbor-list build: collect_set partials
    // dedup map-side, so the raw (c, z) stream shuffles ONCE on z —
    // the r6 shape paid a distinct() exchange on (c, z) first, a
    // second shuffle of the same data the set-agg makes redundant
    val nbrs = pairs.groupBy(col("z"))
      .agg(sort_array(collect_set(col("c"))).as("cs"))
      .withColumn("deg", size(col("cs")))
      .filter(col("deg") >= 2 && col("deg") <= degCap)
      // the 6-dp weight leaves the per-CUSTOMER row as micro-unit
      // LONGs (decimal→int64 is exact), so the deg²-row fan-out sums
      // int64 instead of Decimal — measured 25% off the whole query;
      // sum(wu)/1e6 and the oracle's SUM(DECIMAL(18,6))→double are
      // both correctly-rounded images of the same exact rational, so
      // the hash compare still matches bit-for-bit
      .select(col("cs"),
        (round(lit(1.0) / log(col("deg").cast("double")), 6)
          .cast(DecimalType(18, 6)) * 1000000).cast("long").as("wu"))
    nbrs
      .select(col("wu"), col("cs"), posexplode(col("cs")).as(Seq("i", "a")))
      .select(col("wu"), col("a"),
        explode(expr("slice(cs, i + 2, size(cs))")).as("b"))
      .groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("common"), (sum(col("wu")) / 1000000.0).as("aa"))
      .orderBy(col("aa").desc, col("a"), col("b"))
      .limit(20)
  }

  /** Neighbor-set Jaccard link prediction over the same bipartite
    * trade graph as [[adamicAdar]]: supplier pairs scored by
    * |customers(a) ∩ customers(b)| / |customers(a) ∪ customers(b)|.
    * The metric is defined over the HUB-CAPPED graph — customers with
    * more than [[AdamicAdarDegCap]] suppliers are dropped before BOTH
    * the wedge count and the degree table, so numerator and
    * denominator describe the same graph (and every in-row pair
    * fan-out stays bounded at cap²). Wedges fan out IN-ROW from each
    * customer's sorted supplier list (the [[adamicAdar]] /
    * [[triangles]] idiom — never a supplier⋈supplier self-join);
    * degrees ride in on a broadcast (supplier-cardinality-sized).
    * The score is one integer division per pair — no sum-order
    * concerns at all. Top-20, deterministic tie-break. */
  def jaccardLinks(s: SparkSession, d: String): DataFrame = {
    val pairs = Tables.lineitem(s, d)
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .select(col("l_suppkey").as("c"), col("o_custkey").as("z"))
    // same fused dedup-into-collect_set as [[adamicAdar]]: one z
    // shuffle instead of distinct-then-regroup
    val kept = pairs.groupBy(col("z"))
      .agg(sort_array(collect_set(col("c"))).as("cs"))
      .withColumn("deg", size(col("cs")))
      .filter(col("deg") <= AdamicAdarDegCap)
    val sdeg = kept.select(explode(col("cs")).as("c"))
      .groupBy(col("c")).agg(count(lit(1)).as("deg"))
    val wedges = kept.filter(col("deg") >= 2)
      .select(col("cs"), posexplode(col("cs")).as(Seq("i", "a")))
      .select(col("a"), explode(expr("slice(cs, i + 2, size(cs))")).as("b"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("common"))
    wedges
      .join(broadcast(sdeg.select(col("c").as("a"), col("deg").as("da"))), "a")
      .join(broadcast(sdeg.select(col("c").as("b"), col("deg").as("db"))), "b")
      .select(col("a"), col("b"), col("common"),
        round(col("common").cast("double") /
          (col("da") + col("db") - col("common")).cast("double"), 6)
          .as("jaccard"))
      .orderBy(col("jaccard").desc, col("a"), col("b"))
      .limit(20)
  }

  val jaccardLinksSql: String =
    s"""WITH p AS (
       |  SELECT DISTINCT l_suppkey AS c, o_custkey AS z
       |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
       |deg AS (
       |  SELECT z, CAST(count(*) AS BIGINT) AS deg FROM p GROUP BY z),
       |kept AS (
       |  SELECT p.c, p.z, deg.deg FROM p JOIN deg USING (z)
       |  WHERE deg.deg <= $AdamicAdarDegCap),
       |sdeg AS (
       |  SELECT c, CAST(count(*) AS BIGINT) AS deg FROM kept GROUP BY c),
       |wedges AS (
       |  SELECT p1.c AS a, p2.c AS b, CAST(count(*) AS BIGINT) AS common
       |  FROM kept p1 JOIN kept p2 ON p1.z = p2.z AND p1.c < p2.c
       |  WHERE p1.deg >= 2
       |  GROUP BY p1.c, p2.c)
       |SELECT a, b, common,
       |  round(CAST(common AS DOUBLE) /
       |    CAST(da.deg + db.deg - common AS DOUBLE), 6) AS jaccard
       |FROM wedges
       |JOIN sdeg da ON da.c = a
       |JOIN sdeg db ON db.c = b
       |ORDER BY jaccard DESC, a, b LIMIT 20""".stripMargin

  val adamicAdarSql: String =
    s"""WITH p AS (
      |  SELECT DISTINCT l_suppkey AS c, o_custkey AS z
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
      |deg AS (
      |  SELECT z, CAST(count(*) AS BIGINT) AS deg FROM p GROUP BY z),
      |w AS (
      |  SELECT z, CAST(round(1.0 / ln(CAST(deg AS DOUBLE)), 6) AS DECIMAL(18,6)) AS w
      |  FROM deg WHERE deg BETWEEN 2 AND $AdamicAdarDegCap),
      |wedges AS (
      |  SELECT p1.c AS a, p2.c AS b, w.w
      |  FROM p p1 JOIN p p2 ON p1.z = p2.z AND p1.c < p2.c
      |  JOIN w ON w.z = p1.z)
      |SELECT a, b, CAST(count(*) AS BIGINT) AS common,
      |  CAST(sum(w) AS DOUBLE) AS aa
      |FROM wedges GROUP BY a, b
      |ORDER BY aa DESC, a, b LIMIT 20""".stripMargin
}
