package graft

import graft.operators.Graph
import org.apache.spark.sql.functions._

/** PageRank power iteration: planted graphs with known/independently
  * computed ranks, mass conservation, and partitioning-independence of
  * the rounded scores (the oracle-compared surface). */
class GraphSpec extends SparkSpec {

  /** Driver-side reference: the same damped undirected power
    * iteration, computed on plain Scala maps. */
  private def ref(pairs: Seq[(String, String)], iters: Int, damping: Double): Map[String, Double] = {
    val edges = pairs.flatMap { case (a, b) => Seq(a -> b, b -> a) }
    val deg = edges.groupBy(_._1).map { case (k, v) => k -> v.size }
    val nodes = deg.keySet
    val n = nodes.size
    var r = nodes.map(_ -> 1.0 / n).toMap
    for (_ <- 1 to iters) {
      val contrib = edges.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map { case (src, _) => r(src) / deg(src) }.sum
      }
      r = nodes.map(v => v -> ((1 - damping) / n + damping * contrib.getOrElse(v, 0.0))).toMap
    }
    r
  }

  private def run(pairs: Seq[(String, String)], iters: Int = 8, damping: Double = 0.85): Map[String, Double] = {
    import spark.implicits._
    Graph.pageRankEdges(pairs.toDF("a", "b"), iters, damping)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
  }

  test("a symmetric ring gives every node identical rank 1/n") {
    val got = run(Seq("a" -> "b", "b" -> "c", "c" -> "d", "d" -> "a"))
    assert(got.keySet === Set("a", "b", "c", "d"))
    got.values.foreach(v => assert(math.abs(v - 0.25) < 1e-12))
  }

  test("a star concentrates rank on the hub, matching the reference iteration") {
    val pairs = (1 to 5).map(i => "hub" -> s"leaf$i")
    val got = run(pairs)
    val want = ref(pairs, 8, 0.85)
    assert(got.keySet === want.keySet)
    got.foreach { case (node, pr) =>
      assert(math.abs(pr - want(node)) < 1e-9, s"$node: $pr vs ${want(node)}")
    }
    assert(got("hub") > got("leaf1") * 2)
    // total rank mass is conserved by the damped update
    assert(math.abs(got.values.sum - 1.0) < 1e-9)
  }

  test("an asymmetric two-community graph matches the reference iteration") {
    val pairs = Seq("a" -> "b", "a" -> "c", "b" -> "c", "c" -> "d", "d" -> "e")
    val got = run(pairs)
    val want = ref(pairs, 8, 0.85)
    got.foreach { case (node, pr) =>
      assert(math.abs(pr - want(node)) < 1e-9, s"$node: $pr vs ${want(node)}")
    }
  }

  test("partitioned-state and broadcast-state loops produce identical ranks") {
    import spark.implicits._
    val df = Seq("a" -> "b", "a" -> "c", "b" -> "c", "c" -> "d", "d" -> "e").toDF("a", "b")
    val part = Graph.pageRankEdges(df, 8, 0.85, broadcastState = false)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val bcast = Graph.pageRankEdges(df, 8, 0.85, broadcastState = true)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(part.keySet === bcast.keySet)
    part.foreach { case (node, pr) =>
      assert(math.abs(pr - bcast(node)) < 1e-12, s"$node: $pr vs ${bcast(node)}")
    }
  }

  test("bfs: chain cap, multi-source min, cycle shortcut, disconnected absent") {
    import spark.implicits._
    def bfs(pairs: Seq[(Long, Long)], sources: Seq[Long], rounds: Int = 6): Map[Long, Int] =
      Graph.bfsEdges(pairs.toDF("a", "b"), sources.toDF("node"), rounds)
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val chain = (1L to 8L).map(i => i -> (i + 1))          // 1-2-...-9
    val iso = Seq(100L -> 101L)                            // disconnected island
    // single source: distances 0..6, nodes beyond the hop cap absent
    assert(bfs(chain ++ iso, Seq(1L)) ===
      (1L to 7L).map(i => i -> (i - 1).toInt).toMap)
    // two sources: min distance over sources; whole chain now in reach
    assert(bfs(chain ++ iso, Seq(1L, 9L)) === Map(
      1L -> 0, 2L -> 1, 3L -> 2, 4L -> 3, 5L -> 4, 6L -> 3, 7L -> 2, 8L -> 1, 9L -> 0))
    // diamond: both 2-hop paths settle 4 at round 2, never 3
    assert(bfs(Seq(1L -> 2L, 1L -> 3L, 2L -> 4L, 3L -> 4L), Seq(1L)) ===
      Map(1L -> 0, 2L -> 1, 3L -> 1, 4L -> 2))
  }

  test("triangles: K4 baskets count 3 per node, triangle-free parts absent") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft-tri")
      .toFile.getAbsolutePath
    // baskets building K4 on parts 1-4 (4 triangles, 3 per node) plus
    // a triangle-free pair {5,6}; duplicate part rows must not double
    val rows = Seq(
      (1L, 1L), (1L, 2L), (1L, 3L), (1L, 3L), // dup part in one order
      (2L, 2L), (2L, 3L), (2L, 4L),
      (3L, 1L), (3L, 4L),
      (4L, 1L), (4L, 2L), (4L, 4L),
      (5L, 5L), (5L, 6L))
    rows.map { case (ok, pk) => (ok, pk, 1L, 1.0, 1.0, 0.0, "N", "O",
      java.sql.Timestamp.valueOf("2024-01-01 00:00:00")) }
      .toDF("l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
        "l_extendedprice", "l_discount", "l_returnflag", "l_linestatus",
        "l_shipdate")
      .write.mode("overwrite").parquet(s"$d/lineitem.parquet")
    val got = Graph.triangles(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got === Seq((1L, 3L), (2L, 3L), (3L, 3L), (4L, 3L)))
  }

  test("triangles: degree-ordered closure matches the naive driver count at sf0.001") {
    val edges = Tables.lineitem(spark, sf0001)
      .select(col("l_orderkey"), col("l_partkey")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).values
      .flatMap { g =>
        val ps = g.map(_._2).distinct.sorted
        for (i <- ps.indices; j <- i + 1 until ps.length) yield (ps(i), ps(j))
      }.toSet
    val triPerNode = collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    val adj = edges.groupBy(_._1).map { case (u, es) => u -> es.map(_._2).toSet }
    for ((u, v) <- edges; w <- adj.getOrElse(v, Set.empty) if edges((u, w))) {
      // u < v < w by construction of the value-ordered edge set
      triPerNode(u) += 1; triPerNode(v) += 1; triPerNode(w) += 1
    }
    val expected = triPerNode.toSeq.sortBy { case (k, c) => (-c, k) }.take(20)
    val got = Graph.triangles(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got === expected)
  }

  test("label propagation: two planted communities converge, min-label ties, deterministic") {
    import spark.implicits._
    // two 4-cliques bridged by ONE weak edge: sync LPA with the
    // (count DESC, label ASC) pick must settle each clique on its own
    // minimum node id, and the bridge must not bleed labels across
    val cliqueA = for (i <- 0 to 3; j <- (i + 1) to 3) yield (i.toLong, j.toLong)
    val cliqueB = for (i <- 10 to 13; j <- (i + 1) to 13) yield (i.toLong, j.toLong)
    val pairs = (cliqueA ++ cliqueB ++ Seq((3L, 10L))).toDF("a", "b")
    val got = Graph.labelPropEdges(pairs, rounds = 5).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((0 to 3).forall(i => got(i.toLong) === 0L),
      s"clique A must settle on label 0: $got")
    assert((10 to 13).forall(i => got(i.toLong) === 10L),
      s"clique B must settle on label 10: $got")
    // a lone edge between two isolated nodes: each adopts the OTHER's
    // label every round (sync oscillation is the documented semantics);
    // after an odd round count both carry the partner's start label —
    // pinning this keeps the operator honest about synchronous updates
    val lone = Seq((100L, 101L)).toDF("a", "b")
    val pair = Graph.labelPropEdges(lone, rounds = 5).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(pair === Map(100L -> 101L, 101L -> 100L))
    // deterministic across repartitionings (the oracle replays the
    // same rounds in DuckDB)
    val again = Graph.labelPropEdges(pairs.repartition(7), rounds = 5).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(again === got)
  }

  test("rounded supplier scores are identical across repartitionings") {
    val a = Graph.pageRank(spark, sf0001).collect().toSeq
    val old = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "7")
      val b = Graph.pageRank(spark, sf0001).collect().toSeq
      assert(a === b)
    } finally spark.conf.set("spark.sql.shuffle.partitions", old)
  }

  test("degree stats: log2 buckets recompute on a planted star-plus-leaf graph") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft-degstats")
      .toFile.getAbsolutePath
    // customer 1 trades with suppliers 1,2,3 (deg 3); customer 2 with
    // supplier 1 (deg 1); duplicate lines must not inflate degrees
    Seq((10L, 1L), (11L, 1L), (12L, 1L), (13L, 2L))
      .toDF("o_orderkey", "o_custkey")
      .write.mode("overwrite").parquet(s"$d/orders.parquet")
    Seq((10L, 1L), (10L, 1L), (11L, 2L), (12L, 3L), (13L, 1L))
      .toDF("l_orderkey", "l_suppkey")
      .write.mode("overwrite").parquet(s"$d/lineitem.parquet")
    val out = graft.operators.Graph.degreeStats(spark, d).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(out(("customer", 0L)) === ((1L, 1L, 1L, 1L)))
    assert(out(("customer", 1L)) === ((1L, 3L, 3L, 3L)))
    assert(out(("supplier", 0L)) === ((2L, 1L, 1L, 2L)))
    assert(out(("supplier", 1L)) === ((1L, 2L, 2L, 2L)))
    assert(out.size === 4)
  }
}
