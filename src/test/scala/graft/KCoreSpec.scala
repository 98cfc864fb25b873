package graft

import graft.operators.Graph
import org.apache.spark.sql.functions._

/** k-core peeling and Adamic–Adar link prediction. */
class KCoreSpec extends SparkSpec {

  test("kcore: planted K4 + cascading pendant path + C5, multi-round peel") {
    import spark.implicits._
    // K4 on 1-4; 5 hangs off 4 with two pendant leaves 6, 7 (deg(5)=3
    // survives round 1, cascades out in round 2); C5 on 10-14 (all
    // deg 2, gone in round 1)
    val pairs = Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (4L, 5L), (5L, 6L), (5L, 7L),
      (10L, 11L), (11L, 12L), (12L, 13L), (13L, 14L), (14L, 10L))
      .toDF("a", "b")
    val core = Graph.kcoreEdges(pairs, k = 3, rounds = 8).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(core === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    // one round is NOT enough (node 5 only cascades out in round 2)
    val r1 = Graph.kcoreEdges(pairs, k = 3, rounds = 1).collect()
      .map(_.getLong(0)).toSet
    assert(r1.contains(5L))
    // the early exit (unchanged alive count stops the loop) cannot
    // change the result: a 50-round budget returns the same core
    val r50 = Graph.kcoreEdges(pairs, k = 3, rounds = 50).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r50 === core)
  }

  test("kcore: the 8-round definition is a fixpoint on the real trade graph") {
    // sf0.01: the derived threshold peels ~60% of nodes and leaves a
    // nontrivial stable core (at sf0.001 the cascade runs to empty —
    // equally converged, but nonEmpty is the stronger check)
    val r8 = Graph.kcore(spark, sf001).collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val r9 = Graph.kcore(spark, sf001, rounds = 9).collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(r8 === r9 && r8.nonEmpty)
  }

  test("adamic_adar matches an independent driver recompute incl. tie order") {
    val ps = Tables.lineitem(spark, sf0001)
      .join(Tables.orders(spark, sf0001), col("l_orderkey") === col("o_orderkey"))
      .select(col("l_suppkey").as("c"), col("o_custkey").as("z"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    def r6(x: Double): BigDecimal =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    val byZ = ps.groupBy(_._2).map { case (z, cz) => z -> cz.map(_._1).sorted }
      .filter { case (_, cs) => cs.length >= 2 && cs.length <= 256 }
    val scores = collection.mutable.Map[(Long, Long), (Long, BigDecimal)]()
    byZ.foreach { case (z, cs) =>
      val w = r6(1.0 / math.log(cs.length.toDouble))
      for (i <- cs.indices; j <- i + 1 until cs.length) {
        val k = (cs(i), cs(j))
        val (n, s) = scores.getOrElse(k, (0L, BigDecimal(0)))
        scores(k) = (n + 1, s + w)
      }
    }
    val want = scores.toSeq
      .map { case ((a, b), (n, s)) => (a, b, n, s.toDouble) }
      .sortBy { case (a, b, _, aa) => (-aa, a, b) }
      .take(20)
    val got = Graph.adamicAdar(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(got === want)
  }
}
