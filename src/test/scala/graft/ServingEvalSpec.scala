package graft

import java.nio.file.Files

import graft.operators.{Ads, Graph, Similarity}

/** Round-7 serving/eval additions on planted inputs: Jaccard link
  * prediction on a hand-built bipartite graph, the A/B readout on a
  * planted conversion split, revenue concentration on a known 1..10
  * revenue ladder, and ANN recall cross-checked against the two
  * underlying result sets. */
class ServingEvalSpec extends SparkSpec {

  test("graph_jaccard: hand-built bipartite graph scores exactly") {
    import spark.implicits._
    val d = Files.createTempDirectory("graft-jac").toFile.getAbsolutePath
    // supplier -> customers: s1:{z1,z2} s2:{z1,z2,z3} s3:{z1} s4:{z3}
    val edges = Seq((1L, 1L), (1L, 2L), (2L, 1L), (2L, 2L), (2L, 3L),
      (3L, 1L), (4L, 3L))
    edges.zipWithIndex.map { case ((_, cust), i) =>
      (i.toLong, cust, java.time.LocalDateTime.parse("2024-01-01T00:00:00"), 1.0)
    }.toDF("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
      .write.mode("overwrite").parquet(s"$d/orders.parquet")
    edges.zipWithIndex.map { case ((supp, cust), i) => (i.toLong, supp) }
      .toDF("l_orderkey", "l_suppkey")
      .write.mode("overwrite").parquet(s"$d/lineitem.parquet")
    val out = Graph.jaccardLinks(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getDouble(3))))
      .toMap
    assert(out((1L, 2L)) === ((2L, 0.666667)))
    assert(out((1L, 3L)) === ((1L, 0.5)))
    assert(out((2L, 3L)) === ((1L, 0.333333)))
    assert(out((2L, 4L)) === ((1L, 0.333333)))
    assert(!out.contains((1L, 4L)), "no shared customer -> no pair")
  }

  test("ads_ab_test: planted conversions reproduce exact counts and a signed z") {
    import spark.implicits._
    val d = Files.createTempDirectory("graft-ab").toFile.getAbsolutePath
    // arm is a pure function of user_id — recompute it here and plant
    // a conversion pattern where arm A converts strictly more
    def arm(u: Long): String =
      if (((u % 4294967296L) * 1327217885L) % 4294967296L < 2147483648L) "A"
      else "B"
    val users = (1L to 40L)
    val byArm = users.groupBy(arm)
    // the hash must NOT degenerate to an even/odd user_id split (the
    // old low-bit formula did): each arm must mix both parities
    Seq("A", "B").foreach { a =>
      assert(byArm(a).exists(_ % 2 == 0) && byArm(a).exists(_ % 2 == 1),
        s"arm $a is parity-pure — hash confounded with user_id % 2")
    }
    val converters = byArm("A").take(byArm("A").size * 3 / 4) ++
      byArm("B").take(byArm("B").size / 4)
    users.zipWithIndex.map { case (u, i) =>
      val et = if (converters.contains(u)) "purchase" else "view"
      (i.toLong, java.time.LocalDateTime.parse("2024-01-01T10:00:00"),
        u, et, 1.0, """{"k":1}""")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$d/events.parquet")
    val r = Ads.abTest(spark, d).collect().head
    assert(r.getLong(0) === byArm("A").size.toLong)
    assert(r.getLong(1) === byArm("B").size.toLong)
    assert(r.getLong(2) === byArm("A").size.toLong * 3 / 4)
    assert(r.getLong(3) === byArm("B").size.toLong / 4)
    assert(r.getDouble(7) > 0, "A converts more -> positive z")
  }

  test("ads_revenue_conc: the 1..10 revenue ladder gives Gini 0.3 and exact shares") {
    import spark.implicits._
    val d = Files.createTempDirectory("graft-conc").toFile.getAbsolutePath
    (1 to 10).map(i =>
      (i.toLong, i.toLong,
        java.time.LocalDateTime.parse("2024-01-01T00:00:00"), i * 1.0))
      .toDF("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
      .write.mode("overwrite").parquet(s"$d/orders.parquet")
    val rows = Ads.revenueConcentration(spark, d).collect()
    assert(rows.length === 10)
    rows.foreach { r =>
      assert(r.getLong(1) === 1L)
      assert(r.getDouble(4) === 0.3) // Gini of 1..10
    }
    val top = rows.find(_.getInt(0) == 9).get
    assert(top.getDouble(2) === 10.0)
    assert(top.getDouble(3) === math.rint(10.0 / 55.0 * 1e6) / 1e6)
  }

  test("emb_ann_recall: recall recomputes from the two underlying result sets") {
    val truth = Similarity.annBruteforce(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val cand = Similarity.annLsh(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = Similarity.annRecall(spark, sf0001).collect()
    assert(recall.length === 8)
    recall.foreach { r =>
      val q = r.getLong(0)
      val expected = truth.filter(_._1 == q).count(cand.contains)
      assert(r.getLong(1) === expected.toLong)
      assert(r.getDouble(2) === math.rint(expected / 5.0 * 1e6) / 1e6)
    }
  }
}
