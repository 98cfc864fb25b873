package graft

import graft.operators.{Similarity, Sketches}
import org.apache.spark.sql.functions._

/** Native theta-sketch set algebra: estimate quality vs the exact
  * witness, exactness below nominal entries, partitioning invariance
  * (the retained-hash set is a set property), and the SQL surface.
  * Plus the per-dimension embedding stats card. */
class ThetaSpec extends SparkSpec {

  test("theta intersection tracks the exact overlap within 5%") {
    val r = Sketches.thetaIntersectRaw(spark, sf001).collect()
    assert(r.length === 1)
    val est = r.head.getDouble(0)
    val exact = r.head.getLong(1)
    assert(r.head.getLong(2) === 2L, "both sides present")
    assert(exact > 0)
    assert(math.abs(est - exact) / exact <= 0.05,
      s"theta estimate $est vs exact $exact")
  }

  test("q_theta_intersect witness card: exact overlap, theta_ok pinned TRUE") {
    val r = Sketches.thetaIntersect(spark, sf001).collect()
    assert(r.length === 1)
    assert(r.head.getLong(0) > 0, "exact overlap present")
    assert(r.head.getLong(1) === 2L)
    assert(r.head.getInt(2) === 1, "theta_ok must hold")
  }

  test("theta estimates are exact below nominal entries and set-order-independent") {
    graft.Graft.registerFunctions(spark)
    import spark.implicits._
    // two sides over a small universe: sketches retain everything →
    // union and intersection estimates are EXACT
    val rows = (1L to 500L).map(i => ("a", i)) ++ (251L to 900L).map(i => ("b", i))
    val df = rows.toDF("side", "id")
    def run(d: org.apache.spark.sql.DataFrame): (Double, Double) = {
      val sk = d.groupBy($"side").agg(call_function("graft_theta_agg", $"id").as("sk"))
      val r = sk.agg(
        call_function("graft_theta_union_card", $"sk").as("u"),
        call_function("graft_theta_intersect_card", $"sk").as("i")).head()
      (r.getDouble(0), r.getDouble(1))
    }
    val (u1, i1) = run(df)
    assert(u1 === 900.0)  // |1..900|
    assert(i1 === 250.0)  // |251..500|
    val (u2, i2) = run(df.repartition(7))
    assert((u2, i2) === ((u1, i1)))
  }

  test("theta functions compose in pure SQL text") {
    graft.Graft.registerFunctions(spark)
    Graft.registerViews(spark, sf0001)
    val est = spark.sql(
      """SELECT graft_theta_union_card(sk) AS u FROM (
        |  SELECT event_type, graft_theta_agg(user_id) AS sk
        |  FROM events GROUP BY 1)""".stripMargin).head().getDouble(0)
    val exact = Tables.events(spark, sf0001)
      .agg(countDistinct(col("user_id"))).head().getLong(0)
    assert(est === exact.toDouble, "below-k sketches are exact")
  }

  test("emb_dim_stats: moments recompute by hand and flag a planted dead dimension") {
    import spark.implicits._
    val d = java.nio.file.Files.createTempDirectory("graft-dimstats")
      .toFile.getAbsolutePath
    // dim 1 varies (1.0, 3.0), dim 2 is CONSTANT (the dead-dimension
    // case the card exists to flag), dim 3 has a negative range
    Seq(
      (0L, Array(1.0f, 5.0f, -2.0f), 0),
      (1L, Array(3.0f, 5.0f, 4.0f), 0))
      .toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/embeddings.parquet")
    val out = Similarity.embDimStats(spark, d).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5)))).toMap
    assert(out(1L) === ((2L, 2.0, 1.0, 1.0, 3.0)))
    assert(out(2L) === ((2L, 5.0, 0.0, 5.0, 5.0)))   // zero variance
    assert(out(3L) === ((2L, 1.0, 9.0, -2.0, 4.0)))
  }
}
