package graft

import graft.functions.TopKFreqAgg
import org.apache.spark.sql.functions._

/** Misra–Gries guarantees — the heavy-hitter aggregate has no SQL
  * oracle (marginal counts depend on merge order, inherent to MG), so
  * this spec is its correctness gate: exactness below k distinct
  * items, the heavy-item guarantee and deficit bound under DIFFERENT
  * partitionings, and the SQL surface. */
class TopKFreqSpec extends SparkSpec {
  import spark.implicits._

  private def summarize(terms: Seq[String], k: Int, parts: Int): Map[String, (Long, Long)] = {
    graft.Graft.registerFunctions(spark)
    terms.toDF("term").repartition(parts)
      .agg(call_function("graft_topk_freq", col("term"), lit(k)).as("s"))
      .select(explode(col("s")).as("e"))
      .select(col("e.item"), col("e.count"), col("e.max_deficit"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
  }

  test("below k distinct items the summary is exact under any partitioning") {
    val terms = Seq.fill(40)("a") ++ Seq.fill(25)("b") ++ Seq.fill(3)("c")
    for (parts <- Seq(1, 4)) {
      val got = summarize(terms, k = 8, parts)
      assert(got.view.mapValues(_._1).toMap === Map("a" -> 40L, "b" -> 25L, "c" -> 3L))
      assert(got.values.forall(_._2 == 0L), "no decrement ever ran")
    }
  }

  test("heavy items survive decrements and counts respect the deficit bound, per partitioning") {
    // skewed stream: 2 heavy items + 30 rare ones, k = 8 → decrements engage
    val heavy = Seq.fill(200)("hot1") ++ Seq.fill(120)("hot2")
    val noise = (0 until 30).flatMap(i => Seq.fill(6)(s"rare$i"))
    val terms = scala.util.Random.shuffle(heavy ++ noise)
    val truth = terms.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val n = terms.size.toLong
    val k = 8
    for (parts <- Seq(1, 2, 8)) {
      val got = summarize(terms, k, parts)
      assert(got.size <= k)
      // every item with true frequency > n/k is present
      truth.filter(_._2 > n / k).keys.foreach(h =>
        assert(got.contains(h), s"heavy item $h missing at parts=$parts"))
      // counts under-count by at most the reported deficit, never over
      got.foreach { case (item, (ct, deficit)) =>
        assert(ct <= truth(item), s"$item overcounted")
        assert(truth(item) - ct <= deficit, s"$item under-counted beyond the bound")
        assert(deficit <= n / (k + 1) + 1, "deficit beyond the MG bound")
      }
    }
  }

  test("driver-side Summary agrees with a brute merge of partial summaries") {
    val a = new TopKFreqAgg.Summary(4)
    Seq("x", "x", "y", "z", "w", "v").foreach(a.add(_, 1L))
    val b = new TopKFreqAgg.Summary(4)
    Seq("x", "y", "y", "u", "t").foreach(b.add(_, 1L))
    a.mergeIn(b)
    assert(a.counters.size <= 4)
    // x: true 3, deficit-bounded
    assert(a.counters.get("x").forall(_ <= 3L))
  }

  test("heavy hitters operator returns EXACTLY the frequent-item set above n/k") {
    import org.apache.spark.sql.functions._
    val k = 64
    val terms = graft.Tables.documents(spark, sf001)
      .select(explode(regexp_extract_all(lower(col("text")), lit("[a-z0-9]+"), lit(0))).as("t"))
    val n = terms.count()
    // ground truth: exact counts, thresholded — the MG sketch may only
    // PRUNE candidates, so the operator must reproduce this set exactly
    val want = terms.groupBy(col("t")).agg(count(lit(1)).as("ct"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
      .filter { case (_, ct) => ct * k > n }.toMap
    val rows = graft.operators.TextOps.heavyHitters(spark, sf001).collect()
    assert(rows.nonEmpty && rows.length <= k)
    val got = rows.map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === want, "guaranteed frequent set with exact counts")
    val counts = rows.map(_.getLong(1)).toSeq
    assert(counts === counts.sorted.reverse, "sorted by count desc")
    // SQL surface of the underlying MG aggregate
    graft.Graft.registerViews(spark, sf001)
    val viaSql = spark.sql(
      """SELECT explode(graft_topk_freq(t.term, 16)) FROM (
        |  SELECT explode(regexp_extract_all(lower(text), '[a-z0-9]+', 0)) AS term
        |  FROM documents) t""".stripMargin).collect()
    assert(viaSql.length <= 16 && viaSql.nonEmpty)
  }
}
