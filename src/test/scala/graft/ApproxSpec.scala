package graft

import graft.operators.Relational

/** HLL approximate distinct must stay within its configured relative
  * standard deviation of the exact count. */
class ApproxSpec extends SparkSpec {
  test("approx_count_distinct within 5% of exact") {
    Relational.approxDistinctRaw(spark, sf001).collect().foreach { r =>
      val (approx, exact) = (r.getLong(1), r.getLong(2))
      assert(math.abs(approx - exact).toDouble / exact < 0.05,
        s"approx $approx vs exact $exact")
    }
  }

  test("q_approx_distinct witness card: exact counts, hll_ok pinned TRUE") {
    import org.apache.spark.sql.functions._
    val exact = Tables.lineitem(spark, sf001)
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_orderkey")).as("e")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val rows = Relational.approxDistinct(spark, sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) === exact(r.getString(0)), s"${r.getString(0)} exact")
      assert(r.getInt(2) === 1, s"${r.getString(0)}: hll_ok must hold")
    }
  }

  test("q_quantile_approx witness card: exact n, rank-guarantee flags TRUE") {
    import org.apache.spark.sql.functions._
    val n = Tables.lineitem(spark, sf001)
      .groupBy(col("l_returnflag")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val rows = Relational.quantilesApprox(spark, sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) === n(r.getString(0)), s"${r.getString(0)} n_rows")
      Seq(2, 3, 4).foreach(i =>
        assert(r.getInt(i) === 1, s"${r.getString(0)}: flag $i must hold"))
    }
  }

  test("approx percentiles bracket the exact interpolated quantiles") {
    import org.apache.spark.sql.functions._
    val exact = Relational.quantiles(spark, sf001).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    val groups = Tables.lineitem(spark, sf001)
      .groupBy(col("l_returnflag"))
      .agg(collect_set(col("l_extendedprice")).as("vals")).collect()
      .map(r => r.getString(0) -> r.getSeq[Double](1).toSet).toMap
    val approx = Relational.quantilesApproxRaw(spark, sf001).collect()
    assert(approx.nonEmpty)
    approx.foreach { r =>
      val flag = r.getString(0)
      val (e25, e50, e75) = exact(flag)
      Seq(r.getDouble(1) -> e25, r.getDouble(2) -> e50, r.getDouble(3) -> e75)
        .foreach { case (a, e) =>
          // the sketch returns a REAL element of the group...
          assert(groups(flag).contains(a), s"$a is not a data element of $flag")
          // ...within 2% rank-error distance of the exact quantile value
          assert(math.abs(a - e) / e < 0.02, s"approx $a vs exact $e for $flag")
        }
    }
  }
}
