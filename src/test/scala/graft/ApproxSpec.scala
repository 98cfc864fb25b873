package graft

import graft.operators.Relational

/** HLL approximate distinct must stay within its configured relative
  * standard deviation of the exact count. */
class ApproxSpec extends SparkSpec {
  test("approx_count_distinct within 5% of exact") {
    Relational.approxDistinct(spark, sf001).collect().foreach { r =>
      val (approx, exact) = (r.getLong(1), r.getLong(2))
      assert(math.abs(approx - exact).toDouble / exact < 0.05,
        s"approx $approx vs exact $exact")
    }
  }
}
