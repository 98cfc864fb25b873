package graft

import graft.operators.Skew
import org.apache.spark.sql.functions._

/** Salted aggregation must agree exactly with the direct aggregation
  * (counts are integers — no FP-order concern in the assertion). */
class SkewSpec extends SparkSpec {
  test("salted two-phase aggregation equals direct groupBy") {
    val ev = Tables.events(spark, sf0001)
    val direct = ev.groupBy(col("event_type"))
      .agg(count(lit(1)).as("ct"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = Skew.saltedSumCount(ev, Seq(col("event_type")), col("value"), buckets = 8)
      .collect().map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(salted === direct)
  }
}
