package graft

import graft.operators.Skew
import org.apache.spark.sql.functions._

/** Salted aggregation must agree exactly — counts and decimal-exact
  * money sums — with the direct aggregation. */
class SkewSpec extends SparkSpec {
  test("salted two-phase aggregation equals direct groupBy") {
    val ev = Tables.events(spark, sf0001)
    val direct = ev.groupBy(col("event_type"))
      .agg(graft.operators.Agg.moneySum(col("value")).as("total"), count(lit(1)).as("ct"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
    val salted = Skew.saltedSumCount(ev, Seq(col("event_type")), col("value"), buckets = 8)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
    // decimal-exact: sums match bit-for-bit despite the extra phase
    assert(salted === direct)
  }
}
