package graft

import graft.sources.Bucketing
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec

/** The whole point of bucketing is the missing shuffle — assert it. */
class BucketingSpec extends SparkSpec {

  // AQE wraps materialized exchanges in query stages whose children are
  // opaque to collect(), so plan inspection here runs with AQE off —
  // the Exchange placement question is identical either way.
  private def shuffleCount(df: org.apache.spark.sql.DataFrame): Int =
    df.queryExecution.executedPlan.collect {
      case _: ShuffleExchangeExec => 1
    }.sum

  test("bucketed fact-fact join plans with zero shuffle exchanges") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      Bucketing.writeBucketed(
        Tables.orders(spark, sf0001), "orders_b", "o_orderkey", 4, Some("o_orderkey"))
      Bucketing.writeBucketed(
        Tables.lineitem(spark, sf0001), "lineitem_b", "l_orderkey", 4, Some("l_orderkey"))

      val joined = Bucketing.bucketedJoin(spark, "lineitem_b", "orders_b",
        "l_orderkey", "o_orderkey")
      assert(joined.count() === Tables.lineitem(spark, sf0001).count())
      assert(shuffleCount(joined) === 0, "bucketed join must not shuffle")

      // control: the same join over plain parquet shuffles both sides
      val plain = Tables.lineitem(spark, sf0001).join(Tables.orders(spark, sf0001),
        org.apache.spark.sql.functions.col("l_orderkey") ===
          org.apache.spark.sql.functions.col("o_orderkey"))
      assert(shuffleCount(plain) >= 2, "non-bucketed control should shuffle")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }
}
