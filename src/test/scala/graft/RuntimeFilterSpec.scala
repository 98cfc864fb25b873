package graft

import org.apache.spark.sql.functions._

/** Runtime Bloom-filter join pruning: when one join side is made
  * selective by a filter Catalyst can't push to the other side, Spark
  * can inject a Bloom filter built from the selective side and apply
  * it to the big side's scan — at 100 TB this prunes shuffle input
  * before the exchange, which partition pruning and static pushdown
  * cannot do for join keys. This spec proves the engine configuration
  * actually injects the filter and that results are unchanged. */
class RuntimeFilterSpec extends SparkSpec {

  private def joined() = {
    // selective dim side: ~1/25 of orders; big side: lineitem
    val sel = Tables.orders(spark, sf001)
      .filter(col("o_orderpriority") === "1-URGENT" && col("o_totalprice") > 200000)
      .select(col("o_orderkey"), col("o_orderdate"))
    Tables.lineitem(spark, sf001)
      .join(sel, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderdate"))
      .agg(sum(col("l_quantity")).as("qty"))
  }

  private def withConfs(confs: (String, String)*)(f: => Unit): Unit = {
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try f finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("bloom filter is injected on the big join side and preserves results") {
    var withFilter: Array[org.apache.spark.sql.Row] = null
    var without: Array[org.apache.spark.sql.Row] = null
    withConfs(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "50MB",
      // default 10GB — the rule only fires when the big side is big;
      // lower it so the sf0.001 lineitem qualifies as "big"
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtimeFilter.number.threshold" -> "10",
      // force the non-broadcast join shape the filter exists for
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1") {
      val df = joined()
      val plan = df.queryExecution.optimizedPlan.toString
      assert(plan.contains("might_contain") || plan.contains("bloom_filter_agg"),
        s"no runtime bloom filter injected:\n${plan.take(2000)}")
      withFilter = df.collect().sortBy(_.toString)
    }
    withConfs(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1") {
      without = joined().collect().sortBy(_.toString)
    }
    assert(withFilter.toSeq === without.toSeq)
    assert(withFilter.nonEmpty)
  }
}
