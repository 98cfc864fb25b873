package graft

import org.apache.spark.sql.functions._

/** Substantiates SURVEY §4's claim that skewed joins are handled by
  * AQE: a join where one key holds most rows must both finish and
  * actually take the skew-split path (visible as skew=true in the
  * final adaptive plan). */
class SkewJoinSpec extends SparkSpec {

  test("AQE splits a skewed sort-merge join and keeps results exact") {
    import spark.implicits._
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8KB",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // key 0 carries 200k rows; keys 1..99 carry 50 each.
      // collect() (not count()) so the inspected QueryExecution is the
      // one that actually ran — count() builds a separate plan.
      val left = spark.range(200000).select(lit(0L).as("k"), col("id").as("v"))
        .unionAll(spark.range(50 * 99).select((col("id") % 99 + 1).as("k"), col("id").as("v")))
      val right = spark.range(100).select(col("id").as("k"), (col("id") * 10).as("w"))
      val joined = left.join(right, "k")
      assert(joined.collect().length === 200000 + 50 * 99)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"expected AQE skew-join split in plan:\n${plan.take(2000)}")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
