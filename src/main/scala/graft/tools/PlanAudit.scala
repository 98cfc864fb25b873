package graft.tools

import org.apache.spark.sql.SparkSession
import graft.operators._
object PlanAudit {
  def main(a: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions","4")
      .config("spark.ui.enabled","false")
      .config("spark.sql.legacy.parquet.nanosAsLong","true")
      .config("spark.sql.adaptive.enabled","true").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.01"
    for ((n, df) <- Seq(
      "q1" -> Relational.q1PricingSummary(spark, d),
      "q3" -> Relational.q3ShippingPriority(spark, d),
      "orderWide" -> Dwm.orderWide(spark, d),
      "productStats" -> Dws.productStats(spark, d))) {
      println(s"===== $n =====")
      println(df.queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode).take(4000))
    }
    spark.stop()
  }
}
