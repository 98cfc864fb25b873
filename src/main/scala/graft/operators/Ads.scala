package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Agg._

/** ADS serving queries — the Spark-native versions of the publisher's
  * ClickHouse queries
  * (gmall-publisher/src/main/java/com/atguigu/gmall/gmallpublisher/
  * mapper/ProductStatsMapper.java). */
object Ads {

  /** Daily GMV (`getGMV`: sum(order_amount) where toYYYYMMDD(stt)=date),
    * generalized to all days so the result is a reusable daily series. */
  def gmv(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .groupBy(date_format(col("o_orderdate"), "yyyy-MM-dd").as("dt"))
      .agg(moneySum(col("o_totalprice")).as("gmv"))
      .orderBy(col("dt"))

  val gmvSql: String =
    s"""SELECT strftime(o_orderdate, '%Y-%m-%d') AS dt,
       |  ${sqlMoneySum("o_totalprice")} AS gmv
       |FROM orders GROUP BY 1 ORDER BY dt""".stripMargin

  /** Top-N trademark by order amount (`getProductStatsByTrademark`);
    * `p_brand` plays tm_name. Deterministic tie-break on brand name. */
  def trademarkTopN(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .join(Tables.part(s, d), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(moneySum(col("l_extendedprice")).as("order_amount"))
      .orderBy(col("order_amount").desc, col("p_brand"))
      .limit(5)

  val trademarkTopNSql: String =
    s"""SELECT p_brand, ${sqlMoneySum("l_extendedprice")} AS order_amount
       |FROM lineitem JOIN part ON l_partkey = p_partkey
       |GROUP BY p_brand
       |ORDER BY order_amount DESC, p_brand
       |LIMIT 5""".stripMargin
}
