package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import Agg._

/** DWS layer: multi-stream unions + windowed star-schema aggregation —
  * the Spark-native versions of VisitorStatsApp / ProductStatsApp /
  * ProvinceStatsSqlApp / KeywordStatsApp
  * (gmall-realtime/src/main/java/com/atguigu/app/dws/). */
object Dws {

  /** Visitor stats (VisitorStatsApp.java): union four derived streams
    * (pv / uv / session-visit / jump), key by dimension, tumble by
    * hour, reduce-sum the metric columns and emit window start/end
    * strings — precisely the reference's reduce + ProcessWindowFunction,
    * with `user_id % 10` playing the channel dimension. Each leg is a
    * zero-valued metric row so the union aggregates with one map-side
    * partial agg. */
  def visitorStats(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_ns"), col("event_id"))
    val metric = (pv: Int, uv: Int, sv: Int, uj: Int) => (df: DataFrame) =>
      df.select(
        col("user_id"), col("ts"),
        lit(pv).as("pv"), lit(uv).as("uv"), lit(sv).as("sv"), lit(uj).as("uj"),
        (if (pv == 1) col("value") else lit(0.0)).as("dur"))

    val pvLeg = metric(1, 0, 0, 0)(ev.filter(col("event_type").isin("view", "click")))
    val uvLeg = metric(0, 1, 0, 0)(
      ev.withColumn("visit_date", to_date(col("ts")))
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("user_id"), col("visit_date"))
            .orderBy(col("ts_ns"), col("event_id"))))
        .filter(col("rn") === 1))
    val gapped = ev
      .withColumn("prev_ns", lag(col("ts_ns"), 1).over(w))
      .withColumn("next_ns", lead(col("ts_ns"), 1).over(w))
    val svLeg = metric(0, 0, 1, 0)(
      gapped.filter(col("prev_ns").isNull || col("ts_ns") - col("prev_ns") > Sessions.GapNs))
    val ujLeg = metric(0, 0, 0, 1)(
      gapped.filter(
        (col("prev_ns").isNull || col("ts_ns") - col("prev_ns") > Sessions.GapNs) &&
        (col("next_ns").isNull || col("next_ns") - col("ts_ns") > Sessions.GapNs)))

    pvLeg.unionAll(uvLeg).unionAll(svLeg).unionAll(ujLeg)
      .withColumn("stt", date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss"))
      .withColumn("ch", col("user_id") % 10)
      .groupBy(col("stt"), col("ch"))
      .agg(
        sum(col("pv")).as("pv_ct"), sum(col("uv")).as("uv_ct"),
        sum(col("sv")).as("sv_ct"), sum(col("uj")).as("uj_ct"),
        moneySum(col("dur")).as("dur_sum"))
      .orderBy(col("stt"), col("ch"))
  }

  val visitorStatsSql: String =
    s"""WITH ordered AS (
       |  SELECT user_id, ts, event_id, event_type, value,
       |    lag(ts)  OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts,
       |    lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_ts,
       |    row_number() OVER (PARTITION BY user_id, CAST(ts AS DATE)
       |                       ORDER BY ts, event_id) AS day_rn
       |  FROM events),
       |legs AS (
       |  SELECT user_id, ts, 1 AS pv, 0 AS uv, 0 AS sv, 0 AS uj, value AS dur
       |  FROM ordered WHERE event_type IN ('view','click')
       |  UNION ALL
       |  SELECT user_id, ts, 0, 1, 0, 0, 0.0 FROM ordered WHERE day_rn = 1
       |  UNION ALL
       |  SELECT user_id, ts, 0, 0, 1, 0, 0.0 FROM ordered
       |  WHERE prev_ts IS NULL OR ts - prev_ts > INTERVAL 600 SECOND
       |  UNION ALL
       |  SELECT user_id, ts, 0, 0, 0, 1, 0.0 FROM ordered
       |  WHERE (prev_ts IS NULL OR ts - prev_ts > INTERVAL 600 SECOND)
       |    AND (next_ts IS NULL OR next_ts - ts > INTERVAL 600 SECOND))
       |SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS stt,
       |  user_id % 10 AS ch,
       |  sum(pv) AS pv_ct, sum(uv) AS uv_ct, sum(sv) AS sv_ct, sum(uj) AS uj_ct,
       |  ${sqlMoneySum("dur")} AS dur_sum
       |FROM legs
       |GROUP BY 1, 2
       |ORDER BY stt, ch""".stripMargin

  /** Product stats (ProductStatsApp.java): per-sku metric wide row —
    * order count via COUNT DISTINCT (the reference carries order-id
    * HashSets through its reduce; the scalable form is a two-phase
    * distinct aggregate), amount sums, refund split by return flag,
    * then broadcast dim enrichment with `part`. */
  def productStats(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy(col("l_partkey"))
      .agg(
        countDistinct(col("l_orderkey")).as("order_ct"),
        moneySum(col("l_quantity")).as("sku_num"),
        moneySum(col("l_extendedprice")).as("order_amount"),
        countDistinct(when(col("l_returnflag") === "R", col("l_orderkey"))).as("refund_order_ct"),
        sum(when(col("l_returnflag") === "R", dec(col("l_extendedprice")))
          .otherwise(lit(BigDecimal(0)).cast(org.apache.spark.sql.types.DecimalType(18, 2))))
          .cast("double").as("refund_amount"))
      .join(Tables.part(s, d), col("l_partkey") === col("p_partkey"))
      .select(col("l_partkey"), col("p_name"), col("p_brand"),
        col("order_ct"), col("sku_num"), col("order_amount"),
        col("refund_order_ct"), col("refund_amount"))
      .orderBy(col("l_partkey"))

  val productStatsSql: String =
    s"""SELECT l_partkey, p_name, p_brand,
       |  count(DISTINCT l_orderkey) AS order_ct,
       |  ${sqlMoneySum("l_quantity")} AS sku_num,
       |  ${sqlMoneySum("l_extendedprice")} AS order_amount,
       |  count(DISTINCT CASE WHEN l_returnflag = 'R' THEN l_orderkey END) AS refund_order_ct,
       |  CAST(sum(CASE WHEN l_returnflag = 'R' THEN CAST(l_extendedprice AS DECIMAL(18,2))
       |                ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS refund_amount
       |FROM lineitem JOIN part ON l_partkey = p_partkey
       |GROUP BY l_partkey, p_name, p_brand
       |ORDER BY l_partkey""".stripMargin

  /** Province stats (ProvinceStatsSqlApp.java:52-62): tumbling window ×
    * province GROUP BY with count(distinct order_id) + sum(amount).
    * Nation plays province; the month plays the 10 s tumble. */
  def provinceStats(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .groupBy(
        date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM-dd").as("stt"),
        col("n_name"))
      .agg(
        countDistinct(col("o_orderkey")).as("order_count"),
        moneySum(col("o_totalprice")).as("order_amount"))
      .orderBy(col("stt"), col("n_name"))

  val provinceStatsSql: String =
    s"""SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS stt, n_name,
       |  count(DISTINCT o_orderkey) AS order_count,
       |  ${sqlMoneySum("o_totalprice")} AS order_amount
       |FROM orders
       |JOIN customer ON o_custkey = c_custkey
       |JOIN nation ON c_nationkey = n_nationkey
       |GROUP BY 1, 2
       |ORDER BY stt, n_name""".stripMargin

  /** Keyword stats (KeywordStatsApp.java:63-77 + KeywordUDTF): tokenize
    * + LATERAL explode + count per keyword. The IK segmenter becomes a
    * whitespace tokenizer (the public-domain analog); explode keeps the
    * work fully distributed — no driver-side tokenization. */
  def keywordStats(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(explode(split(col("text"), " ")).as("keyword"))
      .filter(length(col("keyword")) > 0)
      .groupBy(col("keyword"))
      .agg(count(lit(1)).as("ct"))
      .withColumn("source", lit("SEARCH"))
      .orderBy(col("keyword"))

  val keywordStatsSql: String =
    """SELECT keyword, count(*) AS ct, 'SEARCH' AS source FROM (
      |  SELECT unnest(string_split(text, ' ')) AS keyword FROM documents) t
      |WHERE length(keyword) > 0
      |GROUP BY keyword
      |ORDER BY keyword""".stripMargin

  /** Windowed product stats — the reference shape exactly: tumbling
    * event-time window × sku key → sums + COUNT DISTINCT orders
    * (ProductStatsApp.java:215-263: keyBy(sku).window(10s).reduce).
    * 30-day tumble on ship date via Spark's `window()` (epoch-aligned),
    * so both the window assignment and the aggregate are verified. */
  def productStatsWindowed(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy(window(col("l_shipdate"), "30 days").as("w"), col("l_partkey"))
      .agg(
        countDistinct(col("l_orderkey")).as("order_ct"),
        moneySum(col("l_extendedprice")).as("order_amount"))
      .select(
        date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("stt"),
        date_format(col("w.end"), "yyyy-MM-dd HH:mm:ss").as("edt"),
        col("l_partkey"), col("order_ct"), col("order_amount"))
      .orderBy(col("stt"), col("l_partkey"))

  val productStatsWindowedSql: String =
    s"""SELECT
       |  strftime(make_timestamp(((CAST(epoch(l_shipdate) AS BIGINT) // 2592000) * 2592000)
       |           * 1000000), '%Y-%m-%d %H:%M:%S') AS stt,
       |  strftime(make_timestamp(((CAST(epoch(l_shipdate) AS BIGINT) // 2592000) * 2592000
       |           + 2592000) * 1000000), '%Y-%m-%d %H:%M:%S') AS edt,
       |  l_partkey,
       |  count(DISTINCT l_orderkey) AS order_ct,
       |  ${sqlMoneySum("l_extendedprice")} AS order_amount
       |FROM lineitem
       |GROUP BY 1, 2, 3
       |ORDER BY stt, l_partkey""".stripMargin
}
