package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
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

  import org.apache.spark.sql.Column
  import org.apache.spark.sql.expressions.Window

  /** Daily DAU + trailing-7-day WAU — the active-user dashboard series
    * every ClickHouse publisher serves. The WAU is NOT a per-day
    * rescan of a week of raw events: each distinct (user, day)
    * activity row fans out to the ≤7 window days it keeps the user
    * weekly-active for (`sequence`+`explode`, the q_gapfill spine
    * trick), and the count is a two-level exact distinct. Work is
    * O(activity × 7) with every stage partial-aggregable — no per-day
    * window join, no single-partition anything. */
  def activeUsers(s: SparkSession, d: String): DataFrame = {
    // NULL user_ids are excluded EXPLICITLY on both sides: Spark's
    // distinct+count would keep a (null, day) row while SQL's
    // count(DISTINCT user_id) drops it — filtering first makes the
    // two semantics identical by construction
    val ud = Tables.events(s, d)
      .filter(col("user_id").isNotNull)
      .select(col("user_id"), to_date(col("ts")).as("day"))
      .distinct()
    val dau = ud.groupBy(col("day")).agg(count(lit(1)).as("dau"))
    val wau = ud
      .select(col("user_id"),
        explode(sequence(col("day"), date_add(col("day"), 6))).as("day"))
      .distinct()
      .groupBy(col("day")).agg(count(lit(1)).as("wau"))
    // inner join: the fan-out's tail beyond the last active day (and
    // gap days with no activity at all) carry no DAU row and drop
    dau.join(wau, "day")
      .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
        col("dau"), col("wau"))
      .orderBy(col("day"))
  }

  val activeUsersSql: String =
    """WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
      |            FROM events WHERE user_id IS NOT NULL),
      |dau AS (SELECT day, CAST(count(*) AS BIGINT) AS dau FROM ud GROUP BY day),
      |wau AS (SELECT d.day, CAST(count(DISTINCT u.user_id) AS BIGINT) AS wau
      |        FROM (SELECT DISTINCT day FROM ud) d
      |        JOIN ud u ON u.day BETWEEN d.day - 6 AND d.day
      |        GROUP BY d.day)
      |SELECT strftime(dau.day, '%Y-%m-%d') AS day, dau, wau
      |FROM dau JOIN wau ON dau.day = wau.day
      |ORDER BY day""".stripMargin

  /** Rolling z-score anomaly flags on the daily GMV series — the
    * monitoring query behind every "revenue looks weird today" alert.
    * Each day scores against its trailing 7-PRESENT-day window (a rows
    * frame, not a range frame: gap days don't silently shrink the
    * sample). Determinism across engines is by construction: the
    * window sums (Σx, Σx²) are DECIMAL-exact (order-independent), and
    * mean/variance/z are then a fixed sequence of single double ops on
    * identical inputs, 6dp-rounded. Days without a full window, or
    * with a constant window (σ = 0), emit NULL z and flag 0. The only
    * serial structure is the day-granular window — calendar-bounded,
    * the [[graft.operators.Relational.openOrders]] precedent. */
  def gmvAnomaly(s: SparkSession, d: String): DataFrame = {
    // NULL order dates sort NULLS FIRST in Spark windows but NULLS
    // LAST in DuckDB — exclude them on both sides (openOrders precedent)
    val daily = Tables.orders(s, d)
      .filter(col("o_orderdate").isNotNull)
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sum(Agg.dec(col("o_totalprice")))
        .cast(org.apache.spark.sql.types.DecimalType(18, 2)).as("g"))
    val w = Window.orderBy(col("day")).rowsBetween(-6, 0)
    val gd = col("g").cast("double")
    val n = col("cnt").cast("double")
    val s1d = col("s1").cast("double")
    val s2d = col("s2").cast("double")
    val mean = s1d / n
    val variance = greatest((s2d - s1d * s1d / n) / (n - 1), lit(0.0))
    val std = sqrt(variance)
    daily
      .withColumn("cnt", count(lit(1)).over(w))
      .withColumn("s1", sum(col("g")).over(w))
      .withColumn("s2", sum(col("g") * col("g")).over(w))
      .withColumn("z",
        when(col("cnt") === 7 && std > 0, round((gd - mean) / std, 6)))
      .select(
        date_format(col("day"), "yyyy-MM-dd").as("day"),
        gd.as("gmv"), col("z"),
        coalesce((abs(col("z")) > 2).cast("int"), lit(0)).as("is_anomaly"))
      .orderBy(col("day"))
  }

  val gmvAnomalySql: String =
    """WITH daily AS (
      |  SELECT CAST(o_orderdate AS DATE) AS day,
      |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS g
      |  FROM orders WHERE o_orderdate IS NOT NULL GROUP BY 1),
      |win AS (
      |  SELECT day, g,
      |    count(*) OVER w AS cnt,
      |    sum(g) OVER w AS s1,
      |    -- widen BEFORE squaring: DuckDB multiplies DECIMAL(18)s in
      |    -- int64 and a 1.5e9-cent day (sf0.1 scale) overflows;
      |    -- DECIMAL(19,2)^2 = DECIMAL(38,4) computes in hugeint and
      |    -- matches Spark's exact DECIMAL(37,4) product
      |    sum(CAST(g AS DECIMAL(19,2)) * CAST(g AS DECIMAL(19,2))) OVER w AS s2
      |  FROM daily
      |  WINDOW w AS (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)),
      |z AS (
      |  SELECT day, CAST(g AS DOUBLE) AS gmv,
      |    CASE WHEN cnt = 7 AND sqrt(greatest(
      |        (CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / CAST(cnt AS DOUBLE))
      |          / (CAST(cnt AS DOUBLE) - 1), 0.0)) > 0
      |      THEN round(
      |        (CAST(g AS DOUBLE) - CAST(s1 AS DOUBLE) / CAST(cnt AS DOUBLE))
      |          / sqrt(greatest(
      |            (CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / CAST(cnt AS DOUBLE))
      |              / (CAST(cnt AS DOUBLE) - 1), 0.0)), 6)
      |    END AS z
      |  FROM win)
      |SELECT strftime(day, '%Y-%m-%d') AS day, gmv, z,
      |  coalesce(CAST(abs(z) > 2 AS INT), 0) AS is_anomaly
      |FROM z ORDER BY day""".stripMargin

  /** One-row exact interpolated quartile cuts of `c` over `df` —
    * the same value-grouped CDF walk as `Relational.quantiles` (whose
    * oracle proves the interp formula bit-matches `quantile_cont`),
    * ungrouped. The window sorts the DISTINCT-VALUE count table, so
    * it is safe exactly when the metric's value space is bounded —
    * which [[rfm]] guarantees by quantizing first. */
  private def quartileCuts(df: DataFrame, c: String, pre: String): DataFrame = {
    val counts = df.groupBy(col(c).as("p")).agg(count(lit(1)).as("ct"))
    val cum = counts
      .withColumn("cum", sum(col("ct")).over(Window.orderBy(col("p"))))
      .withColumn("n", sum(col("ct")).over(Window.partitionBy()))
    val aggs = CdfQuantile.qCols(0.25, "a") ++ CdfQuantile.qCols(0.5, "b") ++
      CdfQuantile.qCols(0.75, "c")
    cum.agg(aggs.head, aggs.tail: _*)
      .select(CdfQuantile.interp("a").as(s"${pre}25"),
        CdfQuantile.interp("b").as(s"${pre}50"),
        CdfQuantile.interp("c").as(s"${pre}75"))
  }

  /** RFM segmentation (recency / frequency / monetary, the classic
    * e-commerce user scoring the ADS layer feeds to marketing) WITHOUT
    * a global sort: the textbook `ntile(4)` needs one total order over
    * all users — the thing that cannot scale — so scores band against
    * exact quartile CUTS instead (three scalars per metric, broadcast
    * back as a 1-row cross join). Cut distributions are quantized to
    * keep the CDF walk's value space bounded: recency days and
    * purchase counts are already small ints; monetary is floored to
    * whole currency units FOR THE CUTS (scores band the floored value
    * — `floor`, not `round`, because double rounding ties break
    * differently across engines). */
  def rfm(s: SparkSession, d: String): DataFrame = {
    val p = Tables.events(s, d)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), to_date(col("ts")).as("day"), col("value"))
    val maxDay = p.agg(max(col("day")).as("max_day"))
    val u = p.groupBy(col("user_id"))
      .agg(max(col("day")).as("last_day"), count(lit(1)).as("f"),
        moneySum(col("value")).as("m"))
      .crossJoin(broadcast(maxDay))
      .withColumn("r_days", datediff(col("max_day"), col("last_day")).cast("long"))
      .withColumn("m_q", floor(col("m").cast("double")))
    val cuts = quartileCuts(u, "r_days", "r")
      .crossJoin(quartileCuts(u, "f", "f"))
      .crossJoin(quartileCuts(u, "m_q", "m"))
    def above(v: Column, pre: String): Column =
      (v > col(s"${pre}25")).cast("int") + (v > col(s"${pre}50")).cast("int") +
        (v > col(s"${pre}75")).cast("int")
    u.crossJoin(broadcast(cuts))
      .select(col("user_id"), col("r_days"), col("f"),
        col("m").cast("double").as("m"),
        (lit(4) - above(col("r_days"), "r")).as("r_score"),
        (lit(1) + above(col("f"), "f")).as("f_score"),
        (lit(1) + above(col("m_q"), "m")).as("m_score"))
      .orderBy(col("user_id"))
  }

  val rfmSql: String =
    s"""WITH p AS (
       |  SELECT user_id, CAST(ts AS DATE) AS day, value
       |  FROM events WHERE event_type = 'purchase'),
       |u AS (
       |  SELECT user_id,
       |    date_diff('day', max(day), (SELECT max(day) FROM p)) AS r_days,
       |    CAST(count(*) AS BIGINT) AS f,
       |    ${sqlMoneySum("value")} AS m,
       |    floor(CAST(${sqlMoneySum("value")} AS DOUBLE)) AS m_q
       |  FROM p GROUP BY user_id),
       |cuts AS (
       |  SELECT quantile_cont(r_days, 0.25) AS r25, quantile_cont(r_days, 0.5) AS r50,
       |    quantile_cont(r_days, 0.75) AS r75,
       |    quantile_cont(f, 0.25) AS f25, quantile_cont(f, 0.5) AS f50,
       |    quantile_cont(f, 0.75) AS f75,
       |    quantile_cont(m_q, 0.25) AS m25, quantile_cont(m_q, 0.5) AS m50,
       |    quantile_cont(m_q, 0.75) AS m75
       |  FROM u)
       |SELECT user_id, r_days, f, m,
       |  4 - (CAST(r_days > r25 AS INT) + CAST(r_days > r50 AS INT)
       |       + CAST(r_days > r75 AS INT)) AS r_score,
       |  1 + (CAST(f > f25 AS INT) + CAST(f > f50 AS INT)
       |       + CAST(f > f75 AS INT)) AS f_score,
       |  1 + (CAST(m_q > m25 AS INT) + CAST(m_q > m50 AS INT)
       |       + CAST(m_q > m75 AS INT)) AS m_score
       |FROM u, cuts ORDER BY user_id""".stripMargin

  /** Year-over-year customer CHURN per nation — the serving query next
    * to DAU/retention on every dashboard: of the customers who ordered
    * in the base year, how many came back the next year. Both activity
    * sets reduce to per-(nation, customer) distinct rows BEFORE any
    * join (partial-aggregable, the expensive dedup happens map-side),
    * the retention check is one left join on the customer key, and the
    * rollup is nation-grain. `churn_rate` is one rounded division of
    * two exact counts. */
  def churn(s: SparkSession, d: String, baseYear: Int = 1995): DataFrame = {
    val cust = Tables.customer(s, d).select(col("c_custkey"), col("c_nationkey"))
    def active(yr: Int) = Tables.orders(s, d)
      .filter(year(col("o_orderdate")) === yr)
      .select(col("o_custkey")).distinct()
    val prev = active(baseYear)
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name"), col("o_custkey").as("ck"))
    val curr = active(baseYear + 1).select(col("o_custkey").as("ck"), lit(1).as("ret"))
    prev.join(curr, Seq("ck"), "left")
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("prev_custs"),
        sum(coalesce(col("ret"), lit(0)).cast("long")).as("retained"))
      .withColumn("churned", col("prev_custs") - col("retained"))
      .withColumn("churn_rate",
        round(col("churned").cast("double") / col("prev_custs"), 6))
      .orderBy(col("n_name"))
  }

  val churnSql: String =
    """WITH prev AS (
      |  SELECT DISTINCT n_name, o_custkey AS ck
      |  FROM orders
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation ON c_nationkey = n_nationkey
      |  WHERE year(o_orderdate) = 1995),
      |curr AS (
      |  SELECT DISTINCT o_custkey AS ck FROM orders
      |  WHERE year(o_orderdate) = 1996)
      |SELECT n_name,
      |  CAST(count(*) AS BIGINT) AS prev_custs,
      |  CAST(sum(CASE WHEN curr.ck IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS retained,
      |  CAST(count(*) - sum(CASE WHEN curr.ck IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS churned,
      |  round(CAST(count(*) - sum(CASE WHEN curr.ck IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
      |    / count(*), 6) AS churn_rate
      |FROM prev LEFT JOIN curr USING (ck)
      |GROUP BY n_name ORDER BY n_name""".stripMargin

  /** Market-BASKET affinity — support / confidence / lift for
    * co-purchased part pairs (the "customers who bought X also
    * bought Y" serving table; Agrawal's association-rule measures over
    * the order baskets this reference's domain is made of). The pair
    * fan-out is bounded by BASKET size (a TPC-H-ish order holds ≤ 7
    * lines, so ≤ 21 pairs per order — the same in-basket bound
    * `graph_triangles` exploits), the self-join is ORDER-key equi
    * (never part×part), and every count is a partial-aggregable
    * integer; the two divisions happen once per surviving pair,
    * rounded 6 dp. Top-20 by lift with a min-support cut, fully
    * deterministic tie order. */
  def basketAffinity(s: SparkSession, d: String, minPairCt: Long = 2,
    topN: Int = 20): DataFrame = {
    // ONE groupBy builds the sorted basket array (≤ basket-size
    // elements); pairs fan out IN-ROW via posexplode+slice — the
    // `graph_triangles` idiom, replacing the okey self-join shuffle
    // with per-row array arithmetic (measured 3.3 → ~2.5 s at sf0.1)
    val parts = Tables.lineitem(s, d)
      .groupBy(col("l_orderkey"))
      .agg(array_sort(collect_set(col("l_partkey"))).as("ps"))
    val n = parts.agg(count(lit(1)).as("n_orders"))
    val partCt = parts.select(explode(col("ps")).as("part"))
      .groupBy(col("part")).agg(count(lit(1)).as("ct"))
    val pairCt = parts
      .select(posexplode(col("ps")).as(Seq("i", "pa")), col("ps"))
      .select(col("pa"), explode(slice(col("ps"), col("i") + 2,
        greatest(size(col("ps")) - col("i") - 1, lit(0)))).as("pb"))
      .groupBy(col("pa"), col("pb"))
      .agg(count(lit(1)).as("pair_ct"))
      .filter(col("pair_ct") >= minPairCt)
    pairCt
      .join(partCt.select(col("part").as("pa"), col("ct").as("ct_a")), "pa")
      .join(partCt.select(col("part").as("pb"), col("ct").as("ct_b")), "pb")
      .crossJoin(broadcast(n))
      .select(col("pa"), col("pb"), col("pair_ct"),
        round(col("pair_ct").cast("double") / col("ct_a"), 6).as("confidence"),
        round(col("pair_ct").cast("double") * col("n_orders") /
          (col("ct_a") * col("ct_b")), 6).as("lift"))
      .orderBy(col("lift").desc, col("pa"), col("pb"))
      .limit(topN)
  }

  val basketAffinitySql: String =
    """WITH baskets AS (
      |  SELECT DISTINCT l_orderkey AS okey, l_partkey AS part FROM lineitem),
      |n AS (SELECT CAST(count(DISTINCT okey) AS BIGINT) AS n_orders FROM baskets),
      |pc AS (SELECT part, CAST(count(*) AS BIGINT) AS ct FROM baskets GROUP BY part),
      |pr AS (
      |  SELECT a.part AS pa, b.part AS pb, CAST(count(*) AS BIGINT) AS pair_ct
      |  FROM baskets a JOIN baskets b
      |    ON a.okey = b.okey AND a.part < b.part
      |  GROUP BY a.part, b.part
      |  HAVING count(*) >= 2)
      |SELECT pa, pb, pair_ct,
      |  round(CAST(pair_ct AS DOUBLE) / ca.ct, 6) AS confidence,
      |  round(CAST(pair_ct AS DOUBLE) * n_orders / (ca.ct * cb.ct), 6) AS lift
      |FROM pr
      |JOIN pc ca ON ca.part = pa
      |JOIN pc cb ON cb.part = pb
      |CROSS JOIN n
      |ORDER BY lift DESC, pa, pb
      |LIMIT 20""".stripMargin

  /** Exponentially-weighted trailing GMV trend — the smoothing curve
    * every revenue dashboard draws next to [[gmvAnomaly]]'s z-flags: a
    * 28-day EWMA with decay 3/4. Engine-exactness without trusting
    * `pow`: the weights (3/4)^j are DYADIC rationals computed by exact
    * iterated multiplication (3^27 < 2^43 — every step fits the
    * 53-bit mantissa) and baked into BOTH plans as their finite
    * decimal expansions, the day grain is cents (exact longs), and the
    * weighted sum is one fixed left-associated 28-term chain over a
    * single Window node — identical IEEE sequences in both engines.
    * Warmup days (< span history) emit NULL like the anomaly op. */
  def gmvEwma(s: SparkSession, d: String, span: Int = 28): DataFrame = {
    val daily = Tables.orders(s, d)
      .filter(col("o_orderdate").isNotNull)
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sum(Agg.dec(col("o_totalprice")))
        .cast(org.apache.spark.sql.types.DecimalType(18, 2)).as("g"))
      .withColumn("cents", (col("g") * 100).cast("long"))
    val w = Window.orderBy(col("day"))
    val num = Ads.ewmaWeights(span).zipWithIndex
      .map { case (wt, j) => lit(wt) * lag(col("cents"), j).over(w) }
      .reduceLeft(_ + _)
    daily
      .withColumn("ewma",
        round(num / lit(Ads.ewmaWeights(span).sum) / lit(100.0), 6))
      .select(
        date_format(col("day"), "yyyy-MM-dd").as("day"),
        col("g").cast("double").as("gmv"), col("ewma"),
        round(col("g").cast("double") - col("ewma"), 6).as("deviation"))
      .orderBy(col("day"))
  }

  /** (3/4)^j by exact iterated multiplication (each step exact while
    * 3^j fits the mantissa — true through j = 33). */
  private[graft] def ewmaWeights(span: Int): Seq[Double] =
    Iterator.iterate(1.0)(_ * 0.75).take(span).toSeq

  /** Weights are interpolated as their exact finite decimal expansions
    * (dyadic rationals terminate in decimal), so DuckDB parses the
    * identical doubles Spark's literals carry. */
  def gmvEwmaSql(span: Int = 28): String = {
    val ws = ewmaWeights(span)
    val terms = ws.zipWithIndex.map { case (wt, j) =>
      s"CAST(${new java.math.BigDecimal(wt).toPlainString} AS DOUBLE) * lag(cents, $j) OVER win"
    }.mkString("(", " + ", ")")
    val sumW = s"CAST(${new java.math.BigDecimal(ws.sum).toPlainString} AS DOUBLE)"
    s"""WITH daily AS (
       |  SELECT CAST(o_orderdate AS DATE) AS day,
       |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS g
       |  FROM orders WHERE o_orderdate IS NOT NULL
       |  GROUP BY 1)
       |SELECT strftime(day, '%Y-%m-%d') AS day,
       |  CAST(g AS DOUBLE) AS gmv,
       |  round($terms / $sumW / 100.0, 6) AS ewma,
       |  round(CAST(g AS DOUBLE) - round($terms / $sumW / 100.0, 6), 6) AS deviation
       |FROM (SELECT day, g, CAST(g * 100 AS BIGINT) AS cents FROM daily)
       |WINDOW win AS (ORDER BY day)
       |ORDER BY day""".stripMargin
  }

  /** Cumulative REACH curve — total distinct users ever seen, by day
    * (the "audience to date" dashboard line). NOT a per-day rescan or
    * a giant running distinct: cumulative-distinct(day) = count of
    * users whose FIRST day ≤ day, so one per-user min-agg + one
    * day-grain rollup + one calendar-bounded running sum does it —
    * the same first-appearance transform that makes `dauStream`'s
    * state bounded. New-user counts ride along (the growth half of
    * the same chart). */
  def reachCurve(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val perDay = graft.Tables.events(s, d)
      .filter(col("user_id").isNotNull)
      .groupBy(col("user_id")).agg(min(to_date(col("ts"))).as("day"))
      .groupBy(col("day")).agg(count(lit(1)).as("new_users"))
    perDay
      .withColumn("cum_users", sum(col("new_users")).over(Window.orderBy(col("day"))))
      .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
        col("new_users"), col("cum_users").cast("long").as("cum_users"))
      .orderBy(col("day"))
  }

  val reachCurveSql: String =
    """WITH firsts AS (
      |  SELECT user_id, min(CAST(ts AS DATE)) AS day
      |  FROM events WHERE user_id IS NOT NULL GROUP BY user_id),
      |per_day AS (
      |  SELECT day, CAST(count(*) AS BIGINT) AS new_users
      |  FROM firsts GROUP BY day)
      |SELECT strftime(day, '%Y-%m-%d') AS day, new_users,
      |  CAST(sum(new_users) OVER (ORDER BY day) AS BIGINT) AS cum_users
      |FROM per_day ORDER BY day""".stripMargin

  /** Cohort lifetime-value triangle — the acquisition-cohort revenue
    * table next to [[churn]] in every growth dashboard: customers
    * grouped by FIRST-order month, each cohort's revenue tracked by
    * age in months since acquisition. Month arithmetic runs on exact
    * integer month indexes (year*12 + month−1 — never date-diff
    * rounding), revenue on DECIMAL. Plan: one per-customer min-agg
    * (partial-aggregable), one equi-join back on the customer key
    * (both sides shuffle-partitioned on it), one (cohort, age) rollup
    * — cohort-triangle-sized output, fact-sized work, no windows. */
  def cohortLtv(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
      .filter(col("o_orderdate").isNotNull)
      .select(col("o_custkey"), col("o_totalprice"),
        (year(col("o_orderdate")) * 12 + month(col("o_orderdate")) - 1).as("m"))
    val firsts = o.groupBy(col("o_custkey")).agg(min(col("m")).as("cohort_m"))
    o.join(firsts, "o_custkey")
      .groupBy(col("cohort_m"),
        (col("m") - col("cohort_m")).cast("long").as("age_months"))
      .agg(count(lit(1)).as("orders"),
        countDistinct(col("o_custkey")).as("buyers"),
        moneySum(col("o_totalprice")).as("revenue"))
      .select(
        format_string("%04d-%02d", expr("cohort_m div 12"),
          col("cohort_m") % 12 + 1).as("cohort"),
        col("age_months"), col("orders"), col("buyers"), col("revenue"))
      .orderBy(col("cohort"), col("age_months"))
  }

  /** New-vs-returning revenue split per month — the acquisition-mix
    * dashboard next to [[cohortLtv]] (same first-order-month spine):
    * an order is NEW business iff it lands in its customer's first
    * month, RETURNING otherwise. Same plan skeleton as the cohort
    * triangle (min-agg + equi-join + conditional rollup, exact
    * integer month indexes, DECIMAL revenue) with month-grain output. */
  def newVsReturning(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
      .filter(col("o_orderdate").isNotNull)
      .select(col("o_custkey"), col("o_totalprice"),
        (year(col("o_orderdate")) * 12 + month(col("o_orderdate")) - 1).as("m"))
    val firsts = o.groupBy(col("o_custkey")).agg(min(col("m")).as("first_m"))
    o.join(firsts, "o_custkey")
      .groupBy(col("m"))
      .agg(
        countDistinct(when(col("m") === col("first_m"), col("o_custkey")))
          .as("new_customers"),
        countDistinct(when(col("m") =!= col("first_m"), col("o_custkey")))
          .as("returning_customers"),
        moneySum(when(col("m") === col("first_m"), col("o_totalprice")))
          .as("new_revenue"),
        moneySum(when(col("m") =!= col("first_m"), col("o_totalprice")))
          .as("returning_revenue"))
      .select(
        format_string("%04d-%02d", expr("m div 12"), col("m") % 12 + 1).as("month"),
        col("new_customers"), col("returning_customers"),
        col("new_revenue"), col("returning_revenue"))
      .orderBy(col("month"))
  }

  val newVsReturningSql: String =
    """WITH o AS (
      |  SELECT o_custkey, o_totalprice,
      |    year(o_orderdate) * 12 + month(o_orderdate) - 1 AS m
      |  FROM orders WHERE o_orderdate IS NOT NULL),
      |firsts AS (SELECT o_custkey, min(m) AS first_m FROM o GROUP BY 1)
      |SELECT printf('%04d-%02d', m // 12, m % 12 + 1) AS month,
      |  count(DISTINCT CASE WHEN m = first_m THEN o_custkey END) AS new_customers,
      |  count(DISTINCT CASE WHEN m <> first_m THEN o_custkey END) AS returning_customers,
      |  CAST(sum(CASE WHEN m = first_m
      |    THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS new_revenue,
      |  CAST(sum(CASE WHEN m <> first_m
      |    THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS returning_revenue
      |FROM o JOIN firsts USING (o_custkey)
      |GROUP BY m
      |ORDER BY month""".stripMargin

  val cohortLtvSql: String =
    s"""WITH o AS (
       |  SELECT o_custkey, o_totalprice,
       |    year(o_orderdate) * 12 + month(o_orderdate) - 1 AS m
       |  FROM orders WHERE o_orderdate IS NOT NULL),
       |firsts AS (SELECT o_custkey, min(m) AS cohort_m FROM o GROUP BY 1)
       |SELECT printf('%04d-%02d', cohort_m // 12, cohort_m % 12 + 1) AS cohort,
       |  m - cohort_m AS age_months,
       |  count(*) AS orders,
       |  count(DISTINCT o_custkey) AS buyers,
       |  ${Agg.sqlMoneySum("o_totalprice")} AS revenue
       |FROM o JOIN firsts USING (o_custkey)
       |GROUP BY cohort_m, age_months
       |ORDER BY cohort, age_months""".stripMargin

  /** Knuth multiplicative-hash constant for [[abTest]]'s arm split:
    * floor(phi * 2^31), odd. Scaled to 2^31 (not the classic 2^32
    * constant 2654435761) so that `(user_id % 2^32) * K` stays below
    * 2^63 — Spark 4's ANSI mode and DuckDB both abort on BIGINT
    * overflow, and 100TB-scale id spaces exceed 2^32. The arm is the
    * HIGH bit (bit 31) of the mixed product: low bits of u*K mod 2^32
    * are parity-confounded (K odd means bit 0 of u*K == bit 0 of u),
    * while bit 31 mixes every input bit. */
  private val AbHashMul = 1327217885L
  /** Two-sided 5% z critical value — shared with the oracle. */
  private val AbZCrit = "1.959964"

  /** Two-arm A/B conversion readout — the experimentation serving
    * query every growth team runs: users split deterministically into
    * arms by a multiplicative hash of user_id (the text_hash_split
    * discipline — assignment is a pure function of the key, so
    * re-runs and late events land in the same arm), conversion = any
    * `purchase` event, then the two-proportion pooled z-test.
    * Exactness: counts are exact integers; the rates/z are ONE shared
    * double expression over those integers, rounded at 6 dp — both
    * engines compute identical doubles (the ts_acf discipline). Plan:
    * one events scan → per-user rollup → single-row agg; nothing here
    * grows past user cardinality. */
  def abTest(s: SparkSession, d: String): DataFrame = {
    // conversion = purchases OVER-REPRESENTED in the user's event mix
    // (share > the uniform 1/5), as an exact integer comparison — a
    // scale-free definition: "any purchase ever" saturates to 100% as
    // the event history grows with SF, killing the variance term
    val users = Tables.events(s, d)
      .filter(col("user_id").isNotNull)
      .groupBy(col("user_id"))
      .agg(when(
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L)) * 5 >
          count(lit(1)), 1L).otherwise(0L).as("conv"))
      .withColumn("arm",
        when(((col("user_id") % 4294967296L) * AbHashMul) % 4294967296L
          < 2147483648L, "A").otherwise("B"))
    val agg = users.agg(
      sum(when(col("arm") === "A", 1L).otherwise(0L)).as("a_users"),
      sum(when(col("arm") === "B", 1L).otherwise(0L)).as("b_users"),
      sum(when(col("arm") === "A", col("conv")).otherwise(0L)).as("a_conv"),
      sum(when(col("arm") === "B", col("conv")).otherwise(0L)).as("b_conv"))
    // ANSI degenerate-case discipline (the gmvAnomaly shape): every
    // division appears EXACTLY ONCE, inside its own guard's value;
    // downstream columns derive from the guarded result, so nothing
    // is subexpression-hoisted out of a guard
    val rates = agg.select(
      col("a_users"), col("b_users"), col("a_conv"), col("b_conv"),
      when(col("a_users") > 0,
        col("a_conv").cast("double") / col("a_users").cast("double"))
        .as("pa"),
      when(col("b_users") > 0,
        col("b_conv").cast("double") / col("b_users").cast("double"))
        .as("pb"),
      when(col("a_users") + col("b_users") > 0,
        (col("a_conv") + col("b_conv")).cast("double") /
          (col("a_users") + col("b_users")).cast("double")).as("pp"))
    val withSe = rates.withColumn("se",
      when(col("a_users") > 0 && col("b_users") > 0,
        sqrt(col("pp") * (lit(1.0) - col("pp")) *
          (lit(1.0) / col("a_users").cast("double") +
            lit(1.0) / col("b_users").cast("double")))))
    val withZ = withSe.withColumn("z",
      when(col("se") > 0, (col("pa") - col("pb")) / col("se")))
    withZ.select(
      col("a_users"), col("b_users"), col("a_conv"), col("b_conv"),
      round(col("pa"), 6).as("a_rate"), round(col("pb"), 6).as("b_rate"),
      round(when(col("pb") > 0, col("pa") / col("pb") - lit(1.0)), 6)
        .as("lift"),
      round(col("z"), 6).as("z_score"),
      (abs(col("z")) > expr(AbZCrit)).as("significant"))
  }

  val abTestSql: String =
    s"""WITH users AS (
       |  SELECT user_id,
       |    CASE WHEN sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) * 5
       |           > count(*) THEN 1 ELSE 0 END AS conv,
       |    CASE WHEN ((user_id % 4294967296) * $AbHashMul) % 4294967296
       |           < 2147483648 THEN 'A' ELSE 'B' END AS arm
       |  FROM events WHERE user_id IS NOT NULL GROUP BY user_id),
       |agg AS (
       |  SELECT
       |    CAST(sum(CASE WHEN arm = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS a_users,
       |    CAST(sum(CASE WHEN arm = 'B' THEN 1 ELSE 0 END) AS BIGINT) AS b_users,
       |    CAST(sum(CASE WHEN arm = 'A' THEN conv ELSE 0 END) AS BIGINT) AS a_conv,
       |    CAST(sum(CASE WHEN arm = 'B' THEN conv ELSE 0 END) AS BIGINT) AS b_conv
       |  FROM users),
       |rates AS (
       |  SELECT *,
       |    CASE WHEN a_users > 0
       |      THEN CAST(a_conv AS DOUBLE) / CAST(a_users AS DOUBLE) END AS pa,
       |    CASE WHEN b_users > 0
       |      THEN CAST(b_conv AS DOUBLE) / CAST(b_users AS DOUBLE) END AS pb,
       |    CASE WHEN a_users + b_users > 0
       |      THEN CAST(a_conv + b_conv AS DOUBLE)
       |        / CAST(a_users + b_users AS DOUBLE) END AS pp
       |  FROM agg),
       |with_se AS (
       |  SELECT *, CASE WHEN a_users > 0 AND b_users > 0
       |    THEN sqrt(pp * (1.0 - pp) * (1.0 / CAST(a_users AS DOUBLE)
       |      + 1.0 / CAST(b_users AS DOUBLE))) END AS se
       |  FROM rates),
       |with_z AS (
       |  SELECT *, CASE WHEN se > 0 THEN (pa - pb) / se END AS z FROM with_se)
       |SELECT a_users, b_users, a_conv, b_conv,
       |  round(pa, 6) AS a_rate, round(pb, 6) AS b_rate,
       |  round(CASE WHEN pb > 0 THEN pa / pb - 1.0 END, 6) AS lift,
       |  round(z, 6) AS z_score,
       |  abs(z) > $AbZCrit AS significant
       |FROM with_z""".stripMargin

  /** Revenue-concentration card — decile shares plus the Gini
    * coefficient over per-customer lifetime revenue (the "do 20% of
    * customers carry 80% of revenue" dashboard). Customers roll up to
    * exact DECIMAL cents, rank by (cents, custkey) — a deterministic
    * total order — and each decile's mass is an exact integer sum;
    * Gini comes from the exact rank-weighted sum G = (2·Σi·x_i −
    * (n+1)·Σx) / (n·Σx), evaluated once on the final integers. The
    * global rank runs on the per-customer ROLLUP (customer-grain, not
    * fact-grain — the ads_rfm precedent); at 100 TB the rollup is the
    * only fact-sized stage. */
  def revenueConcentration(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cust = Tables.orders(s, d)
      .groupBy(col("o_custkey"))
      .agg((sum(Agg.dec(col("o_totalprice"))).cast(DecimalType(18, 2)) * 100)
        .cast("long").as("cents"))
    val w = Window.orderBy(col("cents"), col("o_custkey"))
    val ranked = cust
      .withColumn("i", row_number().over(w).cast("long"))
    val tot = ranked.agg(
      count(lit(1)).as("n"),
      sum(col("cents").cast(DecimalType(38, 0))).as("s"),
      sum(col("i").cast(DecimalType(38, 0)) * col("cents")).as("iw"))
    val deciles = ranked.crossJoin(broadcast(tot.select(col("n"))))
      .withColumn("decile",
        least(lit(9L), expr("(i - 1) * 10 div n")).cast("int"))
      .groupBy(col("decile"))
      .agg(count(lit(1)).as("customers"),
        sum(col("cents").cast(DecimalType(38, 0))).as("dc"))
    val gini = round(
      (lit(2.0) * col("iw").cast("double") -
        (col("n") + 1).cast("double") * col("s").cast("double")) /
        (col("n").cast("double") * col("s").cast("double")), 6)
    deciles.crossJoin(broadcast(tot))
      .select(col("decile"), col("customers"),
        round(col("dc").cast("double") / lit(100.0), 2).as("revenue"),
        round(col("dc").cast("double") / col("s").cast("double"), 6)
          .as("share"),
        gini.as("gini"))
      .orderBy(col("decile"))
  }

  val revenueConcentrationSql: String =
    """WITH cust AS (
      |  SELECT o_custkey,
      |    CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
      |  FROM orders GROUP BY o_custkey),
      |ranked AS (
      |  SELECT cents, CAST(row_number() OVER (ORDER BY cents, o_custkey) AS BIGINT) AS i
      |  FROM cust),
      |tot AS (
      |  SELECT CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(CAST(cents AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS s,
      |    CAST(sum(CAST(i AS DECIMAL(38,0)) * cents) AS DECIMAL(38,0)) AS iw
      |  FROM ranked),
      |deciles AS (
      |  SELECT CAST(least(9, (i - 1) * 10 // n) AS INTEGER) AS decile,
      |    CAST(count(*) AS BIGINT) AS customers,
      |    CAST(sum(CAST(cents AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS dc
      |  FROM ranked, tot GROUP BY 1)
      |SELECT decile, customers,
      |  round(CAST(dc AS DOUBLE) / 100.0, 2) AS revenue,
      |  round(CAST(dc AS DOUBLE) / CAST(s AS DOUBLE), 6) AS share,
      |  round((2.0 * CAST(iw AS DOUBLE) - CAST(n + 1 AS DOUBLE) * CAST(s AS DOUBLE))
      |    / (CAST(n AS DOUBLE) * CAST(s AS DOUBLE)), 6) AS gini
      |FROM deciles, tot ORDER BY decile""".stripMargin
}
