package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import Agg._

/** Core relational query surface: scan → filter → join → aggregate →
  * window → top-N. These are the generic shapes every gmall DWS query
  * composes from; declared via the DataFrame API so Catalyst handles
  * pushdown, pruning, join selection and AQE re-planning.
  */
object Relational {

  /** TPC-H Q1 shape: pricing summary. Single scan, map-side partial
    * aggregation, 8 groups. */
  def q1PricingSummary(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") <= lit("2000-12-01").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        moneySum(col("l_quantity")).as("sum_qty"),
        moneySum(col("l_extendedprice")).as("sum_base_price"),
        revenue(col("l_extendedprice"), col("l_discount")).as("sum_disc_price"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  val q1Sql: String =
    s"""SELECT l_returnflag, l_linestatus,
       |  ${sqlMoneySum("l_quantity")} AS sum_qty,
       |  ${sqlMoneySum("l_extendedprice")} AS sum_base_price,
       |  ${sqlRevenue("l_extendedprice", "l_discount")} AS sum_disc_price,
       |  count(*) AS count_order
       |FROM lineitem
       |WHERE l_shipdate <= TIMESTAMP '2000-12-01 00:00:00'
       |GROUP BY l_returnflag, l_linestatus
       |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** TPC-H Q3 shape: selective 3-way join + aggregate + top-N.
    * customer is the small build side; join order left to Catalyst. */
  def q3ShippingPriority(s: SparkSession, d: String): DataFrame = {
    val cust = Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
    val ord  = Tables.orders(s, d).filter(col("o_orderdate") < lit("1998-03-15").cast("timestamp"))
    val li   = Tables.lineitem(s, d).filter(col("l_shipdate") > lit("1998-03-15").cast("timestamp"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(revenue(col("l_extendedprice"), col("l_discount")).as("revenue"))
      .select(
        col("l_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"),
        col("o_orderpriority"), col("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  val q3Sql: String =
    s"""SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
       |  o_orderpriority,
       |  ${sqlRevenue("l_extendedprice", "l_discount")} AS revenue
       |FROM lineitem
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |WHERE c_mktsegment = 'BUILDING'
       |  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
       |  AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
       |GROUP BY l_orderkey, o_orderdate, o_orderpriority
       |ORDER BY revenue DESC, l_orderkey
       |LIMIT 10""".stripMargin

  /** Left-semi + left-anti join: customers that have orders but none
    * above the price ceiling. */
  def semiAnti(s: SparkSession, d: String): DataFrame = {
    val ord = Tables.orders(s, d)
    Tables.customer(s, d)
      .join(ord, col("c_custkey") === col("o_custkey"), "left_semi")
      .join(ord.filter(col("o_totalprice") > 400000.0),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))
  }

  val semiAntiSql: String =
    """SELECT c_custkey, c_name FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      |  AND NOT EXISTS (SELECT 1 FROM orders
      |                  WHERE o_custkey = c_custkey AND o_totalprice > 400000.0)
      |ORDER BY c_custkey""".stripMargin

  /** Window functions: top-3 orders per customer by price (rank with
    * deterministic tie-break). */
  def windowRank(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(s, d)
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 3)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), col("rnk"))
      .orderBy(col("o_custkey"), col("rnk"))
  }

  val windowRankSql: String =
    """SELECT o_custkey, o_orderkey, o_totalprice, rnk FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |    row_number() OVER (PARTITION BY o_custkey
      |                       ORDER BY o_totalprice DESC, o_orderkey) AS rnk
      |  FROM orders) t
      |WHERE rnk <= 3
      |ORDER BY o_custkey, rnk""".stripMargin

  /** ROLLUP aggregate: customer account balance by region/nation with
    * subtotals and grand total. */
  def rollupAgg(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(moneySum(col("c_acctbal")).as("acctbal"), count(lit(1)).as("cust_ct"))
      .select(
        coalesce(col("r_name"), lit("ALL")).as("r_name"),
        coalesce(col("n_name"), lit("ALL")).as("n_name"),
        col("acctbal"), col("cust_ct"))
      .orderBy(col("r_name"), col("n_name"))

  val rollupAggSql: String =
    s"""SELECT coalesce(r_name, 'ALL') AS r_name, coalesce(n_name, 'ALL') AS n_name,
       |  ${sqlMoneySum("c_acctbal")} AS acctbal, count(*) AS cust_ct
       |FROM customer
       |JOIN nation ON c_nationkey = n_nationkey
       |JOIN region ON n_regionkey = r_regionkey
       |GROUP BY ROLLUP(r_name, n_name)
       |ORDER BY r_name, n_name""".stripMargin

  /** CUBE aggregate: order totals by status × priority with every
    * subtotal combination — the 2-D completion of [[rollupAgg]] (one
    * Expand + one hash-agg; grouping-set rows share the scan). */
  def cubeAgg(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(moneySum(col("o_totalprice")).as("total"), count(lit(1)).as("order_ct"))
      .select(
        coalesce(col("o_orderstatus"), lit("ALL")).as("o_orderstatus"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("o_orderpriority"),
        col("total"), col("order_ct"))
      .orderBy(col("o_orderstatus"), col("o_orderpriority"))

  val cubeAggSql: String =
    s"""SELECT coalesce(o_orderstatus, 'ALL') AS o_orderstatus,
       |  coalesce(o_orderpriority, 'ALL') AS o_orderpriority,
       |  ${sqlMoneySum("o_totalprice")} AS total, count(*) AS order_ct
       |FROM orders
       |GROUP BY CUBE(o_orderstatus, o_orderpriority)
       |ORDER BY o_orderstatus, o_orderpriority""".stripMargin

  /** Correlated scalar subquery shape: customers whose balance beats
    * their nation's average. Declared as an agg+join (what a decorrelator
    * produces); the per-nation average is a tiny broadcast side. */
  def correlatedAvg(s: SparkSession, d: String): DataFrame = {
    val cust = Tables.customer(s, d)
    val natAvg = cust.groupBy(col("c_nationkey").as("nk"))
      .agg((moneySum(col("c_acctbal")) / count(lit(1))).as("nat_avg"))
    cust.join(broadcast(natAvg), col("c_nationkey") === col("nk"))
      .filter(col("c_acctbal") > col("nat_avg"))
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
      .orderBy(col("c_custkey"))
  }

  val correlatedAvgSql: String =
    s"""SELECT c_custkey, c_name, c_acctbal
       |FROM customer c
       |JOIN (SELECT c_nationkey AS nk,
       |        ${Agg.sqlMoneySum("c_acctbal")} / count(*) AS nat_avg
       |      FROM customer GROUP BY c_nationkey) a
       |  ON c.c_nationkey = a.nk
       |WHERE c.c_acctbal > a.nat_avg
       |ORDER BY c_custkey""".stripMargin

  /** Set operations: customers in BUILDING segment INTERSECT customers
    * with an open order, then EXCEPT those with any high-price order. */
  def setOps(s: SparkSession, d: String): DataFrame = {
    val cust = Tables.customer(s, d)
    val ord = Tables.orders(s, d)
    val building = cust.filter(col("c_mktsegment") === "BUILDING").select(col("c_custkey"))
    val open = ord.filter(col("o_orderstatus") === "O")
      .select(col("o_custkey").as("c_custkey"))
    val pricey = ord.filter(col("o_totalprice") > 450000.0)
      .select(col("o_custkey").as("c_custkey"))
    building.intersect(open).except(pricey)
      .orderBy(col("c_custkey"))
  }

  val setOpsSql: String =
    """(SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
      | INTERSECT
      | SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')
      |EXCEPT
      |SELECT o_custkey FROM orders WHERE o_totalprice > 450000.0
      |ORDER BY c_custkey""".stripMargin

  /** Exact quantiles with the standard linear interpolation
    * (`lower + frac·(upper−lower)` at rank `q·(n−1)`, identical to
    * Spark's `percentile` and DuckDB's `quantile_cont`, so the doubles
    * match bit-for-bit).
    *
    * NOT the built-in `percentile` aggregate: that buffers every value
    * per group in an in-memory map (per-group state ∝ distinct values —
    * the thing that OOMs at 100 TB) and measured 2.0 s at sf0.1. This
    * formulation pre-aggregates (group, value) counts — map-side
    * combined, bounded state — then walks the per-group cumulative
    * distribution with a window and picks each quantile's two
    * interpolation neighbors via conditional aggregates. 1.1 s at
    * sf0.1, and the heavy shuffle carries only distinct values. */
  def quantiles(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"), col("l_extendedprice").as("p"))
      .agg(count(lit(1)).as("ct"))
    val cum = counts
      .withColumn("cum", sum(col("ct")).over(
        Window.partitionBy(col("l_returnflag")).orderBy(col("p"))))
      .withColumn("n", sum(col("ct")).over(Window.partitionBy(col("l_returnflag"))))
    // the row holding 0-based position k is the one with cum-ct ≤ k <
    // cum; bracketing + interpolation live in CdfQuantile (shared with
    // Ads.quartileCuts)
    val aggs = CdfQuantile.qCols(0.25, "a") ++ CdfQuantile.qCols(0.5, "b") ++
      CdfQuantile.qCols(0.75, "c")
    cum.groupBy(col("l_returnflag"))
      .agg(aggs.head, aggs.tail: _*)
      .select(col("l_returnflag"),
        CdfQuantile.interp("a").as("q25"), CdfQuantile.interp("b").as("median"),
        CdfQuantile.interp("c").as("q75"))
      .orderBy(col("l_returnflag"))
  }

  val quantilesSql: String =
    """SELECT l_returnflag,
      |  quantile_cont(l_extendedprice, 0.25) AS q25,
      |  quantile_cont(l_extendedprice, 0.5) AS median,
      |  quantile_cont(l_extendedprice, 0.75) AS q75
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** Sketch-based distinct counting (HyperLogLog++): the 100 TB path
    * for COUNT DISTINCT dashboards — mergeable, fixed memory, no exact
    * two-phase distinct shuffle. The raw estimate is engine-specific
    * (spec-bounded); the REGISTERED [[approxDistinct]] folds it into a
    * 5%-band witness the oracle pins. */
  private[graft] def approxDistinctRaw(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      // HLL state is set-like (duplicate-insensitive), so sketching the
      // pre-deduped (group, key) pairs gives the IDENTICAL estimate —
      // and the exact count becomes a count of finalized partials. One
      // map-side-combined shuffle, no countDistinct Expand doubling.
      .groupBy(col("l_returnflag"), col("l_orderkey")).agg(lit(1).as("one"))
      .groupBy(col("l_returnflag"))
      .agg(
        // rsd 0.02 (p=12, ~4 KB registers): rsd 0.01 would octuple the
        // buffer to ~21 KB/group and its generated update code takes
        // seconds of JIT per executor — measured 8.7 s cold vs 0.6 s
        // here at sf0.1, for precision the 5% spec bound never needs
        approx_count_distinct(col("l_orderkey"), rsd = 0.02).as("approx_orders"),
        count(lit(1)).as("exact_orders"))
      .orderBy(col("l_returnflag"))

  /** HLL++ error-band WITNESS (the q_countmin precedent): the estimate
    * and the exact count ride the SAME pre-deduped scan; `hll_ok` =
    * |est − exact| ≤ 5%·exact (the spec's band — 2.5σ at rsd 0.02,
    * deterministic because register maxima are order-free). The raw
    * estimate stays spec-asserted on [[approxDistinctRaw]]; the
    * emitted card is engine-portable, so a sketch regression flips the
    * flag and fails the driver hash compare. */
  def approxDistinct(s: SparkSession, d: String): DataFrame =
    approxDistinctRaw(s, d)
      .select(col("l_returnflag"), col("exact_orders"),
        when(abs(col("approx_orders") - col("exact_orders")) * 20L <=
          col("exact_orders"), 1).otherwise(0).as("hll_ok"))
      .orderBy(col("l_returnflag"))

  /** Oracle for [[approxDistinct]]: exact distinct counts with the
    * HLL error-band flag pinned TRUE. */
  val approxDistinctSql: String =
    """SELECT l_returnflag,
      |  CAST(count(DISTINCT l_orderkey) AS BIGINT) AS exact_orders,
      |  1 AS hll_ok
      |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin

  /** GROUPING SETS beyond rollup: independent (region) and (segment)
    * subtotals in one pass over the join. */
  def groupingSets(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
      .groupingSets(Seq(Seq(col("r_name")), Seq(col("c_mktsegment"))),
        col("r_name"), col("c_mktsegment"))
      .agg(moneySum(col("c_acctbal")).as("acctbal"), count(lit(1)).as("cust_ct"))
      .select(
        coalesce(col("r_name"), lit("ALL")).as("r_name"),
        coalesce(col("c_mktsegment"), lit("ALL")).as("c_mktsegment"),
        col("acctbal"), col("cust_ct"))
      .orderBy(col("r_name"), col("c_mktsegment"))

  val groupingSetsSql: String =
    s"""SELECT coalesce(r_name, 'ALL') AS r_name,
       |  coalesce(c_mktsegment, 'ALL') AS c_mktsegment,
       |  ${sqlMoneySum("c_acctbal")} AS acctbal, count(*) AS cust_ct
       |FROM customer
       |JOIN nation ON c_nationkey = n_nationkey
       |JOIN region ON n_regionkey = r_regionkey
       |GROUP BY GROUPING SETS ((r_name), (c_mktsegment))
       |ORDER BY r_name, c_mktsegment""".stripMargin

  /** Raw approximate percentiles — the 100 TB companion to
    * [[quantiles]]: `approx_percentile` (KLL-style mergeable summary)
    * holds FIXED memory per group regardless of value cardinality,
    * where even the bounded-state exact CDF walk carries one row per
    * distinct value. The raw estimates are engine-specific, so this
    * form is spec-tested; the REGISTERED [[quantilesApprox]] folds
    * them into a rank-guarantee witness the oracle can pin. */
  private[graft] def quantilesApproxRaw(s: SparkSession, d: String,
      accuracy: Int = 10000): DataFrame =
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(
        percentile_approx(col("l_extendedprice"), lit(0.25), lit(accuracy)).as("q25"),
        percentile_approx(col("l_extendedprice"), lit(0.5), lit(accuracy)).as("median"),
        percentile_approx(col("l_extendedprice"), lit(0.75), lit(accuracy)).as("q75"))
      .orderBy(col("l_returnflag"))

  /** Rank slack granted on top of `percentile_approx`'s 1/accuracy
    * guarantee, in 1e-4 rank units (guarantee = 1 unit; we pin 2). */
  private val QaRankSlack = 2L

  /** Approx-percentile GUARANTEE WITNESS (the q_countmin precedent):
    * the sketch's estimates leave the cluster as a bounded driver step
    * (3 groups × 3 values), come back as one broadcast literal, and a
    * single exact scan computes each estimate's EXACT rank interval
    * [#{x < v} + 1, #{x ≤ v}] per group. `*_ok` = that interval
    * intersects [p − ε, p + ε]·n with ε = [[QaRankSlack]]e-4 — i.e.
    * the 1/accuracy rank guarantee held, as pure BIGINT arithmetic.
    * The estimates themselves stay engine-specific (spec-asserted on
    * [[quantilesApproxRaw]]); the emitted card is deterministic, so
    * the DuckDB oracle reproduces the exact columns and pins the
    * guarantee flags TRUE — a sketch regression flips a flag and
    * fails the hash compare loudly. */
  def quantilesApprox(s: SparkSession, d: String, accuracy: Int = 10000): DataFrame = {
    val li = Tables.lineitem(s, d)
      .select(col("l_returnflag"), col("l_extendedprice"))
    val probeDf = s.createDataFrame(
      quantilesApproxRaw(s, d, accuracy).collect().toSeq.map(r =>
        (r.getString(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))))
      .toDF("flag", "v25", "v50", "v75")
    val checks = Seq(2500L -> "v25", 5000L -> "v50", 7500L -> "v75")
    val aggs = count(lit(1)).as("n_rows") +: checks.flatMap { case (_, v) => Seq(
      sum(when(col("l_extendedprice") < col(v), 1L).otherwise(0L)).as(s"lo_$v"),
      sum(when(col("l_extendedprice") <= col(v), 1L).otherwise(0L)).as(s"hi_$v"))
    }
    def ok(p: Long, v: String): Column =
      when(col(s"lo_$v") * 10000L <= (lit(p) + QaRankSlack) * col("n_rows") &&
        col(s"hi_$v") * 10000L >= (lit(p) - QaRankSlack) * col("n_rows"),
        1).otherwise(0)
    li.join(broadcast(probeDf), col("l_returnflag") === col("flag"))
      .groupBy(col("l_returnflag"))
      .agg(aggs.head, aggs.tail: _*)
      .select(col("l_returnflag"), col("n_rows"),
        ok(2500L, "v25").as("q25_ok"), ok(5000L, "v50").as("median_ok"),
        ok(7500L, "v75").as("q75_ok"))
      .orderBy(col("l_returnflag"))
  }

  /** Oracle for [[quantilesApprox]]: exact per-group counts with the
    * rank-guarantee flags pinned TRUE. */
  val quantilesApproxSql: String =
    """SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n_rows,
      |  1 AS q25_ok, 1 AS median_ok, 1 AS q75_ok
      |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin

  /** RANGE-frame moving aggregate: 7-day rolling GMV. The frame is a
    * VALUE range over day numbers (`rangeBetween(-6, 0)`), not a row
    * count — missing days narrow the frame, which rows-frames get
    * wrong. Scale discipline: the window runs over the PRE-AGGREGATED
    * daily table (one row per day, ~thousands of rows at any corpus
    * size), never over raw orders — aggregate to the frame's
    * granularity first, then the unavoidable single-partition ordered
    * window is bounded by the calendar, not the data. Sums stay
    * DECIMAL through both levels (order-independent), cast once at
    * the end. */
  def rollingGmv(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = Tables.orders(s, d)
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sum(dec(col("o_totalprice"))).as("gmv_dec"))
    val w = Window.orderBy(col("day_num")).rangeBetween(-6, 0)
    daily
      .withColumn("day_num", datediff(col("day"), to_date(lit("1970-01-01"))))
      .withColumn("gmv_7d_dec", sum(col("gmv_dec")).over(w))
      .select(
        date_format(col("day"), "yyyy-MM-dd").as("day"),
        col("gmv_dec").cast("double").as("gmv"),
        col("gmv_7d_dec").cast("double").as("gmv_7d"))
      .orderBy(col("day"))
  }

  val rollingGmvSql: String =
    """WITH daily AS (
      |  SELECT CAST(o_orderdate AS DATE) AS day,
      |    sum(CAST(o_totalprice AS DECIMAL(18,2))) AS gmv_dec
      |  FROM orders GROUP BY 1)
      |SELECT strftime(day, '%Y-%m-%d') AS day,
      |  CAST(gmv_dec AS DOUBLE) AS gmv,
      |  CAST(sum(gmv_dec) OVER (ORDER BY day
      |    RANGE BETWEEN INTERVAL 6 DAY PRECEDING AND CURRENT ROW)
      |    AS DOUBLE) AS gmv_7d
      |FROM daily ORDER BY day""".stripMargin

  /** UNPIVOT (wide → long): the lineitem charge columns melt into
    * (charge, amount) rows — the normalization step feeding generic
    * per-metric pipelines. Spark's native `unpivot` is a narrow
    * in-place transform (an Expand of the projection, no shuffle, no
    * join); output is 3× the rows but each carries two fewer columns. */
  def unpivotCharges(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_extendedprice"), col("l_discount"), col("l_tax"))
      .unpivot(
        Array(col("l_orderkey"), col("l_linenumber")),
        Array(col("l_extendedprice"), col("l_discount"), col("l_tax")),
        "charge", "amount")
      // (orderkey, linenumber) is non-unique in the synthetic lineitem:
      // include amount so ties are full-row duplicates (total order)
      .orderBy(col("l_orderkey"), col("l_linenumber"), col("charge"), col("amount"))

  val unpivotChargesSql: String =
    """SELECT l_orderkey, l_linenumber, charge, amount FROM (
      |  SELECT l_orderkey, l_linenumber,
      |    'l_extendedprice' AS charge, l_extendedprice AS amount FROM lineitem
      |  UNION ALL
      |  SELECT l_orderkey, l_linenumber, 'l_discount', l_discount FROM lineitem
      |  UNION ALL
      |  SELECT l_orderkey, l_linenumber, 'l_tax', l_tax FROM lineitem) t
      |ORDER BY l_orderkey, l_linenumber, charge, amount""".stripMargin

  /** Window-function breadth in one pass: rank / ntile / percent_rank /
    * cume_dist / lag-delta / running sum share ONE window sort per
    * (nation) partition — Catalyst collapses same-spec window functions
    * into a single Window node, so the partition is sorted once, not
    * six times. Ranking ints are cast to LONG (DuckDB emits BIGINT),
    * ratio doubles rounded to 6dp (pure-FP division is bit-identical
    * across engines, rounding guards the compare), money deltas and
    * running sums computed in DECIMAL (exact, order-independent). */
  def windowSuite(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("n_name"))
      .orderBy(col("c_acctbal").desc, col("c_custkey"))
    val balDec = dec(col("c_acctbal"))
    Tables.customer(s, d)
      .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .select(
        col("n_name"), col("c_custkey"), col("c_acctbal"),
        rank().over(w).cast("long").as("bal_rank"),
        ntile(4).over(w).cast("long").as("quartile"),
        round(percent_rank().over(w), 6).as("pct_rank"),
        round(cume_dist().over(w), 6).as("cdist"),
        (balDec - lag(balDec, 1).over(w)).cast("double").as("prev_gap"),
        sum(balDec).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("double").as("run_bal"))
      .filter(col("bal_rank") <= 10)
      .orderBy(col("n_name"), col("bal_rank"))
  }

  val windowSuiteSql: String =
    """SELECT n_name, c_custkey, c_acctbal, bal_rank, quartile, pct_rank,
      |  cdist, prev_gap, run_bal FROM (
      |  SELECT n_name, c_custkey, c_acctbal,
      |    rank() OVER w AS bal_rank,
      |    ntile(4) OVER w AS quartile,
      |    round(percent_rank() OVER w, 6) AS pct_rank,
      |    round(cume_dist() OVER w, 6) AS cdist,
      |    CAST(CAST(c_acctbal AS DECIMAL(18,2))
      |      - lag(CAST(c_acctbal AS DECIMAL(18,2))) OVER w AS DOUBLE) AS prev_gap,
      |    CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) OVER (
      |      PARTITION BY n_name ORDER BY c_acctbal DESC, c_custkey
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS run_bal
      |  FROM customer JOIN nation ON c_nationkey = n_nationkey
      |  WINDOW w AS (PARTITION BY n_name ORDER BY c_acctbal DESC, c_custkey)
      |) t WHERE bal_rank <= 10 ORDER BY n_name, bal_rank""".stripMargin

  /** FULL OUTER join shape (completing the semi/anti/inner/interval
    * breadth): per-day finished-order metrics vs pending-order metrics;
    * days where only one status traded keep the other side's metrics at
    * zero. Both inputs are pre-aggregated to ~one row per day BEFORE
    * the join, so the full-outer shuffles only daily rows — never raw
    * orders — and the join keys are the (already shuffled-by) group
    * keys, which AQE plans as a cheap sort-merge on tiny sides. */
  def fullOuterDaily(s: SparkSession, d: String): DataFrame = {
    def daily(status: String, pfx: String): DataFrame =
      Tables.orders(s, d)
        .filter(col("o_orderstatus") === status)
        .groupBy(to_date(col("o_orderdate")).as("day"))
        .agg(count(lit(1)).as(s"${pfx}_ct"), moneySum(col("o_totalprice")).as(s"${pfx}_amt"))
    daily("F", "fin").join(daily("P", "pend"), Seq("day"), "full_outer")
      .select(
        date_format(col("day"), "yyyy-MM-dd").as("day"),
        coalesce(col("fin_ct"), lit(0L)).as("fin_ct"),
        coalesce(col("fin_amt"), lit(0.0)).as("fin_amt"),
        coalesce(col("pend_ct"), lit(0L)).as("pend_ct"),
        coalesce(col("pend_amt"), lit(0.0)).as("pend_amt"))
      .orderBy(col("day"))
  }

  val fullOuterDailySql: String =
    s"""WITH fin AS (
       |  SELECT CAST(o_orderdate AS DATE) AS day, count(*) AS fin_ct,
       |    ${sqlMoneySum("o_totalprice")} AS fin_amt
       |  FROM orders WHERE o_orderstatus = 'F' GROUP BY 1),
       |pend AS (
       |  SELECT CAST(o_orderdate AS DATE) AS day, count(*) AS pend_ct,
       |    ${sqlMoneySum("o_totalprice")} AS pend_amt
       |  FROM orders WHERE o_orderstatus = 'P' GROUP BY 1)
       |SELECT strftime(coalesce(fin.day, pend.day), '%Y-%m-%d') AS day,
       |  coalesce(fin_ct, 0) AS fin_ct, coalesce(fin_amt, 0.0) AS fin_amt,
       |  coalesce(pend_ct, 0) AS pend_ct, coalesce(pend_amt, 0.0) AS pend_amt
       |FROM fin FULL OUTER JOIN pend ON fin.day = pend.day
       |ORDER BY day""".stripMargin

  /** Calendar gap-fill: a continuous day spine from min to max order
    * date, left-joined to daily order aggregates so quiet days emit
    * explicit zero rows (the serving shape every dashboard line-chart
    * needs). Spark-first: the spine is `sequence()` + `explode` over
    * the 2-value bounds row — derived from the already-aggregated
    * daily table, NOT a second scan of orders, and never a driver
    * loop. At 100 TB the spine is still just (max-min) rows. */
  def dailyGapfill(s: SparkSession, d: String): DataFrame = {
    val daily = Tables.orders(s, d)
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(count(lit(1)).as("order_ct"), moneySum(col("o_totalprice")).as("gmv"))
    val spine = daily.agg(min(col("day")).as("mn"), max(col("day")).as("mx"))
      .select(explode(sequence(col("mn"), col("mx"))).as("day"))
    spine.join(daily, Seq("day"), "left")
      .select(
        date_format(col("day"), "yyyy-MM-dd").as("day"),
        coalesce(col("order_ct"), lit(0L)).as("order_ct"),
        coalesce(col("gmv"), lit(0.0)).as("gmv"))
      .orderBy(col("day"))
  }

  /** Interval-overlap aggregation by SWEEP-LINE: per-day count of
    * lineitems ordered but not yet shipped (in-flight inventory — the
    * "concurrent sessions / open tickets" dashboard shape). The naive
    * plan joins every calendar day against every interval
    * (`day BETWEEN start AND end`) — O(days × intervals) and an
    * inequality join. The sweep-line never materializes overlaps:
    * each interval becomes two DELTAS (+1 at start, −1 the day after
    * end), deltas aggregate per day (partial-aggregable — 100 TB of
    * intervals collapses to one bounded day-granular table), and one
    * running sum over the calendar spine replays them. The only
    * serial structure is the day-granularity window — calendar-bounded
    * like [[dailyGapfill]]'s spine, independent of data volume. */
  def openOrders(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val iv = Tables.lineitem(s, d)
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .select(to_date(col("o_orderdate")).as("start"),
        to_date(col("l_shipdate")).as("end"))
      .filter(col("start").isNotNull && col("end") >= col("start"))
    val deltas = iv.select(col("start").as("day"), lit(1L).as("delta"))
      .unionAll(iv.select(date_add(col("end"), 1).as("day"), lit(-1L).as("delta")))
      .groupBy(col("day")).agg(sum(col("delta")).as("delta"))
    val spine = iv.agg(min(col("start")).as("mn"), max(col("end")).as("mx"))
      .select(explode(sequence(col("mn"), col("mx"))).as("day"))
    spine.join(deltas, Seq("day"), "left")
      .withColumn("open_ct",
        sum(coalesce(col("delta"), lit(0L)))
          .over(Window.orderBy(col("day"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(date_format(col("day"), "yyyy-MM-dd").as("day"), col("open_ct"))
      .orderBy(col("day"))
  }

  /** Oracle: the literal day-interval containment join (the formulation
    * the sweep-line replaces), day spine by list comprehension. */
  val openOrdersSql: String =
    """WITH iv AS (
      |  SELECT CAST(o_orderdate AS DATE) AS s, CAST(l_shipdate AS DATE) AS e
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |  WHERE o_orderdate IS NOT NULL AND CAST(l_shipdate AS DATE) >= CAST(o_orderdate AS DATE)),
      |b AS (SELECT min(s) AS lo, max(e) AS hi FROM iv),
      |spine AS (SELECT unnest([lo + CAST(i AS INTEGER)
      |                         for i in range(0, hi - lo + 1)]) AS day FROM b)
      |SELECT strftime(sp.day, '%Y-%m-%d') AS day,
      |  CAST(count(iv.s) AS BIGINT) AS open_ct
      |FROM spine sp LEFT JOIN iv ON sp.day BETWEEN iv.s AND iv.e
      |GROUP BY sp.day ORDER BY day""".stripMargin

  /** Recursive-CTE hierarchy walk through Spark's own SQL surface
    * (`WITH RECURSIVE` → `UnionLoop`, new in Spark 4): every customer
    * walks up a derived reporting chain (manager = custkey DIV 2, a
    * dense binary hierarchy over the key space — the synthetic stand-in
    * for org charts / category trees, which the TPC-H-ish schema lacks)
    * and reports chain depth plus the DECIMAL-exact balance along it.
    * Depth is data-dependent per row (log2 of the key, ≤ ~15 at any
    * tested SF) — genuine variable-depth recursion, not a bounded-hop
    * join chain, and each level is one distributed join+filter step.
    * The 2400-day calendar spine deliberately does NOT use this form:
    * a recursion 2400 levels deep is 2400 sequential jobs, which is why
    * [[dailyGapfill]] builds its spine with sequence+explode instead —
    * recursion where depth is log-bounded, fan-out where it isn't. */
  def orgWalk(s: SparkSession, d: String): DataFrame = {
    graft.Graft.registerViews(s, d)
    s.sql(
      """WITH RECURSIVE chain(start, node, hop) AS (
        |  SELECT c_custkey, c_custkey, 0 FROM customer
        |  UNION ALL
        |  SELECT start, node DIV 2, hop + 1 FROM chain WHERE node > 1)
        |SELECT chain.start AS c_custkey, max(chain.hop) AS depth,
        |  CAST(sum(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS chain_bal
        |FROM chain JOIN customer c ON chain.node = c.c_custkey
        |GROUP BY chain.start
        |ORDER BY c_custkey""".stripMargin)
  }

  val orgWalkSql: String =
    """WITH RECURSIVE chain(start, node, hop) AS (
      |  SELECT c_custkey, c_custkey, 0 FROM customer
      |  UNION ALL
      |  SELECT start, node // 2, hop + 1 FROM chain WHERE node > 1)
      |SELECT chain.start AS c_custkey, max(chain.hop) AS depth,
      |  CAST(sum(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS chain_bal
      |FROM chain JOIN customer c ON chain.node = c.c_custkey
      |GROUP BY chain.start
      |ORDER BY c_custkey""".stripMargin

  /** Oracle builds the same spine with a RECURSIVE CTE — the SQL-99
    * formulation of the spine Spark expresses as sequence+explode. */
  val dailyGapfillSql: String =
    s"""WITH RECURSIVE daily AS (
       |  SELECT CAST(o_orderdate AS DATE) AS day, count(*) AS order_ct,
       |    ${sqlMoneySum("o_totalprice")} AS gmv
       |  FROM orders GROUP BY 1),
       |b AS (SELECT min(day) AS mn, max(day) AS mx FROM daily),
       |cal(day) AS (
       |  -- mn IS NOT NULL guard: on an empty input Spark's
       |  -- explode(sequence(null,null)) yields ZERO rows; the anchor
       |  -- must match, not emit one NULL-day row
       |  SELECT mn FROM b WHERE mn IS NOT NULL
       |  UNION ALL
       |  SELECT day + 1 FROM cal WHERE day < (SELECT mx FROM b))
       |SELECT strftime(cal.day, '%Y-%m-%d') AS day,
       |  coalesce(order_ct, 0) AS order_ct, coalesce(gmv, 0.0) AS gmv
       |FROM cal LEFT JOIN daily ON cal.day = daily.day
       |ORDER BY day""".stripMargin

  /** 2-D skyline (Pareto frontier) over customers — maximize
    * (total spend, order count): a customer point survives iff no
    * other point is ≥ in both dimensions and > in one (Börzsönyi
    * et al., “The Skyline Operator”, ICDE 2001). The classic engine
    * op Spark has no native node for.
    *
    * Shape — the distributed two-phase sweep instead of the O(n²)
    * self-join: (1) distinct (spend, n) points, each with its customer
    * multiplicity; (2) LOCAL skyline per hash bucket — one window
    * partitioned by bucket, a point dies when a predecessor in
    * (spend DESC, n DESC) order already showed an ≥ order count
    * (the running-max test is exactly dominance under that sort);
    * (3) the same sweep once more, globally, over only the local
    * survivors. Skyline-of-union = skyline-of-local-skylines, and a
    * random bucketing leaves O(skyline · buckets) expected survivors —
    * the single-partition final window sees thousands of rows at
    * 100 TB, never the corpus. Spend stays DECIMAL through both
    * sweeps so the frontier set is engine-exact. */
  def skyline(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val pairs = Tables.orders(s, d)
      .groupBy(col("o_custkey"))
      .agg(sum(dec(col("o_totalprice"))).as("spend"), count(lit(1)).as("n_orders"))
      .groupBy(col("spend"), col("n_orders"))
      .agg(count(lit(1)).as("n_custs"))
    def sweep(df: DataFrame, part: Option[Column]): DataFrame = {
      val base = part.map(Window.partitionBy(_)).getOrElse(Window.partitionBy())
      val w = base.orderBy(col("spend").desc, col("n_orders").desc)
        .rowsBetween(Window.unboundedPreceding, -1)
      df.withColumn("pm", max(col("n_orders")).over(w))
        .filter(col("pm").isNull || col("pm") < col("n_orders"))
        .drop("pm")
    }
    val local = sweep(pairs.withColumn("bkt", pmod(hash(col("spend"), col("n_orders")), lit(32))),
      Some(col("bkt"))).drop("bkt")
    sweep(local, None)
      .select(col("spend").cast("double").as("total_spend"),
        col("n_orders"), col("n_custs"))
      .orderBy(col("total_spend").desc)
  }

  /** Ordered string aggregation (LISTAGG / string_agg / group_concat —
    * the SQL-surface staple): per nation, the alphabetically sorted
    * distinct market segments of its customers as one CSV. Spark 4
    * ships a native `listagg`, but its WITHIN GROUP ordering is not
    * expressible from the DataFrame API and unordered listagg is
    * nondeterministic — so the engine formulation is
    * `concat_ws(array_sort(collect_set(...)))`: same result, fully
    * deterministic under any partitioning (collect_set's order never
    * survives the sort), partial-aggregable, and the per-group state is
    * bounded by segment cardinality, not customer count. */
  def listAgg(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .join(Tables.nation(s, d), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(
        concat_ws(",", array_sort(collect_set(col("c_mktsegment")))).as("segments"),
        count(lit(1)).as("cust_ct"))
      .orderBy(col("n_name"))

  val listAggSql: String =
    """SELECT n_name,
      |  string_agg(DISTINCT c_mktsegment, ',' ORDER BY c_mktsegment) AS segments,
      |  CAST(count(*) AS BIGINT) AS cust_ct
      |FROM customer JOIN nation ON c_nationkey = n_nationkey
      |GROUP BY n_name ORDER BY n_name""".stripMargin

  /** Per-group statistical MODE with an explicit deterministic tie rule
    * (most frequent, tie → alphabetically smallest). Neither engine's
    * native `mode()` pins tie-breaks portably (Spark 4's does only
    * with its `deterministic` flag, DuckDB's not at all), so both
    * sides run the same explicit (count, value) arg-min — the
    * formulation that stays hash-comparable. Two partial-aggregable
    * rollups, no window over the fact table. */
  def modeAgg(s: SparkSession, d: String): DataFrame = {
    val counts = Tables.customer(s, d)
      .join(Tables.nation(s, d), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"), col("c_mktsegment"))
      .agg(count(lit(1)).as("ct"))
    counts.groupBy(col("n_name"))
      .agg(min_by(
        struct(col("c_mktsegment").as("m"), col("ct").as("ct")),
        struct((-col("ct")).as("nc"), col("c_mktsegment"))).as("top"))
      .select(col("n_name"), col("top.m").as("mode_segment"),
        col("top.ct").as("mode_ct"))
      .orderBy(col("n_name"))
  }

  val modeAggSql: String =
    """SELECT n_name, mode_segment, mode_ct FROM (
      |  SELECT n_name, c_mktsegment AS mode_segment, ct AS mode_ct,
      |    row_number() OVER (PARTITION BY n_name
      |      ORDER BY ct DESC, c_mktsegment) AS rn
      |  FROM (
      |    SELECT n_name, c_mktsegment, CAST(count(*) AS BIGINT) AS ct
      |    FROM customer JOIN nation ON c_nationkey = n_nationkey
      |    GROUP BY n_name, c_mktsegment) t) q
      |WHERE rn = 1 ORDER BY n_name""".stripMargin

  /** Oracle: the textbook NOT EXISTS dominance formulation — an
    * independent algorithm agreeing on the exact frontier. */
  val skylineSql: String =
    """WITH pc AS (
      |  SELECT o_custkey, sum(CAST(o_totalprice AS DECIMAL(18,2))) AS spend,
      |    CAST(count(*) AS BIGINT) AS n_orders
      |  FROM orders GROUP BY o_custkey),
      |pairs AS (
      |  SELECT spend, n_orders, CAST(count(*) AS BIGINT) AS n_custs
      |  FROM pc GROUP BY spend, n_orders),
      |sky AS (
      |  SELECT * FROM pairs p WHERE NOT EXISTS (
      |    SELECT 1 FROM pairs q
      |    WHERE q.spend >= p.spend AND q.n_orders >= p.n_orders
      |      AND (q.spend > p.spend OR q.n_orders > p.n_orders)))
      |SELECT CAST(spend AS DOUBLE) AS total_spend, n_orders, n_custs
      |FROM sky ORDER BY total_spend DESC""".stripMargin

  /** Robust per-group dispersion: exact MEDIAN + MAD (median absolute
    * deviation) of order totals per nation — the outlier-resistant
    * spread statistic (1.4826·MAD ≈ σ) monitoring pipelines prefer
    * over stddev. NO global sort and NO second fact scan: the fact
    * table collapses once to per-(group, cent-value) counts, the
    * median comes from the [[CdfQuantile]] CDF walk over those
    * counts, and the deviation distribution is DERIVED FROM THE SAME
    * COUNTS (|2·cents − 2·median| re-keys the count table — deviation
    * multiplicity is value multiplicity), so the second walk also
    * never touches raw rows.
    *
    * Engine-exactness: cents are exact longs; an interpolated median
    * is k or k+0.5, so 2·median is an exact integer and every doubled
    * deviation is an exact long. Both engines therefore interpolate
    * over identical integers and divide identical doubles at the end.
    */
  def medianMad(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cust = Tables.customer(s, d).select(col("c_custkey"), col("c_nationkey"))
    val cents = Tables.orders(s, d)
      .select(col("o_custkey"),
        (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long").as("cents"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"), col("cents").as("p"))
      .agg(count(lit(1)).as("ct"))
    def walk(counts: DataFrame): DataFrame = {
      val cum = counts
        .withColumn("cum", sum(col("ct")).over(
          Window.partitionBy(col("n_name")).orderBy(col("p"))))
        .withColumn("n", sum(col("ct")).over(Window.partitionBy(col("n_name"))))
      val aggs = CdfQuantile.qCols(0.5, "m")
      cum.groupBy(col("n_name")).agg(aggs.head, aggs.tail: _*)
        .select(col("n_name"), CdfQuantile.interp("m").as("med"))
    }
    val med = walk(cents)
    val devCounts = cents
      .join(broadcast(med), "n_name")
      .groupBy(col("n_name"),
        abs(col("p") * 2 - (col("med") * 2).cast("long")).as("p"))
      .agg(sum(col("ct")).as("ct"))
    walk(devCounts).withColumnRenamed("med", "mad2")
      .join(broadcast(med), "n_name")
      .select(col("n_name"),
        (col("med") / 100.0).as("median_price"),
        (col("mad2") / 200.0).as("mad_price"))
      .orderBy(col("n_name"))
  }

  val medianMadSql: String =
    """WITH c AS (
      |  SELECT n_name, CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
      |  FROM orders
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation ON c_nationkey = n_nationkey),
      |m AS (
      |  SELECT n_name, quantile_cont(cents, 0.5) AS medc
      |  FROM c GROUP BY n_name),
      |dev AS (
      |  SELECT c.n_name,
      |    abs(2 * cents - CAST(2 * medc AS BIGINT)) AS dev2
      |  FROM c JOIN m USING (n_name)),
      |md AS (
      |  SELECT n_name, quantile_cont(dev2, 0.5) AS mad2
      |  FROM dev GROUP BY n_name)
      |SELECT m.n_name, medc / 100.0 AS median_price,
      |  mad2 / 200.0 AS mad_price
      |FROM m JOIN md USING (n_name)
      |ORDER BY m.n_name""".stripMargin

  /** Equi-width HISTOGRAM of order totals (the profiling/data-card
    * primitive): 20 buckets over the observed [min, max], bounds from
    * ONE aggregate row that rides as a broadcast literal — no driver
    * round-trip, no second scan source. All bucket arithmetic is
    * integer cents (width rounds UP so the max lands in the last
    * bucket), so bucket ids and bounds are engine-exact; only
    * non-empty buckets emit (identically in both engines). */
  def histogram(s: SparkSession, d: String, buckets: Int = 20): DataFrame = {
    val cents = Tables.orders(s, d)
      .select((col("o_totalprice").cast("decimal(18,2)") * 100).cast("long").as("cents"))
    val bounds = cents.agg(min(col("cents")).as("lo"), max(col("cents")).as("hi"))
      .withColumn("width", expr(s"(hi - lo + $buckets) div $buckets"))
    cents.crossJoin(broadcast(bounds))
      .groupBy(expr("(cents - lo) div width").as("bucket"),
        col("lo"), col("width"))
      .agg(count(lit(1)).as("ct"))
      .select(col("bucket"),
        ((col("lo") + col("bucket") * col("width")) / lit(100.0)).as("bucket_lo"),
        ((col("lo") + (col("bucket") + 1) * col("width")) / lit(100.0)).as("bucket_hi"),
        col("ct"))
      .orderBy(col("bucket"))
  }

  val histogramSql: String =
    """WITH c AS (
      |  SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents FROM orders),
      |b AS (
      |  SELECT min(cents) AS lo,
      |    (max(cents) - min(cents) + 20) // 20 AS width
      |  FROM c)
      |SELECT (cents - lo) // width AS bucket,
      |  CAST(lo + ((cents - lo) // width) * width AS DOUBLE) / 100 AS bucket_lo,
      |  CAST(lo + ((cents - lo) // width + 1) * width AS DOUBLE) / 100 AS bucket_hi,
      |  CAST(count(*) AS BIGINT) AS ct
      |FROM c, b
      |GROUP BY 1, 2, 3 ORDER BY 1""".stripMargin

  /** Customer order-count distribution (the TPC-H Q13 shape): how many
    * customers placed exactly k qualifying orders — including the
    * zero-order customers only an OUTER join can see (the classic
    * "left join then count the null side" trap). Two partial-aggregable
    * hash-aggs around one equi-join: per-customer counts shuffle on
    * the join key, the distribution rollup is count-of-counts-sized.
    * The priority filter rides IN the join condition (pushed to the
    * orders scan) so excluded orders never join. */
  def custDist(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
      .filter(col("o_orderpriority") =!= "1-URGENT")
      .select(col("o_custkey"), col("o_orderkey"))
    Tables.customer(s, d)
      .join(o, col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  val custDistSql: String =
    """SELECT c_count, count(*) AS custdist
      |FROM (
      |  SELECT c_custkey, count(o_orderkey) AS c_count
      |  FROM customer LEFT OUTER JOIN orders
      |    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      |  GROUP BY c_custkey) c_orders
      |GROUP BY c_count
      |ORDER BY custdist DESC, c_count DESC""".stripMargin

  /** Local supplier volume (the TPC-H Q5 shape): revenue from orders
    * where the customer and supplier sit in the SAME nation, within
    * one region and a date window — the classic 6-table star join.
    * Declarative join order, bounded dims (`nation`, `region`)
    * broadcast, date filter pushed to the orders scan, same-nation
    * predicate applied as an equi-condition between the two fact
    * legs; DECIMAL-exact revenue. */
  def q5LocalVolume(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
      .filter(col("o_orderdate") >= lit("1996-01-01")
        && col("o_orderdate") < lit("1998-01-01"))
      .select(col("o_orderkey"), col("o_custkey"))
    Tables.lineitem(s, d)
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .join(Tables.supplier(s, d), col("l_suppkey") === col("s_suppkey"))
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey")
        && col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(Tables.nation(s, d)), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
      .filter(col("r_name") === "ASIA")
      .groupBy(col("n_name"))
      .agg(Agg.revenue(col("l_extendedprice"), col("l_discount")).as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  val q5Sql: String =
    s"""SELECT n_name, ${Agg.sqlRevenue("l_extendedprice", "l_discount")} AS revenue
       |FROM customer, orders, lineitem, supplier, nation, region
       |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
       |  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
       |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
       |  AND r_name = 'ASIA'
       |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
       |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
       |GROUP BY n_name
       |ORDER BY revenue DESC, n_name""".stripMargin

  /** Supplier diversity per part attribute (the TPC-H Q16 shape):
    * distinct suppliers per (brand, type, size), EXCLUDING a
    * complaint set (low-balance suppliers play the
    * customer-complaints subquery) — NOT IN becomes a left-anti
    * equi-join (safe here: the key is non-null), then one
    * multi-key exact-distinct aggregate and a deterministic top-50. */
  def q16SupplierDiversity(s: SparkSession, d: String): DataFrame = {
    val bad = Tables.supplier(s, d)
      .filter(col("s_acctbal") < 1000.0).select(col("s_suppkey"))
    Tables.lineitem(s, d)
      .join(Tables.part(s, d), col("l_partkey") === col("p_partkey"))
      .join(bad, col("l_suppkey") === col("s_suppkey"), "left_anti")
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"), col("p_size"))
      .limit(50)
  }

  val q16Sql: String =
    """SELECT p_brand, p_type, p_size,
      |  count(DISTINCT l_suppkey) AS supplier_cnt
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE l_suppkey NOT IN (
      |  SELECT s_suppkey FROM supplier WHERE s_acctbal < 1000)
      |GROUP BY p_brand, p_type, p_size
      |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
      |LIMIT 50""".stripMargin

  /** Dormant high-balance customers (the TPC-H Q22 shape): customers
    * whose balance beats the positive-balance average but who placed
    * NO recent order, rolled up per nation. The average rides as a
    * broadcast one-row scalar computed DECIMAL-exact (sum/count —
    * never engine-order-dependent `avg`); the NOT EXISTS is a
    * left-anti join against the date-bounded orders scan (filter
    * pushed down). */
  def q22SalesOpportunity(s: SparkSession, d: String): DataFrame = {
    val avgBal = Tables.customer(s, d)
      .filter(col("c_acctbal") > 0)
      .agg((Agg.moneySum(col("c_acctbal")) / count(lit(1))).as("ab"))
    val recent = Tables.orders(s, d)
      .filter(col("o_orderdate") >= lit("1999-01-01"))
      .select(col("o_custkey"))
    Tables.customer(s, d)
      .crossJoin(broadcast(avgBal))
      .filter(col("c_acctbal") > col("ab"))
      .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
      .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("numcust"),
        Agg.moneySum(col("c_acctbal")).as("totacctbal"))
      .orderBy(col("n_name"))
  }

  val q22Sql: String =
    s"""WITH ab AS (
       |  SELECT ${Agg.sqlMoneySum("c_acctbal")} / count(*) AS ab
       |  FROM customer WHERE c_acctbal > 0)
       |SELECT n_name, count(*) AS numcust,
       |  ${Agg.sqlMoneySum("c_acctbal")} AS totacctbal
       |FROM customer, nation, ab
       |WHERE c_nationkey = n_nationkey AND c_acctbal > ab
       |  AND NOT EXISTS (
       |    SELECT 1 FROM orders
       |    WHERE o_custkey = c_custkey
       |      AND o_orderdate >= TIMESTAMP '1999-01-01 00:00:00')
       |GROUP BY n_name
       |ORDER BY n_name""".stripMargin

  /** Late-delivery order-priority counts (the TPC-H Q4 shape): orders
    * in a quarter with at least one line shipped more than 30 days
    * after the order date — EXISTS becomes a left-semi equi-join with
    * the lateness predicate INSIDE the join condition (evaluated
    * during the join, not on a materialized pair stream). */
  def q4OrderPriority(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
      .filter(col("o_orderdate") >= lit("1996-07-01")
        && col("o_orderdate") < lit("1996-10-01"))
    val l = Tables.lineitem(s, d).select(col("l_orderkey"), col("l_shipdate"))
    o.join(l, col("l_orderkey") === col("o_orderkey")
        && col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 30 DAYS"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy(col("o_orderpriority"))
  }

  val q4Sql: String =
    """SELECT o_orderpriority, count(*) AS order_count
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1996-10-01 00:00:00'
      |  AND EXISTS (
      |    SELECT 1 FROM lineitem
      |    WHERE l_orderkey = o_orderkey
      |      AND l_shipdate > o_orderdate + INTERVAL 30 DAY)
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  /** Returned-item revenue per customer (the TPC-H Q10 shape): revenue
    * lost to returns ('R' lines) in a quarter, per customer with
    * nation context, top-20 — fact⋈fact equi-join with both date and
    * returnflag filters pushed to the scans, bounded dim broadcast,
    * DECIMAL-exact revenue, deterministic tie-break. */
  def q10ReturnedItems(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
      .filter(col("o_orderdate") >= lit("1996-07-01")
        && col("o_orderdate") < lit("1996-10-01"))
      .select(col("o_orderkey"), col("o_custkey"))
    Tables.lineitem(s, d)
      .filter(col("l_returnflag") === "R")
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
      .agg(Agg.revenue(col("l_extendedprice"), col("l_discount")).as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
  }

  val q10Sql: String =
    s"""SELECT c_custkey, c_name, n_name,
       |  ${Agg.sqlRevenue("l_extendedprice", "l_discount")} AS revenue
       |FROM lineitem
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |JOIN nation ON c_nationkey = n_nationkey
       |WHERE l_returnflag = 'R'
       |  AND o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
       |  AND o_orderdate < TIMESTAMP '1996-10-01 00:00:00'
       |GROUP BY c_custkey, c_name, n_name
       |ORDER BY revenue DESC, c_custkey
       |LIMIT 20""".stripMargin

  // ---------------------------------------------------------------
  // TPC-H decorrelation wave (Q2 / Q15 / Q17 / Q18 / Q21 shapes)
  // ---------------------------------------------------------------

  /** Minimum-cost supplier per part (the TPC-H Q2 shape — a CORRELATED
    * MIN over a join; the testdata has no partsupp table, so "supply
    * cost" is each supplier's best observed unit price for the part,
    * min(l_extendedprice / l_quantity), which keeps the exact query
    * shape on the tables we ship). Decorrelated Spark-first: the
    * per-(part, supplier) cost table aggregates ONCE, the correlated
    * `cost = (SELECT min ...)` becomes a per-part min aggregate
    * REJOINED on (partkey, cost) — two shuffles on the same part key
    * (AQE coalesced), never a per-row subquery. Region filter runs on
    * the supplier dim BEFORE both aggs (broadcast nation⋈region), so
    * at 100 TB the cost table only carries the region's suppliers.
    * min() of IEEE divisions is order-free, so the double join key is
    * deterministic on both engines. */
  def q2MinCostSupplier(s: SparkSession, d: String): DataFrame = {
    val eur = Tables.supplier(s, d)
      .join(broadcast(Tables.nation(s, d)), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
      .filter(col("r_name") === "EUROPE")
      .select(col("s_suppkey"), col("s_name"), col("s_acctbal"), col("n_name"))
    val cost = Tables.lineitem(s, d)
      .groupBy(col("l_partkey").as("partkey"), col("l_suppkey").as("suppkey"))
      .agg(min(col("l_extendedprice") / col("l_quantity")).as("cost"))
    val ec = cost.join(eur, col("suppkey") === col("s_suppkey"))
    val mn = ec.groupBy(col("partkey").as("mn_partkey"))
      .agg(min(col("cost")).as("mincost"))
    ec.join(mn, col("partkey") === col("mn_partkey") && col("cost") === col("mincost"))
      .join(Tables.part(s, d).filter(col("p_size") >= 30),
        col("partkey") === col("p_partkey"))
      .select(col("s_acctbal"), col("s_name"), col("n_name"),
        col("p_partkey"), col("p_type"), col("cost"))
      .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"), col("p_partkey"))
      .limit(100)
  }

  val q2Sql: String =
    """WITH cost AS (
      |  SELECT l_partkey AS partkey, l_suppkey AS suppkey,
      |         min(l_extendedprice / l_quantity) AS cost
      |  FROM lineitem GROUP BY 1, 2),
      |eur AS (
      |  SELECT s_suppkey, s_name, s_acctbal, n_name
      |  FROM supplier JOIN nation ON s_nationkey = n_nationkey
      |  JOIN region ON n_regionkey = r_regionkey
      |  WHERE r_name = 'EUROPE'),
      |ec AS (SELECT cost.*, s_name, s_acctbal, n_name
      |       FROM cost JOIN eur ON suppkey = s_suppkey)
      |SELECT s_acctbal, s_name, n_name, p_partkey, p_type, cost
      |FROM ec JOIN part ON p_partkey = ec.partkey
      |WHERE p_size >= 30
      |  AND cost = (SELECT min(cost) FROM ec e2 WHERE e2.partkey = ec.partkey)
      |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
      |LIMIT 100""".stripMargin

  /** Top revenue supplier (the TPC-H Q15 shape — MAX over a view): a
    * quarter's revenue per supplier, returning the supplier(s) AT the
    * maximum. Decorrelated: the revenue view aggregates once, the max
    * rides as a broadcast one-row scalar (no driver round-trip), and
    * the equality filter runs map-side — DECIMAL-exact revenue makes
    * the double equality deterministic on both engines. */
  def q15TopSupplier(s: SparkSession, d: String): DataFrame = {
    val rev = Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1996-01-01")
        && col("l_shipdate") < lit("1996-04-01"))
      .groupBy(col("l_suppkey").as("suppkey"))
      .agg(Agg.revenue(col("l_extendedprice"), col("l_discount")).as("total_revenue"))
    val mx = rev.agg(max(col("total_revenue")).as("m"))
    rev.crossJoin(broadcast(mx))
      .filter(col("total_revenue") === col("m"))
      .join(Tables.supplier(s, d), col("suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
      .orderBy(col("s_suppkey"))
  }

  val q15Sql: String =
    s"""WITH rev AS (
       |  SELECT l_suppkey AS suppkey,
       |    ${Agg.sqlRevenue("l_extendedprice", "l_discount")} AS total_revenue
       |  FROM lineitem
       |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
       |    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
       |  GROUP BY 1)
       |SELECT s_suppkey, s_name, total_revenue
       |FROM rev JOIN supplier ON suppkey = s_suppkey
       |WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
       |ORDER BY s_suppkey""".stripMargin

  /** Small-quantity revenue share (the TPC-H Q17 shape — a correlated
    * PER-PART AVG scalar): revenue that would vanish if orders below
    * 20% of a part's average quantity were dropped, for one brand.
    * Decorrelated: per-part moments (Σqty DECIMAL-exact, count)
    * aggregate once over the brand's lines and join back; the
    * `qty < 0.2·avg` predicate is cross-multiplied to
    * `5·qty·n < Σqty` so it compares EXACT decimals — no decimal
    * division whose rounding could differ between engines. The brand
    * filter lands on the part scan and semi-bounds the lineitem leg
    * before any aggregation (at 100 TB the moment table is one
    * brand's parts, not all parts). */
  def q17SmallQuantity(s: SparkSession, d: String): DataFrame = {
    val brandParts = Tables.part(s, d)
      .filter(col("p_brand") === "Brand#1").select(col("p_partkey"))
    val lines = Tables.lineitem(s, d)
      .join(broadcast(brandParts), col("l_partkey") === col("p_partkey"), "left_semi")
    val moments = lines.groupBy(col("l_partkey").as("pk"))
      .agg(sum(Agg.dec(col("l_quantity"))).as("sq"), count(lit(1)).as("n"))
    lines.join(moments, col("l_partkey") === col("pk"))
      .filter(Agg.dec(col("l_quantity")) * lit(5) * col("n") < col("sq"))
      .agg(count(lit(1)).as("n_lines"),
        (Agg.moneySum(col("l_extendedprice")) / 7.0).as("avg_yearly"))
  }

  val q17Sql: String =
    s"""WITH mom AS (
       |  SELECT l_partkey AS pk, sum(CAST(l_quantity AS DECIMAL(18,2))) AS sq,
       |         count(*) AS n
       |  FROM lineitem JOIN part ON p_partkey = l_partkey
       |  WHERE p_brand = 'Brand#1' GROUP BY 1)
       |SELECT count(*) AS n_lines,
       |  ${Agg.sqlMoneySum("l_extendedprice")} / 7.0 AS avg_yearly
       |FROM lineitem JOIN mom ON l_partkey = pk
       |WHERE CAST(l_quantity AS DECIMAL(18,2)) * 5 * n < sq""".stripMargin

  /** Large-volume orders (the TPC-H Q18 shape — IN over a grouped
    * HAVING): orders whose total quantity tops 250, with customer
    * context. Decorrelated: the HAVING aggregate runs once on the
    * fact, and the IN becomes the natural fact⋈fact equi-join on the
    * order key (both sides hash-partitioned on it); quantity sums are
    * DECIMAL-exact, dates format to strings (the engine-wide time
    * column contract). */
  def q18LargeOrders(s: SparkSession, d: String): DataFrame = {
    val big = Tables.lineitem(s, d)
      .groupBy(col("l_orderkey").as("ok"))
      .agg(sum(Agg.dec(col("l_quantity"))).as("sq"))
      .filter(col("sq") > 250)
      .select(col("ok"), col("sq").cast("double").as("total_qty"))
    Tables.orders(s, d)
      .join(big, col("o_orderkey") === col("ok"))
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_orderdate"),
        col("o_totalprice"), col("total_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(100)
  }

  val q18Sql: String =
    """WITH big AS (
      |  SELECT l_orderkey AS ok,
      |    CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
      |  FROM lineitem GROUP BY 1
      |  HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 250)
      |SELECT c_name, c_custkey, o_orderkey,
      |  strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
      |  o_totalprice, total_qty
      |FROM orders JOIN big ON o_orderkey = ok
      |JOIN customer ON o_custkey = c_custkey
      |ORDER BY o_totalprice DESC, o_orderkey
      |LIMIT 100""".stripMargin

  /** Suppliers who kept orders waiting (the TPC-H Q21 shape — EXISTS
    * plus NOT EXISTS self-joins on the fact): for finished orders, a
    * supplier's line shipped late (>60 days after the order date, the
    * testdata's stand-in for receipt>commit) where the order HAS other
    * suppliers but NONE of them were late — the sole-blame query.
    * Decorrelated: the late-line table derives once from the
    * date-filtered fact⋈orders join; EXISTS becomes a left-semi and
    * NOT EXISTS a left-anti self-join, both hash-partitioned on the
    * ORDER key with the supplier inequality evaluated inside the join
    * — no pair stream materializes, and at 100 TB both sides of each
    * self-join co-partition on the same key as the original join. */
  def q21WaitingSuppliers(s: SparkSession, d: String): DataFrame = {
    val oF = Tables.orders(s, d)
      .filter(col("o_orderstatus") === "F")
      .select(col("o_orderkey"), col("o_orderdate"))
    def late = Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
      .join(oF, col("l_orderkey") === col("o_orderkey"))
      .filter(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
      .select(col("l_orderkey"), col("l_suppkey"))
    val others = Tables.lineitem(s, d)
      .select(col("l_orderkey").as("ok2"), col("l_suppkey").as("sk2"))
    val lateOthers = late.select(col("l_orderkey").as("ok3"), col("l_suppkey").as("sk3"))
    late
      .join(others, col("l_orderkey") === col("ok2")
        && col("l_suppkey") =!= col("sk2"), "left_semi")
      .join(lateOthers, col("l_orderkey") === col("ok3")
        && col("l_suppkey") =!= col("sk3"), "left_anti")
      .join(Tables.supplier(s, d), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_name"))
      .agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
      .limit(100)
  }

  val q21Sql: String =
    """SELECT s_name, count(*) AS numwait
      |FROM lineitem l1
      |JOIN orders ON o_orderkey = l1.l_orderkey
      |JOIN supplier ON l1.l_suppkey = s_suppkey
      |WHERE o_orderstatus = 'F'
      |  AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
      |  AND EXISTS (
      |    SELECT 1 FROM lineitem l2
      |    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
      |  AND NOT EXISTS (
      |    SELECT 1 FROM lineitem l3
      |    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      |      AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
      |GROUP BY s_name
      |ORDER BY numwait DESC, s_name
      |LIMIT 100""".stripMargin

  /** Cross-region trade volume (the TPC-H Q7 shape): revenue shipped
    * by one region's suppliers to another region's customers, per
    * (supplier nation, customer nation, ship year) — the two-sided
    * dim-enrichment join. Both nation⋈region dims broadcast; the date
    * filter lands on the lineitem scan; DECIMAL-exact revenue; year
    * extraction on the ship date. */
  def q7NationVolume(s: SparkSession, d: String): DataFrame = {
    val suppN = Tables.supplier(s, d)
      .join(broadcast(Tables.nation(s, d)), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
      .filter(col("r_name") === "EUROPE")
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val custN = Tables.customer(s, d)
      .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
      .filter(col("r_name") === "ASIA")
      .select(col("c_custkey"), col("n_name").as("cust_nation"))
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1996-01-01")
        && col("l_shipdate") < lit("1998-01-01"))
      .join(Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .join(suppN, col("l_suppkey") === col("s_suppkey"))
      .join(custN, col("o_custkey") === col("c_custkey"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).as("l_year"))
      .agg(Agg.revenue(col("l_extendedprice"), col("l_discount")).as("revenue"))
      .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
  }

  val q7Sql: String =
    s"""SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
       |  year(l_shipdate) AS l_year,
       |  ${Agg.sqlRevenue("l_extendedprice", "l_discount")} AS revenue
       |FROM lineitem
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN supplier ON l_suppkey = s_suppkey
       |JOIN customer ON o_custkey = c_custkey
       |JOIN nation sn ON s_nationkey = sn.n_nationkey
       |JOIN nation cn ON c_nationkey = cn.n_nationkey
       |JOIN region sr ON sn.n_regionkey = sr.r_regionkey
       |JOIN region cr ON cn.n_regionkey = cr.r_regionkey
       |WHERE sr.r_name = 'EUROPE' AND cr.r_name = 'ASIA'
       |  AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
       |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
       |GROUP BY 1, 2, 3
       |ORDER BY supp_nation, cust_nation, l_year""".stripMargin

  /** Product-line profit (the TPC-H Q9 shape): per (supplier nation,
    * ship year), revenue minus supply cost — with no partsupp table
    * the unit cost is each (part, supplier)'s best observed unit
    * price (the [[q2MinCostSupplier]] cost model), FLOORED TO WHOLE
    * CENTS: the quotient's exact decimal expansion lands on half-cent
    * boundaries systematically (2-decimal price over small-integer
    * quantity), where the two engines' `round` semantics can differ —
    * `floor` of the same IEEE double is unambiguous on both. Cents
    * ride as DECIMAL so the whole profit sum is exact and order-free;
    * one final /100 division on identical doubles rescales. The cost
    * table aggregates once and joins back on the same (part, supplier)
    * key the fact already carries. */
  def q9ProductProfit(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val cost = Tables.lineitem(s, d)
      .groupBy(col("l_partkey").as("pk"), col("l_suppkey").as("sk"))
      .agg(floor(min(col("l_extendedprice") / col("l_quantity")) * 100)
        .cast(DecimalType(18, 2)).as("uc_cents"))
    val one = lit(BigDecimal(1)).cast(DecimalType(18, 2))
    Tables.lineitem(s, d)
      .join(cost, col("l_partkey") === col("pk") && col("l_suppkey") === col("sk"))
      .join(Tables.supplier(s, d), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.nation(s, d)), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation"), year(col("l_shipdate")).as("o_year"))
      .agg((sum(Agg.dec(col("l_extendedprice")) * (one - Agg.dec(col("l_discount"))) * 100
          - col("uc_cents") * Agg.dec(col("l_quantity")))
        .cast("double") / 100.0).as("sum_profit"))
      .orderBy(col("nation"), col("o_year").desc)
  }

  val q9Sql: String =
    """WITH cost AS (
      |  SELECT l_partkey AS pk, l_suppkey AS sk,
      |    CAST(floor(min(l_extendedprice / l_quantity) * 100) AS DECIMAL(18,2)) AS uc_cents
      |  FROM lineitem GROUP BY 1, 2)
      |SELECT n_name AS nation, year(l_shipdate) AS o_year,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
      |             * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) * 100
      |           - uc_cents * CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / 100.0
      |    AS sum_profit
      |FROM lineitem
      |JOIN cost ON l_partkey = pk AND l_suppkey = sk
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation ON s_nationkey = n_nationkey
      |GROUP BY 1, 2
      |ORDER BY nation, o_year DESC""".stripMargin

  /** Important parts by value share (the TPC-H Q11 shape — HAVING
    * against a global scalar over the same view): per-part value from
    * one region's suppliers, keeping parts above 1.5× the average
    * share. The threshold compares DECIMAL-exact cross-multiplied
    * integers (`2·val·n > 3·total`) — no engine-order-dependent
    * fraction; the totals ride as one broadcast row. */
  def q11ImportantParts(s: SparkSession, d: String): DataFrame = {
    val v = Tables.lineitem(s, d)
      .join(Tables.supplier(s, d), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.nation(s, d)), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
      .filter(col("r_name") === "EUROPE")
      .groupBy(col("l_partkey").as("p_partkey"))
      .agg(sum(Agg.dec(col("l_extendedprice"))).as("vd"))
    val tot = v.agg(sum(col("vd")).as("t"), count(lit(1)).as("np"))
    v.crossJoin(broadcast(tot))
      .filter(col("vd") * col("np") * 2 > col("t") * 3)
      .select(col("p_partkey"), col("vd").cast("double").as("value"))
      .orderBy(col("value").desc, col("p_partkey"))
  }

  val q11Sql: String =
    """WITH v AS (
      |  SELECT l_partkey AS p_partkey,
      |    sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS vd
      |  FROM lineitem
      |  JOIN supplier ON l_suppkey = s_suppkey
      |  JOIN nation ON s_nationkey = n_nationkey
      |  JOIN region ON n_regionkey = r_regionkey
      |  WHERE r_name = 'EUROPE' GROUP BY 1),
      |tot AS (SELECT sum(vd) AS t, count(*) AS np FROM v)
      |SELECT p_partkey, CAST(vd AS DOUBLE) AS value
      |FROM v, tot
      |WHERE vd * np * 2 > t * 3
      |ORDER BY value DESC, p_partkey""".stripMargin

  /** Promotion revenue share (the TPC-H Q14 shape — conditional
    * aggregation ratio): the percentage of a month's revenue from
    * PROMO-type parts. Both legs of the ratio are DECIMAL-exact sums
    * over the same scan; the single division is one IEEE op on
    * identical operands — engine-stable. */
  def q14PromoRevenue(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val one = lit(BigDecimal(1)).cast(DecimalType(18, 2))
    val zero = lit(BigDecimal(0)).cast(DecimalType(18, 2))
    val amount = Agg.dec(col("l_extendedprice")) * (one - Agg.dec(col("l_discount")))
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1996-09-01")
        && col("l_shipdate") < lit("1996-10-01"))
      .join(Tables.part(s, d), col("l_partkey") === col("p_partkey"))
      .agg(
        (lit(100.0) * sum(when(col("p_type").startsWith("PROMO"), amount)
            .otherwise(zero)).cast("double")
          / sum(amount).cast("double")).as("promo_revenue_pct"),
        sum(amount).cast("double").as("total_revenue"))
  }

  val q14Sql: String =
    """SELECT
      |  100.0 * CAST(sum(CASE WHEN p_type LIKE 'PROMO%'
      |      THEN CAST(l_extendedprice AS DECIMAL(18,2))
      |           * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
      |      ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
      |    / CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
      |           * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
      |    AS promo_revenue_pct,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
      |       * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
      |    AS total_revenue
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1996-10-01 00:00:00'""".stripMargin

  /** Disjunctive-predicate revenue (the TPC-H Q19 shape): revenue over
    * an OR of three (brand, size-range, quantity-range) conjunctions
    * spanning BOTH join sides — the classic test that a disjunction
    * across tables still pushes its common join key down and evaluates
    * the residual as one post-join filter rather than three plans.
    * One equi-join, DECIMAL-exact revenue, one witness row. */
  def q19DiscountedOr(s: SparkSession, d: String): DataFrame = {
    val p = col("p_brand")
    val sz = col("p_size")
    val q = col("l_quantity")
    val pred =
      (p === "Brand#1" && sz.between(1, 15) && q.between(1, 30)) ||
      (p === "Brand#2" && sz.between(10, 30) && q.between(10, 40)) ||
      (p === "Brand#3" && sz.between(20, 50) && q.between(20, 50))
    Tables.lineitem(s, d)
      .join(Tables.part(s, d), col("l_partkey") === col("p_partkey"))
      .filter(pred)
      .agg(count(lit(1)).as("n_lines"),
        Agg.revenue(col("l_extendedprice"), col("l_discount")).as("revenue"))
  }

  val q19Sql: String =
    s"""SELECT count(*) AS n_lines,
       |  ${Agg.sqlRevenue("l_extendedprice", "l_discount")} AS revenue
       |FROM lineitem JOIN part ON l_partkey = p_partkey
       |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 30)
       |   OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30 AND l_quantity BETWEEN 10 AND 40)
       |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50 AND l_quantity BETWEEN 20 AND 50)""".stripMargin

  /** Focal-year supply concentration (the TPC-H Q20 shape — a chained
    * semi-join against a correlated aggregate threshold): suppliers
    * who shipped more than half of their all-time volume of
    * widget-named parts during 1996. The correlated `half of total`
    * becomes one conditional-aggregation pass per (supplier, part)
    * (focal-year sum rides the same DECIMAL aggregate as the total —
    * no second scan), the threshold cross-multiplies to exact
    * decimals, and qualifying parts roll up per supplier before the
    * supplier⋈nation enrichment — the name filter semi-bounds the
    * fact leg first. */
  def q20ExcessSupply(s: SparkSession, d: String): DataFrame = {
    val widgetParts = Tables.part(s, d)
      .filter(col("p_name").contains("widget")).select(col("p_partkey"))
    val g = Tables.lineitem(s, d)
      .join(broadcast(widgetParts), col("l_partkey") === col("p_partkey"), "left_semi")
      .groupBy(col("l_suppkey").as("sk"), col("l_partkey").as("pk"))
      .agg(
        sum(when(col("l_shipdate") >= lit("1996-01-01")
            && col("l_shipdate") < lit("1997-01-01"),
          Agg.dec(col("l_quantity"))).otherwise(lit(BigDecimal(0))
            .cast(org.apache.spark.sql.types.DecimalType(18, 2)))).as("q96"),
        sum(Agg.dec(col("l_quantity"))).as("qall"))
    g.filter(col("q96") * 2 > col("qall"))
      .groupBy(col("sk"))
      .agg(count(lit(1)).as("n_parts"))
      .join(Tables.supplier(s, d), col("sk") === col("s_suppkey"))
      .join(broadcast(Tables.nation(s, d)), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_name"), col("n_name"), col("n_parts"))
      .orderBy(col("s_name"))
  }

  val q20Sql: String =
    """WITH g AS (
      |  SELECT l_suppkey AS sk, l_partkey AS pk,
      |    sum(CASE WHEN l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |              AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      |             THEN CAST(l_quantity AS DECIMAL(18,2))
      |             ELSE CAST(0 AS DECIMAL(18,2)) END) AS q96,
      |    sum(CAST(l_quantity AS DECIMAL(18,2))) AS qall
      |  FROM lineitem JOIN part ON l_partkey = p_partkey
      |  WHERE p_name LIKE '%widget%' GROUP BY 1, 2)
      |SELECT s_name, n_name, n_parts
      |FROM (SELECT sk, CAST(count(*) AS BIGINT) AS n_parts
      |      FROM g WHERE q96 * 2 > qall GROUP BY sk) e
      |JOIN supplier ON sk = s_suppkey
      |JOIN nation ON s_nationkey = n_nationkey
      |ORDER BY s_name""".stripMargin

  /** Revenue-increase forecast (the TPC-H Q6 shape): the what-if
    * "revenue gained if these discounts had been dropped" — ONE
    * scan-only aggregate, no join; all three predicates (ship year,
    * discount band, quantity cap) push to the parquet scan, and the
    * forecast delta sums price×discount in exact DECIMAL. The
    * discount band compares the stored doubles against the same
    * literals in both engines, so the boundary behavior is identical
    * by construction. */
  def q6ForecastRevenue(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1996-01-01")
        && col("l_shipdate") < lit("1997-01-01")
        && col("l_discount") >= 0.03 && col("l_discount") <= 0.07
        && col("l_quantity") < 24)
      .agg(sum(Agg.dec(col("l_extendedprice")) * Agg.dec(col("l_discount")))
        .cast("double").as("revenue"))

  val q6Sql: String =
    """SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
      |                * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      |  AND l_discount >= 0.03 AND l_discount <= 0.07
      |  AND l_quantity < 24""".stripMargin

  /** National market share (the TPC-H Q8 shape): one supplier
    * nation's share of a part type's revenue inside one customer
    * region, by order year — the case-sum-over-sum ratio query (the
    * [[q14PromoRevenue]] discipline: both sums DECIMAL-exact, cast to
    * double, ONE division of identical doubles — no rounding needed).
    * The part filter broadcasts (1/6 of a bounded dim), nation/region
    * broadcast, customer membership is a semi-join (region filter
    * carries no payload), and the fact⋈fact orders join shuffles on
    * the key both sides already carry. */
  def q8MarketShare(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val one = lit(BigDecimal(1)).cast(DecimalType(18, 2))
    val zero = lit(BigDecimal(0)).cast(DecimalType(18, 2))
    val amount = Agg.dec(col("l_extendedprice")) * (one - Agg.dec(col("l_discount")))
    val suppN = Tables.supplier(s, d)
      .join(broadcast(Tables.nation(s, d)), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val custAsia = Tables.customer(s, d)
      .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
      .filter(col("r_name") === "ASIA")
      .select(col("c_custkey"))
    Tables.lineitem(s, d)
      .join(broadcast(Tables.part(s, d).filter(col("p_type") === "ECONOMY")
        .select(col("p_partkey"))), col("l_partkey") === col("p_partkey"))
      .join(Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .join(custAsia, col("o_custkey") === col("c_custkey"), "left_semi")
      .join(suppN, col("l_suppkey") === col("s_suppkey"))
      .groupBy(year(col("o_orderdate")).as("o_year"))
      .agg((sum(when(col("supp_nation") === "NATION_19", amount).otherwise(zero)).cast("double")
        / sum(amount).cast("double")).as("mkt_share"))
      .orderBy(col("o_year"))
  }

  val q8Sql: String =
    """SELECT year(o_orderdate) AS o_year,
      |  CAST(sum(CASE WHEN n2.n_name = 'NATION_19'
      |      THEN CAST(l_extendedprice AS DECIMAL(18,2))
      |           * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
      |      ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
      |    / CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
      |           * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE)
      |    AS mkt_share
      |FROM lineitem
      |JOIN part ON l_partkey = p_partkey
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation n1 ON c_nationkey = n1.n_nationkey
      |JOIN nation n2 ON s_nationkey = n2.n_nationkey
      |JOIN region ON n1.n_regionkey = r_regionkey
      |WHERE p_type = 'ECONOMY' AND r_name = 'ASIA'
      |GROUP BY 1
      |ORDER BY 1""".stripMargin

  /** Shipping class × order priority (the TPC-H Q12 shape): how many
    * critical-priority orders ride each shipping class, counting only
    * LATE lines. The synthetic schema has no l_shipmode or
    * commit/receipt dates, so the return flag plays the mode dimension
    * and "late" is a ship lag > 45 days past the order date (the
    * [[q4OrderPriority]] 30-day precedent). The year filter pushes to
    * the lineitem scan; the lag predicate rides the equi-join as a
    * residual; counts are exact longs. */
  def q12ShipPriority(s: SparkSession, d: String): DataFrame = {
    val hi = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1996-01-01")
        && col("l_shipdate") < lit("1997-01-01"))
      .join(Tables.orders(s, d)
          .select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority")),
        col("l_orderkey") === col("o_orderkey")
          && col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 45 DAYS"))
      .groupBy(col("l_returnflag"))
      .agg(
        sum(when(hi, 1L).otherwise(0L)).as("high_line_count"),
        sum(when(hi, 0L).otherwise(1L)).as("low_line_count"))
      .orderBy(col("l_returnflag"))
  }

  val q12Sql: String =
    """SELECT l_returnflag,
      |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
      |    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
      |    THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |WHERE l_shipdate > o_orderdate + INTERVAL 45 DAY
      |  AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      |GROUP BY 1 ORDER BY 1""".stripMargin
}
