package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-quality / warehouse-audit operators — the governance layer a
  * production warehouse runs next to every ingest the reference
  * pipeline performs implicitly (BaseLogApp's dirty side output,
  * gmall-realtime app/dwd/BaseLogApp.java:52-63, is a per-record
  * validity check; these operators are its TABLE-level siblings:
  * profile a landed table, audit rule compliance, diff a dim snapshot
  * after a MERGE).
  *
  * Scale design: `dqProfile` is ONE scan (the per-column stats fuse
  * into a single aggregate; the exact multi-distinct expands to a
  * k-way Expand — the standard profiling pass; at 100 TB swap the
  * exact distincts for `approx_count_distinct` partials, same plan
  * shape). `dqRules` fuses all single-table rules into one
  * conditional-aggregation scan per table; referential rules are
  * left-anti equi-joins on the key (shuffle on the FK, partial-
  * aggregable count). `snapshotDiff` is one full-outer equi-join on
  * the dim key — dim-sized, never fact-sized.
  */
object Quality {

  // ---------------------------------------------------------------
  // dq_profile — per-column profiling card
  // ---------------------------------------------------------------

  /** Per-column profile of the normalized `events` table: row count,
    * null count, exact distinct count, numeric min/max (as double) for
    * numeric columns, lexicographic min/max for string columns. The
    * timestamp profiles as `ts_us` (integer micros — engine-neutral,
    * the Tables.events contract). One scan; every stat is
    * partial-aggregable.
    */
  def dqProfile(s: SparkSession, d: String): DataFrame =
    profileCard(s, d, c => countDistinct(col(c)))

  /** [[dqProfile]]'s 100 TB twin — the variant the profile doc-comment
    * promises: the SAME one-scan card with the exact multi-distinct
    * (a k-way Expand that replays the scan k times through the
    * aggregate) swapped for `approx_count_distinct` HLL++ partials —
    * plan shows NO Expand, per-column state is a fixed-size register
    * set, merges are register maxima (order-free, so the card is
    * partitioning-invariant and ContractSpec-stable). `n_distinct`
    * becomes an estimate (rsd 2%) → spec-asserted (error bound vs
    * the exact card, Expand-free plan); the REGISTERED
    * [[dqProfileApprox]] folds it into a witness card. */
  private[graft] def dqProfileApproxRaw(s: SparkSession, d: String): DataFrame =
    profileCard(s, d, c => approx_count_distinct(col(c), 0.02))

  /** HLL profile-card WITNESS (the q_countmin precedent): the exact
    * card ([[dqProfile]]) joins the Expand-free approx card on the
    * column name; every non-estimate stat is emitted exactly, and
    * `nd_ok` = |est − exact| ≤ max(5%·exact, 1 absolute) — the spec's
    * band, deterministic because register maxima are order-free. The
    * exact pass exists FOR the witness (at 100 TB you would ship only
    * [[dqProfileApproxRaw]]'s card); a sketch regression flips nd_ok
    * and fails the driver hash compare. */
  def dqProfileApprox(s: SparkSession, d: String): DataFrame =
    dqProfile(s, d)
      .join(dqProfileApproxRaw(s, d)
          .select(col("col").as("acol"), col("n_distinct").as("nd_est")),
        col("col") === col("acol"))
      .select(col("col"), col("n_rows"), col("n_nulls"), col("n_distinct"),
        when(abs(col("nd_est") - col("n_distinct")) * 20L <=
          greatest(col("n_distinct"), lit(20L)), 1).otherwise(0).as("nd_ok"),
        col("min_num"), col("max_num"), col("min_str"), col("max_str"))
      .orderBy(col("col"))


  private def profileCard(s: SparkSession, d: String,
      nd: String => Column): DataFrame = {
    val e = Tables.events(s, d)
      .select(col("event_id"), col("ts_us"), col("user_id"),
        col("event_type"), col("value"), col("props"))

    def numStats(c: String) = Seq(
      count(when(col(c).isNull, 1)).as(s"nn_$c"),
      nd(c).as(s"nd_$c"),
      min(col(c)).cast("double").as(s"mn_$c"),
      max(col(c)).cast("double").as(s"mx_$c"))
    def strStats(c: String) = Seq(
      count(when(col(c).isNull, 1)).as(s"nn_$c"),
      nd(c).as(s"nd_$c"),
      min(col(c)).as(s"mn_$c"),
      max(col(c)).as(s"mx_$c"))

    val numCols = Seq("event_id", "ts_us", "user_id", "value")
    val strCols = Seq("event_type", "props")
    val aggs = count(lit(1)).as("n") +:
      (numCols.flatMap(numStats) ++ strCols.flatMap(strStats))
    val a = e.agg(aggs.head, aggs.tail: _*)

    val nullD = lit(null).cast("double")
    val nullS = lit(null).cast("string")
    def numRow(c: String) = struct(
      lit(c).as("col"), col("n").as("n_rows"),
      col(s"nn_$c").as("n_nulls"), col(s"nd_$c").as("n_distinct"),
      col(s"mn_$c").as("min_num"), col(s"mx_$c").as("max_num"),
      nullS.as("min_str"), nullS.as("max_str"))
    def strRow(c: String) = struct(
      lit(c).as("col"), col("n").as("n_rows"),
      col(s"nn_$c").as("n_nulls"), col(s"nd_$c").as("n_distinct"),
      nullD.as("min_num"), nullD.as("max_num"),
      col(s"mn_$c").as("min_str"), col(s"mx_$c").as("max_str"))

    a.select(explode(array(
        (numCols.map(numRow) ++ strCols.map(strRow)): _*)).as("p"))
      .select(col("p.*"))
      .orderBy(col("col"))
  }

  val dqProfileSql: String = {
    def num(c: String, expr: String) =
      s"""SELECT '$c' AS col, n AS n_rows, nn_$c AS n_nulls,
         |  nd_$c AS n_distinct, mn_$c AS min_num, mx_$c AS max_num,
         |  CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str
         |FROM s""".stripMargin
    def str(c: String) =
      s"""SELECT '$c' AS col, n AS n_rows, nn_$c AS n_nulls,
         |  nd_$c AS n_distinct, CAST(NULL AS DOUBLE) AS min_num,
         |  CAST(NULL AS DOUBLE) AS max_num, mn_$c AS min_str, mx_$c AS max_str
         |FROM s""".stripMargin
    // ts profiles as micros: DuckDB's implicit TIMESTAMP_NS -> TIMESTAMP
    // coercion inside epoch_us truncates to micros, matching
    // Tables.events' ts_us = ns div 1000 — no explicit CAST needed.
    """WITH e AS (
      |  SELECT event_id, epoch_us(ts) AS ts_us,
      |    user_id, event_type, value, props
      |  FROM events),
      |s AS (SELECT count(*) AS n,
      |  count(*) FILTER (event_id IS NULL) AS nn_event_id,
      |  count(DISTINCT event_id) AS nd_event_id,
      |  CAST(min(event_id) AS DOUBLE) AS mn_event_id,
      |  CAST(max(event_id) AS DOUBLE) AS mx_event_id,
      |  count(*) FILTER (ts_us IS NULL) AS nn_ts_us,
      |  count(DISTINCT ts_us) AS nd_ts_us,
      |  CAST(min(ts_us) AS DOUBLE) AS mn_ts_us,
      |  CAST(max(ts_us) AS DOUBLE) AS mx_ts_us,
      |  count(*) FILTER (user_id IS NULL) AS nn_user_id,
      |  count(DISTINCT user_id) AS nd_user_id,
      |  CAST(min(user_id) AS DOUBLE) AS mn_user_id,
      |  CAST(max(user_id) AS DOUBLE) AS mx_user_id,
      |  count(*) FILTER (value IS NULL) AS nn_value,
      |  count(DISTINCT value) AS nd_value,
      |  min(value) AS mn_value, max(value) AS mx_value,
      |  count(*) FILTER (event_type IS NULL) AS nn_event_type,
      |  count(DISTINCT event_type) AS nd_event_type,
      |  min(event_type) AS mn_event_type, max(event_type) AS mx_event_type,
      |  count(*) FILTER (props IS NULL) AS nn_props,
      |  count(DISTINCT props) AS nd_props,
      |  min(props) AS mn_props, max(props) AS mx_props
      |FROM e)
      |""".stripMargin +
      (Seq(num("event_id", ""), num("ts_us", ""), num("user_id", ""),
        num("value", "")) ++ Seq(str("event_type"), str("props")))
        .mkString("", "\nUNION ALL\n", "\nORDER BY col")
  }

  /** Oracle for [[dqProfileApprox]]: the exact profile card with the
    * HLL error-band flag pinned TRUE. */
  val dqProfileApproxSql: String =
    s"SELECT col, n_rows, n_nulls, n_distinct, 1 AS nd_ok,\n" +
      s"  min_num, max_num, min_str, max_str\nFROM (\n$dqProfileSql\n) t ORDER BY col"

  // ---------------------------------------------------------------
  // dq_rules — declarative rule-violation audit
  // ---------------------------------------------------------------

  /** Rule-based validation audit: per rule, the violation count.
    * Single-table rules (domain / range / duplicate-PK / null-key /
    * unparseable-payload) fuse into ONE conditional-aggregation scan
    * per table; referential-integrity rules (lineitem→orders,
    * orders→customer orphans) are left-anti equi-joins. Every leg is
    * partial-aggregable; the final union is 7 one-row frames. */
  def dqRules(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
    val l = Tables.lineitem(s, d)
    val c = Tables.customer(s, d)
    val e = Tables.events(s, d)

    def rows(pairs: (String, Column)*)(src: DataFrame): DataFrame =
      src.agg(pairs.head._2.as(pairs.head._1),
          pairs.tail.map(p => p._2.as(p._1)): _*)
        .select(explode(array(pairs.map(p =>
          struct(lit(p._1).as("rule"), col(p._1).as("violations"))): _*)).as("r"))
        .select(col("r.*"))

    val ordersRules = rows(
      "orders_status_domain" ->
        count(when(!col("o_orderstatus").isin("F", "P", "O"), 1)),
      "orders_nonpositive_total" -> count(when(col("o_totalprice") <= 0, 1)),
      "orders_dup_pk" -> (count(lit(1)) - countDistinct(col("o_orderkey"))))(o)
    val liRules = rows(
      "lineitem_qty_range" ->
        count(when(col("l_quantity") < 1 || col("l_quantity") > 50, 1)))(l)
    val eventsRules = rows(
      "events_null_user" -> count(when(col("user_id").isNull, 1)),
      "events_unparseable_props" ->
        count(when(Dwd.propsK(coalesce(col("props"), lit(""))) === "", 1)))(e)
    val orphanLi = l.join(o, col("l_orderkey") === col("o_orderkey"), "left_anti")
      .agg(count(lit(1)).as("violations"))
      .select(lit("lineitem_orphan_order").as("rule"), col("violations"))
    val orphanOrd = o.join(c, col("o_custkey") === col("c_custkey"), "left_anti")
      .agg(count(lit(1)).as("violations"))
      .select(lit("orders_orphan_customer").as("rule"), col("violations"))

    ordersRules.unionByName(liRules).unionByName(eventsRules)
      .unionByName(orphanLi).unionByName(orphanOrd)
      .orderBy(col("rule"))
  }

  val dqRulesSql: String =
    """SELECT 'orders_status_domain' AS rule,
      |  count(*) FILTER (o_orderstatus NOT IN ('F','P','O')) AS violations
      |FROM orders
      |UNION ALL
      |SELECT 'orders_nonpositive_total',
      |  count(*) FILTER (o_totalprice <= 0) FROM orders
      |UNION ALL
      |SELECT 'orders_dup_pk',
      |  count(*) - count(DISTINCT o_orderkey) FROM orders
      |UNION ALL
      |SELECT 'lineitem_qty_range',
      |  count(*) FILTER (l_quantity < 1 OR l_quantity > 50) FROM lineitem
      |UNION ALL
      |SELECT 'events_null_user',
      |  count(*) FILTER (user_id IS NULL) FROM events
      |UNION ALL
      |SELECT 'events_unparseable_props',
      |  count(*) FILTER (regexp_extract(coalesce(props, ''), '"k":\s*(\d+)', 1) = '')
      |FROM events
      |UNION ALL
      |SELECT 'lineitem_orphan_order', count(*)
      |FROM lineitem WHERE NOT EXISTS (
      |  SELECT 1 FROM orders WHERE o_orderkey = l_orderkey)
      |UNION ALL
      |SELECT 'orders_orphan_customer', count(*)
      |FROM orders WHERE NOT EXISTS (
      |  SELECT 1 FROM customer WHERE c_custkey = o_custkey)
      |ORDER BY rule""".stripMargin

  // ---------------------------------------------------------------
  // q_snapshot_diff — audit diff of a dim MERGE
  // ---------------------------------------------------------------

  /** Snapshot DIFF audit — what did the day's CDC replay actually do
    * to the dim table? Compares the base `part` snapshot against the
    * merged result of [[DimMaintenance.dimUpsert]] (same replay) and
    * emits one row per CHANGED key: op I (key new in the merge), D
    * (key tombstoned away), U (payload changed) with the changed
    * column list. The whole audit is ONE full-outer equi-join on the
    * dim key — dim-sized work however large the fact history behind
    * the CDC stream is. Unchanged keys emit nothing, so the output is
    * change-sized (the audit you can afford to keep per day). */
  def snapshotDiff(s: SparkSession, d: String): DataFrame = {
    val base = Tables.part(s, d)
      .select(col("p_partkey").as("b_key"), col("p_name").as("b_name"),
        col("p_brand").as("b_brand"))
    val merged = DimMaintenance.dimUpsert(s, d)
      .select(col("p_partkey").as("m_key"), col("p_name").as("m_name"),
        col("p_brand").as("m_brand"))
    base.join(merged, col("b_key") === col("m_key"), "full_outer")
      .withColumn("op",
        when(col("b_key").isNull, "I")
          .when(col("m_key").isNull, "D")
          .when(col("b_name") =!= col("m_name")
            || col("b_brand") =!= col("m_brand"), "U"))
      .filter(col("op").isNotNull)
      .select(
        coalesce(col("b_key"), col("m_key")).as("p_partkey"),
        col("op"),
        when(col("op") === "U", concat_ws(",",
          when(col("b_name") =!= col("m_name"), lit("p_name")),
          when(col("b_brand") =!= col("m_brand"), lit("p_brand")))).as("changed"),
        col("m_name").as("new_name"))
      .orderBy(col("p_partkey"))
  }

  val snapshotDiffSql: String =
    s"""WITH merged AS (${DimMaintenance.dimUpsertSqlBody}),
       |j AS (
       |  SELECT b.p_partkey AS b_key, b.p_name AS b_name, b.p_brand AS b_brand,
       |    m.p_partkey AS m_key, m.p_name AS m_name, m.p_brand AS m_brand
       |  FROM part b FULL OUTER JOIN merged m ON b.p_partkey = m.p_partkey),
       |ops AS (
       |  SELECT *, CASE WHEN b_key IS NULL THEN 'I'
       |                 WHEN m_key IS NULL THEN 'D'
       |                 WHEN b_name <> m_name OR b_brand <> m_brand THEN 'U'
       |            END AS op
       |  FROM j)
       |SELECT coalesce(b_key, m_key) AS p_partkey, op,
       |  CASE WHEN op = 'U' THEN concat_ws(',',
       |    CASE WHEN b_name <> m_name THEN 'p_name' END,
       |    CASE WHEN b_brand <> m_brand THEN 'p_brand' END) END AS changed,
       |  m_name AS new_name
       |FROM ops WHERE op IS NOT NULL
       |ORDER BY p_partkey""".stripMargin

  // ---------------------------------------------------------------
  // dq_volume_anomaly — ingest-volume monitoring
  // ---------------------------------------------------------------

  /** Ingest-VOLUME anomaly monitor — the data-ops alarm next to the
    * content rules: daily event row counts scored against their
    * trailing 7-present-day window (the [[Ads.gmvAnomaly]] z-score
    * recipe applied to pipeline health instead of revenue — a feed
    * that doubles or dries up flags before any downstream number goes
    * wrong). Counts are integers, so Σx/Σx² are exact under any
    * partitioning and mean/σ/z are fixed IEEE sequences on identical
    * operands; warmup and σ=0 windows emit NULL z. The only serial
    * structure is the day-granular window (calendar-bounded). */
  def dqVolumeAnomaly(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.DecimalType
    val daily = Tables.events(s, d)
      .groupBy(to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("rows_in"))
    val w = Window.orderBy(col("day")).rowsBetween(-6, 0)
    val n = col("cnt").cast("double")
    val s1d = col("s1").cast("double")
    val s2d = col("s2").cast("double")
    val mean = s1d / n
    val variance = greatest((s2d - s1d * s1d / n) / (n - 1), lit(0.0))
    val std = sqrt(variance)
    daily
      .withColumn("cnt", count(lit(1)).over(w))
      .withColumn("s1", sum(col("rows_in").cast(DecimalType(18, 0))).over(w)
        .cast(DecimalType(18, 0)))
      .withColumn("s2", sum(col("rows_in").cast(DecimalType(18, 0))
        * col("rows_in").cast(DecimalType(18, 0))).over(w)
        .cast(DecimalType(38, 0)))
      .withColumn("z",
        when(col("cnt") === 7 && std > 0,
          round((col("rows_in").cast("double") - mean) / std, 6)))
      .select(
        date_format(col("day"), "yyyy-MM-dd").as("day"),
        col("rows_in"), col("z"),
        coalesce((abs(col("z")) > 2).cast("int"), lit(0)).as("is_anomaly"))
      .orderBy(col("day"))
  }

  /** Per-stream FRESHNESS audit — the third standard DQ dimension next
    * to validity ([[dqRules]]) and volume ([[dqVolumeAnomaly]]): how
    * stale is each event stream relative to the freshest data in the
    * warehouse? Wall-clock `now()` would be nondeterministic, so the
    * reference point is the corpus-wide max event time (a broadcast
    * one-row scalar — the histogram pattern); staleness is exact
    * integer micros. One conditional-aggregation scan. */
  def dqFreshness(s: SparkSession, d: String): DataFrame = {
    val e = Tables.events(s, d)
    val perType = e.groupBy(col("event_type"))
      .agg(count(lit(1)).as("rows_in"), max(col("ts_us")).as("mx"))
    val global = e.agg(max(col("ts_us")).as("gmx"))
    perType.crossJoin(broadcast(global))
      .select(col("event_type"), col("rows_in"),
        date_format(timestamp_micros(col("mx")), "yyyy-MM-dd HH:mm:ss").as("last_seen"),
        expr("(gmx - mx) div 1000000").as("staleness_s"))
      .orderBy(col("event_type"))
  }

  val dqFreshnessSql: String =
    """WITH e AS (
      |  SELECT event_type, epoch_us(ts) AS ts_us FROM events),
      |pt AS (
      |  SELECT event_type, CAST(count(*) AS BIGINT) AS rows_in,
      |    CAST(max(ts_us) AS BIGINT) AS mx
      |  FROM e GROUP BY event_type),
      |g AS (SELECT CAST(max(ts_us) AS BIGINT) AS gmx FROM e)
      |SELECT event_type, rows_in,
      |  strftime(make_timestamp(mx), '%Y-%m-%d %H:%M:%S') AS last_seen,
      |  (gmx - mx) // 1000000 AS staleness_s
      |FROM pt, g
      |ORDER BY event_type""".stripMargin

  val dqVolumeAnomalySql: String =
    """WITH daily AS (
      |  SELECT CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS rows_in
      |  FROM events GROUP BY 1),
      |st AS (
      |  SELECT day, rows_in,
      |    CAST(count(*) OVER win AS BIGINT) AS cnt,
      |    CAST(sum(CAST(rows_in AS DECIMAL(18,0))) OVER win AS DECIMAL(18,0)) AS s1,
      |    CAST(sum(CAST(rows_in AS DECIMAL(18,0)) * CAST(rows_in AS DECIMAL(18,0)))
      |      OVER win AS DECIMAL(38,0)) AS s2
      |  FROM daily
      |  WINDOW win AS (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)),
      |z AS (
      |  SELECT day, rows_in,
      |    CASE WHEN cnt = 7 AND sqrt(greatest(
      |        (CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
      |           / CAST(cnt AS DOUBLE)) / (CAST(cnt AS DOUBLE) - 1), 0.0)) > 0
      |      THEN round((CAST(rows_in AS DOUBLE)
      |          - CAST(s1 AS DOUBLE) / CAST(cnt AS DOUBLE))
      |        / sqrt(greatest((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE)
      |            * CAST(s1 AS DOUBLE) / CAST(cnt AS DOUBLE))
      |          / (CAST(cnt AS DOUBLE) - 1), 0.0)), 6)
      |    END AS z
      |  FROM st)
      |SELECT strftime(day, '%Y-%m-%d') AS day, rows_in, z,
      |  coalesce(CAST(abs(z) > 2 AS INTEGER), 0) AS is_anomaly
      |FROM z ORDER BY day""".stripMargin
}
