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

  /** Visitor stats (VisitorStatsApp.java): the reference unions four
    * derived streams (pv / uv / session-visit / jump), keys by
    * Tuple4(vc, ch, ar, is_new) (VisitorStatsApp.java:145-150), tumbles
    * by time and reduce-sums the metric columns. Spark-first
    * formulation: ONE scan of events, one window pass computing
    * prev/next neighbors per user, then every metric as a conditional
    * column — the 100 TB input is read once instead of four times, and
    * the four "streams" collapse into flags that feed a single
    * map-side-partial aggregation. uv (first event of the user's day)
    * falls out of the same ordered pass: the first event of a calendar
    * day is exactly where the previous event's date is older (dates
    * are monotone along the per-user ordering).
    *
    * Dimension analogs at the reference's full 4-key breadth:
    * `vc` (version_code) = event_id % 3, `ch` (channel) = user_id % 10,
    * `ar` (area) = (user_id div 10) % 5, `is_new` = whether the event's
    * day is the user's FIRST-ever day — computed like
    * [[Dwd.newUserFlag]], a per-user min hash-aggregation joined back
    * on user_id (no extra serial window). */
  def visitorStats(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
    val ev = Tables.events(s, d)
    visitorTail(
      ev.withColumn("prev_us", lag(col("ts_us"), 1).over(w))
        .withColumn("next_us", lead(col("ts_us"), 1).over(w)),
      ev)
  }

  /** Hot-key-safe visitor stats — identical output to [[visitorStats]]
    * (same oracle), per-key serial work O(chunks): the uv/sv/uj flags
    * need BOTH neighbors, so the frame comes from the bidirectional
    * (user, time-chunk) stitch shared with [[Dwm.userJumpChunked]]
    * ([[Dwm.chunkedNeighbors]]); the is_new leg is already a hash
    * aggregation, chunk-safe by construction. One bot user with a
    * billion events spreads across chunks instead of serializing one
    * window task. */
  def visitorStatsChunked(s: SparkSession, d: String): DataFrame =
    visitorStatsChunkedDf(Tables.events(s, d), chunkUs = 86400L * 1000000L)

  def visitorStatsChunkedDf(events: DataFrame, chunkUs: Long): DataFrame =
    visitorTail(Dwm.chunkedNeighbors(events, chunkUs), events)

  /** Flags + 4-dim key + aggregate shared verbatim by [[visitorStats]]
    * and [[visitorStatsChunked]] — one definition, so the chunked
    * variant cannot drift from the oracle it shares. `withNeighbors`
    * must carry `prev_us`/`next_us`; `events` is the raw table the
    * per-user first-day aggregate reads (kept separate so the hash-agg
    * branch never pays the neighbor windows). */
  private def visitorTail(withNeighbors: DataFrame, events: DataFrame): DataFrame = {
    val first = events.groupBy(col("user_id")).agg(min(col("ts_us")).as("first_us"))
    val isPv = col("event_type").isin("view", "click")
    val isUv = col("prev_us").isNull ||
      to_date(expr("timestamp_micros(prev_us)")) < to_date(col("ts"))
    val isSv = col("prev_us").isNull || col("ts_us") - col("prev_us") > Sessions.GapUs
    val isUj = isSv &&
      (col("next_us").isNull || col("next_us") - col("ts_us") > Sessions.GapUs)
    val isNew = to_date(col("ts")) === to_date(expr("timestamp_micros(first_us)"))
    withNeighbors.join(first, "user_id")
      .select(
        date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss").as("stt"),
        (col("event_id") % 3).as("vc"),
        (col("user_id") % 10).as("ch"),
        expr("(user_id div 10) % 5").as("ar"),
        when(isNew, 1).otherwise(0).as("is_new"),
        when(isPv, 1).otherwise(0).as("pv"),
        when(isUv, 1).otherwise(0).as("uv"),
        when(isSv, 1).otherwise(0).as("sv"),
        when(isUj, 1).otherwise(0).as("uj"),
        when(isPv, col("value")).otherwise(lit(0.0)).as("dur"))
      .groupBy(col("stt"), col("vc"), col("ch"), col("ar"), col("is_new"))
      .agg(
        sum(col("pv")).as("pv_ct"), sum(col("uv")).as("uv_ct"),
        sum(col("sv")).as("sv_ct"), sum(col("uj")).as("uj_ct"),
        moneySum(col("dur")).as("dur_sum"))
      .orderBy(col("stt"), col("vc"), col("ch"), col("ar"), col("is_new"))
  }

  // CAST(... AS BIGINT) on every integer sum: DuckDB promotes sum(int)
  // to HUGEINT, which the driver's hash compare renders differently.
  val visitorStatsSql: String =
    s"""WITH ordered AS (
       |  SELECT user_id, ts, event_id, event_type, value,
       |    lag(ts)  OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts,
       |    lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_ts,
       |    min(ts)  OVER (PARTITION BY user_id) AS first_ts
       |  FROM events),
       |flagged AS (
       |  SELECT
       |    strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS stt,
       |    event_id % 3 AS vc,
       |    user_id % 10 AS ch,
       |    (user_id // 10) % 5 AS ar,
       |    CASE WHEN CAST(ts AS DATE) = CAST(first_ts AS DATE) THEN 1 ELSE 0 END AS is_new,
       |    CASE WHEN event_type IN ('view','click') THEN 1 ELSE 0 END AS pv,
       |    CASE WHEN prev_ts IS NULL
       |           OR CAST(prev_ts AS DATE) < CAST(ts AS DATE) THEN 1 ELSE 0 END AS uv,
       |    CASE WHEN prev_ts IS NULL
       |           OR ts - prev_ts > INTERVAL 600 SECOND THEN 1 ELSE 0 END AS sv,
       |    CASE WHEN (prev_ts IS NULL OR ts - prev_ts > INTERVAL 600 SECOND)
       |          AND (next_ts IS NULL OR next_ts - ts > INTERVAL 600 SECOND)
       |         THEN 1 ELSE 0 END AS uj,
       |    CASE WHEN event_type IN ('view','click') THEN value ELSE 0.0 END AS dur
       |  FROM ordered)
       |SELECT stt, vc, ch, ar, is_new,
       |  CAST(sum(pv) AS BIGINT) AS pv_ct, CAST(sum(uv) AS BIGINT) AS uv_ct,
       |  CAST(sum(sv) AS BIGINT) AS sv_ct, CAST(sum(uj) AS BIGINT) AS uj_ct,
       |  ${sqlMoneySum("dur")} AS dur_sum
       |FROM flagged
       |GROUP BY 1, 2, 3, 4, 5
       |ORDER BY stt, vc, ch, ar, is_new""".stripMargin

  /** Product stats (ProductStatsApp.java): per-sku metric wide row —
    * order count via COUNT DISTINCT (the reference carries order-id
    * HashSets through its reduce; the scalable form is a two-phase
    * distinct aggregate), amount sums, refund split by return flag,
    * then broadcast dim enrichment with `part`. */
  def productStats(s: SparkSession, d: String): DataFrame =
    // explicit two-level distinct: one (partkey, orderkey) partial pass
    // with map-side combine, then count of finalized partials — vs the
    // double-countDistinct Expand plan that triples the scan output
    // before its shuffle (measured 2.8 s → 1.9 s at sf0.1); decimal
    // partial sums keep the money totals bit-exact. Built from the SAME
    // psPartials/psRollup pieces as [[productStatsIncr]], so the
    // incremental path can never silently diverge from this one.
    psRollup(psPartials(Tables.lineitem(s, d)), s, d)

  /** Per-(sku, order) maintained partials — the STATE of incremental
    * product-stats refresh. max/sum partials are re-mergeable, so a
    * delta batch folds in without touching history. */
  private def psPartials(li: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val decZero = lit(BigDecimal(0)).cast(DecimalType(18, 2))
    li.groupBy(col("l_partkey"), col("l_orderkey"))
      .agg(
        max(when(col("l_returnflag") === "R", 1).otherwise(0)).as("has_r"),
        sum(dec(col("l_quantity"))).as("qty"),
        sum(dec(col("l_extendedprice"))).as("amt"),
        sum(when(col("l_returnflag") === "R", dec(col("l_extendedprice")))
          .otherwise(decZero)).as("ramt"))
  }

  /** Merge two partial states (max re-maxes, sums re-sum) — an order
    * whose rows span both inputs combines exactly. */
  def psMergePartials(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b)
      .groupBy(col("l_partkey"), col("l_orderkey"))
      .agg(
        max(col("has_r")).as("has_r"), sum(col("qty")).as("qty"),
        sum(col("amt")).as("amt"), sum(col("ramt")).as("ramt"))

  /** The rollup + dimension enrichment shared by [[productStats]] and
    * [[productStatsIncr]]. The reference enriches the wide row up a
    * category HIERARCHY — sku → spu → trademark → category3, each a
    * DimAsyncFunction lookup (ProductStatsApp.java) — so the part dim
    * contributes the analog levels, all DERIVED from part attributes
    * during the same single broadcast-sized join (no extra shuffle):
    * `spu_name` = the product-family noun of p_name, `tm_name` =
    * p_brand, `mfgr_name` = the brand-number group ('Brand#17' →
    * 'MFGR#4', five brands per manufacturer — TPC-H's brand=mfgr+digit
    * convention), `category3_name` = p_type. */
  private def psRollup(partials: DataFrame, s: SparkSession, d: String): DataFrame =
    partials
      .groupBy(col("l_partkey"))
      .agg(
        count(lit(1)).as("order_ct"),
        sum(col("qty")).cast("double").as("sku_num"),
        sum(col("amt")).cast("double").as("order_amount"),
        sum(col("has_r")).as("refund_order_ct"),
        sum(col("ramt")).cast("double").as("refund_amount"))
      .join(Tables.part(s, d), col("l_partkey") === col("p_partkey"))
      .select(col("l_partkey"), col("p_name"), col("p_brand"),
        element_at(split(col("p_name"), " "), 2).as("spu_name"),
        col("p_brand").as("tm_name"),
        expr("concat('MFGR#', CAST((CAST(regexp_extract(p_brand, '#([0-9]+)', 1) AS INT) - 1) DIV 5 + 1 AS STRING))")
          .as("mfgr_name"),
        col("p_type").as("category3_name"),
        col("order_ct"), col("sku_num"), col("order_amount"),
        col("refund_order_ct"), col("refund_amount"))
      .orderBy(col("l_partkey"))

  /** INCREMENTAL DWS refresh — the 100 TB serving pattern: the fact
    * history is never rescanned; the maintained state is the bounded
    * per-(sku, order) partial table, and a delta batch merges into it
    * before a rollup of partials only. This instance splits lineitem
    * into a "history" (line numbers 0-3 mod 5) and a "delta" (4 mod 5)
    * — orders deliberately SPAN the split — and must produce the
    * byte-identical wide row to the full recompute, so it shares
    * [[productStatsSql]] as its oracle. */
  def productStatsIncr(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
    val history = psPartials(li.filter(col("l_linenumber") % 5 =!= 4))
    val delta = psPartials(li.filter(col("l_linenumber") % 5 === 4))
    psRollup(psMergePartials(history, delta), s, d)
  }

  val productStatsSql: String =
    s"""SELECT l_partkey, p_name, p_brand,
       |  string_split(p_name, ' ')[2] AS spu_name,
       |  p_brand AS tm_name,
       |  'MFGR#' || CAST((CAST(regexp_extract(p_brand, '#([0-9]+)', 1) AS INTEGER) - 1) // 5 + 1 AS VARCHAR) AS mfgr_name,
       |  p_type AS category3_name,
       |  count(DISTINCT l_orderkey) AS order_ct,
       |  ${sqlMoneySum("l_quantity")} AS sku_num,
       |  ${sqlMoneySum("l_extendedprice")} AS order_amount,
       |  count(DISTINCT CASE WHEN l_returnflag = 'R' THEN l_orderkey END) AS refund_order_ct,
       |  CAST(sum(CASE WHEN l_returnflag = 'R' THEN CAST(l_extendedprice AS DECIMAL(18,2))
       |                ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS refund_amount
       |FROM lineitem JOIN part ON l_partkey = p_partkey
       |GROUP BY l_partkey, p_name, p_brand, p_type
       |ORDER BY l_partkey""".stripMargin

  /** Full multi-stream product stats — the reference's complete wide
    * row (ProductStatsApp.java + bean/ProductStats.java): ~7 streams
    * (display, click, favor, cart, order, payment, refund) unioned into
    * ONE per-sku row. Spark-first shape: each SOURCE is scanned once
    * with the per-stream metrics as conditional columns (the in-source
    * "streams" cost nothing extra), the two sources union by name, and
    * a single hash aggregation — with map-side partials on every sum —
    * produces the wide row. At 100 TB that is 2 scans + 1 shuffle, vs
    * the naive 7-leg union's 7 scans. Stream→column mapping: the event
    * stream's view/click/signup/purchase play display/click/favor/cart
    * (+ payment_amount from purchase value); lineitem plays the
    * order/refund streams. Sku alignment between the two synthetic id
    * spaces: events' `k` (0..99) ≡ `l_partkey % 100`. Distinct order
    * counts are two-phase distinct aggregates, never HashSets-in-rows
    * (the reference carries orderIdSet through its reduce —
    * ProductStats.java:40). */
  def productStatsFull(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val decZero = lit(BigDecimal(0)).cast(DecimalType(18, 2))
    val ev = Tables.events(s, d)
      .withColumn("sku",
        Dwd.propsK(col("props")).cast("int"))
      .select(
        col("sku"),
        when(col("event_type") === "view", 1).otherwise(0).as("display_pv"),
        when(col("event_type") === "click", 1).otherwise(0).as("click_pv"),
        when(col("event_type") === "signup", 1).otherwise(0).as("favor_pv"),
        when(col("event_type") === "purchase", 1).otherwise(0).as("cart_pv"),
        when(col("event_type") === "purchase", dec(col("value")))
          .otherwise(decZero).as("pay_amt"),
        lit(null).cast("long").as("order_key"),
        lit(null).cast("long").as("refund_key"),
        decZero.as("qty"), decZero.as("ord_amt"), decZero.as("ref_amt"))
    val li = Tables.lineitem(s, d)
      .select(
        (col("l_partkey") % 100).cast("int").as("sku"),
        lit(0).as("display_pv"), lit(0).as("click_pv"),
        lit(0).as("favor_pv"), lit(0).as("cart_pv"),
        decZero.as("pay_amt"),
        col("l_orderkey").as("order_key"),
        when(col("l_returnflag") === "R", col("l_orderkey")).as("refund_key"),
        dec(col("l_quantity")).as("qty"),
        dec(col("l_extendedprice")).as("ord_amt"),
        when(col("l_returnflag") === "R", dec(col("l_extendedprice")))
          .otherwise(decZero).as("ref_amt"))
    // two-level distinct, same shape as the streaming mirror: level 1
    // groups by (sku, order_key) — event rows all carry a NULL key, so
    // they collapse into one partial row per sku — and level 2 counts
    // the finalized non-null partials as the exact distinct orders.
    // The double-countDistinct Expand plan would triple the unioned
    // stream before its shuffle.
    ev.unionByName(li)
      .groupBy(col("sku"), col("order_key"))
      .agg(
        sum(col("display_pv")).as("display_pv"),
        sum(col("click_pv")).as("click_pv"),
        sum(col("favor_pv")).as("favor_pv"),
        sum(col("cart_pv")).as("cart_pv"),
        sum(col("pay_amt")).as("pay_amt"),
        max(when(col("refund_key").isNotNull, 1).otherwise(0)).as("has_refund"),
        sum(col("qty")).as("qty"),
        sum(col("ord_amt")).as("ord_amt"),
        sum(col("ref_amt")).as("ref_amt"))
      .groupBy(col("sku"))
      .agg(
        sum(col("display_pv")).as("display_ct"),
        sum(col("click_pv")).as("click_ct"),
        sum(col("favor_pv")).as("favor_ct"),
        sum(col("cart_pv")).as("cart_ct"),
        sum(col("pay_amt")).cast("double").as("payment_amount"),
        count(col("order_key")).as("order_ct"),
        sum(when(col("order_key").isNotNull, col("has_refund")).otherwise(0)).as("refund_order_ct"),
        sum(col("qty")).cast("double").as("order_sku_num"),
        sum(col("ord_amt")).cast("double").as("order_amount"),
        sum(col("ref_amt")).cast("double").as("refund_amount"))
      .orderBy(col("sku"))
  }

  val productStatsFullSql: String =
    """WITH ev AS (
      |  SELECT CAST(json_extract_string(props, '$.k') AS INTEGER) AS sku,
      |    CASE WHEN event_type = 'view' THEN 1 ELSE 0 END AS display_pv,
      |    CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS click_pv,
      |    CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END AS favor_pv,
      |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS cart_pv,
      |    CASE WHEN event_type = 'purchase' THEN CAST(value AS DECIMAL(18,2))
      |         ELSE CAST(0 AS DECIMAL(18,2)) END AS pay_amt,
      |    CAST(NULL AS BIGINT) AS order_key, CAST(NULL AS BIGINT) AS refund_key,
      |    CAST(0 AS DECIMAL(18,2)) AS qty,
      |    CAST(0 AS DECIMAL(18,2)) AS ord_amt,
      |    CAST(0 AS DECIMAL(18,2)) AS ref_amt
      |  FROM events),
      |li AS (
      |  SELECT CAST(l_partkey % 100 AS INTEGER) AS sku,
      |    0 AS display_pv, 0 AS click_pv, 0 AS favor_pv, 0 AS cart_pv,
      |    CAST(0 AS DECIMAL(18,2)) AS pay_amt,
      |    l_orderkey AS order_key,
      |    CASE WHEN l_returnflag = 'R' THEN l_orderkey END AS refund_key,
      |    CAST(l_quantity AS DECIMAL(18,2)) AS qty,
      |    CAST(l_extendedprice AS DECIMAL(18,2)) AS ord_amt,
      |    CASE WHEN l_returnflag = 'R' THEN CAST(l_extendedprice AS DECIMAL(18,2))
      |         ELSE CAST(0 AS DECIMAL(18,2)) END AS ref_amt
      |  FROM lineitem),
      |u AS (SELECT * FROM ev UNION ALL SELECT * FROM li)
      |SELECT sku,
      |  CAST(sum(display_pv) AS BIGINT) AS display_ct,
      |  CAST(sum(click_pv) AS BIGINT) AS click_ct,
      |  CAST(sum(favor_pv) AS BIGINT) AS favor_ct,
      |  CAST(sum(cart_pv) AS BIGINT) AS cart_ct,
      |  CAST(sum(pay_amt) AS DOUBLE) AS payment_amount,
      |  count(DISTINCT order_key) AS order_ct,
      |  count(DISTINCT refund_key) AS refund_order_ct,
      |  CAST(sum(qty) AS DOUBLE) AS order_sku_num,
      |  CAST(sum(ord_amt) AS DOUBLE) AS order_amount,
      |  CAST(sum(ref_amt) AS DOUBLE) AS refund_amount
      |FROM u
      |GROUP BY sku
      |ORDER BY sku""".stripMargin

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

  /** WINDOWED keyword stats — the reference's exact query shape:
    * `GROUP BY TUMBLE(rowtime, 10s), keyword`
    * (KeywordStatsApp.java:68-74). [[keywordStats]] is the global
    * count; this is the tumble × keyword form, same two-level shape as
    * [[productStatsWindowed]]. `documents` carries no event time, so
    * the rowtime is a synthetic arrival clock — doc_id seconds past the
    * epoch (one document per second, deterministic in both engines) —
    * and each 10 s tumble covers ten documents' keywords. Explode →
    * one hash aggregation with map-side partials; the window
    * assignment is Spark's epoch-aligned `window()`, verified against
    * the oracle's floor-division arithmetic on the same clock. */
  def keywordStatsWindowed(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(expr("timestamp_seconds(doc_id)").as("rowtime"), col("text"))
      .select(col("rowtime"), explode(split(col("text"), " ")).as("keyword"))
      .filter(length(col("keyword")) > 0)
      .groupBy(window(col("rowtime"), "10 seconds").as("w"), col("keyword"))
      .agg(count(lit(1)).as("ct"))
      .select(
        date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("stt"),
        date_format(col("w.end"), "yyyy-MM-dd HH:mm:ss").as("edt"),
        col("keyword"), col("ct"), lit("SEARCH").as("source"))
      .orderBy(col("stt"), col("keyword"))

  val keywordStatsWindowedSql: String =
    """SELECT
      |  strftime(make_timestamp((doc_id // 10) * 10 * 1000000), '%Y-%m-%d %H:%M:%S') AS stt,
      |  strftime(make_timestamp(((doc_id // 10) * 10 + 10) * 1000000), '%Y-%m-%d %H:%M:%S') AS edt,
      |  keyword, count(*) AS ct, 'SEARCH' AS source
      |FROM (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS keyword FROM documents) t
      |WHERE length(keyword) > 0
      |GROUP BY 1, 2, 3
      |ORDER BY stt, keyword""".stripMargin

  /** Keyword stats over the DICTIONARY segmenter — the IK-analyzer
    * path (KeywordStatsApp.java uses IKSegmenter via KeywordUDTF;
    * [[keywordStats]] is the whitespace analog). The trie is built
    * once per partition (`functions/DictTokenizer` — dictionary load
    * is task-init work, the IK deployment shape) and rows stream
    * through it; everything after tokenization is the same explode →
    * hash-agg plan as the whitespace variant. On the all-ASCII test
    * corpus the segmenter's Latin rule makes the output exactly
    * `regexp_extract_all(lower(text), '[a-z0-9]+')`, which is what
    * the oracle checks; the CJK dictionary path (longest match,
    * single-char fallback) is spec-verified on planted text
    * (DictTokenizerSpec). */
  def keywordStatsDict(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val toks = Tables.documents(s, d).select(col("text")).as[String]
      .mapPartitions { it =>
        val tok = graft.functions.DictTokenizer.default
        it.flatMap(tok.segment)
      }
    toks.toDF("keyword")
      .groupBy(col("keyword")).agg(count(lit(1)).as("ct"))
      .withColumn("source", lit("SEARCH"))
      .orderBy(col("keyword"))
  }

  val keywordStatsDictSql: String =
    """SELECT keyword, count(*) AS ct, 'SEARCH' AS source FROM (
      |  SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS keyword
      |  FROM documents) t
      |GROUP BY keyword
      |ORDER BY keyword""".stripMargin

  /** Windowed product stats — the reference shape exactly: tumbling
    * event-time window × sku key → sums + COUNT DISTINCT orders
    * (ProductStatsApp.java:215-263: keyBy(sku).window(10s).reduce).
    * 30-day tumble on ship date via Spark's `window()` (epoch-aligned),
    * so both the window assignment and the aggregate are verified. */
  def productStatsWindowed(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      // two-level distinct (the streaming mirror's shape): per-order
      // partials with map-side combine, then count of partials — no
      // countDistinct Expand doubling the scan output
      .groupBy(window(col("l_shipdate"), "30 days").as("w"), col("l_partkey"),
        col("l_orderkey"))
      .agg(sum(dec(col("l_extendedprice"))).as("amt"))
      .groupBy(col("w"), col("l_partkey"))
      .agg(
        count(lit(1)).as("order_ct"),
        sum(col("amt")).cast("double").as("order_amount"))
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

  /** Hopping-window visitor stats — the Flink HOP window the reference
    * mixes with its tumbles (VisitorStatsApp uses tumbling; HOP is the
    * sliding sibling in the same Flink window API): size 2 h, slide
    * 1 h, so every event lands in exactly size/slide = 2 windows.
    * Spark's sliding `window()` does that fan-out inside the generated
    * code (no self-union of shifted tumbles), and the aggregate is the
    * same two-level-distinct + decimal-sum shape as the tumbling ops:
    * (window, type, user) partials with map-side combine, then the
    * rollup counts partials for the exact uv without a countDistinct
    * Expand. */
  def visitorStatsHop(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(window(col("ts"), "2 hours", "1 hour").as("w"),
        col("event_type"), col("user_id"))
      .agg(count(lit(1)).as("pv_p"), sum(dec(col("value"))).as("val_p"))
      .groupBy(col("w"), col("event_type"))
      .agg(sum(col("pv_p")).as("pv_ct"), count(lit(1)).as("uv_ct"),
        sum(col("val_p")).cast("double").as("val_sum"))
      .select(
        date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("stt"),
        date_format(col("w.end"), "yyyy-MM-dd HH:mm:ss").as("edt"),
        col("event_type"), col("pv_ct"), col("uv_ct"), col("val_sum"))
      .orderBy(col("stt"), col("event_type"))

  // Window starts are slide-aligned epoch multiples in BOTH engines:
  // Spark aligns sliding windows to the epoch by slideDuration; the
  // oracle derives each event's two covering starts by floor-division
  // arithmetic on the same micros (make_timestamp, per the TZ
  // invariant). count(*) returns BIGINT in DuckDB but sum() needs the
  // HUGEINT cast.
  val visitorStatsHopSql: String =
    s"""WITH hopped AS (
       |  SELECT user_id, event_type, value,
       |    unnest([make_timestamp(((epoch_us(ts) // 3600000000) - k) * 3600000000)
       |            for k in [0, 1]]) AS ws
       |  FROM events)
       |SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS stt,
       |  strftime(ws + INTERVAL 2 HOUR, '%Y-%m-%d %H:%M:%S') AS edt,
       |  event_type,
       |  count(*) AS pv_ct,
       |  count(DISTINCT user_id) AS uv_ct,
       |  ${sqlMoneySum("value")} AS val_sum
       |FROM hopped
       |GROUP BY ws, event_type
       |ORDER BY stt, event_type""".stripMargin
}
