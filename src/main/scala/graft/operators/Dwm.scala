package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** DWM layer: dedup, pattern (CEP) detection, wide fact tables — the
  * Spark-native versions of UniqueVisitApp / UserJumpDetailApp /
  * OrderWideApp / PaymentWideApp
  * (gmall-realtime/src/main/java/com/atguigu/app/dwm/). */
object Dwm {


  /** Daily unique visit: the first event of each (user, day) survives.
    * Reference keeps a keyed first-visit-date ValueState with 1-day
    * TTL; the batch-native equivalent is a per-(user,day) row_number.
    * At 100 TB this is a single hash-partitioned window, no driver
    * state. */
  def uniqueVisit(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"), col("visit_date"))
      .orderBy(col("ts_us"), col("event_id"))
    Tables.events(s, d)
      .withColumn("visit_date", date_format(col("ts"), "yyyy-MM-dd"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("visit_date"), col("event_id"))
      .orderBy(col("user_id"), col("visit_date"))
  }

  val uniqueVisitSql: String =
    """SELECT user_id, visit_date, event_id FROM (
      |  SELECT user_id, strftime(ts, '%Y-%m-%d') AS visit_date, event_id,
      |    row_number() OVER (PARTITION BY user_id, strftime(ts, '%Y-%m-%d')
      |                       ORDER BY ts, event_id) AS rn
      |  FROM events) t
      |WHERE rn = 1
      |ORDER BY user_id, visit_date""".stripMargin

  /** Jump (bounce) detection. Reference CEP: a session-start page not
    * followed by another page within the window → the visit "jumped".
    * Batch-native CEP over ordered per-key events: an event with no
    * neighbor within the session gap on either side is a 1-event visit,
    * i.e. a bounce. lag/lead over micros + unique event_id — the same
    * ordering and gap resolution the DuckDB oracle observes. */
  def userJump(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
    jumpTail(Tables.events(s, d)
      .withColumn("prev_us", lag(col("ts_us"), 1).over(w))
      .withColumn("next_us", lead(col("ts_us"), 1).over(w)))
  }

  /** Hot-key-safe jump detection — identical output to [[userJump]]
    * (same oracle), per-key serial work O(chunks): the sessionize/as-of
    * chunking recipe applied BIDIRECTIONALLY, since the bounce
    * predicate needs both neighbors. Within (user, chunk) windows give
    * local prev/next; a chunk-first event's predecessor is the
    * previous non-empty chunk's max and a chunk-last event's successor
    * is the next non-empty chunk's min — both from one window over
    * chunk rows, not event rows. */
  def userJumpChunked(s: SparkSession, d: String): DataFrame =
    userJumpChunkedDf(Tables.events(s, d), chunkUs = 86400L * 1000000L)

  def userJumpChunkedDf(events: DataFrame, chunkUs: Long): DataFrame =
    jumpTail(chunkedNeighbors(events, chunkUs))

  /** The bidirectional hot-key-safe neighbor stitch, shared by every
    * operator whose predicate needs BOTH the previous and the next
    * event timestamp ([[userJumpChunked]], `Dws.visitorStatsChunked`):
    * returns `events` + `prev_us`/`next_us` columns identical to a
    * plain per-user lag/lead, with per-key serial work O(chunks).
    * Within (user, chunk) windows give local prev/next; a chunk-first
    * event's predecessor is the previous non-empty chunk's max and a
    * chunk-last event's successor is the next non-empty chunk's min —
    * both from one window over chunk rows, not event rows. */
  private[operators] def chunkedNeighbors(events: DataFrame, chunkUs: Long): DataFrame = {
    val wLocal = Window.partitionBy(col("user_id"), col("chunk"))
      .orderBy(col("ts_us"), col("event_id"))
    val wChunk = Window.partitionBy(col("user_id")).orderBy(col("chunk"))
    val chunked = events.withColumn("chunk", expr(s"ts_us div $chunkUs"))
    val ev = chunked
      .withColumn("local_prev", lag(col("ts_us"), 1).over(wLocal))
      .withColumn("local_next", lead(col("ts_us"), 1).over(wLocal))
    // stats branch aggregates the PRE-window projection — it needs no
    // neighbor columns, so that branch never pays the local windows
    val stats = chunked.groupBy(col("user_id"), col("chunk"))
      .agg(max(col("ts_us")).as("cmax"), min(col("ts_us")).as("cmin"))
      .withColumn("prev_cmax", lag(col("cmax"), 1).over(wChunk))
      .withColumn("next_cmin", lead(col("cmin"), 1).over(wChunk))
      .select(col("user_id"), col("chunk"), col("prev_cmax"), col("next_cmin"))
    ev.join(stats, Seq("user_id", "chunk"))
      .withColumn("prev_us", coalesce(col("local_prev"), col("prev_cmax")))
      .withColumn("next_us", coalesce(col("local_next"), col("next_cmin")))
      .drop("local_prev", "local_next", "prev_cmax", "next_cmin")
  }

  /** The isolation predicate + output shape shared verbatim by
    * [[userJump]] and [[userJumpChunked]] — one definition, so the
    * chunked variant cannot drift from the oracle it shares. */
  private def jumpTail(withNeighbors: DataFrame): DataFrame =
    withNeighbors
      .filter(
        (col("prev_us").isNull || col("ts_us") - col("prev_us") > Sessions.GapUs) &&
        (col("next_us").isNull || col("next_us") - col("ts_us") > Sessions.GapUs))
      .select(
        col("event_id"), col("user_id"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts_s"))
      .orderBy(col("event_id"))

  val userJumpSql: String =
    """SELECT event_id, user_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s FROM (
      |  SELECT event_id, user_id, ts,
      |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts,
      |    lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_ts
      |  FROM events) t
      |WHERE (prev_ts IS NULL OR ts - prev_ts > INTERVAL 600 SECOND)
      |  AND (next_ts IS NULL OR next_ts - ts > INTERVAL 600 SECOND)
      |ORDER BY event_id""".stripMargin

  /** Strict CEP jump — the reference's exact pattern
    * (UserJumpDetailApp.java:84-95): `begin(last_page_id == null)
    * .times(2).consecutive().within(10s)` plus the timeout side output.
    * The session-entry page maps to the `signup` event (the same event
    * the dwd_split "start" stream routes); a visit "jumped" when an
    * entry is consecutively followed by ANOTHER entry within 10 s, or
    * when nothing at all follows within 10 s (the CEP timeout branch).
    * An entry followed within 10 s by a normal page is a real visit —
    * this is the predicate [[userJump]]'s 600 s isolation approximates,
    * and the two provably differ (see StrictJumpSpec): an entry whose
    * next event lands between 10 s and 600 s is a jump here, not there.
    * One window pass, no per-key driver state — scales like userJump. */
  def userJumpStrict(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
    strictTail(Tables.events(s, d)
      .withColumn("next_us", lead(col("ts_us"), 1).over(w))
      .withColumn("next_type", lead(col("event_type"), 1).over(w)))
  }

  /** Hot-key-safe strict CEP jump — identical output to
    * [[userJumpStrict]] (same oracle). The strict predicate only looks
    * FORWARD (successor ts + type), so the stitch is the unidirectional
    * half of [[userJumpChunkedDf]]: lead-1 within (user, chunk) gives
    * the local successor; a chunk-LAST event's successor is the next
    * non-empty chunk's first event — its (ts, event_id)-min struct,
    * carried by one lead over chunk rows, not event rows. Per-key
    * serial work drops from O(events-per-user) to O(chunks). */
  def userJumpStrictChunked(s: SparkSession, d: String): DataFrame =
    userJumpStrictChunkedDf(Tables.events(s, d), chunkUs = 86400L * 1000000L)

  def userJumpStrictChunkedDf(events: DataFrame, chunkUs: Long): DataFrame = {
    val wLocal = Window.partitionBy(col("user_id"), col("chunk"))
      .orderBy(col("ts_us"), col("event_id"))
    val wChunk = Window.partitionBy(col("user_id")).orderBy(col("chunk"))
    val chunked = events.withColumn("chunk", expr(s"ts_us div $chunkUs"))
    val ev = chunked.withColumn("local_next",
      lead(struct(col("ts_us"), col("event_type")), 1).over(wLocal))
    // chunk-first = min over (ts_us, event_id, type): the unique
    // (ts_us, event_id) prefix decides the comparison, so the struct
    // min IS the (ts, id)-ordered first event, type riding along
    val stats = chunked.groupBy(col("user_id"), col("chunk"))
      .agg(min(struct(col("ts_us"), col("event_id"), col("event_type"))).as("cfirst"))
      .withColumn("next_cfirst", lead(col("cfirst"), 1).over(wChunk))
      .select(col("user_id"), col("chunk"), col("next_cfirst"))
    // coalesce whole structs, never field-by-field: a NULL event_type
    // inside a present local successor must NOT fall through to the
    // next chunk's type
    strictTail(ev.join(stats, Seq("user_id", "chunk"))
      .withColumn("nxt", coalesce(col("local_next"),
        struct(col("next_cfirst")("ts_us").as("ts_us"),
          col("next_cfirst")("event_type").as("event_type"))))
      .withColumn("next_us", col("nxt")("ts_us"))
      .withColumn("next_type", col("nxt")("event_type")))
  }

  /** Strict-CEP predicate + output shape shared verbatim by
    * [[userJumpStrict]] and [[userJumpStrictChunked]] — one definition,
    * so the chunked variant cannot drift from the oracle it shares. */
  private def strictTail(withNext: DataFrame): DataFrame = {
    val winUs = 10L * 1000000L
    withNext
      .filter(col("event_type") === "signup" &&
        ((col("next_us").isNull || col("next_us") - col("ts_us") > winUs) ||
         (col("next_type") === "signup" && col("next_us") - col("ts_us") <= winUs)))
      .select(
        col("event_id"), col("user_id"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts_s"))
      .orderBy(col("event_id"))
  }

  val userJumpStrictSql: String =
    """SELECT event_id, user_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s FROM (
      |  SELECT event_id, user_id, ts, event_type,
      |    lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_ts,
      |    lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type
      |  FROM events) t
      |WHERE event_type = 'signup'
      |  AND ((next_ts IS NULL OR next_ts - ts > INTERVAL 10 SECOND)
      |    OR (next_type = 'signup' AND next_ts - ts <= INTERVAL 10 SECOND))
      |ORDER BY event_id""".stripMargin

  /** Order-wide table (OrderWideApp.java:78-190): fact⋈fact join
    * orders⋈lineitem, then the reference's SIX chained async dim
    * lookups (user w/ derived age+gender, province, sku, spu,
    * trademark, category3 — each a DimAsyncFunction) become hash-join
    * dim enrichment with the same breadth: customer (user) → nation
    * (province) → region, part (sku, carrying p_brand=trademark and
    * p_type=category3 analogs), supplier (spu) → supplier-nation.
    * The reference's birthday→age derived field maps to two derived
    * columns computed during enrichment: `cust_band` (a dim-attribute
    * banding, c_acctbal deciles) and `ship_delay_d` (order-date
    * arithmetic, shipdate − orderdate). Bounded dims (nation, region)
    * carry explicit broadcast hints; customer/part/supplier joins are
    * left to Catalyst/AQE, which broadcasts when the build side fits
    * and falls back to shuffle join at 100 TB where those dims scale
    * with the data. */
  def orderWide(s: SparkSession, d: String): DataFrame = {
    val custDims = Tables.customer(s, d)
      .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"),
        col("c_acctbal"), col("n_name"), col("r_name"))
    val suppDims = Tables.supplier(s, d)
      .join(broadcast(Tables.nation(s, d)
          .select(col("n_nationkey").as("sn_nationkey"),
            col("n_name").as("s_nation"))),
        col("s_nationkey") === col("sn_nationkey"))
      .select(col("s_suppkey"), col("s_name"), col("s_nation"))
    val partDim = Tables.part(s, d)
      .select(col("p_partkey"), col("p_brand"), col("p_type"))
    Tables.lineitem(s, d)
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(custDims, col("o_custkey") === col("c_custkey"))
      .join(partDim, col("l_partkey") === col("p_partkey"))
      .join(suppDims, col("l_suppkey") === col("s_suppkey"))
      .select(
        col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        col("l_extendedprice"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"),
        col("o_totalprice"), col("c_name"), col("c_mktsegment"),
        col("n_name"), col("r_name"),
        col("p_brand"), col("p_type"), col("s_name"), col("s_nation"),
        // derived-at-enrichment fields (the birthday→age analogs)
        floor(col("c_acctbal") / 1000).cast("int").as("cust_band"),
        datediff(col("l_shipdate"), col("o_orderdate")).as("ship_delay_d"))
      // (l_orderkey, l_linenumber) is NOT unique in the synthetic
      // lineitem, so the sort orders by every output column — ties are
      // then full-row duplicates and the output is totally ordered
      .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        col("l_extendedprice"), col("o_totalprice"), col("c_name"),
        col("p_brand"), col("p_type"), col("s_name"), col("s_nation"),
        col("ship_delay_d"))
  }

  val orderWideSql: String =
    """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice,
      |  strftime(o_orderdate, '%Y-%m-%d') AS order_date,
      |  o_totalprice, c_name, c_mktsegment, nation.n_name AS n_name, r_name,
      |  p_brand, p_type, s_name, sn.n_name AS s_nation,
      |  CAST(floor(c_acctbal / 1000) AS INTEGER) AS cust_band,
      |  CAST(date_diff('day', o_orderdate, l_shipdate) AS INTEGER) AS ship_delay_d
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |JOIN part ON l_partkey = p_partkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation sn ON s_nationkey = sn.n_nationkey
      |ORDER BY l_orderkey, l_linenumber, l_quantity, l_extendedprice,
      |  o_totalprice, c_name, p_brand, p_type, s_name, s_nation,
      |  ship_delay_d""".stripMargin

  /** Interval join (PaymentWideApp.java:80-92: payment⋈order_wide keyed
    * by order id within [-15 min, 0]). Same shape here: key equality
    * plus an event-time range — ship events land within [order date,
    * order date + 30 d]. Catalyst plans the equi-key as the shuffle key
    * and the range as a post-join residual, which is exactly how a
    * cluster should do it (no cross product). */
  def paymentWide(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .join(Tables.orders(s, d),
        col("l_orderkey") === col("o_orderkey") &&
        col("l_shipdate") >= col("o_orderdate") &&
        col("l_shipdate") <= col("o_orderdate") + expr("INTERVAL 30 DAYS"))
      .select(
        col("o_orderkey"), col("l_linenumber"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"),
        date_format(col("l_shipdate"), "yyyy-MM-dd").as("ship_date"),
        col("l_extendedprice"))
      // same non-unique (orderkey, linenumber) caveat as orderWide
      .orderBy(col("o_orderkey"), col("l_linenumber"), col("ship_date"),
        col("l_extendedprice"))

  val paymentWideSql: String =
    """SELECT o_orderkey, l_linenumber,
      |  strftime(o_orderdate, '%Y-%m-%d') AS order_date,
      |  strftime(l_shipdate, '%Y-%m-%d') AS ship_date,
      |  l_extendedprice
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |  AND l_shipdate >= o_orderdate
      |  AND l_shipdate <= o_orderdate + INTERVAL 30 DAY
      |ORDER BY o_orderkey, l_linenumber, ship_date, l_extendedprice""".stripMargin
}
