package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import Agg._

/** Event-analytics operators the reference's ADS/ClickHouse layer
  * serves in practice (session stats, funnels, cohort retention,
  * pivoted metrics) — DWS-adjacent capabilities over the `events`
  * stream table. Each is one or two hash-partitioned passes; no
  * driver-side iteration. */
object EventAnalytics {

  /** Sessionization: gap > 10 min opens a session; one output row per
    * session with count/duration. The session id is a running sum of
    * session-start flags per user — one window pass, then one
    * aggregation, both on the same user_id partitioning. */
  /** Gap-rule session assignment (strict > GapUs on (ts_us, event_id)
    * order) — THE definition of a session boundary, shared by every
    * serial-window formulation so the rule can never drift between
    * ops. */
  private def addSessionSeq(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
    events
      .withColumn("prev_us", lag(col("ts_us"), 1).over(w))
      .withColumn("new_s",
        when(col("prev_us").isNull || col("ts_us") - col("prev_us") > Sessions.GapUs, 1).otherwise(0))
      .withColumn("session_seq", sum(col("new_s")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  def sessionize(s: SparkSession, d: String): DataFrame = {
    addSessionSeq(Tables.events(s, d))
      .groupBy(col("user_id"), col("session_seq"))
      .agg(
        count(lit(1)).as("n_events"),
        date_format(min(col("ts")), "yyyy-MM-dd HH:mm:ss").as("stt"),
        date_format(max(col("ts")), "yyyy-MM-dd HH:mm:ss").as("edt"),
        moneySum(col("value")).as("value_sum"))
      .orderBy(col("user_id"), col("session_seq"))
  }

  private val PathLen = 8

  /** Session path mining (user-journey analysis): each session's
    * ordered event-type sequence, truncated to its first [[PathLen]]
    * events, counted across every session — the top-20 journeys. The
    * truncation happens BEFORE the path collect (row_number filter),
    * so per-session aggregation state is bounded at PathLen structs
    * even for a bot session with millions of events — the op never
    * builds an unbounded `collect_list`. Path order is (ts_us,
    * event_id) — the oracle-stable tie-broken event order. */
  def pathAnalysis(s: SparkSession, d: String): DataFrame = {
    val sw = Window.partitionBy(col("user_id"), col("session_seq"))
      .orderBy(col("ts_us"), col("event_id"))
    addSessionSeq(Tables.events(s, d))
      .withColumn("rn", row_number().over(sw))
      .filter(col("rn") <= PathLen)
      .groupBy(col("user_id"), col("session_seq"))
      .agg(concat_ws(">",
        transform(
          sort_array(collect_list(struct(col("ts_us"), col("event_id"), col("event_type")))),
          x => x("event_type"))).as("path"))
      .groupBy(col("path")).agg(count(lit(1)).as("sess_ct"))
      .orderBy(col("sess_ct").desc, col("path"))
      .limit(20)
  }

  val pathAnalysisSql: String =
    s"""WITH flags AS (
       |  SELECT user_id, event_id, ts, event_type,
       |    CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
       |           OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
       |              > INTERVAL 600 SECOND
       |         THEN 1 ELSE 0 END AS new_s
       |  FROM events),
       |sess AS (
       |  SELECT user_id, event_id, ts, event_type,
       |    sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
       |                     ROWS UNBOUNDED PRECEDING) AS session_seq
       |  FROM flags),
       |rn AS (
       |  SELECT *, row_number() OVER (PARTITION BY user_id, session_seq
       |                               ORDER BY ts, event_id) AS rn
       |  FROM sess),
       |paths AS (
       |  SELECT user_id, session_seq,
       |    string_agg(event_type, '>' ORDER BY ts, event_id) AS path
       |  FROM rn WHERE rn <= $PathLen GROUP BY 1, 2)
       |SELECT path, count(*) AS sess_ct FROM paths
       |GROUP BY path ORDER BY sess_ct DESC, path LIMIT 20""".stripMargin

  val sessionizeSql: String =
    s"""SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq, count(*) AS n_events,
       |  strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS stt,
       |  strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS edt,
       |  ${sqlMoneySum("value")} AS value_sum
       |FROM (
       |  SELECT user_id, ts, value,
       |    sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
       |                     ROWS UNBOUNDED PRECEDING) AS session_seq
       |  FROM (
       |    SELECT user_id, event_id, ts, value,
       |      CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
       |             OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
       |                > INTERVAL 600 SECOND
       |           THEN 1 ELSE 0 END AS new_s
       |    FROM events) flags) sess
       |GROUP BY user_id, session_seq
       |ORDER BY user_id, session_seq""".stripMargin

  /** Sessionization via Spark's NATIVE batch `session_window` — the
    * same operator the streaming mirror runs, in batch: the gap-merge
    * happens inside one SessionWindow aggregation instead of the
    * hand-rolled lag + running-sum double window pass. gap + 1 µs
    * aligns the end-EXCLUSIVE merge rule with the batch op's strict->
    * boundary test (see StreamOps.sessionizeStream); the session
    * sequence number is a per-user window over SESSION rows (#sessions
    * ≪ #events). Shares [[sessionize]]'s oracle — outputs identical. */
  def sessionizeNative(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(session_window(col("ts"), "600000001 microseconds").as("w"),
        col("user_id"))
      .agg(
        count(lit(1)).as("n_events"),
        date_format(min(col("ts")), "yyyy-MM-dd HH:mm:ss").as("stt"),
        date_format(max(col("ts")), "yyyy-MM-dd HH:mm:ss").as("edt"),
        moneySum(col("value")).as("value_sum"))
      .withColumn("session_seq", row_number().over(
        Window.partitionBy(col("user_id")).orderBy(col("w.start"))).cast("long"))
      .select(col("user_id"), col("session_seq"), col("n_events"),
        col("stt"), col("edt"), col("value_sum"))
      .orderBy(col("user_id"), col("session_seq"))

  /** Hot-key-safe sessionization — identical output to [[sessionize]]
    * (same oracle), but the per-key SERIAL work drops from O(events)
    * to O(time-chunks): SURVEY §4's "single key with billions of
    * events serializes in one partition" limit, closed.
    *
    * Time-range pre-chunking: events window within (user_id, chunk)
    * partitions — a billion-event key spreads across chunks — and the
    * cross-chunk stitch runs on ONE ROW PER CHUNK:
    *   1. each chunk-first event's true predecessor is the previous
    *      non-empty chunk's max timestamp (lag over per-chunk stats);
    *   2. global session numbers = running count of session starts in
    *      earlier chunks (again a window over per-chunk stats) + the
    *      local within-chunk running count.
    * Both stitch windows scan #chunks rows, not #events. */
  def sessionizeChunked(s: SparkSession, d: String): DataFrame =
    sessionizeChunkedDf(Tables.events(s, d), chunkUs = 86400L * 1000000L)

  def sessionizeChunkedDf(events: DataFrame, chunkUs: Long): DataFrame = {
    // no constraint between chunk size and gap: a chunk-first event's
    // predecessor is the previous NON-EMPTY chunk's max, so sessions
    // stitch correctly even across empty chunks
    val wLocal = Window.partitionBy(col("user_id"), col("chunk"))
      .orderBy(col("ts_us"), col("event_id"))
    val wChunk = Window.partitionBy(col("user_id")).orderBy(col("chunk"))
    val ev = events
      .withColumn("chunk", expr(s"ts_us div $chunkUs"))
      .withColumn("local_prev", lag(col("ts_us"), 1).over(wLocal))
    // ALL chunk-level facts come out of ONE aggregation over the
    // windowed events: internal session starts count directly, and the
    // chunk-FIRST event's start flag is decidable chunk-level (its
    // predecessor is prev_cmax, its ts is cmin) — so the offsets
    // branch never re-runs the event-level windows + join, which a
    // flagged-side re-aggregation would recompute wholesale
    val chunkStats = ev.groupBy(col("user_id"), col("chunk"))
      .agg(
        max(col("ts_us")).as("cmax"),
        min(col("ts_us")).as("cmin"),
        sum(when(col("local_prev").isNotNull &&
          col("ts_us") - col("local_prev") > Sessions.GapUs, 1).otherwise(0))
          .as("internal_starts"))
      .withColumn("prev_cmax", lag(col("cmax"), 1).over(wChunk))
      .withColumn("n_starts", col("internal_starts") +
        when(col("prev_cmax").isNull ||
          col("cmin") - col("prev_cmax") > Sessions.GapUs, 1).otherwise(0))
    val offsets = chunkStats
      .withColumn("offset", coalesce(
        sum(col("n_starts")).over(
          wChunk.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("user_id"), col("chunk"), col("prev_cmax"), col("offset"))
    ev.join(offsets, Seq("user_id", "chunk"))
      .withColumn("prev_us", coalesce(col("local_prev"), col("prev_cmax")))
      .withColumn("new_s",
        when(col("prev_us").isNull ||
          col("ts_us") - col("prev_us") > Sessions.GapUs, 1).otherwise(0))
      .withColumn("local_seq", sum(col("new_s")).over(
        wLocal.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("session_seq", col("offset") + col("local_seq"))
      .groupBy(col("user_id"), col("session_seq"))
      .agg(
        count(lit(1)).as("n_events"),
        date_format(min(col("ts")), "yyyy-MM-dd HH:mm:ss").as("stt"),
        date_format(max(col("ts")), "yyyy-MM-dd HH:mm:ss").as("edt"),
        moneySum(col("value")).as("value_sum"))
      .orderBy(col("user_id"), col("session_seq"))
  }

  /** Ordered funnel view → click → purchase: a user reaches stage N+1
    * only with an event strictly after their stage-N entry. Per-stage
    * reachable-user counts. Three aggregate+join hops, each keyed on
    * user_id so the partitioning is reused. */
  def funnel(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d).select(col("user_id"), col("event_type"), col("ts_us"))
    val v = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ts_us")).as("t1"))
    val c = ev.filter(col("event_type") === "click").as("e")
      .join(v, "user_id")
      .filter(col("ts_us") > col("t1"))
      .groupBy(col("user_id")).agg(min(col("ts_us")).as("t2"))
    val p = ev.filter(col("event_type") === "purchase").as("e")
      .join(c, "user_id")
      .filter(col("ts_us") > col("t2"))
      .groupBy(col("user_id")).agg(min(col("ts_us")).as("t3"))
    Seq("1_view", "2_click", "3_purchase").zip(Seq(v, c, p)).map { case (stage, df) =>
        df.select(lit(stage).as("stage"), col("user_id"))
      }
      .reduce(_ unionAll _)
      .groupBy(col("stage")).agg(count(lit(1)).as("user_ct"))
      .orderBy(col("stage"))
  }

  val funnelSql: String =
    """WITH v AS (SELECT user_id, min(ts) AS t1 FROM events
      |           WHERE event_type = 'view' GROUP BY user_id),
      |c AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e
      |      JOIN v ON e.user_id = v.user_id AND e.ts > v.t1
      |      WHERE e.event_type = 'click' GROUP BY e.user_id),
      |p AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e
      |      JOIN c ON e.user_id = c.user_id AND e.ts > c.t2
      |      WHERE e.event_type = 'purchase' GROUP BY e.user_id)
      |SELECT stage, count(*) AS user_ct FROM (
      |  SELECT '1_view' AS stage, user_id FROM v
      |  UNION ALL SELECT '2_click', user_id FROM c
      |  UNION ALL SELECT '3_purchase', user_id FROM p) t
      |GROUP BY stage ORDER BY stage""".stripMargin

  /** Windowed funnel — [[funnel]] with a CONVERSION WINDOW: every
    * later stage must land within 72 h of the user's FIRST stage-1
    * event (the anchored greedy definition product-analytics funnels
    * use; the anchor is the same `min` aggregate as the plain funnel,
    * so the two share their join/agg shape and scale profile — the
    * window predicate just rides the stage joins). */
  def funnelWindowed(s: SparkSession, d: String): DataFrame = {
    val windowUs = 72L * 3600 * 1000000
    val ev = Tables.events(s, d).select(col("user_id"), col("event_type"), col("ts_us"))
    val v = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ts_us")).as("t1"))
    val c = ev.filter(col("event_type") === "click")
      .join(v, "user_id")
      .filter(col("ts_us") > col("t1") && col("ts_us") <= col("t1") + windowUs)
      .groupBy(col("user_id")).agg(min(col("ts_us")).as("t2"), min(col("t1")).as("t1"))
    val p = ev.filter(col("event_type") === "purchase")
      .join(c, "user_id")
      .filter(col("ts_us") > col("t2") && col("ts_us") <= col("t1") + windowUs)
      .groupBy(col("user_id")).agg(min(col("ts_us")).as("t3"))
    Seq("1_view", "2_click", "3_purchase").zip(Seq(v, c, p)).map { case (stage, df) =>
        df.select(lit(stage).as("stage"), col("user_id"))
      }
      .reduce(_ unionAll _)
      .groupBy(col("stage")).agg(count(lit(1)).as("user_ct"))
      .orderBy(col("stage"))
  }

  val funnelWindowedSql: String =
    """WITH v AS (SELECT user_id, min(ts) AS t1 FROM events
      |           WHERE event_type = 'view' GROUP BY user_id),
      |c AS (SELECT e.user_id, min(e.ts) AS t2, min(v.t1) AS t1 FROM events e
      |      JOIN v ON e.user_id = v.user_id AND e.ts > v.t1
      |        AND e.ts <= v.t1 + INTERVAL 72 HOUR
      |      WHERE e.event_type = 'click' GROUP BY e.user_id),
      |p AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e
      |      JOIN c ON e.user_id = c.user_id AND e.ts > c.t2
      |        AND e.ts <= c.t1 + INTERVAL 72 HOUR
      |      WHERE e.event_type = 'purchase' GROUP BY e.user_id)
      |SELECT stage, count(*) AS user_ct FROM (
      |  SELECT '1_view' AS stage, user_id FROM v
      |  UNION ALL SELECT '2_click', user_id FROM c
      |  UNION ALL SELECT '3_purchase', user_id FROM p) t
      |GROUP BY stage ORDER BY stage""".stripMargin

  /** Cohort retention: users grouped by their first-activity day;
    * day-N retention = distinct users of that cohort active N days
    * later (N ≤ 7). */
  def retention(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .select(col("user_id"), to_date(col("ts")).as("day"))
    val cohort = ev.groupBy(col("user_id")).agg(min(col("day")).as("cohort_day"))
    ev.join(cohort, "user_id")
      .withColumn("day_n", datediff(col("day"), col("cohort_day")).cast("long"))
      .filter(col("day_n") <= 7)
      .groupBy(
        date_format(col("cohort_day"), "yyyy-MM-dd").as("cohort"),
        col("day_n"))
      .agg(countDistinct(col("user_id")).as("user_ct"))
      .orderBy(col("cohort"), col("day_n"))
  }

  val retentionSql: String =
    """WITH ev AS (SELECT user_id, CAST(ts AS DATE) AS day FROM events),
      |cohort AS (SELECT user_id, min(day) AS cohort_day FROM ev GROUP BY user_id)
      |SELECT strftime(cohort_day, '%Y-%m-%d') AS cohort,
      |  date_diff('day', cohort_day, day) AS day_n,
      |  count(DISTINCT ev.user_id) AS user_ct
      |FROM ev JOIN cohort ON ev.user_id = cohort.user_id
      |WHERE date_diff('day', cohort_day, day) <= 7
      |GROUP BY 1, 2
      |ORDER BY cohort, day_n""".stripMargin

  /** Pivoted per-user event-type counts (the wide-metric shape the
    * ClickHouse tables store): one row per user, one column per event
    * type. Spark's `pivot` with an explicit value list keeps the plan
    * a single hash aggregation. */
  def pivotCounts(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(col("user_id"))
      .pivot("event_type", Seq("view", "click", "purchase", "signup", "error"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .select(col("user_id"), col("view").as("view_ct"), col("click").as("click_ct"),
        col("purchase").as("purchase_ct"), col("signup").as("signup_ct"),
        col("error").as("error_ct"))
      .orderBy(col("user_id"))

  val pivotCountsSql: String =
    """SELECT user_id,
      |  CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view_ct,
      |  CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click_ct,
      |  CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase_ct,
      |  CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup_ct,
      |  CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error_ct
      |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin

  /** Event-type transition counts (first-order Markov pairs): for each
    * user's chronological stream, count (previous type → type) pairs —
    * the path-analysis primitive behind "what do users do next". */
  def transitions(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
    Tables.events(s, d)
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .filter(col("prev_type").isNotNull)
      .groupBy(col("prev_type"), col("event_type").as("next_type"))
      .agg(count(lit(1)).as("ct"))
      .orderBy(col("prev_type"), col("next_type"))
  }

  /** Hot-key-safe transitions — identical output to [[transitions]]
    * (same oracle): lag-1 pairing within (user, time-chunk) windows,
    * with each chunk-first event's predecessor type supplied by the
    * previous non-empty chunk's LAST event type (one `max_by` per
    * chunk + a lag over chunk rows). */
  def transitionsChunked(s: SparkSession, d: String): DataFrame =
    transitionsChunkedDf(Tables.events(s, d), chunkUs = 86400L * 1000000L)

  def transitionsChunkedDf(events: DataFrame, chunkUs: Long): DataFrame = {
    val wLocal = Window.partitionBy(col("user_id"), col("chunk"))
      .orderBy(col("ts_us"), col("event_id"))
    val wChunk = Window.partitionBy(col("user_id")).orderBy(col("chunk"))
    val chunked = events.withColumn("chunk", expr(s"ts_us div $chunkUs"))
    val ev = chunked
      .withColumn("local_prev_type", lag(col("event_type"), 1).over(wLocal))
    val stats = chunked.groupBy(col("user_id"), col("chunk"))
      .agg(max_by(col("event_type"),
        struct(col("ts_us"), col("event_id"))).as("clast_type"))
      .withColumn("prev_clast_type", lag(col("clast_type"), 1).over(wChunk))
      .select(col("user_id"), col("chunk"), col("prev_clast_type"))
    ev.join(stats, Seq("user_id", "chunk"))
      .withColumn("prev_type",
        coalesce(col("local_prev_type"), col("prev_clast_type")))
      .filter(col("prev_type").isNotNull)
      .groupBy(col("prev_type"), col("event_type").as("next_type"))
      .agg(count(lit(1)).as("ct"))
      .orderBy(col("prev_type"), col("next_type"))
  }

  val transitionsSql: String =
    """SELECT prev_type, next_type, count(*) AS ct FROM (
      |  SELECT lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type,
      |    event_type AS next_type
      |  FROM events) t
      |WHERE prev_type IS NOT NULL
      |GROUP BY prev_type, next_type
      |ORDER BY prev_type, next_type""".stripMargin

  /** Touch event types credited by [[attribution]]. */
  private[graft] val TouchTypes = Seq("view", "click", "signup")

  /** Multi-touch marketing ATTRIBUTION — first- and last-touch credit
    * per conversion (the serving query behind every "which channel
    * drove this purchase" dashboard). A touch credits the NEXT
    * conversion of the same user within the lookback window; per
    * conversion, the earliest credited touch takes first-touch
    * credit, the latest takes last-touch, and credits + conversion
    * GMV roll up per touch type.
    *
    * Shape — the MERGE-form discipline (the as-of join lesson): no
    * touch⋈conversion inequality join anywhere. Touches and
    * conversions ride ONE user-keyed descending window pass where a
    * running `last(conversion struct, ignoreNulls)` hands every touch
    * its next conversion; the first/last pick is a per-conversion
    * row_number (bounded by touches-per-window, never corpus-wide);
    * the rollup is partial-aggregable. Everything orders on the
    * (ts_us, event_id) composite — the tie-break contract. GMV sums
    * ride DECIMAL. */
  def attribution(s: SparkSession, d: String, windowUs: Long = 86400000000L): DataFrame =
    attributionTail(attrCarry(attrPrep(Tables.events(s, d))), windowUs)

  /** Shared projection for the attribution family. */
  private def attrPrep(ev: DataFrame): DataFrame =
    ev.filter(col("event_type").isin((TouchTypes :+ "purchase").map(x => x: Any): _*))
      .select(col("user_id"), col("ts_us"), col("event_id"),
        (col("event_type") === "purchase").as("is_conv"),
        col("event_type"), col("value"))

  private def convStruct = when(col("is_conv"),
    struct(col("ts_us").as("cts"), col("event_id").as("cid"), col("value").as("cval")))

  /** The plain descending carry: every row learns its NEXT conversion
    * (strictly after in the (ts, event_id) composite). */
  private def attrCarry(u: DataFrame): DataFrame = {
    val wDesc = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us").desc, col("event_id").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    u.withColumn("nc", last(convStruct, ignoreNulls = true).over(wDesc))
  }

  /** Hot-key-safe carry — the [[AsOfJoin]] chunk-stitch recipe on the
    * DESCENDING direction: within (user, chunk) windows give the local
    * next-conversion; the carry entering a chunk from LATER chunks is
    * the min (cts, cid) conversion struct among them (struct min is
    * exactly the earliest-next tie rule), from a window over one row
    * per chunk. A billion-event user spreads across chunk partitions
    * instead of serializing one task. */
  private[operators] def attrCarryChunked(u0: DataFrame, chunkUs: Long): DataFrame = {
    val u = u0.withColumn("_chunk", expr(s"ts_us div $chunkUs"))
    val wLocal = Window.partitionBy(col("user_id"), col("_chunk"))
      .orderBy(col("ts_us").desc, col("event_id").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val local = u.withColumn("lnc", last(convStruct, ignoreNulls = true).over(wLocal))
    val wNextChunk = Window.partitionBy(col("user_id")).orderBy(col("_chunk").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val stats = u.groupBy(col("user_id"), col("_chunk"))
      .agg(min(convStruct).as("cmin"))
      .withColumn("nin", last(col("cmin"), ignoreNulls = true).over(wNextChunk))
      .select(col("user_id"), col("_chunk"), col("nin"))
    local.join(stats, Seq("user_id", "_chunk"))
      .withColumn("nc", coalesce(col("lnc"), col("nin")))
      .drop("lnc", "nin", "_chunk")
  }

  /** Credit assignment + rollup shared verbatim by the plain and
    * chunked forms — one definition, so the chunked variant cannot
    * drift from the oracle it shares. The per-conversion windows are
    * bounded by touches-per-lookback, never corpus-wide. */
  private def attributionTail(carried: DataFrame, windowUs: Long): DataFrame = {
    val credited = carried
      .filter(!col("is_conv") && col("nc").isNotNull &&
        col("nc.cts") - col("ts_us") <= windowUs)
      .select(col("nc.cid").as("conv_id"), col("nc.cval").as("conv_value"),
        col("ts_us"), col("event_id"), col("event_type").as("touch_type"))
    val wf = Window.partitionBy(col("conv_id")).orderBy(col("ts_us"), col("event_id"))
    val wl = Window.partitionBy(col("conv_id")).orderBy(col("ts_us").desc, col("event_id").desc)
    val marked = credited
      .withColumn("rf", row_number().over(wf))
      .withColumn("rl", row_number().over(wl))
    val firstC = marked.filter(col("rf") === 1).groupBy(col("touch_type"))
      .agg(count(lit(1)).as("first_credits"), moneySum(col("conv_value")).as("first_gmv"))
    val lastC = marked.filter(col("rl") === 1).groupBy(col("touch_type"))
      .agg(count(lit(1)).as("last_credits"), moneySum(col("conv_value")).as("last_gmv"))
    firstC.join(lastC, Seq("touch_type"), "full_outer")
      .select(col("touch_type"),
        coalesce(col("first_credits"), lit(0L)).as("first_credits"),
        coalesce(col("last_credits"), lit(0L)).as("last_credits"),
        coalesce(col("first_gmv"), lit(0.0)).as("first_gmv"),
        coalesce(col("last_gmv"), lit(0.0)).as("last_gmv"))
      .orderBy(col("touch_type"))
  }

  /** [[attribution]] through the hot-key-safe chunked carry — must
    * produce the identical result (same oracle; day-sized chunks). */
  def attributionChunked(s: SparkSession, d: String): DataFrame =
    attributionChunkedDf(Tables.events(s, d), chunkUs = 86400L * 1000000L)

  def attributionChunkedDf(events: DataFrame, chunkUs: Long,
      windowUs: Long = 86400000000L): DataFrame =
    attributionTail(attrCarryChunked(attrPrep(events), chunkUs), windowUs)

  /** Oracle: identical descending carry (IGNORE NULLS struct), micro
    * timestamps compare as INTERVAL — same ≤ window bound. */
  val attributionSql: String = {
    val touches = TouchTypes.map(t => s"'$t'").mkString(", ")
    s"""WITH ev AS (
       |  SELECT user_id, event_id, ts, event_type, value,
       |    event_type = 'purchase' AS is_conv
       |  FROM events
       |  WHERE event_type IN ($touches, 'purchase')),
       |tagged AS (
       |  SELECT *,
       |    last_value(CASE WHEN is_conv
       |        THEN struct_pack(cts := ts, cid := event_id, cval := value) END
       |      IGNORE NULLS)
       |      OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC
       |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS nc
       |  FROM ev),
       |credited AS (
       |  SELECT nc.cid AS conv_id, nc.cval AS conv_value,
       |    ts, event_id, event_type AS touch_type
       |  FROM tagged
       |  WHERE NOT is_conv AND nc IS NOT NULL
       |    AND nc.cts - ts <= INTERVAL 1 DAY),
       |marked AS (
       |  SELECT *,
       |    row_number() OVER (PARTITION BY conv_id ORDER BY ts, event_id) AS rf,
       |    row_number() OVER (PARTITION BY conv_id ORDER BY ts DESC, event_id DESC) AS rl
       |  FROM credited),
       |f AS (
       |  SELECT touch_type, CAST(count(*) AS BIGINT) AS first_credits,
       |    ${Agg.sqlMoneySum("conv_value")} AS first_gmv
       |  FROM marked WHERE rf = 1 GROUP BY touch_type),
       |l AS (
       |  SELECT touch_type, CAST(count(*) AS BIGINT) AS last_credits,
       |    ${Agg.sqlMoneySum("conv_value")} AS last_gmv
       |  FROM marked WHERE rl = 1 GROUP BY touch_type)
       |SELECT coalesce(f.touch_type, l.touch_type) AS touch_type,
       |  coalesce(first_credits, 0) AS first_credits,
       |  coalesce(last_credits, 0) AS last_credits,
       |  coalesce(first_gmv, 0.0) AS first_gmv,
       |  coalesce(last_gmv, 0.0) AS last_gmv
       |FROM f FULL OUTER JOIN l ON f.touch_type = l.touch_type
       |ORDER BY touch_type""".stripMargin
  }

  /** Gaps-and-islands: per-user CONSECUTIVE-DAY activity streaks (the
    * daily-engagement serving shape next to retention/DAU — "longest
    * run of consecutive active days"). Classic island detection:
    * epoch-day minus per-user row_number is constant within a
    * contiguous run, so one groupBy per (user, island) yields streak
    * lengths without any self-join.
    *
    * Scale: the serial window runs AFTER the (user, day) distinct —
    * a billion-event hot user collapses to at most calendar-range
    * rows (the dedup is a partial-aggregable hash agg), so per-key
    * window state is calendar-bounded by construction and the op
    * needs no chunked variant. */
  def streaks(s: SparkSession, d: String): DataFrame = {
    val days = Tables.events(s, d)
      .select(col("user_id"),
        datediff(to_date(col("ts")), lit("1970-01-01")).as("dayn"))
      .distinct()
    val w = Window.partitionBy(col("user_id")).orderBy(col("dayn"))
    val islands = days
      .withColumn("grp", col("dayn") - row_number().over(w))
      .groupBy(col("user_id"), col("grp"))
      .agg(count(lit(1)).as("len"))
    islands.groupBy(col("user_id"))
      .agg(max(col("len")).as("longest_streak"),
        count(lit(1)).as("n_streaks"),
        sum(col("len")).as("active_days"))
      .orderBy(col("user_id"))
  }

  val streaksSql: String =
    """WITH days AS (
      |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
      |g AS (
      |  SELECT user_id, day,
      |    date_diff('day', DATE '1970-01-01', day)
      |      - row_number() OVER (PARTITION BY user_id ORDER BY day) AS grp
      |  FROM days),
      |st AS (
      |  SELECT user_id, grp, CAST(count(*) AS BIGINT) AS len
      |  FROM g GROUP BY user_id, grp)
      |SELECT user_id, CAST(max(len) AS BIGINT) AS longest_streak,
      |  CAST(count(*) AS BIGINT) AS n_streaks,
      |  CAST(sum(len) AS BIGINT) AS active_days
      |FROM st GROUP BY user_id ORDER BY user_id""".stripMargin

  /** Out-of-order ARRIVAL diagnostic — the measurement that sizes
    * every watermark in the streaming mirrors: replay events in
    * arrival order (event_id — the ingest sequence), track the
    * event-time high-water mark, and score each arrival's lateness
    * against it (exactly what Spark's watermark machinery would see).
    * Per-user rollup: event count, late-arrival count, worst and total
    * lateness in micros. A p99 of `max_late_us` across users IS the
    * watermark delay you should configure.
    *
    * The integer micro lateness values make every aggregate exact
    * under any partitioning. */
  def outOfOrder(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.events(s, d)
      .withColumn("hwm", max(col("ts_us")).over(w))
      .select(col("user_id"), lateCol(col("hwm"), col("ts_us")).as("late_us"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum((col("late_us") > 0).cast("long")).as("n_late"),
        max(col("late_us")).as("max_late_us"),
        sum(col("late_us")).as("total_late_us"))
      .orderBy(col("user_id"))
  }

  /** NULL-explicit lateness: first arrival (no high-water mark) and
    * in-order arrivals are 0 by RULE in both engines. */
  private def lateCol(hwm: Column, ts: Column): Column =
    when(hwm.isNull || hwm <= ts, lit(0L)).otherwise(hwm - ts)

  /** Hot-key-safe out-of-order diagnostic — identical output to
    * [[outOfOrder]] (same oracle): arrivals window within
    * (user, arrival-chunk) so a billion-event key spreads across
    * chunks, and the cross-chunk high-water mark carry is ONE row per
    * chunk (running max over the per-chunk maxima — the ascending-carry
    * half of the standard chunk stitch). Per-key serial work O(chunks). */
  def outOfOrderChunked(s: SparkSession, d: String,
    chunkSize: Long = 4096L): DataFrame = {
    val base = Tables.events(s, d)
      .select(col("user_id"), col("event_id"), col("ts_us"))
      .withColumn("_chunk", expr(s"event_id div $chunkSize"))
    val wLocal = Window.partitionBy(col("user_id"), col("_chunk"))
      .orderBy(col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wCarry = Window.partitionBy(col("user_id")).orderBy(col("_chunk"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val carries = base.groupBy(col("user_id"), col("_chunk"))
      .agg(max(col("ts_us")).as("cmax"))
      .withColumn("carry", max(col("cmax")).over(wCarry))
      .select(col("user_id"), col("_chunk"), col("carry"))
    val hwmLocal = max(col("ts_us")).over(wLocal)
    base.join(carries, Seq("user_id", "_chunk"))
      .withColumn("hwm",
        when(col("carry").isNull, hwmLocal)
          .otherwise(greatest(coalesce(hwmLocal, col("carry")), col("carry"))))
      .select(col("user_id"), lateCol(col("hwm"), col("ts_us")).as("late_us"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum((col("late_us") > 0).cast("long")).as("n_late"),
        max(col("late_us")).as("max_late_us"),
        sum(col("late_us")).as("total_late_us"))
      .orderBy(col("user_id"))
  }

  val outOfOrderSql: String =
    """WITH a AS (
      |  SELECT user_id,
      |    max(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS hwm,
      |    epoch_us(ts) AS tus
      |  FROM events),
      |l AS (
      |  SELECT user_id,
      |    CASE WHEN hwm IS NULL OR hwm <= tus THEN 0 ELSE hwm - tus END AS late_us
      |  FROM a)
      |SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
      |  CAST(sum(CASE WHEN late_us > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_late,
      |  CAST(max(late_us) AS BIGINT) AS max_late_us,
      |  CAST(sum(late_us) AS BIGINT) AS total_late_us
      |FROM l GROUP BY user_id ORDER BY user_id""".stripMargin

  /** Sequence-pattern COUNT (ClickHouse `sequenceCount('(?1)(?2)')`
    * analog): per user, how many NON-OVERLAPPING view → purchase
    * matches the ordered event stream contains — the repeat-conversion
    * metric the one-shot [[funnel]] can't express (a funnel says
    * whether a user converted; this says how many times).
    *
    * The greedy left-to-right matcher is NOT run as a serial fold:
    * with d = +1 per purchase / −1 per view and R_t its prefix sum in
    * (ts_us, event_id) order, the purchases a greedy matcher leaves
    * unmatched are exactly max(0, max_t R_t) — a purchase goes
    * unmatched iff at its position purchases-so-far exceed
    * views-so-far, and that excess is monotone in the prefix maximum
    * (the bracket-matching identity; same two-window shape as
    * ts_cusum's CUSUM rewrite). So matches = P − max(0, max R_t) from
    * ONE per-user running window + one rollup — no per-event state
    * machine, no UDF, and a billion-event user costs a partitioned
    * window scan, not a driver fold. Output is the bounded histogram
    * (conversions → user count); per-user detail stays in-cluster. */
  def sequenceCount(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .filter(col("user_id").isNotNull &&
        col("event_type").isin("view", "purchase"))
      .select(col("user_id"), col("ts_us"), col("event_id"),
        when(col("event_type") === "purchase", 1L).otherwise(-1L).as("d"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val per = ev.withColumn("r", sum(col("d")).over(w))
      .groupBy(col("user_id"))
      .agg(sum(when(col("d") === 1L, 1L).otherwise(0L)).as("p"),
        greatest(max(col("r")), lit(0L)).as("deficit"))
      .select((col("p") - col("deficit")).as("conversions"))
    per.groupBy(col("conversions"))
      .agg(count(lit(1)).as("user_ct"))
      .orderBy(col("conversions"))
  }

  /** Oracle for [[sequenceCount]] — the identical bracket-matching
    * windows ((ts_us, event_id) order, micros via epoch_us). */
  val sequenceCountSql: String =
    """WITH ev AS (
      |  SELECT user_id, epoch_us(ts) AS ts_us, event_id,
      |    CASE WHEN event_type = 'purchase' THEN 1 ELSE -1 END AS d
      |  FROM events
      |  WHERE user_id IS NOT NULL AND event_type IN ('view', 'purchase')),
      |pref AS (
      |  SELECT user_id, d,
      |    sum(d) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS r
      |  FROM ev),
      |per AS (
      |  SELECT CAST(sum(CASE WHEN d = 1 THEN 1 ELSE 0 END) AS BIGINT)
      |      - greatest(CAST(max(r) AS BIGINT), 0) AS conversions
      |  FROM pref GROUP BY user_id)
      |SELECT conversions, CAST(count(*) AS BIGINT) AS user_ct
      |FROM per GROUP BY conversions ORDER BY conversions""".stripMargin
}
