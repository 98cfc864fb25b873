package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — the canonical "operator Spark lacks" (preference path
  * (a): composed from built-ins, no custom plan node needed).
  *
  * For every left row, attach the latest right row with the same key
  * and right.ts ≤ left.ts. The naive formulation (inequality join +
  * per-left-row max) explodes to a near-cross-product per key. The
  * scalable composition is the MERGE form: union both sides tagged,
  * ONE shuffle on the key, one ordered window pass carrying the last
  * seen right payload forward (`last(..., ignoreNulls)`), then keep
  * the left rows. O(n log n) per key partition, no inequality join.
  */
object AsOfJoin {

  /** Generic as-of: `left` rows pick up `payloadCols` from the most
    * recent `right` row with equal `key` and ts ≤ left ts. Ties
    * (identical ts) count as matches (the ASOF convention).
    *
    * The payloads ride inside ONE struct column: `last(ignoreNulls)`
    * then tests "was there a right row", not "was the payload value
    * non-null" — a right row whose payload IS null still wins over an
    * older non-null one, matching true ASOF semantics. */
  /** Shared MERGE-form setup for [[asOf]] / [[asOfChunked]]: project
    * the right side to its contract columns, ride the payloads in ONE
    * struct column (`_p` non-null ⇔ "this is a right row", so a right
    * row whose payload VALUE is null still wins over an older non-null
    * one), tag left=1 / right=0 (rights sort first at equal ts → ties
    * match), and union by name with null-typed fillers. */
  private def taggedUnion(left: DataFrame, rightRaw: DataFrame, key: String,
    ts: String, payloadCols: Seq[String]): DataFrame = {
    val overlap = payloadCols.toSet.intersect(left.columns.toSet)
    require(overlap.isEmpty,
      s"asOf payload columns collide with left columns: ${overlap.mkString(", ")}")
    // auto-project the right side: any extra right column would make the
    // union ambiguous (and is not part of the as-of contract)
    val right = rightRaw.select((Seq(key, ts) ++ payloadCols).map(col): _*)
    val extraLeft = left.columns.toSeq.filterNot(c => c == key || c == ts)
    val payloadStruct = struct(payloadCols.map(col): _*)
    val l2 = left.withColumn("_tag", lit(1))
      .withColumn("_p", lit(null).cast(right.select(payloadStruct).schema.head.dataType))
    val r2 = extraLeft.foldLeft(
      right.withColumn("_tag", lit(0)).withColumn("_p", payloadStruct)
        .drop(payloadCols: _*)) { (df, c) =>
      df.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }
    l2.unionByName(r2)
  }

  /** Extract the carried payload fields back out and keep left rows. */
  private def extractPayload(df: DataFrame, payloadCols: Seq[String]): DataFrame =
    payloadCols.foldLeft(df.filter(col("_tag") === 1)) { (acc, c) =>
      acc.withColumn(c, col("_p").getField(c))
    }

  /** Whether `_p` can join the window sort (maps are unorderable —
    * for those, same-ts right rows fall back to partition order rather
    * than failing analysis). */
  private def orderable(dt: org.apache.spark.sql.types.DataType): Boolean = {
    import org.apache.spark.sql.types._
    dt match {
      case _: MapType      => false
      case s: StructType   => s.fields.forall(f => orderable(f.dataType))
      case a: ArrayType    => orderable(a.elementType)
      case _               => true
    }
  }

  private def tieCols(u: DataFrame): Seq[Column] =
    if (orderable(u.schema("_p").dataType)) Seq(col("_p")) else Nil

  def asOf(left: DataFrame, rightRaw: DataFrame, key: String, ts: String,
    payloadCols: Seq[String]): DataFrame = {
    val u = taggedUnion(left, rightRaw, key, ts, payloadCols)
    // `_p` as the final order key (when orderable): two right rows on
    // the SAME (ts) would otherwise resolve by partition order
    // (nondeterministic, and divergent from whatever the oracle picks)
    // — with `_p` in the sort, the largest payload wins the tie
    val w = Window.partitionBy(col(key))
      .orderBy(col(ts) +: col("_tag") +: tieCols(u): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = u.withColumn("_p", last(col("_p"), ignoreNulls = true).over(w))
    extractPayload(carried, payloadCols).drop("_tag", "_p")
  }

  /** Hot-key-safe as-of join — identical output to [[asOf]] (shares
    * its oracle), with per-key SERIAL work dropped from O(rows) to
    * O(time-chunks): the same mitigation recipe as
    * EventAnalytics.sessionizeChunked, applied to the MERGE form.
    *
    *   1. the tagged union windows within (key, chunk) partitions, so
    *      a billion-row key spreads across chunks;
    *   2. each chunk's final carried payload is reduced to ONE row per
    *      chunk (`max_by` over the chunk), and the payload entering a
    *      chunk is the last non-empty final among EARLIER chunks —
    *      a window over chunk rows, not event rows;
    *   3. a row's as-of payload = its within-chunk carry, else the
    *      chunk's incoming carry.
    * Empty chunks and runs of right-free chunks stitch correctly
    * because the incoming-carry window skips nulls. */
  def asOfChunked(left: DataFrame, rightRaw: DataFrame, key: String, ts: String,
    payloadCols: Seq[String], chunkSize: Long): DataFrame = {
    val u = taggedUnion(left, rightRaw, key, ts, payloadCols)
      .withColumn("_chunk", (col(ts) / chunkSize).cast("long"))
    // same deterministic tie-break as [[asOf]]: `_p` last in the sort
    val wLocal = Window.partitionBy(col(key), col("_chunk"))
      .orderBy(col(ts) +: col("_tag") +: tieCols(u): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = u.withColumn("_pc", last(col("_p"), ignoreNulls = true).over(wLocal))
    // one row per (key, chunk): the carry leaving that chunk (`_pc` in
    // the max_by order mirrors the window tie-break)
    val chunkTie = tieCols(u).map(_ => col("_pc"))
    val chunkLast = local.groupBy(col(key), col("_chunk"))
      .agg(max_by(col("_pc"),
        struct(col(ts) +: col("_tag") +: chunkTie: _*)).as("_clast"))
    val wChunk = Window.partitionBy(col(key)).orderBy(col("_chunk"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val incoming = chunkLast
      .withColumn("_pin", last(col("_clast"), ignoreNulls = true).over(wChunk))
      .select(col(key), col("_chunk"), col("_pin"))
    val stitched = local.join(incoming, Seq(key, "_chunk"))
      .withColumn("_p", coalesce(col("_pc"), col("_pin")))
    extractPayload(stitched, payloadCols)
      .drop("_tag", "_p", "_pc", "_pin", "_chunk")
  }

  /** [[purchaseAsOfView]] through the chunked path — must produce the
    * identical result (same oracle; day-sized chunks). */
  def purchaseAsOfViewChunked(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts_us"), col("event_id").as("purchase_id"),
        col("value").as("purchase_value"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts_us"), col("event_id").as("view_id"))
    asOfChunked(purchases, views, key = "user_id", ts = "ts_us",
      payloadCols = Seq("view_id"), chunkSize = 86400L * 1000000L)
      .select(col("purchase_id"), col("user_id"), col("view_id"), col("purchase_value"))
      .orderBy(col("purchase_id"))
  }

  /** Inventory entry: each purchase event picks up the user's most
    * recent prior (or simultaneous) view event — "what was the user
    * looking at when they bought". */
  def purchaseAsOfView(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts_us"), col("event_id").as("purchase_id"),
        col("value").as("purchase_value"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts_us"), col("event_id").as("view_id"))
    asOf(purchases, views, key = "user_id", ts = "ts_us", payloadCols = Seq("view_id"))
      .select(col("purchase_id"), col("user_id"), col("view_id"), col("purchase_value"))
      .orderBy(col("purchase_id"))
  }

  /** DuckDB oracle via its native ASOF JOIN (same ≥ tie semantics). */
  val purchaseAsOfViewSql: String =
    """SELECT p.event_id AS purchase_id, p.user_id, v.event_id AS view_id,
      |  p.value AS purchase_value
      |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
      |  ON p.user_id = v.user_id AND p.ts >= v.ts
      |ORDER BY purchase_id""".stripMargin

  /** Tolerance-bounded as-of join — the `merge_asof(tolerance=...)` /
    * ASOF-with-TOLERANCE shape engines ship for sensor alignment: the
    * match must not only be the latest prior right row, it must be
    * RECENT (left.ts − right.ts ≤ tolerance), else the left row keeps
    * nulls. Same MERGE-form carry as [[asOf]] — the right row's ts
    * rides inside the carried struct, and one codegen'd predicate
    * nulls out stale matches AFTER the carry (the bound cannot be a
    * pre-filter: which right row is "the" match depends on the carry
    * itself). Adds zero shuffles over the unbounded form. */
  def purchaseAsOfViewTol(s: SparkSession, d: String,
      toleranceUs: Long = 1800L * 1000000L): DataFrame =
    tolTail(tolJoin(s, d, chunkUs = None), toleranceUs)

  /** [[purchaseAsOfViewTol]] through the chunked carry — identical
    * output (same oracle; day-sized chunks): the tolerance predicate
    * composes with EITHER carry because it runs after the match. */
  def purchaseAsOfViewTolChunked(s: SparkSession, d: String,
      toleranceUs: Long = 1800L * 1000000L): DataFrame =
    tolTail(tolJoin(s, d, chunkUs = Some(86400L * 1000000L)), toleranceUs)

  private def tolJoin(s: SparkSession, d: String, chunkUs: Option[Long]): DataFrame = {
    val ev = Tables.events(s, d)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts_us"), col("event_id").as("purchase_id"),
        col("value").as("purchase_value"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts_us"), col("event_id").as("view_id"),
        col("ts_us").as("view_ts_us"))
    chunkUs match {
      case Some(c) => asOfChunked(purchases, views, key = "user_id", ts = "ts_us",
        payloadCols = Seq("view_id", "view_ts_us"), chunkSize = c)
      case None => asOf(purchases, views, key = "user_id", ts = "ts_us",
        payloadCols = Seq("view_id", "view_ts_us"))
    }
  }

  private def tolTail(joined: DataFrame, toleranceUs: Long): DataFrame =
    joined
      .withColumn("fresh", col("ts_us") - col("view_ts_us") <= toleranceUs)
      .select(col("purchase_id"), col("user_id"),
        when(col("fresh"), col("view_id")).as("view_id"),
        when(col("fresh"), col("ts_us") - col("view_ts_us")).as("age_us"),
        col("purchase_value"))
      .orderBy(col("purchase_id"))

  /** Oracle: DuckDB's native ASOF JOIN has no TOLERANCE clause, so the
    * bound is applied the same way — after the match, as a CASE. */
  val purchaseAsOfViewTolSql: String =
    """SELECT purchase_id, user_id,
      |  CASE WHEN age_us <= 1800000000 THEN view_id END AS view_id,
      |  CASE WHEN age_us <= 1800000000 THEN age_us END AS age_us,
      |  purchase_value
      |FROM (
      |  SELECT p.event_id AS purchase_id, p.user_id, v.event_id AS view_id,
      |    epoch_us(p.ts) - epoch_us(v.ts) AS age_us,
      |    p.value AS purchase_value
      |  FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      |  ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
      |    ON p.user_id = v.user_id AND p.ts >= v.ts) t
      |ORDER BY purchase_id""".stripMargin

  /** NEAREST-event join — the bidirectional as-of (sensor alignment /
    * "closest reading to this timestamp" shape engines ship as ASOF
    * NEAREST): each purchase picks the view of the same user closest
    * in time, in EITHER direction, ties to the earlier side.
    *
    * Same MERGE-form discipline as [[asOf]], run twice over ONE
    * shuffled union: an ascending carry hands every purchase its
    * latest prior view, a descending carry its earliest later view
    * (both windows share the (user) partitioning → one Exchange), and
    * a codegen'd CASE picks the nearer. Tie conventions are explicit
    * and engine-mirrored: equal-ts views count for BOTH directions
    * (Δ = 0 wins outright); among equal-ts views prev resolves to the
    * largest view id, next to the smallest; Δprev = Δnext resolves to
    * 'prev'. Purchases with no view at all keep null columns (left
    * semantics). */
  def purchaseNearestView(s: SparkSession, d: String): DataFrame =
    nearestTail(nearestCarries(nearestPrep(Tables.events(s, d))))

  /** Shared projection for the nearest-view family: purchases and
    * views only, with the view payload riding in ONE nullable struct
    * (non-null ⇔ view row), so both carry directions and both the
    * plain and chunked forms see identical inputs. */
  private[operators] def nearestPrep(ev: DataFrame): DataFrame =
    ev.filter(col("event_type").isin("purchase", "view"))
      .select(col("user_id"), col("ts_us"), col("event_id"),
        (col("event_type") === "purchase").as("is_p"),
        when(col("event_type") === "view",
          struct(col("ts_us").as("vts"), col("event_id").as("vid"))).as("v"))

  /** The plain dual carry: latest prior view ascending, earliest later
    * view descending, both windows sharing one (user) Exchange. */
  private[operators] def nearestCarries(u: DataFrame): DataFrame = {
    val wPrev = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("is_p").cast("int"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wNext = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us").desc, col("is_p").cast("int"), col("event_id").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    u.withColumn("pv", last(col("v"), ignoreNulls = true).over(wPrev))
      .withColumn("nv", last(col("v"), ignoreNulls = true).over(wNext))
  }

  /** Verdict + output shape shared verbatim by [[purchaseNearestView]]
    * and [[purchaseNearestViewChunked]] — one definition, so the
    * chunked variant cannot drift from the oracle it shares. */
  private def nearestTail(carried: DataFrame): DataFrame = {
    val picked = carried
      .filter(col("is_p"))
      .withColumn("dp", col("ts_us") - col("pv.vts"))
      .withColumn("dn", col("nv.vts") - col("ts_us"))
    val prevWins = col("pv").isNotNull && (col("nv").isNull || col("dp") <= col("dn"))
    picked.select(col("event_id").as("purchase_id"), col("user_id"),
        when(prevWins, col("pv.vid")).otherwise(col("nv.vid")).as("view_id"),
        when(prevWins, col("dp")).otherwise(col("dn")).as("delta_us"),
        when(col("pv").isNull && col("nv").isNull, lit(null).cast("string"))
          .when(prevWins, lit("prev")).otherwise(lit("next")).as("direction"))
      .orderBy(col("purchase_id"))
  }

  /** Hot-key-safe nearest-view join — identical output to
    * [[purchaseNearestView]] (same oracle), per-key serial work
    * O(time-chunks): the [[Dwm.chunkedNeighbors]] bidirectional stitch
    * applied to the dual IGNORE-NULLS carries. Within (user, chunk)
    * windows give the local prev/next view; the prev carry entering a
    * chunk is the max (vts, vid) view struct among EARLIER non-empty
    * chunks and the next carry the min view struct among LATER ones —
    * both from windows over chunk rows, not event rows (struct min/max
    * ignore nulls and compare (vts, vid) lexicographically, which is
    * exactly each direction's tie rule). A billion-event user spreads
    * across chunk partitions instead of serializing one task. */
  def purchaseNearestViewChunked(s: SparkSession, d: String): DataFrame =
    purchaseNearestViewChunkedDf(Tables.events(s, d), chunkUs = 86400L * 1000000L)

  def purchaseNearestViewChunkedDf(events: DataFrame, chunkUs: Long): DataFrame =
    nearestTail(nearestCarriesChunked(nearestPrep(events), chunkUs))

  private[operators] def nearestCarriesChunked(u0: DataFrame, chunkUs: Long): DataFrame = {
    val u = u0.withColumn("_chunk", expr(s"ts_us div $chunkUs"))
    val wLp = Window.partitionBy(col("user_id"), col("_chunk"))
      .orderBy(col("ts_us"), col("is_p").cast("int"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wLn = Window.partitionBy(col("user_id"), col("_chunk"))
      .orderBy(col("ts_us").desc, col("is_p").cast("int"), col("event_id").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val local = u
      .withColumn("lpv", last(col("v"), ignoreNulls = true).over(wLp))
      .withColumn("lnv", last(col("v"), ignoreNulls = true).over(wLn))
    // one row per (user, chunk): the view carry leaving the chunk in
    // each direction; runs of view-free chunks stitch because the
    // chunk-level carries skip nulls
    val wPrevChunk = Window.partitionBy(col("user_id")).orderBy(col("_chunk"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wNextChunk = Window.partitionBy(col("user_id")).orderBy(col("_chunk").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val stats = u.groupBy(col("user_id"), col("_chunk"))
      .agg(max(col("v")).as("cmax_v"), min(col("v")).as("cmin_v"))
      .withColumn("pin", last(col("cmax_v"), ignoreNulls = true).over(wPrevChunk))
      .withColumn("nin", last(col("cmin_v"), ignoreNulls = true).over(wNextChunk))
      .select(col("user_id"), col("_chunk"), col("pin"), col("nin"))
    local.join(stats, Seq("user_id", "_chunk"))
      .withColumn("pv", coalesce(col("lpv"), col("pin")))
      .withColumn("nv", coalesce(col("lnv"), col("nin")))
      .drop("lpv", "lnv", "pin", "nin", "_chunk")
  }

  /** Oracle: the identical two IGNORE-NULLS carries and tie rules —
    * micro deltas via epoch_us, so both engines compare the same
    * integers. */
  val purchaseNearestViewSql: String =
    """WITH u AS (
      |  SELECT user_id, ts, event_id,
      |    event_type = 'purchase' AS is_p,
      |    CASE WHEN event_type = 'view'
      |      THEN struct_pack(vts := ts, vid := event_id) END AS v
      |  FROM events WHERE event_type IN ('purchase', 'view')),
      |c AS (
      |  SELECT *,
      |    last_value(v IGNORE NULLS) OVER (PARTITION BY user_id
      |      ORDER BY ts, CAST(is_p AS INT), event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pv,
      |    last_value(v IGNORE NULLS) OVER (PARTITION BY user_id
      |      ORDER BY ts DESC, CAST(is_p AS INT), event_id DESC
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS nv
      |  FROM u),
      |p AS (
      |  SELECT event_id, user_id, pv, nv,
      |    epoch_us(ts) - epoch_us(pv.vts) AS dp,
      |    epoch_us(nv.vts) - epoch_us(ts) AS dn
      |  FROM c WHERE is_p)
      |SELECT event_id AS purchase_id, user_id,
      |  CASE WHEN pv IS NOT NULL AND (nv IS NULL OR dp <= dn)
      |    THEN pv.vid ELSE nv.vid END AS view_id,
      |  CASE WHEN pv IS NOT NULL AND (nv IS NULL OR dp <= dn)
      |    THEN dp ELSE dn END AS delta_us,
      |  CASE WHEN pv IS NULL AND nv IS NULL THEN NULL
      |       WHEN pv IS NOT NULL AND (nv IS NULL OR dp <= dn) THEN 'prev'
      |       ELSE 'next' END AS direction
      |FROM p ORDER BY purchase_id""".stripMargin

  /** Range join: band each event's value into configured [lo, hi)
    * ranges. With a small range table the right plan is a broadcast
    * nested-loop join (each row tests a handful of bands); were the
    * bands uniform it would collapse to arithmetic bucketing — both
    * avoid a shuffle of the fact side. */
  def rangeJoin(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val bands = (0 until 10).map(i => (i * 20.0, (i + 1) * 20.0, f"band_$i%02d"))
      .toDF("lo", "hi", "band")
    Tables.events(s, d)
      .join(broadcast(bands), col("value") >= col("lo") && col("value") < col("hi"))
      .groupBy(col("band"))
      .agg(count(lit(1)).as("ev_ct"), Agg.moneySum(col("value")).as("value_sum"))
      .orderBy(col("band"))
  }

  val rangeJoinSql: String =
    s"""WITH bands AS (
       |  SELECT i * 20.0 AS lo, (i + 1) * 20.0 AS hi,
       |    'band_' || lpad(CAST(i AS VARCHAR), 2, '0') AS band
       |  FROM (SELECT unnest(range(0, 10)) AS i))
       |SELECT band, count(*) AS ev_ct,
       |  ${Agg.sqlMoneySum("value")} AS value_sum
       |FROM events JOIN bands ON value >= lo AND value < hi
       |GROUP BY band ORDER BY band""".stripMargin
}
