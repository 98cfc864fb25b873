package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dimension-table maintenance — the batch MERGE / latest-record-wins
  * analog of the reference's continuous dim upserts into Phoenix/HBase
  * (gmall-realtime app/func/DimSinkFunction.java `invoke` UPSERTs each
  * CDC record; utils/PhoenixUtil.java executes them). A Spark-native
  * warehouse replays the day's CDC stream against the previous
  * snapshot in one pass:
  *
  *   new_snapshot = latest-version-wins( old_snapshot ∪ cdc_updates ),
  *                  with `delete` tombstones removing the key.
  *
  * The merge is ONE hash-partitioned window over (key): both sides
  * shuffle once on the dim key, no driver state, no per-record RPC —
  * at 100 TB of facts the dim stream is still dim-sized, and this
  * replaces millions of point upserts with a single sorted pass.
  */
object DimMaintenance {

  /** Latest-wins merge that RETAINS each surviving row's (version,
    * tie, op) — the state form that can be merged again with later,
    * possibly out-of-order, update batches: a late old update cannot
    * displace a newer winner, and delete tombstones stay in the state
    * so a late pre-delete update cannot resurrect a deleted key. */
  def mergeVersioned(state: DataFrame, updates: DataFrame, keyCol: String,
    versionCol: String, tieCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(versionCol).desc, col(tieCol).desc)
    state.unionByName(updates)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("rn")
  }

  /** Generic latest-wins merge. `snapshot` rows carry implicit version
    * -∞; `updates` rows carry (`versionCol`, `opCol` with 'u'/'d') and
    * the full replacement payload. Ties on version break by `tieCol`
    * (a unique record id, CDC offset analog) — highest wins. The
    * output is the user-facing snapshot (tombstones applied, bookkeeping
    * columns dropped); for repeated merging keep [[mergeVersioned]]'s
    * state form instead. */
  def upsert(snapshot: DataFrame, updates: DataFrame, keyCol: String,
    versionCol: String, tieCol: String, opCol: String): DataFrame = {
    val base = snapshot
      .withColumn(versionCol, lit(Long.MinValue))
      .withColumn(tieCol, lit(Long.MinValue))
      .withColumn(opCol, lit("u"))
    mergeVersioned(base, updates, keyCol, versionCol, tieCol)
      .filter(col(opCol) =!= "d")
      .drop(versionCol, tieCol, opCol)
  }

  /** Oracled instance: the `part` dim snapshot replayed against a CDC
    * stream derived from events — `purchase` events upsert the part
    * keyed by the payload's `k` (new name stamped from the event id),
    * `error` events are delete tombstones; version = event micros.
    * Emits (p_partkey, p_name, p_brand, src) — src marks whether the
    * surviving row came from the base snapshot or the CDC replay. */
  def dimUpsert(s: SparkSession, d: String): DataFrame = {
    val updates = Tables.events(s, d)
      .filter(col("event_type").isin("purchase", "error"))
      .withColumn("k",
        Dwd.propsK(col("props")).cast("long"))
      .select(
        col("k").as("p_partkey"),
        concat(lit("upd-"), col("event_id")).as("p_name"),
        lit("CDC-BRAND").as("p_brand"),
        lit("cdc").as("src"),
        col("ts_us").as("version"),
        col("event_id").as("tie"),
        when(col("event_type") === "error", "d").otherwise("u").as("op"))
    val snapshot = Tables.part(s, d)
      .select(col("p_partkey"), col("p_name"), col("p_brand"),
        lit("base").as("src"))
    upsert(snapshot, updates, "p_partkey", "version", "tie", "op")
      .orderBy(col("p_partkey"))
  }

  /** SCD Type-2 dimension history — the other half of dim maintenance:
    * instead of latest-wins overwrite ([[upsert]]), keep every version
    * with its validity range. One window pass per key: `valid_to` of a
    * version is the NEXT version's start (`lead`), open-ended for the
    * current one; a delete tombstone closes the prior row's validity
    * and contributes no row itself. The base snapshot enters at
    * version 0 (before every CDC micro-timestamp). */
  def scd2(history: DataFrame, keyCol: String, versionCol: String,
    tieCol: String, opCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(versionCol), col(tieCol))
    history
      .withColumn("valid_from", col(versionCol))
      .withColumn("valid_to", lead(col(versionCol), 1).over(w))
      .withColumn("is_current",
        (col("valid_to").isNull && col(opCol) =!= "d").cast("int"))
      .filter(col(opCol) =!= "d")
      .drop(versionCol, tieCol, opCol)
  }

  /** Oracled instance over the same CDC replay as [[dimUpsert]]:
    * the full change history of every part touched by the stream. */
  def dimScd2(s: SparkSession, d: String): DataFrame = {
    val updates = Tables.events(s, d)
      .filter(col("event_type").isin("purchase", "error"))
      .select(
        Dwd.propsK(col("props")).cast("long").as("p_partkey"),
        concat(lit("upd-"), col("event_id")).as("p_name"),
        col("ts_us").as("version"),
        col("event_id").as("tie"),
        when(col("event_type") === "error", "d").otherwise("u").as("op"))
    val base = Tables.part(s, d)
      .select(col("p_partkey"), col("p_name"),
        lit(0L).as("version"), lit(Long.MinValue).as("tie"), lit("u").as("op"))
    scd2(base.unionByName(updates), "p_partkey", "version", "tie", "op")
      .orderBy(col("p_partkey"), col("valid_from"), col("p_name"))
  }

  val dimScd2Sql: String =
    """WITH history AS (
      |  SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS p_partkey,
      |    'upd-' || event_id AS p_name,
      |    epoch_us(ts) AS version, event_id AS tie,
      |    CASE WHEN event_type = 'error' THEN 'd' ELSE 'u' END AS op
      |  FROM events
      |  WHERE event_type IN ('purchase', 'error')
      |  UNION ALL
      |  SELECT p_partkey, p_name, 0 AS version,
      |    CAST(-9223372036854775808 AS BIGINT) AS tie, 'u' AS op
      |  FROM part)
      |SELECT p_partkey, p_name, valid_from, valid_to, is_current FROM (
      |  SELECT p_partkey, p_name, op,
      |    version AS valid_from,
      |    lead(version) OVER (PARTITION BY p_partkey ORDER BY version, tie) AS valid_to,
      |    CAST((lead(version) OVER (PARTITION BY p_partkey ORDER BY version, tie) IS NULL
      |          AND op <> 'd') AS INTEGER) AS is_current
      |  FROM history) t
      |WHERE op <> 'd'
      |ORDER BY p_partkey, valid_from, p_name""".stripMargin

  /** SCD2 point-in-time (temporal) join — the consumer side of
    * [[dimScd2]]: every fact row picks up the dimension VERSION that
    * was valid at the fact's event time (the reference enriches each
    * order with the dim row current at processing time,
    * gmall-realtime app/func/DimAsyncFunction.java; PIT is the
    * history-correct batch form).
    *
    * The naive plan is a per-key interval join (`fact.ts BETWEEN
    * valid_from AND valid_to`) — an inequality join Spark can only
    * nested-loop or near-cross-product per key. This formulation never
    * builds intervals at all: the dim CHANGE stream (base snapshot at
    * version 0, updates, delete tombstones carrying a NULL payload)
    * rides the MERGE-form as-of ([[AsOfJoin.asOf]]) — one shuffle on
    * the dim key, one ordered window pass. Tombstones work for free:
    * the carried payload struct goes non-null-with-null-fields, so a
    * fact dated inside a deleted gap resolves to NULL exactly like the
    * closed-validity interval semantics. Same-version ties resolve by
    * the CDC record id riding FIRST in the payload struct (struct
    * comparison = lexicographic), matching the empty-interval
    * semantics of [[scd2]]'s (version, tie) lead.
    *
    * Instance: every `view` event (the fact stream) picks up the part
    * version current at view time under the same purchase/error CDC
    * replay as [[dimScd2]]. NULL part keys (dirty payloads) are
    * excluded on BOTH sides: SQL join-on-NULL never matches, while a
    * window PARTITION BY groups NULLs together — keeping them would
    * let NULL-key facts see NULL-key updates. */
  def scd2PointInTime(s: SparkSession, d: String): DataFrame = {
    val updates = Tables.events(s, d)
      .filter(col("event_type").isin("purchase", "error"))
      .select(
        Dwd.propsK(col("props")).cast("long").as("p_partkey"),
        col("ts_us").as("version"),
        col("event_id").as("tie"),
        when(col("event_type") =!= "error",
          concat(lit("upd-"), col("event_id"))).as("p_name"))
      .filter(col("p_partkey").isNotNull)
    val base = Tables.part(s, d)
      .select(col("p_partkey"), lit(0L).as("version"),
        lit(Long.MinValue).as("tie"), col("p_name"))
    val facts = Tables.events(s, d)
      .filter(col("event_type") === "view")
      .select(col("event_id"),
        Dwd.propsK(col("props")).cast("long").as("p_partkey"),
        col("ts_us").as("version"))
      .filter(col("p_partkey").isNotNull)
    AsOfJoin.asOf(facts, base.unionByName(updates),
      key = "p_partkey", ts = "version", payloadCols = Seq("tie", "p_name"))
      .select(col("event_id"), col("p_partkey"), col("p_name").as("pit_name"))
      .orderBy(col("event_id"))
  }

  /** Oracle: the literal interval join against the SCD2 history —
    * valid_from inclusive, valid_to exclusive, open-ended current
    * rows; ties collapse to empty intervals so each fact matches at
    * most one version. */
  val scd2PointInTimeSql: String =
    s"""WITH scd AS (${dimScd2Sql}),
       |facts AS (
       |  SELECT event_id,
       |    CAST(json_extract_string(props, '$$.k') AS BIGINT) AS p_partkey,
       |    epoch_us(ts) AS v
       |  FROM events WHERE event_type = 'view'
       |    AND json_extract_string(props, '$$.k') IS NOT NULL)
       |SELECT f.event_id, f.p_partkey, s.p_name AS pit_name
       |FROM facts f LEFT JOIN scd s
       |  ON f.p_partkey = s.p_partkey AND f.v >= s.valid_from
       |     AND (s.valid_to IS NULL OR f.v < s.valid_to)
       |ORDER BY event_id""".stripMargin

  /** UNORDERED merge body — shared verbatim by [[dimUpsertSql]] (which
    * appends the presentation ORDER BY) and Quality.snapshotDiffSql
    * (which embeds it as a CTE and orders its own output), so the
    * composition never depends on string surgery against a trailing
    * clause. */
  val dimUpsertSqlBody: String =
    """WITH updates AS (
      |  SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS p_partkey,
      |    'upd-' || event_id AS p_name,
      |    'CDC-BRAND' AS p_brand,
      |    'cdc' AS src,
      |    ts AS version_ts, event_id AS tie,
      |    CASE WHEN event_type = 'error' THEN 'd' ELSE 'u' END AS op
      |  FROM events
      |  WHERE event_type IN ('purchase', 'error')),
      |base AS (
      |  SELECT p_partkey, p_name, p_brand, 'base' AS src,
      |    CAST(NULL AS TIMESTAMP) AS version_ts,
      |    CAST(-9223372036854775808 AS BIGINT) AS tie,
      |    'u' AS op
      |  FROM part),
      |merged AS (
      |  SELECT *, row_number() OVER (
      |      PARTITION BY p_partkey
      |      ORDER BY version_ts DESC NULLS LAST, tie DESC) AS rn
      |  FROM (SELECT * FROM base UNION ALL SELECT * FROM updates) u)
      |SELECT p_partkey, p_name, p_brand, src
      |FROM merged
      |WHERE rn = 1 AND op <> 'd'""".stripMargin

  val dimUpsertSql: String = dimUpsertSqlBody + "\nORDER BY p_partkey"

  /** INCREMENTAL SCD2 maintenance — [[dimScd2]]'s delta-merge form and
    * the dimension-side sibling of `dws_product_stats_incr`: the
    * standing history is NEVER re-windowed. Maintained state is
    * (a) the CLOSED-version archive (append-only, immutable) and
    * (b) ONE raw last-event row per key — the open version, or the
    * tombstone that closed the key (kept so a delete's memory survives;
    * publishing only `is_current` rows would lose it). A delta batch
    * (all versions later than the standing state — the in-order CDC
    * premise; out-of-order arrival is [[mergeVersioned]]'s domain)
    * merges as: archive ∪ scd2(last-event ∪ delta) — per-key merge work
    * is 1 + delta rows, independent of history depth.
    *
    * Output must be BYTE-IDENTICAL to the full rebuild, so it shares
    * [[dimScd2Sql]] as its oracle. The arrival split here is the
    * midpoint of the CDC version range, attached as a broadcast
    * single-row scalar (no driver round-trip); keys deliberately span
    * the split. */
  def dimScd2Incr(s: SparkSession, d: String): DataFrame = {
    val updates = Tables.events(s, d)
      .filter(col("event_type").isin("purchase", "error"))
      .select(
        Dwd.propsK(col("props")).cast("long").as("p_partkey"),
        concat(lit("upd-"), col("event_id")).as("p_name"),
        col("ts_us").as("version"),
        col("event_id").as("tie"),
        when(col("event_type") === "error", "d").otherwise("u").as("op"))
    val base = Tables.part(s, d)
      .select(col("p_partkey"), col("p_name"),
        lit(0L).as("version"), lit(Long.MinValue).as("tie"), lit("u").as("op"))
    val bounds = updates.agg(
      ((min(col("version")) + max(col("version"))) / 2).cast("long").as("cut"))
    val tagged = updates.crossJoin(broadcast(bounds))
    val standingEvents = base.unionByName(
      tagged.filter(col("version") <= col("cut")).drop("cut"))
    val delta = tagged.filter(col("version") > col("cut")).drop("cut")

    // maintained state, derived here from the standing batch; in
    // production these two ARE the stored tables
    val wLast = Window.partitionBy(col("p_partkey"))
      .orderBy(col("version").desc, col("tie").desc)
    val lastEvent = standingEvents
      .withColumn("rn", row_number().over(wLast))
      .filter(col("rn") === 1).drop("rn")
    val closedArchive =
      scd2(standingEvents, "p_partkey", "version", "tie", "op")
        .filter(col("valid_to").isNotNull)

    // the delta merge: per key, one state row + the delta rows
    val openRegion = scd2(lastEvent.unionByName(delta),
      "p_partkey", "version", "tie", "op")
    closedArchive.unionByName(openRegion)
      .orderBy(col("p_partkey"), col("valid_from"), col("p_name"))
  }
}
