package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** DWD layer: clean, flag, split, route — the Spark-native versions of
  * the reference's BaseLogApp / BaseDBApp
  * (gmall-realtime/src/main/java/com/atguigu/app/dwd/BaseLogApp.java,
  * BaseDBApp.java, app/func/TableProcessFunction.java).
  *
  * The reference does per-record imperative work (fastjson parse with
  * try/catch side output, keyed ValueState, broadcast state). Here each
  * becomes a declarative plan: regexp field extraction (codegen'd),
  * window-function state, broadcast join routing — all of which scale
  * horizontally with no per-key driver state.
  */
object Dwd {

  /** The tracking payload's `k` field — the ONE definition every
    * operator extracting it shares (clean/dirty/cdcOps here, product
    * stats, dim maintenance). */
  private[graft] def propsK(props: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    regexp_extract(props, """"k":\s*(\d+)""", 1)

  /** Deterministic CDC op envelope (the Debezium/Maxwell `type` field
    * analog, derived from the record id) — single-sourced so the batch
    * [[cdcOps]] and streaming `StreamOps.cdcEnvelope` can never
    * disagree on what is a delete. */
  private[graft] def opOf(id: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    when(id % 5 === 0, "d").when(id % 5 === 1, "u").otherwise("c")

  /** Parse the JSON-ish `props` payload, drop dirty rows (no parseable
    * `k`, or an upstream-flagged `error` record), emit typed columns.
    * Mirrors BaseLogApp.java:52-68: only well-formed page/start/display
    * records flow downstream; everything else goes to [[dirty]].
    * `clean` ∪ `dirty` is an exact partition of the input (DwdSpec).
    */
  def clean(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .withColumn("k", propsK(col("props")))
      // null-safe: a NULL event_type must land in dirty, not vanish
      // from both legs (x =!= 'error' alone is NULL for NULL x)
      .filter(col("k") =!= "" && col("event_type").isNotNull
        && col("event_type") =!= "error")
      .select(
        col("event_id"), col("user_id"), col("event_type"), col("value"),
        col("k").cast("int").as("k"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts_s"))
      .orderBy(col("event_id"))

  val cleanSql: String =
    """SELECT event_id, user_id, event_type, value,
      |  CAST(regexp_extract(props, '"k":\s*(\d+)', 1) AS INTEGER) AS k,
      |  strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s
      |FROM events
      |WHERE regexp_extract(props, '"k":\s*(\d+)', 1) <> ''
      |  AND event_type IS NOT NULL AND event_type <> 'error'
      |ORDER BY event_id""".stripMargin

  /** The dirty side output itself (BaseLogApp.java:52-63 writes
    * unparseable records to a `Dirty` OutputTag topic for quarantine).
    * Exact complement of [[clean]] over the same scan: rows whose
    * payload has no parseable `k`, or that the upstream SDK flagged as
    * `error` records, are emitted raw (original payload kept intact
    * for replay) plus a `reason` column. Both legs share one parquet
    * scan when composed (DwdSpec asserts the partition property on a
    * corpus with planted null/empty/garbage payloads). */
  def dirty(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      // coalesce first: regexp_extract(NULL) is NULL, and NULL = '' is
      // NULL — a null payload must land in THIS leg, not vanish
      .filter(propsK(coalesce(col("props"), lit(""))) === ""
        || col("event_type").isNull || col("event_type") === "error")
      .select(
        col("event_id"), col("user_id"), col("event_type"),
        col("props").as("raw_payload"),
        when(col("props").isNull, "null_payload")
          .when(length(trim(col("props"))) === 0, "empty_payload")
          .when(propsK(col("props")) === "",
            "unparseable_key")
          .when(col("event_type").isNull, "null_event_type")
          .otherwise("error_flagged").as("reason"))
      .orderBy(col("event_id"))

  val dirtySql: String =
    """SELECT event_id, user_id, event_type, props AS raw_payload,
      |  CASE WHEN props IS NULL THEN 'null_payload'
      |       WHEN length(trim(props)) = 0 THEN 'empty_payload'
      |       WHEN regexp_extract(props, '"k":\s*(\d+)', 1) = '' THEN 'unparseable_key'
      |       WHEN event_type IS NULL THEN 'null_event_type'
      |       ELSE 'error_flagged' END AS reason
      |FROM events
      |WHERE regexp_extract(coalesce(props, ''), '"k":\s*(\d+)', 1) = ''
      |   OR event_type IS NULL OR event_type = 'error'
      |ORDER BY event_id""".stripMargin

  /** Stream splitting (BaseLogApp.java:110-145 side outputs): route
    * each event to the page / start / other stream. */
  def split(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .select(
        col("event_id"), col("user_id"), col("event_type"),
        when(col("event_type").isin("view", "click"), "page")
          .when(col("event_type") === "signup", "start")
          .otherwise("other").as("stream"))
      .orderBy(col("event_id"))

  val splitSql: String =
    """SELECT event_id, user_id, event_type,
      |  CASE WHEN event_type IN ('view','click') THEN 'page'
      |       WHEN event_type = 'signup' THEN 'start'
      |       ELSE 'other' END AS stream
      |FROM events
      |ORDER BY event_id""".stripMargin

  /** New-user flag repair (BaseLogApp.java:73-105: keyed ValueState
    * holding first-visit date): the first event a user ever produced
    * is `is_new = 1`.
    *
    * NOT a per-user ordered window: "first" is a lexicographic MIN of
    * (ts_us, event_id), so a hash aggregation with map-side partials
    * finds it and a key-join stamps the flag — no per-key serial sort
    * anywhere, so a billion-event user costs the same as any other.
    * The agg and the join share the user_id partitioning. */
  def newUserFlag(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val first = ev.groupBy(col("user_id"))
      .agg(min(struct(col("ts_us"), col("event_id")))
        .getField("event_id").as("first_id"))
    ev.join(first, "user_id")
      .select(
        col("event_id"), col("user_id"),
        when(col("event_id") === col("first_id"), 1).otherwise(0).as("is_new"))
      .orderBy(col("event_id"))
  }

  val newUserFlagSql: String =
    """SELECT event_id, user_id,
      |  CASE WHEN row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) = 1
      |       THEN 1 ELSE 0 END AS is_new
      |FROM events
      |ORDER BY event_id""".stripMargin

  /** Dynamic routing via a broadcast config table (BaseDBApp.java:66-95
    * + TableProcessFunction: the MySQL `table_process` config decides
    * each row's sink and its kept columns). The config is a tiny
    * dimension broadcast to every executor — same information flow as
    * Flink broadcast state, but re-planned by Catalyst. Unmatched types
    * fall through to the default sink (reference drops them). */
  def cdcRoute(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val config = Seq(
      ("view", "dwd_page_log", "kafka"),
      ("click", "dwd_page_log", "kafka"),
      ("signup", "dwd_start_log", "kafka"),
      ("purchase", "dwd_order_info", "kafka"),
      ("error", "dim_error", "hbase"))
      .toDF("src_type", "sink_table", "sink_type")
    Tables.events(s, d)
      .join(broadcast(config), col("event_type") === col("src_type"), "left")
      .select(
        col("event_id"), col("event_type"),
        coalesce(col("sink_table"), lit("dwd_default")).as("sink_table"),
        coalesce(col("sink_type"), lit("kafka")).as("sink_type"))
      .orderBy(col("event_id"))
  }

  val cdcRouteSql: String =
    """SELECT event_id, event_type,
      |  CASE event_type WHEN 'view' THEN 'dwd_page_log'
      |                  WHEN 'click' THEN 'dwd_page_log'
      |                  WHEN 'signup' THEN 'dwd_start_log'
      |                  WHEN 'purchase' THEN 'dwd_order_info'
      |                  WHEN 'error' THEN 'dim_error'
      |                  ELSE 'dwd_default' END AS sink_table,
      |  CASE WHEN event_type = 'error' THEN 'hbase' ELSE 'kafka' END AS sink_type
      |FROM events
      |ORDER BY event_id""".stripMargin

  /** CDC envelope + op-type routing — the part of BaseDBApp the plain
    * [[cdcRoute]] lacks (BaseDBApp.java:57-62 filters `type = 'delete'`
    * before routing; the envelope itself is built in
    * app/func/MyDeserializerFunc.java; per-sink column pruning is
    * TableProcessFunction.java `filterColumn`). Three pieces, all
    * codegen'd column work:
    *   1. envelope: an `op` column (c=insert / u=update / d=delete),
    *      derived deterministically from the record id — the synthetic
    *      stand-in for the Debezium/Maxwell `type` field;
    *   2. delete filtering: `op = 'd'` rows never reach a sink;
    *   3. column pruning: the broadcast config carries each sink's
    *      `sink_columns` list and the generic filter/transform pass
    *      keeps exactly those fields in the serialized payload —
    *      the row narrows BEFORE the shuffle/sink, which at 100 TB is
    *      the difference between shipping 4 columns and shipping all.
    * Money fields ride as DECIMAL(18,2) strings so the rendering is
    * engine-stable (the Agg.moneySum convention, per-row). */
  def cdcOps(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.types.DecimalType
    val config = Seq(
      ("view", "dwd_page_log", "kafka", "event_id,user_id,value_c"),
      ("click", "dwd_page_log", "kafka", "event_id,user_id,value_c"),
      ("signup", "dwd_start_log", "kafka", "event_id,user_id"),
      ("purchase", "dwd_order_info", "kafka", "event_id,k,user_id,value_c"),
      ("error", "dim_error", "hbase", "event_id"))
      .toDF("src_type", "sink_table", "sink_type", "sink_columns")
    val candidates = array(
      struct(lit("event_id").as("n"), col("event_id").cast("string").as("v")),
      struct(lit("k").as("n"), col("k").as("v")),
      struct(lit("user_id").as("n"), col("user_id").cast("string").as("v")),
      struct(lit("value_c").as("n"),
        col("value").cast(DecimalType(18, 2)).cast("string").as("v")))
    // functions.split, not the Dwd.split operator this object shadows it with;
    // the unmatched-type fallback payload must match the oracle's ELSE
    // branch (full default columns, not event_id alone)
    val kept = org.apache.spark.sql.functions.split(
      coalesce(col("sink_columns"), lit("event_id,user_id,value_c")), ",")
    Tables.events(s, d)
      .withColumn("k", propsK(col("props")))
      .withColumn("op", opOf(col("event_id")))
      .filter(col("op") =!= "d")
      .join(broadcast(config), col("event_type") === col("src_type"), "left")
      .select(
        col("event_id"), col("event_type"), col("op"),
        coalesce(col("sink_table"), lit("dwd_default")).as("sink_table"),
        coalesce(col("sink_type"), lit("kafka")).as("sink_type"),
        concat_ws(",",
          transform(
            filter(candidates, c => array_contains(kept, c("n"))),
            c => concat_ws("=", c("n"), c("v")))).as("payload"))
      .orderBy(col("event_id"))
  }

  // The oracle enumerates the static config per sink (the Spark side
  // runs the generic filter/transform pruning machinery).
  val cdcOpsSql: String =
    """SELECT event_id, event_type, op, sink_table, sink_type, payload FROM (
      |  SELECT event_id, event_type,
      |    CASE event_id % 5 WHEN 0 THEN 'd' WHEN 1 THEN 'u' ELSE 'c' END AS op,
      |    CASE event_type WHEN 'view' THEN 'dwd_page_log'
      |                    WHEN 'click' THEN 'dwd_page_log'
      |                    WHEN 'signup' THEN 'dwd_start_log'
      |                    WHEN 'purchase' THEN 'dwd_order_info'
      |                    WHEN 'error' THEN 'dim_error'
      |                    ELSE 'dwd_default' END AS sink_table,
      |    CASE WHEN event_type = 'error' THEN 'hbase' ELSE 'kafka' END AS sink_type,
      |    CASE event_type
      |      WHEN 'signup' THEN 'event_id=' || event_id || ',user_id=' || user_id
      |      WHEN 'purchase' THEN 'event_id=' || event_id
      |        || ',k=' || json_extract_string(props, '$.k')
      |        || ',user_id=' || user_id
      |        || ',value_c=' || CAST(CAST(value AS DECIMAL(18,2)) AS VARCHAR)
      |      WHEN 'error' THEN 'event_id=' || event_id
      |      ELSE 'event_id=' || event_id || ',user_id=' || user_id
      |        || ',value_c=' || CAST(CAST(value AS DECIMAL(18,2)) AS VARCHAR)
      |    END AS payload
      |  FROM events) t
      |WHERE op <> 'd'
      |ORDER BY event_id""".stripMargin

  /** Nested-JSON explode (BaseLogApp.java:123-140: the `displays`
    * array is exploded into per-element rows stamped with the parent
    * page_id). Here the JSON payload is parsed into a dynamic MAP and
    * exploded, each entry stamped with its parent event — same shape:
    * parse nested structure, fan out, keep parent context. */
  def explodeProps(df: DataFrame): DataFrame =
    df.select(
      col("event_id"), col("event_type"),
      explode(from_json(col("props"), "map<string,string>", Map.empty[String, String]))
        .as(Seq("prop_key", "prop_value")))

  def propsExplode(s: SparkSession, d: String): DataFrame =
    explodeProps(Tables.events(s, d))
      .orderBy(col("event_id"), col("prop_key"))

  // The corpus' props carry the single key "k", so the oracle can
  // enumerate it with scalar JSON functions (DuckDB's json_each table
  // function is unavailable offline); the Spark side still exercises
  // the dynamic from_json(MAP) + explode machinery, and the
  // EdgeCaseSpec covers multi-key payloads.
  val propsExplodeSql: String =
    """SELECT event_id, event_type, 'k' AS prop_key,
      |  json_extract_string(props, '$.k') AS prop_value
      |FROM events
      |WHERE json_extract_string(props, '$.k') IS NOT NULL
      |ORDER BY event_id, prop_key""".stripMargin
}
