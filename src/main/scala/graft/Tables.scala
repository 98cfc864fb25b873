package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated TPC-H-ish tables.
  *
  * Mapping to the reference (gmall-flink-2021):
  *  - `events`   plays the Kafka page-log / CDC streams (ods_base_log,
  *    gmall-realtime/src/main/java/com/atguigu/app/dwd/BaseLogApp.java)
  *  - `orders`/`lineitem` play order_info/order_detail
  *    (app/dwm/OrderWideApp.java)
  *  - `customer`→`nation`→`region`, `part`, `supplier` play the DIM_*
  *    tables looked up in app/func/DimAsyncFunction.java
  *  - `documents` feeds keyword/text ops (app/dws/KeywordStatsApp.java)
  *  - `embeddings` feeds the similarity-search extensions.
  *
  * All reads are plain parquet scans so Catalyst keeps pushdown/pruning.
  */
object Tables {
  private def p(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame   = p(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame   = p(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = p(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = p(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = p(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame   = p(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = p(s, d, "lineitem")
  def documents(s: SparkSession, d: String): DataFrame = p(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = p(s, d, "embeddings")

  /** `events.ts` has shipped as either parquet TIMESTAMP(NANOS) — which
    * Spark only reads as a long (spark.sql.legacy.parquet.nanosAsLong)
    * — or plain TIMESTAMP(MICROS) (isAdjustedToUTC=false → read as
    * TIMESTAMP_NTZ). The loader normalizes both to the same layout: the
    * exact stored value in `ts_ns` (nanos; micro-sourced data carries
    * zero sub-micro digits), `ts_us = ts_ns div 1000` — the resolution
    * DuckDB sees in either encoding, so every oracle-compared ordering /
    * gap comparison runs on `ts_us` (with unique `event_id` as
    * tie-break) — and a micro-precision `ts` timestamp for window ops.
    * The NTZ branch converts with naive-datetime arithmetic
    * (`timestampdiff` from the epoch), never a session-timezone cast,
    * so `ts_us` is the stored value on every host timezone.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = p(s, d, "events")
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    val tsNs = raw.schema("ts").dataType match {
      case LongType => col("ts") // TIMESTAMP(NANOS): raw nanos long
      case TimestampNTZType =>
        expr("timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)") * lit(1000L)
      case _ => // instant-typed micros (TIMESTAMP_LTZ)
        unix_micros(col("ts")) * lit(1000L)
    }
    raw.select(col("event_id"), tsNs.as("ts_ns"), col("user_id"),
        col("event_type"), col("value"), col("props"))
      .withColumn("ts_us", expr("ts_ns div 1000"))
      .withColumn("ts", expr("timestamp_micros(ts_us)"))
  }
}
