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

  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark only reads as
    * a long (spark.sql.legacy.parquet.nanosAsLong). We keep the exact
    * nanos in `ts_ns`, plus `ts_us = ts_ns div 1000` — the resolution
    * DuckDB sees after its truncating TIMESTAMP(NANOS) read, so every
    * oracle-compared ordering / gap comparison runs on `ts_us` (with
    * unique `event_id` as tie-break) — and a micro-precision `ts`
    * timestamp for window ops.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    p(s, d, "events")
      .withColumnRenamed("ts", "ts_ns")
      .withColumn("ts_us", expr("ts_ns div 1000"))
      .withColumn("ts", expr("timestamp_micros(ts_us)"))
  }
}
