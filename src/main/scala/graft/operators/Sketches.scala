package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Mergeable-sketch pre-aggregation — how a 100 TB warehouse serves
  * COUNT DISTINCT rollups without rescanning raw data: sketch each
  * fine-grained partition once (here: order month), persist the
  * sketches as a tiny pre-agg table, and answer ANY coarser rollup
  * (year, all-time, ad-hoc month ranges) by merging sketches. The
  * reference's ClickHouse tables store raw rows and re-aggregate per
  * query (ProductStatsMapper re-sums on every request); at scale the
  * sketch table is smaller than one partition of the raw data.
  *
  * Spark's Datasketches HLL surface keeps every step distributed and
  * mergeable: `hll_sketch_agg` (partial-aggregable per month),
  * `hll_union_agg` (re-aggregable upward), `hll_sketch_estimate`.
  * Register maxima are order-independent, so estimates are
  * deterministic under any partitioning.
  */
object Sketches {

  /** Monthly distinct-customer sketches rolled up to years by sketch
    * UNION — the raw orders table is scanned exactly once; the rollup
    * aggregates kilobyte sketches, not data. `exact_custs` (two-phase
    * distinct over the same scan) rides along as the in-query witness
    * the spec bounds the estimate against. */
  def hllPreAgg(s: SparkSession, d: String): DataFrame = {
    val monthly = Tables.orders(s, d)
      .groupBy(date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM").as("month"))
      .agg(hll_sketch_agg(col("o_custkey"), lit(14)).as("sk"))
    monthly
      .groupBy(substring(col("month"), 1, 4).as("year"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"), lit(true))).as("approx_custs"),
        count(lit(1)).as("months"))
      .orderBy(col("year"))
  }

  /** The witness the spec compares against: exact per-year distinct
    * customers from the raw table. */
  def exactByYear(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .groupBy(date_format(col("o_orderdate"), "yyyy").as("year"))
      .agg(countDistinct(col("o_custkey")).as("exact_custs"))
      .orderBy(col("year"))
}
