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

  /** Count–min sketch point-frequency service (Cormode & Muthukrishnan
    * J.Alg'05) — the third leg of the mergeable-frequency family next
    * to MG top-k (which items are frequent) and HLL (how many distinct):
    * "how often does THIS term occur" answered from a fixed
    * depth×width counter grid, never from raw data. The sketch is
    * built distributed (`count_min_sketch` is a partial-aggregable
    * Catalyst aggregate; merges are counter-matrix adds, so the result
    * is partitioning-independent for a fixed seed); only the
    * kilobyte-sized grid reaches the driver — the same bounded-state
    * contract as the HLL ops. Probes are the exact top-`probes` terms,
    * computed from the same single term scan (the exact counts ride
    * along as the in-query witness; the spec asserts the CMS
    * guarantee exact ≤ est ≤ exact + ε·N).
    */
  def countMin(s: SparkSession, d: String, probes: Int = 20,
      eps: Double = 0.0001, confidence: Double = 0.99): DataFrame = {
    import org.apache.spark.util.sketch.CountMinSketch
    val terms = Tables.documents(s, d)
      .select(explode(regexp_extract_all(lower(col("text")), lit("[a-z0-9]+"), lit(0))).as("term"))
    val sketchBytes = terms
      .agg(count_min_sketch(col("term"), lit(eps), lit(confidence), lit(42)).as("sk"))
      .head().getAs[Array[Byte]]("sk")
    val cms = CountMinSketch.readFrom(new java.io.ByteArrayInputStream(sketchBytes))
    // bounded driver step (same contract as the IVF centroid pull):
    // exactly `probes` (term, count) rows leave the cluster; the grid
    // is probed driver-side so no UDF enters any distributed plan
    val top = terms.groupBy(col("term")).agg(count(lit(1)).as("exact_ct"))
      .orderBy(col("exact_ct").desc, col("term")).limit(probes)
      .collect()
    val rows = top.map(r =>
      (r.getString(0), r.getLong(1), cms.estimateCount(r.getString(0))))
    s.createDataFrame(rows.toSeq).toDF("term", "exact_ct", "cms_ct")
      .orderBy(col("exact_ct").desc, col("term"))
  }
}
