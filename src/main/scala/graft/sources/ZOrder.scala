package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) clustered writes — the multi-dimensional
  * data-skipping layout for 100 TB scans. A table range-partitioned
  * and sorted by ONE column skips files only for predicates on that
  * column; interleaving the bits of several quantized columns orders
  * rows along a space-filling curve, so every clustered dimension's
  * per-file min/max footer range shrinks (~√ per dimension for two)
  * and a scan with a predicate on ANY of them prunes files/row-groups
  * from parquet statistics alone. Same idea as the lakehouse OPTIMIZE
  * ZORDER BY maintenance command, expressed as plain column
  * arithmetic + repartitionByRange.
  *
  * Quantization is linear between the column's min and max, taken
  * from one stats aggregate (2 doubles per column to the driver —
  * bounded, documented). Rank-based quantization would resist skew
  * better but needs a global sort of its own; min/max is the standard
  * first cut and keeps the layout pass to exactly one extra scan.
  */
object ZOrder {

  private val Bits = 16 // per-dimension resolution: 65536 buckets

  /** Interleave the low [[Bits]] bits of the quantized dimensions:
    * dimension d contributes its bit i at output position i*n + d.
    * Pure shift/mask column arithmetic — fully codegen'd. */
  private[graft] def interleave(qs: Seq[Column]): Column = {
    val n = qs.size
    (0 until Bits).flatMap { i =>
      qs.zipWithIndex.map { case (q, d) =>
        shiftleft(shiftright(q, i).bitwiseAND(lit(1L)), i * n + d)
      }
    }.reduce(_ bitwiseOR _)
  }

  /** The Morton key for `cols`, each linearly quantized to [0, 2^16)
    * between the supplied (min, max) bounds. */
  private[graft] def mortonKey(cols: Seq[Column], bounds: Seq[(Double, Double)]): Column =
    interleave(cols.zip(bounds).map { case (c, (lo, hi)) =>
      val span = math.max(hi - lo, java.lang.Double.MIN_VALUE)
      least(lit((1L << Bits) - 1), greatest(lit(0L),
        floor((c.cast("double") - lit(lo)) / lit(span) * ((1L << Bits) - 1)).cast("long")))
    })

  /** Z-order-cluster `df` by `cols` into ~`nFiles` files at `path`:
    * one stats pass for the quantization bounds, then
    * repartitionByRange + sortWithinPartitions on the Morton key —
    * the range exchange puts contiguous curve segments in each file,
    * so parquet footer min/max on every clustered column tightens. */
  def clusterWrite(df: DataFrame, path: String, cols: Seq[String], nFiles: Int): Unit = {
    val exprs = cols.flatMap(c =>
      Seq(min(col(c)).cast("double"), max(col(c)).cast("double")))
    val stats = df.agg(exprs.head, exprs.tail: _*).head()
    val bounds = cols.indices.map(i => (stats.getDouble(2 * i), stats.getDouble(2 * i + 1)))
    df.withColumn("__z", mortonKey(cols.map(col), bounds))
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }

  /** The 100 TB FACT-table layout (r12): date-partitioned (`dt=`)
    * directories for partition/DPP pruning, Z-order clustering WITHIN
    * each partition for footer-stat skipping on the clustered columns
    * — the two pruning layers compose: a dim-filtered join prunes
    * whole `dt=` directories at runtime, then the pushed column
    * predicates skip row groups inside the surviving ones.
    *
    * One range exchange on (dt, z) makes every task a contiguous
    * curve segment of mostly one date, so each `dt=` directory's
    * files carry tight min/max footers on every clustered column;
    * `nTasks` sets the per-partition file granularity (at real scale
    * the 5M-row default per file plays this role). */
  def clusterWriteDatePartitioned(df: DataFrame, path: String, dateCol: Column,
      cols: Seq[String], nTasks: Int, maxRecordsPerFile: Long = 5000000L): Unit = {
    val exprs = cols.flatMap(c =>
      Seq(min(col(c)).cast("double"), max(col(c)).cast("double")))
    val stats = df.agg(exprs.head, exprs.tail: _*).head()
    val bounds = cols.indices.map(i => (stats.getDouble(2 * i), stats.getDouble(2 * i + 1)))
    df.withColumn("dt", dateCol)
      .withColumn("__z", mortonKey(cols.map(col), bounds))
      .repartitionByRange(nTasks, col("dt"), col("__z"))
      .sortWithinPartitions(col("dt"), col("__z"))
      .drop("__z")
      .write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy("dt")
      .parquet(path)
  }
}
