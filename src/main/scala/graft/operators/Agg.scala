package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Exact-arithmetic helpers shared by all operators.
  *
  * Money/metric sums are computed on DECIMAL(18,2) and only cast back
  * to DOUBLE at the very end: decimal addition is exact and
  * order-independent, so Spark (any partitioning / AQE plan) and the
  * DuckDB oracle produce bit-identical doubles. Summing raw doubles
  * would drift in the last bits depending on reduction order.
  */
object Agg {
  /** Cast to exact decimal before aggregating. */
  def dec(c: Column): Column = c.cast(DecimalType(18, 2))

  /** Exact sum of a money-like double column, returned as double. */
  def moneySum(c: Column): Column = sum(dec(c)).cast("double")

  /** Exact revenue term: price * (1 - discount), scale-4 decimal. */
  def revenue(price: Column, discount: Column): Column =
    sum(dec(price) * (lit(BigDecimal(1)).cast(DecimalType(18, 2)) - dec(discount))).cast("double")

  /** SQL fragments for the DuckDB oracle mirroring the helpers above. */
  def sqlMoneySum(col: String): String =
    s"CAST(sum(CAST($col AS DECIMAL(18,2))) AS DOUBLE)"
  def sqlRevenue(price: String, discount: String): String =
    s"CAST(sum(CAST($price AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST($discount AS DECIMAL(18,2)))) AS DOUBLE)"
}

/** Shared pieces of the exact interpolated-percentile CDF walk
  * (`Relational.quantiles` grouped, `Ads.quartileCuts` global): over a
  * frame carrying (`p` distinct value, `ct` its count, `cum` running
  * count, `n` total), locate the two rows bracketing each quantile and
  * interpolate EXACTLY the two-sided form both Spark's `percentile`
  * and DuckDB's `quantile_cont` evaluate — bit-identical doubles. The
  * invariant lives HERE once; a fix in one consumer cannot silently
  * leave the other diverging from its oracle. */
private[operators] object CdfQuantile {

  /** Four agg columns: bracketing values + both interpolation weights.
    * The weights are carried SEPARATELY (constant per group, n is
    * group-wide) — collapsing to f/1−f drifts in the last ulp. */
  def qCols(q: Double, nm: String): Seq[Column] = {
    val r = lit(q) * (col("n") - 1)
    val lo = floor(r)
    val hi = ceil(r)
    Seq(
      max(when(col("cum") - col("ct") <= lo && lo < col("cum"), col("p"))).as(s"${nm}_lo"),
      max(when(col("cum") - col("ct") <= hi && hi < col("cum"), col("p"))).as(s"${nm}_hi"),
      max(hi - r).as(s"${nm}_wlo"),
      max(r - lo).as(s"${nm}_whi"))
  }

  /** loV·(hi−pos) + hiV·(pos−lo), with the integral-position special
    * case — the exact `quantile_cont` form. */
  def interp(nm: String): Column =
    when(col(s"${nm}_whi") === 0.0, col(s"${nm}_lo"))
      .otherwise(col(s"${nm}_lo") * col(s"${nm}_wlo") +
        col(s"${nm}_hi") * col(s"${nm}_whi"))
}
