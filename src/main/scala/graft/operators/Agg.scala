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
