package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities (SURVEY §4). AQE's skew-join splitting
  * handles skewed *joins* automatically; skewed *aggregations* on a
  * hot key still funnel into one reducer. `saltedAgg` runs the classic
  * two-phase fix: aggregate on (key, salt) first — spreading a hot key
  * over `buckets` reducers — then combine the partials per key. Only
  * algebraic aggregates (sum/count/min/max) decompose this way, so the
  * API takes (partial, final) column pairs.
  */
object Skew {

  /** Two-phase salted aggregation.
    *
    * @param df       input
    * @param keys     grouping keys
    * @param buckets  salt fan-out (≈ number of reducers a hot key spreads over)
    * @param partials (alias, partial-agg column) computed per (key, salt)
    * @param finals   (alias, final-combine column over the partial alias)
    */
  def saltedAgg(df: DataFrame, keys: Seq[Column], buckets: Int,
    partials: Seq[(String, Column)], finals: Seq[(String, Column)]): DataFrame = {
    val salted = df.withColumn("_salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(buckets)))
    val phase1 = salted
      .groupBy(keys :+ col("_salt"): _*)
      .agg(partials.head._2.as(partials.head._1),
        partials.tail.map { case (a, c) => c.as(a) }: _*)
    phase1
      .groupBy(keys: _*)
      .agg(finals.head._2.as(finals.head._1),
        finals.tail.map { case (a, c) => c.as(a) }: _*)
  }

  /** Convenience: salted sum+count for one value column. The sum runs
    * on DECIMAL(18,2) (Agg.dec) so the salted two-phase total is
    * bit-identical to a direct groupBy — raw double sums would drift
    * with the extra reduction level. */
  def saltedSumCount(df: DataFrame, keys: Seq[Column], value: Column,
    buckets: Int = 32): DataFrame =
    saltedAgg(df, keys, buckets,
      partials = Seq("p_sum" -> sum(Agg.dec(value)), "p_ct" -> count(lit(1))),
      finals = Seq("total" -> sum(col("p_sum")).cast("double"), "ct" -> sum(col("p_ct"))))
}
